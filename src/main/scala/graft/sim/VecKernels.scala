package graft.sim

import org.apache.spark.sql.catalyst.util.ArrayData

/** Compiled per-row kernels for the embedding similarity hot paths.
  *
  * Why these exist: the cosine verify in `cosineDupPairs` / `semDedup` /
  * `bruteForceTopK` was built from Catalyst higher-order functions
  * (`transform` + `zip_with` + `aggregate`). HOF lambda bodies do NOT
  * participate in whole-stage codegen — every array element evaluation
  * walks the interpreted expression tree — so a 64-dim cosine cost
  * hundreds of interpreted expression evals per candidate pair, and the
  * pair-verify stage (candidates outnumber rows at dedup settings) was
  * compute-bound on the interpreter, not on arithmetic. Each kernel here
  * is one JIT-compiled loop over the underlying float array, invoked as a
  * single static call from generated code (the `TopNgramCharFrac`
  * pattern), keeping the stage inside WholeStageCodegen.
  *
  * BIT-EXACTNESS CONTRACT: every kernel performs the IDENTICAL sequence
  * of IEEE-754 double operations, in the identical order, as the HOF
  * expression chain it replaced (float promoted to double per element,
  * products accumulated left-to-right from a 0.0 seed, `java.lang.Math`
  * sqrt/abs/floor — the same intrinsics Catalyst's Sqrt/Abs/Floor emit).
  * The driver's oracle gates hash rounded cosines, so "close" is not
  * enough; VecKernelsSpec asserts bit equality against the HOF forms on
  * randomized vectors. */
object VecKernels {

  /** dot(a, b) with floats promoted to double, summed in index order —
    * bit-identical to
    * `aggregate(zip_with(castD(a), castD(b), _*_), 0.0, _+_)`. */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** sqrt(sum of squares), floats promoted to double, summed in index
    * order — bit-identical to
    * `sqrt(aggregate(transform(castD(a), x => x*x), 0.0, _+_))`. */
  def norm2(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    java.lang.Math.sqrt(acc)
  }

  /** cosine(a, q) with zero-norm rows pinned to -1.0 (never NaN) — the
    * `Ann.cosineTo` semantics in one pass: dot and norm accumulated in
    * index order, cosine = dot / (norm * qNorm). The caller handles the
    * qNorm == 0 case (a constant) before building the expression. */
  def cosineToQ(a: ArrayData, q: Array[Double], qNorm: Double): Double = {
    val n = a.numElements()
    var dot = 0.0
    var ss = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble
      dot += d * q(i)
      ss += d * d
      i += 1
    }
    val norm = java.lang.Math.sqrt(ss)
    if (norm == 0.0) -1.0 else dot / (norm * qNorm)
  }

  /** int8-quantized cosine of `a` against pre-quantized query codes —
    * the `Ann.int8CosineTo` semantics in one pass, operation-for-
    * operation: maxAbs via greatest(acc, abs(x)) from a 0.0 seed, scale =
    * maxAbs/127.0, code_i = floor(x_i/scale + 0.5), integer-valued double
    * dot and norm in index order; maxAbs == 0 rows pin to -1.0 (the
    * codes are never evaluated for them, exactly like the `when` guard in
    * the expression form). */
  def int8CosineToQ(a: ArrayData, qCodes: Array[Double], qNorm: Double): Double = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val d = java.lang.Math.abs(a.getFloat(i).toDouble)
      if (d > maxAbs) maxAbs = d
      i += 1
    }
    if (maxAbs == 0.0) return -1.0
    val scale = maxAbs / 127.0
    var dot = 0.0
    var ss = 0.0
    i = 0
    while (i < n) {
      val c = java.lang.Math.floor(a.getFloat(i).toDouble / scale + 0.5)
      dot += c * qCodes(i)
      ss += c * c
      i += 1
    }
    dot / (java.lang.Math.sqrt(ss) * qNorm)
  }
}
