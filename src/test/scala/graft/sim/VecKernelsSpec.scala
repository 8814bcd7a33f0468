package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Column, functions => F}

import graft.SparkTestSession

/** The compiled vector kernels replaced interpreted higher-order-function
  * expression chains on an oracle-hash-gated path — "close" is not
  * enough, so every kernel is asserted BIT-IDENTICAL (java.lang.Double
  * bit patterns) against the exact HOF form it replaced, over randomized
  * vectors including zero vectors and denormal-ish magnitudes. */
class VecKernelsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val dim = 64
  private def vec(seed: Long): Array[Float] = {
    val r = new java.util.Random(seed)
    Array.tabulate(dim)(_ => (r.nextGaussian() * math.pow(10, r.nextInt(7) - 3)).toFloat)
  }
  private def rows = (0L until 200L).map(i =>
    (i, if (i % 17 == 0) Array.fill(dim)(0.0f) else vec(i)))

  // ---- the former HOF expression forms, verbatim ----
  private def asD(c: Column) = F.transform(c, x => x.cast("double"))
  private def hofDot(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(asD(a), asD(b), (x, y) => x * y),
      F.lit(0.0), (acc, x) => acc + x)
  private def hofNorm(c: Column): Column =
    F.sqrt(F.aggregate(F.transform(asD(c), x => x * x), F.lit(0.0), (acc, x) => acc + x))
  private def hofCosineTo(emb: Column, q: Array[Float]): Column = {
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val qCol = F.typedlit(q.map(_.toDouble))
    val dot = F.aggregate(F.zip_with(asD(emb), qCol, (a, b) => a * b),
      F.lit(0.0), (acc, x) => acc + x)
    if (qNorm == 0.0) F.lit(-1.0)
    else F.when(hofNorm(emb) === 0.0, F.lit(-1.0))
      .otherwise(dot / (hofNorm(emb) * F.lit(qNorm)))
  }
  private def hofInt8CosineTo(emb: Column, q: Array[Float]): Column = {
    val qCodes = Ann.int8Codes(q)
    val qNorm = math.sqrt(qCodes.map(x => x * x).sum)
    val embD = asD(emb)
    val maxAbs = F.aggregate(embD, F.lit(0.0), (a, x) => F.greatest(a, F.abs(x)))
    val scale = maxAbs / F.lit(127.0)
    val codes = F.transform(embD, x => F.floor(x / scale + F.lit(0.5)).cast("double"))
    val qCol = F.typedlit(qCodes)
    val dot = F.aggregate(F.zip_with(codes, qCol, (a, b) => a * b),
      F.lit(0.0), (acc, x) => acc + x)
    val norm = F.sqrt(F.aggregate(F.transform(codes, a => a * a),
      F.lit(0.0), (acc, x) => acc + x))
    if (qNorm == 0.0) F.lit(-1.0)
    else F.when(maxAbs === 0.0, F.lit(-1.0)).otherwise(dot / (norm * F.lit(qNorm)))
  }

  private def assertBitEqual(df: org.apache.spark.sql.DataFrame): Unit =
    df.collect().foreach { r =>
      val (id, a, b) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      assert(java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b),
        s"row $id: kernel $a != HOF $b (bit patterns differ)")
    }

  test("vecNorm is bit-identical to the HOF sqrt-of-sum-of-squares chain") {
    import spark.implicits._
    val df = rows.toDF("id", "emb")
    assertBitEqual(df.select(F.col("id"),
      graft.plans.GraftFunctions.vecNorm(F.col("emb")),
      hofNorm(F.col("emb"))))
  }

  test("vecDot is bit-identical to the HOF zip_with/aggregate chain") {
    import spark.implicits._
    val df = rows.map { case (i, v) => (i, v, vec(i + 5000)) }.toDF("id", "a", "b")
    assertBitEqual(df.select(F.col("id"),
      graft.plans.GraftFunctions.vecDot(F.col("a"), F.col("b")),
      hofDot(F.col("a"), F.col("b"))))
  }

  test("cosineTo is bit-identical to the HOF form (zero-norm rows at -1.0)") {
    import spark.implicits._
    val df = rows.toDF("id", "emb")
    val q = vec(424242L)
    assertBitEqual(df.select(F.col("id"),
      Ann.cosineTo(F.col("emb"), q),
      hofCosineTo(F.col("emb"), q)))
    // zero query: both constants
    assertBitEqual(df.select(F.col("id"),
      Ann.cosineTo(F.col("emb"), Array.fill(dim)(0.0f)),
      hofCosineTo(F.col("emb"), Array.fill(dim)(0.0f))))
  }

  test("int8CosineTo is bit-identical to the HOF form (maxAbs==0 rows at -1.0)") {
    import spark.implicits._
    val df = rows.toDF("id", "emb")
    val q = vec(99L)
    assertBitEqual(df.select(F.col("id"),
      Ann.int8CosineTo(F.col("emb"), q),
      hofInt8CosineTo(F.col("emb"), q)))
  }

  test("vecDot/cosine kernels: ragged lengths yield null (zip_with-padding semantics)") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("id", "a", "b")
    val out = df.select(
      graft.plans.GraftFunctions.vecDot(F.col("a"), F.col("b")).as("d"),
      graft.plans.GraftFunctions.vecCosineToQ(F.col("a"), Seq(1.0, 2.0, 3.0), 1.0).as("c"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
