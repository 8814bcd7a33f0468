package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.{Splitter, TokenMatcher}

/** Native Catalyst expression for X1 multi-token containment: ONE pass
  * over the string sets all presence bits (vs ~700 Contains expressions,
  * which would blow codegen size and rescan the string per token —
  * SURVEY.md §4.2). The Aho–Corasick automaton is built once per
  * expression instance and shipped as a codegen reference object, so
  * generated code stays tiny and the expression composes with
  * whole-stage codegen.
  */
case class MultiContains(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  @transient private lazy val matcher = TokenMatcher(tokens.toArray)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"multi_contains requires a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(BooleanType, containsNull = false)
  override def prettyName: String = "multi_contains"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(matcher.matchBits(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matcherRef = ctx.addReferenceObj("matcher", matcher, classOf[TokenMatcher].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $matcherRef.matchBits($c.toString()));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContains =
    copy(child = newChild)
}

/** Gopher top-n-gram char fraction as a native codegen'd expression:
  * the per-row hash-count kernel (O(words), `Repetition.topNgramCharFrac`)
  * is not expressible with built-in higher-order functions in better
  * than O(words²), so a custom UnaryExpression carries it — generated
  * code is one static call, keeping the whole stage inside
  * WholeStageCodegen (a Scala UDF would box and break the stage). */
case class TopNgramCharFrac(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_ngram_char_frac requires a string column, got ${child.dataType}")
    else if (n < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_ngram_char_frac requires n >= 1, got $n")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_ngram_char_frac"

  override def nullSafeEval(input: Any): Any =
    graft.quality.Repetition.topNgramCharFrac(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.quality.Repetition.topNgramCharFrac($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): TopNgramCharFrac =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native codegen'd expression — Spark
  * ships no normalizer builtin, and canonical-equivalent byte variants
  * (decomposed accents, composed ligature forms) silently defeat
  * fingerprint dedup, gram matching, and token counting. Generated code
  * is one static call with an `isNormalized` fast path that returns the
  * (dominant) already-NFC row untouched; stays inside WholeStageCodegen
  * where a Scala UDF would box and break the stage. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string column, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    graft.text.Normalize.nfcUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Normalize.nfcUtf8($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** G1 as a SQL-facing Generator: split_snippets(text, limit) explodes a
  * file into chunks of >= limit non-empty lines (tail merged), semantics
  * of `create_stack_snippets.py:120-141`. Generators don't participate in
  * whole-stage codegen, so CodegenFallback costs nothing here.
  */
case class SplitSnippets(child: Expression, limit: Expression)
    extends BinaryExpression with CollectionGenerator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = child
  override def right: Expression = limit
  override def position: Boolean = false
  override def inline: Boolean = false

  override def elementSchema: StructType =
    StructType(StructField("chunk", StringType, nullable = false) :: Nil)

  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    val lim = limit.eval(input)
    if (text == null || lim == null) Iterator.empty
    else Splitter
      .splitSnippet(text.asInstanceOf[UTF8String].toString, lim.asInstanceOf[Int])
      .iterator.map(c => InternalRow(UTF8String.fromString(c)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SplitSnippets =
    copy(child = newLeft, limit = newRight)
}
