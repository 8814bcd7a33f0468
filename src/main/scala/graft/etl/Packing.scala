package graft.etl

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Sequence packing — the "concat-and-chunk" step that turns a filtered
  * corpus into fixed token-budget training chunks: documents are laid out
  * in a stable order and a new chunk starts each time the running token
  * total crosses a budget multiple (a document's chunk is where its FIRST
  * token lands, so over-budget documents own their span rather than
  * erroring).
  *
  * Scale shape: ONE window shuffle keyed by the shard column (source /
  * date / path-prefix) — never a global order, which would serialize
  * 10^12 rows through a single partition. Shards pack independently and
  * deterministically, so the layout is reproducible run-to-run and
  * resumable per shard; chunk identity is (shard, chunk_id).
  */
object Packing {

  /** Adds `chunk_id`: 0-based chunk index within `shardCol`, packing in
    * ascending `orderCol` (must be unique per shard for determinism). */
  def packSequential(df: DataFrame, tokens: Column, shardCol: String,
                     orderCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
    df.withColumn("__tok", tokens.cast("long"))
      .withColumn("__start", F.sum(F.col("__tok")).over(w) - F.col("__tok"))
      .withColumn("chunk_id", F.floor(F.col("__start") / F.lit(budget).cast("double")))
      .drop("__tok", "__start")
  }

  /** SLIDING-window chunker with overlap — the per-document layout a
    * RAG index or long-context pretraining run uses (`packSequential`
    * concatenates ACROSS documents; this cuts WITHIN one): whitespace
    * tokens, chunk k covers tokens [k*stride, k*stride + width), and the
    * last chunk is the FIRST window that reaches the document's tail —
    * every token lands in at least one chunk (stride <= width) and no
    * degenerate sub-stride tail chunk is emitted. Documents at or under
    * `width` tokens yield exactly one whole-document chunk; zero-token
    * documents yield none.
    *
    * Output: `idCol`, `chunk_idx`, `chunk_tokens`, `chunk_text` (the
    * window's tokens joined by single spaces — the corpus-wide canonical
    * text convention).
    *
    * Scale shape: the chunk windows are built IN-ROW (one transform over
    * a sequence of starts, slicing the token array) and posexploded — a
    * narrow stage, no shuffle, no window function; integer arithmetic
    * only, so the layout is SQL-reproducible bit-for-bit (q91). */
  def chunkSliding(docs: DataFrame, textCol: String, idCol: String,
                   width: Int, stride: Int): DataFrame = {
    require(width > 0, s"chunk width must be positive: $width")
    require(stride > 0 && stride <= width,
      s"stride must be in [1, width]: stride=$stride width=$width")
    val ws = F.filter(F.split(F.col(textCol), "\\s+"), x => x =!= "")
    val nChunks = F.when(F.col("__n") === 0, 0)
      .when(F.col("__n") <= width, 1)
      .otherwise(F.ceil((F.col("__n") - width).cast("double") / stride).cast("int") + 1)
    docs.select(F.col(idCol), ws.as("__ws"))
      .withColumn("__n", F.size(F.col("__ws")))
      .filter(F.col("__n") > 0) // before __chunks: sequence(0, -1) descends
      .withColumn("__chunks",
        F.transform(F.sequence(F.lit(0), nChunks - 1),
          k => F.slice(F.col("__ws"), k * stride + 1, F.lit(width))))
      .select(F.col(idCol), F.posexplode(F.col("__chunks")).as(Seq("chunk_idx", "__c")))
      .select(F.col(idCol), F.col("chunk_idx"),
        F.size(F.col("__c")).cast("long").as("chunk_tokens"),
        F.array_join(F.col("__c"), " ").as("chunk_text"))
  }
}
