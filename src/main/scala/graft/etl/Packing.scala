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
}
