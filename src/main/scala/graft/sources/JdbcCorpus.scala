package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3: relational-source scan of the reference's corpus schema
  * (`/root/reference/data/schema.sql:6-20`):
  *
  *   samples(content, language, extension, length_chars,
  *           annotations_json, linguist, path PK)
  *   languages(name, linguist_primary, rosetta_code_primary)
  *
  * The reference reads SQLite with an alias projection
  * (`data/utils.py:10-19`: SELECT snippet AS Snippet, language AS
  * Language). Here the same shape goes through spark.read.jdbc — on a
  * cluster this is any JDBC warehouse; tests use embedded Derby.
  *
  * Scale note: `partitionColumn`/`numPartitions` split the read into
  * parallel range scans so a big corpus table doesn't funnel through one
  * task.
  */
object JdbcCorpus {

  /** samples → canonical (FileId, Language, Snippet) frame. */
  def loadSamples(spark: SparkSession, url: String,
                  partitions: Int = 0, props: java.util.Properties = new java.util.Properties()): DataFrame = {
    val raw =
      if (partitions > 0)
        spark.read.jdbc(url, "samples", "length_chars", 0L, 1000000L, partitions, props)
      else spark.read.jdbc(url, "samples", props)
    raw.selectExpr("path AS FileId", "language AS Language", "content AS Snippet")
  }

  def loadLanguages(spark: SparkSession, url: String): DataFrame =
    spark.read.jdbc(url, "languages", new java.util.Properties())
}
