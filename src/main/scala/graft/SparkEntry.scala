package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._
import graft.quality.Rules

/** Driver contract — one query per implemented operator (SURVEY.md §2),
  * each with equivalent DuckDB oracle SQL where SQL-expressible.
  *
  * Design rules for oracle parity (learned the hard way; keep following
  * them):
  *  - alias every computed column identically in Spark and SQL
  *  - money aggregates: sum over decimal(18,2) casts (exact), never
  *    float sums
  *  - deterministic row sets only: every LIMIT has a total-order ORDER BY
  *  - hash buckets use md5-hex (same in both engines), not xxhash64
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: the quality_filter pipeline shape over the documents table
    * at sf0.001 — metrics, junk rules, PII scrub, fingerprint, token count.
    * One narrow stage: scan → project/filter → result (no shuffle).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = t(spark, dir, "documents")
    val text = col("text")
    val total = length(text).cast("double")
    val piiScrub = udf((s: String) => graft.text.Scrub.scrubPii(s))
    docs
      .withColumn("n_tokens", tokenCount(text))
      .withColumn("letter_ratio", when(total === 0, 0.0).otherwise(letterCount(text) / total))
      .withColumn("digit_ratio", when(total === 0, 0.0).otherwise(digitCount(text) / total))
      .withColumn("punct_ratio", when(total === 0, 0.0).otherwise(punctCount(text) / total))
      .withColumn("line_count", lineCount(text))
      .withColumn("keep", !Rules.isJunkCol(length(text), lineCount(text),
        col("letter_ratio"), col("punct_ratio"), col("digit_ratio")))
      .withColumn("quality", qualityScore(text))
      .withColumn("fingerprint", fingerprint(text))
      .withColumn("scrubbed", piiScrub(text))
  }

  // ----- shared column builders -----

  private def asciiLetterRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(letterCount(c) / length(c).cast("double"))
  private def asciiDigitRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(digitCount(c) / length(c).cast("double"))
  private def asciiPunctRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(punctCount(c) / length(c).cast("double"))

  /** documents with planted near-duplicates (deterministic): every doc with
    * doc_id % 7 == 0 gets a mutated copy (one word appended, id offset by
    * 1e6). Input for dedup operators so candidate pairs actually exist. */
  private def docsWithPlantedDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
    val dups = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" mutated")).as("text"), col("lang"))
    docs.unionByName(dups)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 group count — `features.py:86` value_counts
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"))),

    // TPC-H Q1 shape: multi-agg with exact decimal sums
    "q2_pricing_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"),
          count(lit(1)).as("n"))),

    // J1 joins (broadcast dims) + group agg
    "q3_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // O3 per-group head via window row_number
    "q4_window_head" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("user_id", "rn", "event_id", "event_type")
    }),

    // O1 sort + deterministic limit (total order incl. tiebreaks)
    "q5_topn" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(25)),

    // U1/U2 union + distinct
    "q6_union_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .unionByName(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()),

    // F1 isin membership filter
    "q7_filter_isin" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(col("lang").isin("en", "de", "fr"))
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))),

    // F4/F5 projection + rename + filter pushdown
    "q8_project_rename" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_size") > 20)
        .select(col("p_partkey").as("part_key"), upper(col("p_brand")).as("brand_u"),
          col("p_retailprice").cast("decimal(18,2)").as("price"))),

    // A11 distinct count
    "q9_countdistinct" -> ((s, dir) =>
      t(s, dir, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))),

    // A1 value_counts with order
    "q10_value_counts" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang").agg(count(lit(1)).as("n"))),

    // A10 deterministic hash split (md5 bucket -- oracle-checkable)
    "q11_det_split" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("is_val", md5Bucket(col("doc_id"), 100) < 20)
        .groupBy("lang", "is_val").agg(count(lit(1)).as("n"))),

    // exact dedup over a doubled table: keep min id per fingerprint
    "q12_dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000))
      graft.dedup.Dedup.exact(doubled, "text", "doc_id")
        .groupBy("lang").agg(count(lit(1)).as("n"))
    }),

    // token counting
    "q13_token_stats" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("source")
        .agg(sum(tokenCount(col("text"))).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"))),

    // F7 char-class metrics (ASCII, exact integer sums)
    "q14_charclass" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("source")
        .agg(sum(letterCount(col("text"))).as("letters"),
          sum(digitCount(col("text"))).as("digits"),
          sum(wsCount(col("text"))).as("ws"),
          sum(punctCount(col("text"))).as("punct"))),

    // F2 junk filter decisions
    "q15_junk_filter" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("keep", !Rules.isJunkCol(length(col("text")), lineCount(col("text")),
          asciiLetterRatio(col("text")), asciiPunctRatio(col("text")), asciiDigitRatio(col("text"))))
        .groupBy("lang", "keep").agg(count(lit(1)).as("n"))),

    // document fingerprinting
    "q16_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), fingerprint(col("text")).as("fp"))),

    // quality scoring (integer-exact component sum)
    "q17_quality" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("source")
        .agg(sum((qualityScore(col("text")) * 4).cast("long")).as("ok_components"),
          count(lit(1)).as("n"))),

    // ANN brute-force cosine top-k to a fixed stored query vector
    "q18_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      graft.sim.Ann.bruteForceTopK(emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", q, 10)
        .select(col("vec_id"), round(col("cosine"), 6).as("cos6"))
    }),

    // MinHash LSH near-dup pairs on planted dups (no SQL oracle)
    "q19_minhash_dups" -> ((s, dir) =>
      graft.dedup.Dedup.minhashDupPairs(docsWithPlantedDups(s, dir), "text", "doc_id",
          w = 3, k = 32, bands = 8, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("j6"))),

    // SimHash near-dup pairs on planted dups (no SQL oracle)
    "q20_simhash_dups" -> ((s, dir) =>
      graft.dedup.Dedup.simhashDupPairs(docsWithPlantedDups(s, dir), "text", "doc_id",
        maxHamming = 6)),

    // LSH ANN (no SQL oracle; recall vs brute-force is asserted in tests)
    "q21_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      graft.sim.Ann.lshTopK(emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", q,
        k = 10, nBits = 8, seed = 42L, probeHamming = 2)
        .select(col("vec_id"), round(col("cosine"), 6).as("cos6"))
    }),

    // A9 deterministic stratified sample (md5 bucket)
    "q22_det_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(md5Bucket(col("doc_id"), 100) < 30)
        .groupBy("lang").agg(count(lit(1)).as("n"))),
  )

  def oracleSql: Map[String, String] = {
    // non-negative 32-bit value, so plain % is safe (DuckDB has no pmod)
    val md5bucket =
      "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100)"
    val letterCountSql = "(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))"
    val digitCountSql = "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))"
    val wsCountSql = "(length(text) - length(regexp_replace(text, '[\\s]', '', 'g')))"
    val punctCountSql = s"(length(text) - $letterCountSql - $digitCountSql - $wsCountSql)"
    val lineCountSql = "len(string_split(text, chr(10)))"
    val fpSql = "md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val tokSql = "(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)"
    val junkSql =
      s"""(length(text) < 75 OR length(text) > 50000 OR $lineCountSql > 100
         | OR (CASE WHEN length(text)=0 THEN 0.0 ELSE $letterCountSql / CAST(length(text) AS DOUBLE) END) < 0.01
         | OR (CASE WHEN length(text)=0 THEN 0.0 ELSE $letterCountSql / CAST(length(text) AS DOUBLE) END) > 0.9
         | OR (CASE WHEN length(text)=0 THEN 0.0 ELSE $punctCountSql / CAST(length(text) AS DOUBLE) END) < 0.01
         | OR (CASE WHEN length(text)=0 THEN 0.0 ELSE $punctCountSql / CAST(length(text) AS DOUBLE) END) > 0.4
         | OR (CASE WHEN length(text)=0 THEN 0.0 ELSE $digitCountSql / CAST(length(text) AS DOUBLE) END) > 0.5)""".stripMargin
    Map(
      "q1_agg" ->
        "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1",
      "q2_pricing_agg" ->
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
          | sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price, count(*) AS n
          |FROM lineitem GROUP BY 1, 2""".stripMargin,
      "q3_join_agg" ->
        """SELECT r_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue, count(*) AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1""".stripMargin,
      "q4_window_head" ->
        """SELECT user_id, rn, event_id, event_type FROM (
          | SELECT user_id, event_id, event_type,
          |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          | FROM events) WHERE rn <= 2""".stripMargin,
      "q5_topn" ->
        """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
          |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin,
      "q6_union_distinct" ->
        """SELECT c_nationkey AS nationkey FROM customer
          |UNION SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
      "q7_filter_isin" ->
        """SELECT lang, source, count(*) AS n FROM documents
          |WHERE lang IN ('en','de','fr') GROUP BY 1, 2""".stripMargin,
      "q8_project_rename" ->
        """SELECT p_partkey AS part_key, upper(p_brand) AS brand_u,
          | CAST(p_retailprice AS DECIMAL(18,2)) AS price
          |FROM part WHERE p_size > 20""".stripMargin,
      "q9_countdistinct" ->
        """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
          |FROM events GROUP BY 1""".stripMargin,
      "q10_value_counts" ->
        "SELECT lang, count(*) AS n FROM documents GROUP BY 1",
      "q11_det_split" ->
        s"""SELECT lang, $md5bucket < 20 AS is_val, count(*) AS n
           |FROM documents GROUP BY 1, 2""".stripMargin,
      "q12_dedup_exact" ->
        s"SELECT lang, count(DISTINCT $fpSql) AS n FROM documents GROUP BY 1",
      "q13_token_stats" ->
        s"""SELECT source, sum($tokSql) AS n_tokens, sum(n_chars) AS n_chars
           |FROM documents GROUP BY 1""".stripMargin,
      "q14_charclass" ->
        s"""SELECT source, sum($letterCountSql) AS letters, sum($digitCountSql) AS digits,
           | sum($wsCountSql) AS ws, sum($punctCountSql) AS punct
           |FROM documents GROUP BY 1""".stripMargin,
      "q15_junk_filter" ->
        s"SELECT lang, NOT $junkSql AS keep, count(*) AS n FROM documents GROUP BY 1, 2",
      "q16_fingerprint" ->
        s"SELECT doc_id, $fpSql AS fp FROM documents",
      "q17_quality" ->
        s"""SELECT source, sum(
           |  CAST((CASE WHEN length(text) BETWEEN 75 AND 50000 THEN 1.0 ELSE 0.0 END
           |   + CASE WHEN (CASE WHEN length(text)=0 THEN 0.0 ELSE $letterCountSql / CAST(length(text) AS DOUBLE) END) BETWEEN 0.01 AND 0.9 THEN 1.0 ELSE 0.0 END
           |   + CASE WHEN (CASE WHEN length(text)=0 THEN 0.0 ELSE $punctCountSql / CAST(length(text) AS DOUBLE) END) <= 0.4 THEN 1.0 ELSE 0.0 END
           |   + CASE WHEN (CASE WHEN length(text)=0 THEN 0.0 ELSE $digitCountSql / CAST(length(text) AS DOUBLE) END) <= 0.5 THEN 1.0 ELSE 0.0 END) AS BIGINT)
           | ) AS ok_components, count(*) AS n
           |FROM documents GROUP BY 1""".stripMargin,
      "q18_ann_brute" ->
        """SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
          |  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cos6
          |FROM embeddings WHERE vec_id <> 0
          |ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
          |  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC, vec_id
          |LIMIT 10""".stripMargin,
      "q22_det_sample" ->
        s"""SELECT lang, count(*) AS n FROM documents
           |WHERE $md5bucket < 30 GROUP BY 1""".stripMargin,
    )
  }
}
