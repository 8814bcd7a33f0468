package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

import graft.SparkTestSession

/** Bucketed co-located join: same results as a plain join, with ZERO
  * shuffle exchanges in the physical plan — the property that makes
  * repeated fact-fact joins affordable at 100 TB. */
class BucketedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def mkData() = {
    import spark.implicits._
    val left = (0 until 5000).map(i => (i.toLong % 97, i.toLong, s"l$i"))
      .toDF("k", "lid", "lval")
    val right = (0 until 8000).map(i => (i.toLong % 97, i.toLong, s"r$i"))
      .toDF("k", "rid", "rval")
    (left, right)
  }

  test("co-located join: no ShuffleExchange, SortMergeJoin over bucketed scans") {
    val (left, right) = mkData()
    Bucketed.writeBucketed(left, "bspec_left", "k", nBuckets = 8)
    Bucketed.writeBucketed(right, "bspec_right", "k", nBuckets = 8)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketed.coLocatedJoin(spark, "bspec_left", "bspec_right", "k")
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case s: SortMergeJoinExec => s }.nonEmpty,
        s"expected a SortMergeJoin:\n${plan.treeString}")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed co-located join must not shuffle:\n${plan.treeString}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("cached write: warm fingerprint skips the rewrite, keeps the zero-exchange plan") {
    val (left, right) = mkData()
    Bucketed.writeBucketedCached(left, "bspec_cl", "k", nBuckets = 8, fingerprint = "fpA")
    Bucketed.writeBucketedCached(right, "bspec_cr", "k", nBuckets = 8, fingerprint = "fpA")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "bspec_cl")
    def dataFilesMtime(): Map[String, Long] =
      loc.listFiles().filterNot(_.getName.startsWith("_"))
        .map(f => f.getName -> f.lastModified()).toMap
    val before = dataFilesMtime()
    assert(before.nonEmpty)
    // warm hit: same fingerprint — files untouched
    Bucketed.writeBucketedCached(left, "bspec_cl", "k", nBuckets = 8, fingerprint = "fpA")
    assert(dataFilesMtime() == before, "warm hit must not rewrite data files")
    // fresh-catalog path: drop the registration (as a new JVM would) and
    // re-register over the existing files — still bucketed, still no shuffle
    spark.sql("DROP TABLE bspec_cl")
    Bucketed.writeBucketedCached(left, "bspec_cl", "k", nBuckets = 8, fingerprint = "fpA")
    assert(dataFilesMtime() == before, "re-registration must not rewrite data files")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketed.coLocatedJoin(spark, "bspec_cl", "bspec_cr", "k")
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"re-registered external bucketed table must keep the shuffle-free join:\n${plan.treeString}")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // changed fingerprint: rebuild happens
    Bucketed.writeBucketedCached(left.limit(100), "bspec_cl", "k", nBuckets = 8,
      fingerprint = "fpB")
    assert(spark.table("bspec_cl").count() == 100,
      "a new fingerprint must rebuild the table")
  }

  test("co-located join result equals the plain shuffled join") {
    val (left, right) = mkData()
    Bucketed.writeBucketed(left, "bspec_left2", "k", nBuckets = 8)
    Bucketed.writeBucketed(right, "bspec_right2", "k", nBuckets = 8)
    val coloc = Bucketed.coLocatedJoin(spark, "bspec_left2", "bspec_right2", "k")
      .groupBy("k").agg(F.count(F.lit(1)).as("n"), F.sum("lid").as("s"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val plain = left.join(right, "k")
      .groupBy("k").agg(F.count(F.lit(1)).as("n"), F.sum("lid").as("s"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(coloc == plain)
  }
}
