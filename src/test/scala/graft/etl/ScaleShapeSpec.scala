package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession
import graft.pipeline.Transcripts

/** Scale-shape evidence: bucketed co-located joins (no shuffle) and
  * salted repartitioning actually balancing hot-conversation skew. */
class ScaleShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val left = (1L to 2000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 2000L).map(i => (i, i * 2)).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucket_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucket_right")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so bucketing (not broadcast) avoids the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_left")
        .join(spark.table("graft_bucket_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == 2000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_right")
    }
  }

  test("salted repartition balances hot-conversation skew across tasks") {
    import spark.implicits._
    // heavy skew: hotFactor 200 => the hot conv dwarfs the others
    val turns = Transcripts.generate(spark, nConvs = 100, seed = 3L, hotFactor = 200)
    def maxPartitionFraction(df: org.apache.spark.sql.Dataset[graft.pipeline.Turn]): Double = {
      val sizes = df.mapPartitions(it => Iterator.single(it.size)).collect()
      sizes.max.toDouble / sizes.sum
    }
    val byConv = turns.repartition(8, F.col("conv_id"))
    val salted = turns.repartition(8,
      F.xxhash64(F.col("conv_id"), F.col("turn_idx")))
    val skewed = maxPartitionFraction(byConv)
    val balanced = maxPartitionFraction(salted)
    // the hot conversation concentrates >40% of rows in one task when
    // partitioned by conv_id; salting spreads it to ~1/8 each
    assert(skewed > 0.4, s"fixture not skewed enough: $skewed")
    assert(balanced < 0.25, s"salted partitioning still skewed: $balanced")
  }
}
