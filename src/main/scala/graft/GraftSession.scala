package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory with the scale knobs the north rule calls
  * out (explicit shuffle partitions, AQE + skew handling, broadcast
  * threshold, custom function extensions). On a real cluster the same
  * settings go through spark-submit --conf; this is the single place the
  * engine documents them.
  */
object GraftSession {

  def builder(cores: Int, appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      // shuffle partitions tied to parallelism, not the 200 default
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      // AQE: runtime coalescing + skew-join splitting
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      // dims up to 64 MB broadcast (region/nation/customer-sized)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // splittable input sizing for the wide narrow stages
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle/spill on tmpfs when available: local-mode shuffle is
      // page-cache-sized here, and routing it through the (shared,
      // contended) block device makes shuffle stages hostage to noisy
      // neighbors. On a real cluster this maps to fast local NVMe via
      // spark.local.dir in spark-submit conf.
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = builder(cores, appName).master(s"local[$cores]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
