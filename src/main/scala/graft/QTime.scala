package graft

/** Dev tool: warm + time individual driver-contract queries.
  * usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.QTime <sfDir> <q> [<q>...]"
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-qtime")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, dir).count() // warm (JIT, page cache)
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(f"QTIME $n: ${(System.nanoTime() - t0) / 1e9}%.2f s, $c rows")
    }
    spark.stop()
  }
}
