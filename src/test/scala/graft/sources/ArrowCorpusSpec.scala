package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{functions => F, Row}
import org.apache.spark.sql.types._

import graft.SparkTestSession

/** S4 Arrow IPC source/sink: distributed write (one file per partition),
  * distributed read, full type closure of the testdata tables, and
  * parquet-twin agreement. */
class ArrowCorpusSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"arrow_$tag").toString

  test("roundtrip: documents-shaped table (long/string columns), multi-partition") {
    import spark.implicits._
    val df = (0 until 200).map(i =>
      (i.toLong, s"text body $i with words", s"lang${i % 5}", i.toLong * 3))
      .toDF("doc_id", "text", "lang", "n_chars").repartition(4)
    val dir = tmpDir("docs")
    ArrowCorpus.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(files.length > 1, "distributed write must emit one file per non-empty partition")
    val back = ArrowCorpus.read(spark, dir)
    assert(back.schema == df.schema)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("roundtrip: full type closure incl. timestamp-NTZ, binary, bool, array<float>, nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("s", StringType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampNTZType),
      StructField("emb", ArrayType(FloatType, containsNull = true))))
    val rows = (0 until 50).map { i =>
      Row(i.toLong,
        if (i % 7 == 0) null else i,
        i * 1.5,
        i * 0.25f,
        if (i % 5 == 0) null else s"val-$i é中",
        i % 2 == 0,
        Array[Byte]((i % 127).toByte, 0, -1),
        java.time.LocalDateTime.of(2024, 1, 1 + (i % 28), i % 24, 0, i % 60),
        (0 until 4).map(j =>
          if (i % 11 == 0 && j == 2) null // null ELEMENT inside the array
          else java.lang.Float.valueOf((i + j) * 0.5f)))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), schema).repartition(3)
    val dir = tmpDir("types")
    ArrowCorpus.write(df, dir)
    val back = ArrowCorpus.read(spark, dir)
    assert(back.schema == schema)
    def key(r: Row) = r.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case o => o
    }
    assert(back.collect().map(key).toSet == df.collect().map(key).toSet)
  }

  test("arrow scan agrees with its parquet twin on an aggregate") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, s"t$i", s"lang${i % 3}", (i * 7L) % 100))
      .toDF("doc_id", "text", "lang", "n_chars").repartition(4)
    val pq = tmpDir("twinpq"); val ar = tmpDir("twinar")
    df.write.mode("overwrite").parquet(pq)
    ArrowCorpus.write(df, ar)
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("lang").agg(F.count(F.lit(1)).as("n"), F.sum("n_chars").as("sum_chars"))
        .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(agg(ArrowCorpus.read(spark, ar)) == agg(spark.read.parquet(pq)))
  }

  test("multi-batch write (rows > batch size) roundtrips, incl. list columns") {
    import spark.implicits._
    // 10k rows in 1 partition -> 3 record batches of 4096; exercises
    // vector reset + list-writer state across writeBatch() calls
    val df = (0 until 10000).map(i =>
      (i.toLong, s"t$i", Seq(i * 0.5f, i * 0.25f)))
      .toDF("id", "s", "emb").coalesce(1)
    val dir = tmpDir("multibatch")
    ArrowCorpus.write(df, dir)
    val back = ArrowCorpus.read(spark, dir).collect()
    assert(back.length == 10000)
    val byId = back.map(r => r.getLong(0) -> r).toMap
    Seq(0, 4095, 4096, 9999).foreach { i =>
      val r = byId(i.toLong)
      assert(r.getString(1) == s"t$i")
      assert(r.getSeq[Float](2) == Seq(i * 0.5f, i * 0.25f),
        s"list mismatch at row $i: ${r.getSeq[Float](2)}")
    }
  }

  test("unsupported column types fail loudly at schema mapping, not at extraction") {
    import spark.implicits._
    val df = Seq((1L, BigDecimal("1.50"))).toDF("id", "price") // DecimalType unsupported
    val e = intercept[IllegalArgumentException] {
      ArrowCorpus.write(df, tmpDir("bad"))
    }
    assert(e.getMessage.contains("unsupported Spark type"))
    assert(e.getMessage.contains("price"))
  }

}
