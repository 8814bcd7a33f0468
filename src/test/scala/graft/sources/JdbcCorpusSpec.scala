package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** S3 source path: the reference's SQLite corpus schema served over JDBC
  * (embedded Derby stands in for the warehouse). */
class JdbcCorpusSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val url: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    val u = s"jdbc:derby:$dir/corpus;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE samples (
      path VARCHAR(255) PRIMARY KEY, content CLOB, language VARCHAR(64),
      extension VARCHAR(16), length_chars INT, annotations_json CLOB,
      linguist VARCHAR(64))""")
    st.execute("""CREATE TABLE languages (
      name VARCHAR(64) PRIMARY KEY, linguist_primary VARCHAR(64),
      rosetta_code_primary VARCHAR(64))""")
    val ins = conn.prepareStatement(
      "INSERT INTO samples VALUES (?, ?, ?, ?, ?, ?, ?)")
    Seq(
      ("a.py", "def f():\n    return 1", "Python"),
      ("b.go", "package main\nfunc g() {}", "Go"),
      ("c.php", "<?php echo $x;", "PHP"),
    ).foreach { case (p, c, l) =>
      ins.setString(1, p); ins.setString(2, c); ins.setString(3, l)
      ins.setString(4, p.split('.').last); ins.setInt(5, c.length)
      ins.setString(6, "{}"); ins.setString(7, l)
      ins.executeUpdate()
    }
    st.execute("INSERT INTO languages VALUES ('Python', 'Python', 'Python')")
    conn.close()
    u
  }

  test("jdbc scan with canonical alias projection (data/utils.py shape)") {
    val df = JdbcCorpus.loadSamples(spark, url)
    assert(df.columns.toSeq == Seq("FileId", "Language", "Snippet"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("a.py", "Python"), ("b.go", "Go"), ("c.php", "PHP")))
    assert(JdbcCorpus.loadLanguages(spark, url).count() == 1)
  }

  test("partitioned jdbc read returns the same rows") {
    val df = JdbcCorpus.loadSamples(spark, url, partitions = 3)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 3)
  }

  test("jdbc corpus feeds the snippet scorer end-to-end") {
    val scorer = spark.sparkContext.broadcast(
      new graft.score.Scorer(graft.model.DefaultModels.tiny))
    val predUdf = org.apache.spark.sql.functions.udf(
      (s: String) => scorer.value.predictLabel(s))
    val preds = JdbcCorpus.loadSamples(spark, url)
      .withColumn("pred", predUdf(org.apache.spark.sql.functions.col("Snippet")))
      .collect().map(r => r.getString(1) -> r.getString(3)).toMap
    assert(preds("Python") == "Python")
    assert(preds("Go") == "Go")
    assert(preds("PHP") == "PHP")
  }
}
