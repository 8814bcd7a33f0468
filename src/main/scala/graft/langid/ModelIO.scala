package graft.langid

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Compact binary persistence for the broadcastable models (the n-gram
  * table is ~1.6 MB of float32 — JSON would triple it). Hadoop FS API so
  * the same artifacts live next to the data on HDFS/object stores.
  * Format: magic, version, params, UTF strings, raw float/double arrays.
  */
object ModelIO {

  private val NGramMagic = 0x4752414e // "GRAN"
  private val CharLMMagic = 0x4752414c // "GRAL"

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def saveNGram(spark: SparkSession, m: NGramModel, path: String): Unit = {
    val out = new DataOutputStream(fs(spark, path).create(new Path(path), true))
    try {
      out.writeInt(NGramMagic); out.writeInt(1)
      out.writeInt(m.classes.length)
      m.classes.foreach(out.writeUTF)
      out.writeInt(m.numBuckets); out.writeInt(m.nMin); out.writeInt(m.nMax)
      m.logPrior.foreach(out.writeDouble)
      out.writeInt(m.logProbT.length)
      m.logProbT.foreach(out.writeFloat)
    } finally out.close()
  }

  def loadNGram(spark: SparkSession, path: String): NGramModel = {
    val in = new DataInputStream(fs(spark, path).open(new Path(path)))
    try {
      require(in.readInt() == NGramMagic && in.readInt() == 1, s"bad ngram model file: $path")
      val nc = in.readInt()
      val classes = Array.fill(nc)(in.readUTF())
      val numBuckets = in.readInt(); val nMin = in.readInt(); val nMax = in.readInt()
      val prior = Array.fill(nc)(in.readDouble())
      val n = in.readInt()
      val lp = new Array[Float](n)
      var i = 0
      while (i < n) { lp(i) = in.readFloat(); i += 1 }
      NGramModel(classes, numBuckets, nMin, nMax, prior, lp)
    } finally in.close()
  }

  def saveCharLM(spark: SparkSession, m: CharLMModel, path: String): Unit = {
    val out = new DataOutputStream(fs(spark, path).create(new Path(path), true))
    try {
      out.writeInt(CharLMMagic); out.writeInt(1)
      out.writeInt(m.classes.length)
      m.classes.foreach(out.writeUTF)
      out.writeInt(m.v)
      m.logProb.foreach { arr => arr.foreach(out.writeFloat) }
    } finally out.close()
  }

  def loadCharLM(spark: SparkSession, path: String): CharLMModel = {
    val in = new DataInputStream(fs(spark, path).open(new Path(path)))
    try {
      require(in.readInt() == CharLMMagic && in.readInt() == 1, s"bad charlm model file: $path")
      val nc = in.readInt()
      val classes = Array.fill(nc)(in.readUTF())
      val v = in.readInt()
      val lp = Array.fill(nc) {
        val arr = new Array[Float](v * v)
        var i = 0
        while (i < arr.length) { arr(i) = in.readFloat(); i += 1 }
        arr
      }
      CharLMModel(classes, v, lp)
    } finally in.close()
  }

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))
}
