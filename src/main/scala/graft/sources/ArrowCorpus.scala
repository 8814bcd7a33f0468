package graft.sources

import java.nio.channels.Channels
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.complex.impl.UnionListWriter
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC file source/sink (S4): read and write `.arrow` files — the
  * format the reference's JS predictor consumes directly (its test driver
  * loads a `.arrow` table and iterates record batches; see the reference's
  * js test entry reading the `.arrow` files under data/). Round 2 covered
  * "columnar scan"
  * only by parquet-vectorized equivalence; this is the literal format.
  *
  * Spark-first shape:
  *  - WRITE is distributed: one IPC file per partition, written by the
  *    task that owns the partition (no driver collect, no single-writer
  *    bottleneck — the same layout parquet output uses).
  *  - READ is distributed: file paths are the work units; each task
  *    streams its file's record batches through zero-copy Arrow vectors.
  *    An IPC *file* is not byte-range splittable like parquet row groups,
  *    so parallelism = number of files — which the distributed writer
  *    naturally makes ~one per upstream partition. (For 100 TB corpora:
  *    many files of a few hundred MB, exactly how Arrow datasets ship.)
  *
  * Supported column types (the testdata closure + binary for multimodal):
  * long, int, double, float, string, boolean, binary, timestamp-micro
  * (NTZ), and array<float> (embeddings). Anything else fails loudly at
  * schema mapping, not silently at value extraction.
  */
object ArrowCorpus {

  // ---- schema mapping ----

  private[sources] def toArrowField(f: StructField): Field = {
    def prim(t: ArrowType) =
      new Field(f.name, new FieldType(f.nullable, t, null), null)
    f.dataType match {
      case LongType    => prim(new ArrowType.Int(64, true))
      case IntegerType => prim(new ArrowType.Int(32, true))
      case DoubleType  => prim(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
      case FloatType   => prim(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
      case StringType  => prim(new ArrowType.Utf8())
      case BooleanType => prim(new ArrowType.Bool())
      case BinaryType  => prim(new ArrowType.Binary())
      case TimestampNTZType => prim(new ArrowType.Timestamp(TimeUnit.MICROSECOND, null))
      case ArrayType(FloatType, _) =>
        new Field(f.name, new FieldType(f.nullable, new ArrowType.List(), null),
          List(new Field("element",
            new FieldType(true, new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE), null),
            null)).asJava)
      case other => throw new IllegalArgumentException(
        s"ArrowCorpus: unsupported Spark type $other for column ${f.name}")
    }
  }

  private[sources] def toSparkField(f: Field): StructField = {
    val dt = f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Utf8   => StringType
      case _: ArrowType.Bool   => BooleanType
      case _: ArrowType.Binary => BinaryType
      case t: ArrowType.Timestamp if t.getUnit == TimeUnit.MICROSECOND && t.getTimezone == null =>
        TimestampNTZType
      case _: ArrowType.List =>
        val el = toSparkField(f.getChildren.get(0))
        ArrayType(el.dataType, el.nullable)
      case other => throw new IllegalArgumentException(
        s"ArrowCorpus: unsupported Arrow type $other for column ${f.getName}")
    }
    StructField(f.getName, dt, f.isNullable)
  }

  // ---- distributed write ----

  /** Write `df` as one Arrow IPC file per partition under `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val schema = df.schema
    val arrowSchema = new ArrowSchema(schema.fields.map(toArrowField).toList.asJava)
    val schemaJson = arrowSchema.toJson // pojo Schema is not serializable; ship JSON
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val pid = TaskContext.getPartitionId()
        val alloc = new RootAllocator()
        val root = VectorSchemaRoot.create(ArrowSchema.fromJSON(schemaJson), alloc)
        val ch = Files.newByteChannel(Paths.get(dir, f"part-$pid%05d.arrow"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
          java.nio.file.StandardOpenOption.WRITE)
        val writer = new ArrowFileWriter(root, null, ch)
        try {
          writer.start()
          val batchSize = 4096
          val buf = rows.grouped(batchSize)
          while (buf.hasNext) {
            val batch = buf.next()
            root.allocateNew()
            var r = 0
            batch.foreach { row =>
              var c = 0
              while (c < schema.length) {
                writeCell(root.getVector(c), r, row, c, schema(c).dataType)
                c += 1
              }
              r += 1
            }
            root.setRowCount(r)
            writer.writeBatch()
          }
          writer.end()
        } finally {
          writer.close(); root.close(); alloc.close()
        }
      }
    }
  }

  private def writeCell(v: FieldVector, r: Int, row: Row, c: Int, dt: DataType): Unit = {
    if (row.isNullAt(c)) { v.setNull(r); return }
    (v, dt) match {
      case (x: BigIntVector, _)  => x.setSafe(r, row.getLong(c))
      case (x: IntVector, _)     => x.setSafe(r, row.getInt(c))
      case (x: Float8Vector, _)  => x.setSafe(r, row.getDouble(c))
      case (x: Float4Vector, _)  => x.setSafe(r, row.getFloat(c))
      case (x: VarCharVector, _) =>
        x.setSafe(r, row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (x: BitVector, _)       => x.setSafe(r, if (row.getBoolean(c)) 1 else 0)
      case (x: VarBinaryVector, _) => x.setSafe(r, row.getAs[Array[Byte]](c))
      case (x: TimeStampMicroVector, _) =>
        val ldt = row.getAs[java.time.LocalDateTime](c)
        x.setSafe(r, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
      case (x: ListVector, ArrayType(FloatType, _)) =>
        val w: UnionListWriter = x.getWriter
        w.setPosition(r)
        w.startList()
        val fw = w.float4()
        // elements come boxed (containsNull=true in the schema mapping);
        // a null element must become an Arrow null, not an unboxing NPE
        row.getAs[scala.collection.Seq[java.lang.Float]](c).foreach { v =>
          if (v == null) fw.writeNull() else fw.writeFloat4(v.floatValue())
        }
        w.endList()
      case (other, t) => throw new IllegalArgumentException(
        s"ArrowCorpus.write: unsupported vector ${other.getClass.getSimpleName} for $t")
    }
  }

  // ---- distributed read ----

  /** Read a directory of `.arrow` IPC files (or a single file) as a
    * DataFrame. Schema comes from the first file's IPC header (footer
    * read driver-side — a few KB, not the data). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = Paths.get(path)
    val files: Seq[String] =
      if (Files.isDirectory(p)) {
        val stream = Files.list(p) // close it: the stream holds an open fd
        try stream.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".arrow")).toSeq.sorted
        finally stream.close()
      } else Seq(path)
    require(files.nonEmpty, s"no .arrow files under $path")
    val schema = {
      val alloc = new RootAllocator()
      val ch = Files.newByteChannel(Paths.get(files.head))
      val rd = new ArrowFileReader(ch, alloc)
      try StructType(rd.getVectorSchemaRoot.getSchema.getFields.asScala.map(toSparkField).toArray)
      finally { rd.close(); alloc.close() }
    }
    import spark.implicits._
    val filesDs = spark.createDataset(files)
    filesDs.flatMap { file =>
      val alloc = new RootAllocator()
      val ch = Files.newByteChannel(Paths.get(file))
      val rd = new ArrowFileReader(ch, alloc)
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        try { rd.close(); alloc.close() } catch { case _: Exception => }
      })
      val root = rd.getVectorSchemaRoot
      new Iterator[Row] {
        private var rowsInBatch = 0
        private var i = 0
        private def advance(): Boolean = {
          while (i >= rowsInBatch) {
            if (!rd.loadNextBatch()) return false
            rowsInBatch = root.getRowCount
            i = 0
          }
          true
        }
        def hasNext: Boolean = advance()
        def next(): Row = {
          val vals = new Array[Any](schema.length)
          var c = 0
          while (c < schema.length) {
            vals(c) = readCell(root.getVector(c), i)
            c += 1
          }
          i += 1
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(Encoders.row(schema))
  }

  private def readCell(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) return null
    v match {
      case x: BigIntVector        => x.get(i)
      case x: IntVector           => x.get(i)
      case x: Float8Vector        => x.get(i)
      case x: Float4Vector        => x.get(i)
      case x: VarCharVector       => new String(x.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case x: BitVector           => x.get(i) == 1
      case x: VarBinaryVector     => x.get(i)
      case x: TimeStampMicroVector =>
        val us = x.get(i)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case x: ListVector =>
        val obj = x.getObject(i).asInstanceOf[java.util.List[_]]
        obj.asScala.map {
          case f: java.lang.Float => f.floatValue()
          case o => o
        }.toIndexedSeq
      case other => throw new IllegalArgumentException(
        s"ArrowCorpus.read: unsupported vector ${other.getClass.getSimpleName}")
    }
  }
}
