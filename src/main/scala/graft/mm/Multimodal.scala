package graft.mm

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side shape (schema, partitioning, batch processing, metadata
  * propagation) is real and tested; the codec kernels are STUBS — this
  * container has no image/audio libraries, so `decodeHeader` parses a
  * deterministic synthetic header and `embed` produces a deterministic
  * hash-derived feature vector. Swapping in real codecs (e.g. a JNI
  * decoder) only replaces the marked kernel bodies; the distributed
  * plumbing is unchanged.
  */
object Multimodal {

  final case class MediaBlob(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
  )

  final case class MediaMeta(
      media_id: Long,
      modality: String,
      width: Int, // images/video
      height: Int,
      durationMs: Int, // audio/video
      sizeBytes: Int,
      valid: Boolean,
  )

  final case class MediaFeature(media_id: Long, modality: String,
                                embedding: Array[Float])

  val Magic: Array[Byte] = Array('G'.toByte, 'R'.toByte, 'F'.toByte, 'T'.toByte)

  /** Deterministic synthetic blob: 16-byte header (magic, width, height,
    * durationMs) + seeded payload bytes. */
  def synthBlob(id: Long, modality: String, seed: Long): MediaBlob = {
    val r = graft.dedup.Dedup.mix64(seed ^ id)
    val width = 64 + ((r & 0xffff) % 1024).toInt
    val height = 64 + (((r >>> 16) & 0xffff) % 1024).toInt
    val dur = 1000 + (((r >>> 32) & 0xffff) % 60000).toInt
    val bodyLen = 256 + ((r >>> 48) & 0xff).toInt
    val buf = java.nio.ByteBuffer.allocate(16 + bodyLen)
    buf.put(Magic)
    buf.putInt(width); buf.putInt(height); buf.putInt(dur)
    var i = 0
    var x = r
    while (i < bodyLen) {
      x = graft.dedup.Dedup.mix64(x)
      buf.put((x & 0xff).toByte)
      i += 1
    }
    MediaBlob(id, modality, buf.array())
  }

  def synth(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.range(0, n).map { id =>
      val mod = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      synthBlob(id, mod, seed)
    }
  }

  /** STUB codec kernel: parses the synthetic header. A real implementation
    * would dispatch to an image/audio decoder here; everything around it
    * (schema, null-safety, batching) is production shape. */
  def decodeHeader(b: MediaBlob): MediaMeta = {
    val p = b.payload
    if (p == null || p.length < 16 || p(0) != Magic(0) || p(1) != Magic(1) ||
        p(2) != Magic(2) || p(3) != Magic(3))
      return MediaMeta(b.media_id, b.modality, 0, 0, 0, if (p == null) 0 else p.length, valid = false)
    val buf = java.nio.ByteBuffer.wrap(p, 4, 12)
    MediaMeta(b.media_id, b.modality, buf.getInt, buf.getInt, buf.getInt,
      p.length, valid = true)
  }

  /** STUB feature kernel: deterministic 16-dim embedding from payload
    * bytes (a real kernel would run a vision/audio model per batch). */
  def embed(b: MediaBlob): MediaFeature = {
    val dim = 16
    val v = new Array[Float](dim)
    val p = b.payload
    if (p != null) {
      var i = 0
      while (i < p.length) {
        v(i % dim) += (p(i) & 0xff) / 255.0f
        i += 1
      }
      var j = 0
      while (j < dim) { v(j) = v(j) / math.max(1, p.length / dim); j += 1 }
    }
    MediaFeature(b.media_id, b.modality, v)
  }

  /** Batched decode: mapPartitions so a real codec could amortize
    * per-batch init (model load, native context) across the partition —
    * the S6 connection-reuse idiom (`the_stack_parser.py:33-36`). */
  def decodeAll(spark: SparkSession, blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.mapPartitions { it =>
      // per-partition init for a real codec would go here
      it.map(decodeHeader)
    }
  }

  def embedAll(spark: SparkSession, blobs: Dataset[MediaBlob]): Dataset[MediaFeature] = {
    import spark.implicits._
    blobs.mapPartitions(_.map(embed))
  }
}
