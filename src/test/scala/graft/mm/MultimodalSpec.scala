package graft.mm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("synth blobs decode to valid typed metadata; corrupt payloads flagged") {
    import spark.implicits._
    val blobs = Multimodal.synth(spark, 300, seed = 9L)
    val metas = Multimodal.decodeAll(spark, blobs).collect()
    assert(metas.length == 300)
    assert(metas.forall(_.valid))
    assert(metas.forall(m => m.width >= 64 && m.height >= 64 && m.durationMs >= 1000))
    assert(metas.map(_.modality).toSet == Set("image", "audio", "video"))

    val corrupt = blobs.map(b => b.copy(payload = b.payload.drop(8)))
    val badMetas = Multimodal.decodeAll(spark, corrupt).collect()
    assert(badMetas.forall(!_.valid), "corrupt header must be flagged, not crash")
  }

  private def expectedGraySum(id: Long): Long = {
    val w = 16 + (id % 8).toInt; val h = 16 + ((id / 8) % 8).toInt
    (for (y <- 0 until h; x <- 0 until w) yield (x * 7 + y * 13 + id * 31) % 256).sum
  }

  test("REAL png codec roundtrip: dims and pixel sum exact (lossless)") {
    val blob = Multimodal.synthPng(5L)
    val m = Multimodal.decodeImage(5L, blob.payload)
    assert(m.valid && m.format == "png")
    assert(m.width == 16 + 5 && m.height == 16)
    assert(m.gray_sum == expectedGraySum(5L))
    // distributed path agrees with the local kernel
    val metas = Multimodal.decodeImages(spark, Multimodal.synthPngs(spark, 30))
      .collect().sortBy(_.media_id)
    assert(metas.forall(m => m.valid && m.gray_sum == expectedGraySum(m.media_id)))
  }

  test("REAL jpeg and bmp decode via the JDK codecs") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(40, 24, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 40)
      img.setRGB(x, y, ((x * 3) << 16) | ((y * 5) << 8) | ((x + y) & 0xff))
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val jm = Multimodal.decodeImage(1L, enc("jpg"))
    assert(jm.valid && jm.format == "jpeg" && jm.width == 40 && jm.height == 24)
    val bm = Multimodal.decodeImage(2L, enc("bmp"))
    assert(bm.valid && bm.format == "bmp" && bm.width == 40 && bm.height == 24)
    // BMP is lossless: band-mean sum must equal the same sum off the source
    val r = img.getRaster
    val srcSum = (for (y <- 0 until 24; x <- 0 until 40)
      yield (0 until 3).map(b => r.getSample(x, y, b).toLong).sum / 3).sum
    assert(bm.gray_sum == srcSum)
  }

  test("REAL wav decode: rate, channels, frames, exact duration") {
    val blob = Multimodal.synthWav(7L)
    assert(Multimodal.sniffFormat(blob.payload) == "wav")
    val a = Multimodal.decodeWav(7L, blob.payload)
    assert(a.valid && a.sample_rate == 8000 && a.channels == 1)
    assert(a.frames == 800 + 7 * 8 && a.duration_ms == (800 + 7 * 8) / 8)
    val dist = Multimodal.decodeWavs(spark,
      spark.createDataset(Seq(blob, Multimodal.synthWav(12L)))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaBlob]))
      .collect().sortBy(_.media_id)
    assert(dist.forall(_.valid) && dist(1).frames == 800 + 12 * 8)
  }

  test("REAL thumbnail resize: fits bounds, never upscales, survives re-decode") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(100, 60, BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val thumb = Multimodal.thumbnail(bos.toByteArray, 32, 32)
    val tm = Multimodal.decodeImage(0L, thumb)
    assert(tm.valid && tm.format == "png" && tm.width == 32 && tm.height == 19)
    val small = Multimodal.synthPng(0L) // 16x16 — already within bounds
    val sm = Multimodal.decodeImage(0L, Multimodal.thumbnail(small.payload, 32, 32))
    assert(sm.width == 16 && sm.height == 16, "must not upscale")
  }

  test("REAL animated-gif frame sampling: every Nth frame, exact pixel sums") {
    val blob = Multimodal.synthGif(13L) // 13 % 5 = 3 -> 6 frames; w=13, h=12
    assert(Multimodal.sniffFormat(blob.payload) == "gif")
    val frames = Multimodal.frameSample(13L, blob.payload, 2)
    assert(frames.map(_.frame_idx) == Seq(0, 2, 4))
    def expected(f: Int): Long =
      (for (y <- 0 until 12; x <- 0 until 13)
        yield (x * 7 + y * 13 + 13 * 31 + f * 17) % 256).sum
    assert(frames.forall(v => v.width == 13 && v.height == 12 &&
      v.gray_sum == expected(v.frame_idx)))
    // everyN=1 yields all frames; distributed path agrees with local
    assert(Multimodal.frameSample(13L, blob.payload, 1).size == 6)
    val dist = Multimodal.frameSampleAll(spark, Multimodal.synthGifs(spark, 10), 3)
      .collect().sortBy(v => (v.media_id, v.frame_idx))
    val local = (0L until 10L).flatMap(i =>
      Multimodal.frameSample(i, Multimodal.synthGif(i).payload, 3))
    assert(dist.toSeq == local)
    assert(Multimodal.frameSample(99L, Array[Byte](0, 1, 2), 2).isEmpty,
      "garbage payload samples to empty, not a throw")
  }

  test("corrupt media yields valid=false, never a task failure") {
    val png = Multimodal.synthPng(3L).payload
    val truncated = png.take(png.length / 2)
    assert(!Multimodal.decodeImage(3L, truncated).valid)
    assert(!Multimodal.decodeWav(3L, Array[Byte](1, 2, 3, 4)).valid)
    assert(Multimodal.thumbnail(Array[Byte](9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9), 8, 8) == null)
    assert(Multimodal.sniffFormat(null) == "unknown")
  }

  test("embeddings are deterministic and dimension-stable") {
    import spark.implicits._
    val blobs = Multimodal.synth(spark, 50, seed = 9L)
    val e1 = Multimodal.embedAll(spark, blobs).collect().sortBy(_.media_id)
    val e2 = Multimodal.embedAll(spark, Multimodal.synth(spark, 50, seed = 9L))
      .collect().sortBy(_.media_id)
    assert(e1.length == 50)
    assert(e1.forall(_.embedding.length == 16))
    assert(e1.zip(e2).forall { case (a, b) => a.embedding.sameElements(b.embedding) })
  }

  test("dHash: stable under re-encode, close under small edits, far across images") {
    val a = Multimodal.synthNoisePng(1L)
    val aAgain = Multimodal.synthNoisePng(1L)
    assert(Multimodal.dHash(a.payload) == Multimodal.dHash(aAgain.payload),
      "deterministic decode -> deterministic hash")
    // a re-encode through thumbnail at full size (decode -> RGB -> PNG)
    // must keep the gradient structure
    val reenc = Multimodal.thumbnail(a.payload, 32, 32)
    assert(java.lang.Long.bitCount(
      Multimodal.dHash(a.payload) ^ Multimodal.dHash(reenc)) <= 8)
    // 6 flipped pixels of 1024: most 9x8 cells untouched
    val noisy = Multimodal.synthNoisePng(900L, baseId = 1L, noisePixels = 6)
    assert(java.lang.Long.bitCount(
      Multimodal.dHash(a.payload) ^ Multimodal.dHash(noisy.payload)) <= 8,
      "a tiny edit stays within the near-dup radius")
    // distinct pseudo-random images: ~32 bits differ
    val other = Multimodal.synthNoisePng(2L)
    assert(java.lang.Long.bitCount(
      Multimodal.dHash(a.payload) ^ Multimodal.dHash(other.payload)) > 16,
      "unrelated images are far in Hamming space")
    assert(Multimodal.dHash(Array[Byte](1, 2, 3)) == 0L, "undecodable -> 0")
  }

  test("audioHash: stable on identical clips, close under sparse damage, far across clips") {
    val a = Multimodal.synthNoiseWav(1L)
    assert(Multimodal.audioHash(a.payload) ==
      Multimodal.audioHash(Multimodal.synthNoiseWav(1L).payload))
    val damaged = Multimodal.synthNoiseWav(900L, baseId = 1L, noiseSamples = 10)
    assert(java.lang.Long.bitCount(Multimodal.audioHash(a.payload)
      ^ Multimodal.audioHash(damaged.payload)) <= 8,
      "10 corrupted samples of 4000 stay within the near-dup radius")
    val other = Multimodal.synthNoiseWav(2L)
    assert(java.lang.Long.bitCount(Multimodal.audioHash(a.payload)
      ^ Multimodal.audioHash(other.payload)) > 16,
      "unrelated clips are far in Hamming space")
    assert(Multimodal.audioHash(Array[Byte](9, 9, 9)) == 0L, "undecodable -> 0")
  }

  test("audioDupPairs: planted damaged copies pair up, unrelated do not") {
    import spark.implicits._
    val originals = (0L until 30L).map(i => Multimodal.synthNoiseWav(i))
    val dups = (0L until 6L).map(i =>
      Multimodal.synthNoiseWav(100L + i, baseId = i * 5, noiseSamples = 10))
    val pairs = Multimodal.audioDupPairs(spark, spark.createDataset(originals ++ dups),
        maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 6L).foreach { i =>
      assert(pairs.contains((i * 5, 100L + i)), s"planted pair (${i * 5}, ${100 + i}) missing")
    }
    assert(pairs.forall { case (a, b) => b >= 100L && a == (b - 100L) * 5L },
      s"no unrelated clip may pair: $pairs")
  }

  test("videoHash: frame-majority dHash — stable, damage-robust, far across clips") {
    val a = Multimodal.synthNoiseGif(1L)
    assert(Multimodal.videoHash(a.payload) ==
      Multimodal.videoHash(Multimodal.synthNoiseGif(1L).payload))
    val damaged = Multimodal.synthNoiseGif(900L, baseId = 1L, noisePixels = 6)
    assert(java.lang.Long.bitCount(Multimodal.videoHash(a.payload)
      ^ Multimodal.videoHash(damaged.payload)) <= 8,
      "per-frame noise must not break the frame-majority bits")
    val other = Multimodal.synthNoiseGif(2L)
    assert(java.lang.Long.bitCount(Multimodal.videoHash(a.payload)
      ^ Multimodal.videoHash(other.payload)) > 16)
    assert(Multimodal.videoHash(Array[Byte](7, 7)) == 0L, "undecodable -> 0")
  }

  test("videoDupPairs: planted noisy clip copies pair up, unrelated do not") {
    import spark.implicits._
    val originals = (0L until 30L).map(i => Multimodal.synthNoiseGif(i))
    val dups = (0L until 6L).map(i =>
      Multimodal.synthNoiseGif(100L + i, baseId = i * 5, noisePixels = 6))
    val pairs = Multimodal.videoDupPairs(spark, spark.createDataset(originals ++ dups),
        maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 6L).foreach { i =>
      assert(pairs.contains((i * 5, 100L + i)), s"planted pair (${i * 5}, ${100 + i}) missing")
    }
    assert(pairs.forall { case (a, b) => b >= 100L && a == (b - 100L) * 5L },
      s"no unrelated clip may pair: $pairs")
  }

  test("imageDupPairs: planted near-identical images pair up, unrelated do not") {
    import spark.implicits._
    // 40 distinct images; ids 100..107 are noisy copies of ids 0..7
    val originals = (0L until 40L).map(i => Multimodal.synthNoisePng(i))
    val dups = (0L until 8L).map(i =>
      Multimodal.synthNoisePng(100L + i, baseId = i, noisePixels = 5))
    val blobs = spark.createDataset(originals ++ dups)
    val pairs = Multimodal.imageDupPairs(spark, blobs, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 8L).foreach { i =>
      assert(pairs.contains((i, 100L + i)), s"planted pair ($i, ${100 + i}) missing")
    }
    assert(pairs.forall { case (a, b) => b - a == 100L },
      s"no unrelated image may pair: ${pairs.filterNot { case (a, b) => b - a == 100L }}")
  }
}
