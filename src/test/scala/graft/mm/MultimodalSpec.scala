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
}
