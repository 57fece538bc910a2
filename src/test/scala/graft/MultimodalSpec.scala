package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  test("synthetic media table is deterministic and typed") {
    val a = Multimodal.synthesize(spark, 50).collect()
    val b = Multimodal.synthesize(spark, 50).collect()
    assert(a.map(_.media_id).toSeq == b.map(_.media_id).toSeq)
    assert(a.map(_.payload.toSeq) sameElements b.map(_.payload.toSeq))
    assert(a.forall(m => m.payload.length == m.width * m.height))
    assert(a.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("feature extraction emits fixed-size thumbnails + stable stats") {
    val media = Multimodal.synthesize(spark, 30)
    val f = Multimodal.extractFeatures(media, thumbLen = 16).collect()
    assert(f.length == 30)
    assert(f.forall(_.thumb.length <= 16))
    assert(f.forall(x => x.byte_mean >= 0 && x.byte_mean < 256))
    // decode stub is deterministic
    val f2 = Multimodal.extractFeatures(media, thumbLen = 16).collect()
    assert(f.map(_.byte_mean).toSeq == f2.map(_.byte_mean).toSeq)
  }

  test("stats aggregates per kind over the binary column") {
    val media = Multimodal.synthesize(spark, 90).toDF()
    val st = Multimodal.stats(media).collect()
    assert(st.length == 3)
    assert(st.map(_.getLong(1)).sum == 90)
  }

  test("batched (mapInPandas-shaped) extraction == row-wise, any batch size") {
    val media = Multimodal.synthesize(spark, 47)
    def norm(fs: Array[graft.multimodal.Multimodal.MediaFeatures]) =
      fs.sortBy(_.media_id).map(f => (f.media_id, f.kind, f.n_bytes,
        f.byte_mean, f.byte_entropy_q, f.thumb.toSeq)).toSeq
    val rowWise = norm(Multimodal.extractFeatures(media).collect())
    for (bs <- Seq(1, 3, 1000)) {
      assert(norm(Multimodal.extractFeaturesBatched(media, batchSize = bs)
        .collect()) == rowWise, s"batchSize=$bs")
    }
  }

  test("decode stub: frame-sampling shape") {
    val payload = (0 until 100).map(_.toByte).toArray
    val thumb = Multimodal.decodeStub(payload, 10)
    assert(thumb.length == 10)
    assert(thumb.head == 0.toByte)
    assert(Multimodal.decodeStub(Array.emptyByteArray, 10).isEmpty)
  }
}
