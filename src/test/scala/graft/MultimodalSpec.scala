package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world"), (1L, "abc"), (2L, "some longer video text"),
    (3L, "x")).toDF("doc_id", "text")

  test("mediaFromDocuments produces the media schema contract") {
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "mime", "payload", "meta"))
    val kinds = media.select("kind").as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  test("extractFeatures: deterministic, batched, normalized histogram") {
    val media = Multimodal.mediaFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(media, dim = 8)
    val f2 = Multimodal.extractFeatures(media, dim = 8)
    val a = f1.orderBy("media_id").collect().map(_.toString)
    val b = f2.orderBy("media_id").collect().map(_.toString)
    assert(a.sameElements(b)) // deterministic across runs
    val row = f1.filter($"media_id" === 0L).head()
    assert(row.getAs[Int]("n_bytes") == "hello world".length)
    val feats = row.getSeq[Float](4)
    assert(feats.length == 8)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // normalized histogram
  }

  test("resizeImages touches only image metadata") {
    val media = Multimodal.mediaFromDocuments(docs)
    val resized = Multimodal.resizeImages(media, 32, 32)
    val images = resized.filter($"kind" === "image")
      .select("meta.width").as[Int].collect()
    assert(images.nonEmpty && images.forall(_ == 32))
    val others = resized.filter($"kind" =!= "image")
      .select("meta.width").as[Int].collect()
    assert(others.forall(_ == 64))
  }

  test("sampleFrames emits one row per sampled offset for videos only") {
    val media = Multimodal.mediaFromDocuments(docs)
    val frames = Multimodal.sampleFrames(media, everyMs = 50)
    val perVideo = frames.groupBy("media_id").count()
      .as[(Long, Long)].collect().toMap
    val durations = media.filter($"kind" === "video")
      .select($"media_id", $"meta.duration_ms").as[(Long, Int)].collect()
    assert(durations.nonEmpty)
    durations.foreach { case (id, dur) =>
      assert(perVideo(id) == dur / 50 + 1)
    }
  }
}
