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
    // text bytes are not a decodable image → stub fallback, flagged
    assert(!row.getAs[Boolean]("decoded"))
    assert(row.isNullAt(row.fieldIndex("width")))
    val feats = row.getSeq[Float](row.fieldIndex("features"))
    assert(feats.length == 8)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // normalized histogram
  }

  // a real PNG via the JDK's own encoder — the decode tests exercise the
  // genuine ImageIO codec path end-to-end
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def mediaRow(id: Long, kind: String, payload: Array[Byte]) =
    org.apache.spark.sql.Row(id, kind, "application/octet-stream",
      payload, null)

  private def mediaOf(rows: org.apache.spark.sql.Row*) =
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
      Multimodal.mediaSchema)

  test("real image decode: dimensions, channel means, luminance bucket") {
    val media = mediaOf(
      mediaRow(1L, "image", png(8, 4, 0xFF8040)),   // r=255 g=128 b=64
      mediaRow(2L, "image", "not an image".getBytes),
      mediaRow(3L, "audio", png(8, 4, 0xFF8040)))   // non-image: stub
    val f = Multimodal.extractFeatures(media, dim = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    val img = f(1L)
    assert(img.getAs[Boolean]("decoded"))
    assert(img.getAs[Int]("width") === 8 && img.getAs[Int]("height") === 4)
    val feats = img.getSeq[Float](img.fieldIndex("features"))
    assert(feats(0) === 255f && feats(1) === 128f && feats(2) === 64f)
    // Rec.601 luma of (255,128,64) = 158; bucket 3 + 158*5/256 = 6
    assert(feats(6) === 1f)
    assert(!f(2L).getAs[Boolean]("decoded"), "corrupt bytes → fallback")
    assert(!f(3L).getAs[Boolean]("decoded"), "audio kind → stub")
  }

  test("real image resize: output re-decodes at target dims, color kept") {
    val media = mediaOf(
      mediaRow(1L, "image", png(16, 16, 0x102030)),
      mediaRow(2L, "image", "junk".getBytes),
      mediaRow(3L, "audio", "pcm?".getBytes))
    val out = Multimodal.resizeImages(media, 4, 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getString(2) === "image/png")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r1.getAs[Array[Byte]]("payload")))
    assert(back.getWidth === 4 && back.getHeight === 4)
    // solid color survives bilinear scaling exactly
    assert((back.getRGB(2, 2) & 0xFFFFFF) === 0x102030)
    assert(r1.getAs[org.apache.spark.sql.Row]("meta").getInt(0) === 4)
    // undecodable image: payload untouched, intended dims recorded
    assert(new String(out(2L).getAs[Array[Byte]]("payload")) === "junk")
    assert(out(2L).getAs[org.apache.spark.sql.Row]("meta").getInt(0) === 4)
    // non-image: fully untouched
    assert(new String(out(3L).getAs[Array[Byte]]("payload")) === "pcm?")
    assert(out(3L).getAs[org.apache.spark.sql.Row]("meta") === null)
  }

  test("resizeGrayNearest ≡ reference index arithmetic: downsample, " +
      "non-divisible dims, upsample, identity") {
    val rnd = new scala.util.Random(9)
    def ref(px: Seq[Int], sw: Int, sh: Int, dw: Int, dh: Int): Seq[Int] =
      (0 until dw * dh).map { k =>
        val i = k / dw; val j = k % dw
        px((i * sh / dh) * sw + (j * sw / dw))
      }
    val shapes = Seq((8, 8, 4, 4), (8, 8, 3, 5), (4, 4, 6, 6),
      (5, 3, 5, 3), (7, 2, 1, 1))
    for ((sw, sh, dw, dh) <- shapes) {
      val rows = (0L until 20L)
        .map(id => (id, Seq.fill(sw * sh)(rnd.nextInt(256))))
      val got = rows.toDF("id", "px")
        .select($"id",
          Multimodal.resizeGrayNearest($"px", sw, sh, dw, dh).as("r"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      rows.foreach { case (id, px) =>
        assert(got(id) === ref(px, sw, sh, dw, dh),
          s"shape ${sw}x$sh -> ${dw}x$dh")
      }
    }
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

  test("gray PNG encode → decode round-trips pixels exactly") {
    val grids = Seq(
      (0L, (0 until 64).map(i => (i * 4) % 256)),
      (1L, (0 until 64).map(i => (255 - i) % 256)),
      (2L, Seq.fill(64)(0)), (3L, Seq.fill(64)(255)))
      .toDF("media_id", "px")
    val pngs = Multimodal.encodeGrayPngs(grids, "media_id", "px", 8, 8)
    val dec = Multimodal.decodeGrayPixels(pngs, "media_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getInt(3), r.getSeq[Int](4)))
      .toMap
    val want = grids.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(dec.keySet == want.keySet)
    dec.foreach { case (id, (decoded, w, h, px)) =>
      assert(decoded && w == 8 && h == 8)
      assert(px == want(id), s"grid $id did not round-trip")
    }
  }

  test("decodeGrayPixels: corrupt bytes route to decoded=false") {
    val bad = Seq((9L, "not a png at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val r = Multimodal.decodeGrayPixels(bad, "media_id", "payload")
      .collect().head
    assert(r.getLong(0) == 9L && !r.getBoolean(1) && r.isNullAt(4))
  }

  test("PCM WAV encode → javax.sound decode round-trips samples exactly") {
    val waves = Seq(
      (0L, (0 until 64).map(i => (128 + (i % 16) * 8 - 64) & 0xFF)),
      (1L, Seq.fill(32)(128)), (2L, Seq(0, 255, 0, 255)))
      .toDF("media_id", "s")
    val wavs = Multimodal.encodePcmWavs(waves, "media_id", "s", 8000)
    val dec = Multimodal.decodeWavSamples(wavs, "media_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getSeq[Int](3))).toMap
    val want = waves.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(dec.keySet == want.keySet)
    dec.foreach { case (id, (decoded, rate, samples)) =>
      assert(decoded && rate == 8000)
      assert(samples == want(id), s"wave $id did not round-trip")
    }
  }

  test("decodeWavSamples: corrupt and unsupported bytes route out") {
    val bad = Seq((7L, "definitely not RIFF".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val r = Multimodal.decodeWavSamples(bad, "media_id", "payload")
      .collect().head
    assert(r.getLong(0) == 7L && !r.getBoolean(1) && r.isNullAt(3))
  }

  test("frame container: pack → demux round-trips frames in order") {
    val frames = Seq(
      (1L, 0, Array[Byte](1, 2, 3)),
      (1L, 1, Array[Byte](4)),
      (1L, 2, Array.empty[Byte]),
      (2L, 0, Array[Byte](9, 9)))
      .toDF("media_id", "f", "payload")
    val packed = Multimodal.encodeFrameContainer(
      frames, "media_id", "f", "payload")
    assert(packed.count() == 2)
    val got = Multimodal.demuxFrames(packed, "media_id", "payload")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Array[Byte]](2).toSeq)
      .toMap
    assert(got.keySet ==
      Set((1L, 0), (1L, 1), (1L, 2), (2L, 0)))
    assert(got((1L, 0)) == Seq[Byte](1, 2, 3))
    assert(got((1L, 1)) == Seq[Byte](4))
    assert(got((1L, 2)).isEmpty)
    assert(got((2L, 0)) == Seq[Byte](9, 9))
    // malformed container → zero frames, no exception
    val bad = Seq((5L, "GARBAGE".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    assert(Multimodal.demuxFrames(bad, "media_id", "payload").count() == 0)
  }

  test("dHash chain: one-pixel edit stays within Hamming 2 of original") {
    import graft.functions.VectorExpressions
    val base = (0 until 64).map(i => (i * 37 + 11) % 256)
    val edited = base.updated(0, (base(0) + 16) % 256)
    val far = (0 until 64).map(i => (i * 101 + 3) % 251)
    val grids = Seq((0L, base), (1L, edited), (2L, far))
      .toDF("media_id", "px")
    val pngs = Multimodal.encodeGrayPngs(grids, "media_id", "px", 8, 8)
    val hashed = Multimodal.decodeGrayPixels(pngs, "media_id", "payload")
      .filter($"decoded")
      .select($"media_id".as("doc_id"),
        VectorExpressions.dhashBits($"pixels", 8, 8).as("simhash"))
    val pairs = graft.operators.Dedup.simhashPairsFromHashes(
        hashed, "doc_id", numBits = 56, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.operators.Dedup.releasePersisted()
    // pixel 0 feeds exactly one difference bit → Hamming ≤ 1 ≤ 2
    assert(pairs.contains((0L, 1L)), s"edited copy not paired: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "unrelated image paired")
  }
}
