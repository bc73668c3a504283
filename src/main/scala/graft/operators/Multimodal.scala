package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata, processed in partition-sized
 * batches.
 *
 * IMAGE decode and resize are REAL: the JDK ships PNG/JPEG/BMP/GIF/WBMP
 * codecs in `javax.imageio` (no external libraries), so image payloads
 * are actually decoded — real dimensions, per-channel means, a
 * luminance histogram, full pixel grids ([[decodeGrayPixels]]) — and
 * actually resized (scaled redraw, PNG re-encode). AUDIO decode is
 * REAL for PCM containers: `javax.sound.sampled` parses WAV/AIFF/AU in
 * the JDK with no audio device ([[decodeWavSamples]]). What remains a
 * clearly marked STUB: compressed audio (mp3/ogg/aac) and VIDEO demux
 * (no such codecs in the JVM), and the fallback for undecodable bytes
 * — a deterministic byte histogram, flagged `decoded = false` so
 * downstream can route or drop.
 *
 * Real throughout: the schema contract, the batched per-partition
 * execution shape (`mapPartitions` over an iterator — the Scala twin of
 * a pandas-batch UDF: no per-row setup cost, bounded memory, codec
 * state reused within a partition), and the partitioning controls a
 * 100 TB media corpus needs (payloads never shuffle unless the caller
 * asks; only the small feature projection continues downstream).
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true))),
      nullable = true)))

  /** Output schema of [[extractFeatures]]. `decoded` marks rows whose
    * features come from a real codec pass; `width`/`height` are real
    * decoded dimensions (null when not an image or not decodable). */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("payload_hash", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /**
   * REAL image decode via the JDK's built-in ImageIO codecs (PNG, JPEG,
   * BMP, GIF, WBMP — part of the JVM, zero external deps). Features:
   * `[meanR, meanG, meanB, (dim-3)-bucket luminance histogram]` — the
   * classic cheap visual-dedup / quality signals. None when the bytes
   * are not a decodable image (ImageIO yields null), routing the row to
   * the stub fallback with `decoded = false`.
   */
  private[graft] def decodeImage(payload: Array[Byte], dim: Int)
      : Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Float](dim)
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            sr += r; sg += g; sb += b
            // integer Rec.601 luma, exact and portable
            val lum = (r * 299 + g * 587 + b * 114) / 1000
            out(3 + lum * (dim - 3) / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        out(0) = (sr / n).toFloat
        out(1) = (sg / n).toFloat
        out(2) = (sb / n).toFloat
        var j = 3
        while (j < dim) { out(j) /= n; j += 1 }
        Some((w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * STUB decoder ???: stands in for audio PCM read / video demux (no
   * such codecs in this environment) and for undecodable image bytes;
   * this deterministic fake derives a byte histogram so tests have
   * stable expectations. Marked clearly so it is never mistaken for a
   * real codec.
   */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) % dim) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < dim) { hist(j) /= payload.length; j += 1 }
    }
    hist
  }

  /**
   * Batched feature extraction over media rows: one pass per partition,
   * iterator-to-iterator (constant memory, no per-row driver round trips).
   * The 100 TB shape: payloads stay where they were read; only the small
   * (id, hash, features) projection continues downstream.
   */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    require(dim > 3, s"dim must exceed the 3 channel means, got $dim")
    val spark = media.sparkSession
    val out = media.select("media_id", "kind", "payload").rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // see encodeGrayPngs
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val fnv = {
            var h = 0xcbf29ce484222325L
            var i = 0
            while (i < payload.length) {
              h ^= (payload(i) & 0xFFL); h *= 0x100000001b3L; i += 1
            }
            h
          }
          val img = if (r.getString(1) == "image")
            decodeImage(payload, dim) else None
          img match {
            case Some((w, h, feats)) =>
              Row(r.getLong(0), r.getString(1), payload.length, fnv,
                true, w, h, feats)
            case None =>
              Row(r.getLong(0), r.getString(1), payload.length, fnv,
                false, null, null, decodeStub(payload, dim))
          }
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /**
   * REAL image resize: decodable image payloads are scaled with a
   * bilinear redraw and re-encoded as PNG (all JDK ImageIO/Graphics2D —
   * no external libs), metadata updated to the real new dimensions.
   * Rows whose bytes don't decode (and non-image kinds) pass through
   * with payload untouched and only the intended-dimension metadata
   * recorded — the prior stub behavior, now the fallback. Same batched
   * per-partition shape as [[extractFeatures]].
   *
   * Contract: returns exactly [[mediaSchema]] — enrichment columns
   * beyond it do not survive; re-join them on `media_id`. The
   * narrowing is LOUD: a caller passing extra columns gets an error at
   * plan time (`allowExtraColumns = true` opts into the silent drop),
   * not a runtime column loss three operators downstream.
   */
  def resizeImages(media: DataFrame, w: Int, h: Int,
      allowExtraColumns: Boolean = false): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val mediaCols =
      Set("media_id", "kind", "mime", "payload", "meta")
    val extras = media.columns.filterNot(mediaCols)
    require(allowExtraColumns || extras.isEmpty,
      s"resizeImages returns exactly mediaSchema; input carries extra " +
        s"column(s) ${extras.mkString(", ")} that would be dropped — " +
        "re-join them on media_id, or pass allowExtraColumns = true")
    val spark = media.sparkSession
    val out = media.select("media_id", "kind", "mime", "payload", "meta")
      .rdd.mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // see encodeGrayPngs
        it.map { r =>
          val kind = r.getString(1)
          val payload = r.getAs[Array[Byte]]("payload")
          val meta = r.getAs[Row](4)
          val durationMs = if (meta == null) null else meta.get(2)
          def metaRow = Row(w, h, durationMs)
          if (kind != "image") Row(r.getLong(0), kind, r.getString(2),
            payload, meta)
          else {
            val resized = try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))
              if (img == null) None
              else {
                val dst = new java.awt.image.BufferedImage(w, h,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                try {
                  g.setRenderingHint(
                    java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img, 0, 0, w, h, null)
                } finally g.dispose()
                val buf = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(dst, "png", buf)
                Some(buf.toByteArray)
              }
            } catch { case scala.util.control.NonFatal(_) => None }
            resized match {
              case Some(bytes) =>
                Row(r.getLong(0), kind, "image/png", bytes, metaRow)
              case None =>
                Row(r.getLong(0), kind, r.getString(2), payload, metaRow)
            }
          }
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Output schema of [[decodeGrayPixels]]: the full decoded pixel grid
    * (row-major band-0 samples), or `decoded = false` with null grid
    * when the bytes are not a decodable image. */
  val grayPixelSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = true)))

  /**
   * Exact nearest-neighbor resample of a row-major gray pixel grid —
   * the RESIZE step of the image pipeline in its oracle-replayable
   * form: `out(i, j) = in(⌊i·srcH/dstH⌋, ⌊j·srcW/dstW⌋)`, pure integer
   * index arithmetic over built-in array expressions, so a DuckDB
   * oracle replays it bit-exactly behind the lossless PNG round trip
   * (q156). [[resizeImages]] is the real-codec bilinear sibling for
   * arbitrary payloads (spec-gated — filtered interpolation is not
   * SQL-replayable). The array-lambda eval is fine here: the REAL
   * decode it follows dominates, and the output is dstW·dstH elements.
   * Works both directions (downsample and upsample). The double
   * divisions are exact-floor at these magnitudes (indices < 2³¹,
   * fractional parts ≥ 1/dim ≫ the quotient's ulp), matching integer
   * `//` in the oracle.
   */
  def resizeGrayNearest(pixels: Column, srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Column = {
    require(srcW > 0 && srcH > 0 && dstW > 0 && dstH > 0,
      s"dims must be positive, got ${srcW}x$srcH -> ${dstW}x$dstH")
    transform(sequence(lit(0), lit(dstW * dstH - 1)), { k =>
      val i = floor(k.cast("double") / lit(dstW)).cast("int")
      val j = pmod(k, lit(dstW))
      val si = floor((i * lit(srcH)).cast("double") / lit(dstH)).cast("int")
      val sj = floor((j * lit(srcW)).cast("double") / lit(dstW)).cast("int")
      element_at(pixels, si * lit(srcW) + sj + lit(1))
    })
  }

  /**
   * REAL PNG encode of grayscale pixel grids (JDK ImageIO, no external
   * deps): each row's `pixelsCol` (int array, row-major, values 0–255,
   * length `w·h`) becomes an 8-bit grayscale PNG payload. PNG is
   * lossless, so [[decodeGrayPixels]] recovers the grid EXACTLY — which
   * is what lets the perceptual-hash dedup path (q128) run a REAL
   * codec round-trip under a DuckDB oracle that replays the pixels
   * from their generating formula: any codec deviation would change
   * the hash and fail the gate. Iterator-to-iterator, one encoder per
   * row, no shuffle.
   *
   * Input contract — and why this side THROWS where the decode paths
   * route to `decoded = false`: decode inputs are UNTRUSTED bytes (a
   * crawl can contain anything, so a bad payload is data, not a bug);
   * encode inputs are pipeline-GENERATED pixel grids, so a grid whose
   * length isn't `w·h` is a caller bug upstream, and failing the job
   * loudly beats silently dropping or padding frames that would then
   * hash-diverge from their generating formula.
   */
  def encodeGrayPngs(df: DataFrame, idCol: String, pixelsCol: String,
      w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, s"dims must be positive, got ${w}x$h")
    val spark = df.sparkSession
    val out = df.select(col(idCol).cast("long").as("media_id"),
        col(pixelsCol).as("__px")).rdd
      .mapPartitions { it =>
        // ImageIO's default stream cache spills every encode through a
        // temp FILE — per-image disk round-trips that dominate small
        // payloads; in-memory streams need no cache at all
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val px = r.getSeq[Int](1)
          require(px.length == w * h,
            s"pixel grid ${px.length} != ${w}x$h")
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, px(y * w + x) & 0xFF)
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          Row(r.getLong(0), buf.toByteArray)
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /**
   * REAL image decode to the full grayscale pixel grid (band-0 raster
   * samples, row-major) — the per-pixel sibling of [[decodeImage]]'s
   * summary features, feeding perceptual hashing
   * ([[graft.functions.VectorExpressions.DHashBits]]) and any other
   * pixel-level signal. Undecodable bytes route to `decoded = false`
   * with a null grid (never an exception mid-partition). Same
   * iterator-to-iterator shape; payloads never shuffle.
   */
  def decodeGrayPixels(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val out = df.select(col(idCol).cast("long").as("media_id"),
        col(payloadCol).as("__payload")).rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // see encodeGrayPngs
        it.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val img = try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)))
          } catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case Some(im) if im.getWidth > 0 && im.getHeight > 0 =>
              val w = im.getWidth
              val h = im.getHeight
              val raster = im.getRaster
              val px = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  px(y * w + x) = raster.getSample(x, y, 0)
                  x += 1
                }
                y += 1
              }
              Row(r.getLong(0), true, w, h, px.toSeq)
            case _ => Row(r.getLong(0), false, null, null, null)
          }
        }
      }
    spark.createDataFrame(out, grayPixelSchema)
  }

  /** Output schema of [[decodeWavSamples]]. */
  val wavSampleSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = true)))

  /**
   * WAV container encode of 8-bit unsigned mono PCM (RIFF header
   * written directly — 44 deterministic bytes + the sample bytes;
   * public format). PCM WAV is lossless, so [[decodeWavSamples]]
   * recovers the samples EXACTLY — the audio twin of
   * [[encodeGrayPngs]]'s oracle story (q133): synthesize samples from
   * a portable formula, round-trip through the REAL JDK decoder, and
   * any codec deviation fails the hash gate.
   */
  def encodePcmWavs(df: DataFrame, idCol: String, samplesCol: String,
      sampleRate: Int = 8000): DataFrame = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val spark = df.sparkSession
    val out = df.select(col(idCol).cast("long").as("media_id"),
        col(samplesCol).as("__s")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val s = r.getSeq[Int](1)
          val data = s.map(v => (v & 0xFF).toByte).toArray
          val buf = java.nio.ByteBuffer
            .allocate(44 + data.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII"))
          buf.putInt(36 + data.length)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII"))
          buf.putInt(16)
          buf.putShort(1)               // PCM
          buf.putShort(1)               // mono
          buf.putInt(sampleRate)
          buf.putInt(sampleRate)        // byte rate (8-bit mono)
          buf.putShort(1)               // block align
          buf.putShort(8)               // bits per sample
          buf.put("data".getBytes("US-ASCII"))
          buf.putInt(data.length)
          buf.put(data)
          Row(r.getLong(0), buf.array())
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /**
   * REAL audio decode via the JDK's `javax.sound.sampled` WAV/AIFF/AU
   * parser (part of the JVM, zero external deps, no audio device
   * needed for stream reads) — audio is no longer wholly stubbed: PCM
   * WAV payloads actually decode to their sample values (8-bit
   * unsigned as 0–255 ints). Undecodable bytes and non-8-bit formats
   * route to `decoded = false` with a null array, mirroring
   * [[decodeGrayPixels]]. Compressed audio (mp3/ogg/aac) remains the
   * honest documented stub — those codecs are NOT in the JDK.
   * Iterator-to-iterator; payloads never shuffle.
   */
  def decodeWavSamples(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val out = df.select(col(idCol).cast("long").as("media_id"),
        col(payloadCol).as("__payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val parsed = try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1) {
                val bytes = in.readAllBytes()
                Some((fmt.getSampleRate.toInt,
                  bytes.map(b => (b & 0xFF): Int)))
              } else None
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
          parsed match {
            case Some((rate, samples)) =>
              Row(r.getLong(0), true, rate, samples.toSeq)
            case None => Row(r.getLong(0), false, null, null)
          }
        }
      }
    spark.createDataFrame(out, wavSampleSchema)
  }

  /**
   * Pack per-frame image payloads into a length-prefixed frame
   * container (`GFV1` magic + frame count + [len, bytes] per frame —
   * a deterministic MJPEG-style concatenation): the video twin of the
   * WAV/PNG encode side. Frames must carry `(idCol, frameIdxCol,
   * payloadCol)`; one container row per id, frames ordered by index.
   * HONEST SCOPE: this is a homemade container so the DEMUX + per-
   * frame ImageIO decode path can be real and oracle-gated (q134);
   * standard containers (mp4/mkv/avi) have no JDK demuxer and remain
   * the documented stub.
   *
   * Frames of one video shuffle once to their id (they must meet in
   * one row); containers never shuffle again.
   */
  def encodeFrameContainer(frames: DataFrame, idCol: String,
      frameIdxCol: String, payloadCol: String): DataFrame = {
    val spark = frames.sparkSession
    val out = frames
      .select(col(idCol).cast("long").as("media_id"),
        struct(col(frameIdxCol).cast("int").as("idx"),
          col(payloadCol).as("p")).as("__f"))
      .groupBy("media_id")
      .agg(sort_array(collect_list(col("__f"))).as("__fs"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val fs = r.getSeq[Row](1)
          val total = 8 + fs.map(f =>
            4 + f.getAs[Array[Byte]]("p").length).sum
          val buf = java.nio.ByteBuffer.allocate(total)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("GFV1".getBytes("US-ASCII"))
          buf.putInt(fs.size)
          fs.foreach { f =>
            val b = f.getAs[Array[Byte]]("p")
            buf.putInt(b.length)
            buf.put(b)
          }
          Row(r.getLong(0), buf.array())
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /** Demux a [[encodeFrameContainer]] payload back into one row per
    * frame `(media_id, frame_idx, frame)` — malformed containers yield
    * zero frames rather than an exception (route on absence). Iterator
    * -to-iterator; generator shape (one input row → n frame rows). */
  def demuxFrames(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val out = df.select(col(idCol).cast("long").as("media_id"),
        col(payloadCol).as("__payload")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val b = r.getAs[Array[Byte]](1)
          try {
            val buf = java.nio.ByteBuffer.wrap(b)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val magic = new Array[Byte](4)
            buf.get(magic)
            if (new String(magic, "US-ASCII") != "GFV1") Iterator.empty
            else {
              val n = buf.getInt
              require(n >= 0 && n <= (1 << 20))
              (0 until n).iterator.map { i =>
                val len = buf.getInt
                val frame = new Array[Byte](len)
                buf.get(frame)
                Row(r.getLong(0), i, frame)
              }.toArray.iterator // materialize: fail atomically per row
            }
          } catch {
            case scala.util.control.NonFatal(_) => Iterator.empty
          }
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false))))
  }

  /** Frame-sample stub for videos: every `everyMs` ms up to the recorded
    * duration — emits one row per sampled frame offset (the generator
    * shape a real frame extractor would follow). */
  def sampleFrames(media: DataFrame, everyMs: Int = 1000): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0),
          coalesce(col("meta.duration_ms"), lit(0)), lit(everyMs)))
          .as("frame_ms"))

  /** Builds a demo media table from the documents fixture (text bytes as
    * payloads) — lets every pipeline stage run end-to-end without codecs. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).cast("int").as("width"),
        lit(64).cast("int").as("height"),
        (length(col("text")) * 10).cast("int").as("duration_ms")).as("meta"))
}
