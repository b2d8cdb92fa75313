package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-batched feature extraction.
  *
  * IMAGE decode is REAL ([[decodeImage]] runs `javax.imageio` — PNG / BMP /
  * GIF / JPEG, the codecs the JDK itself ships; q53 machine-checks a full
  * encode→decode round trip against a closed-form oracle) and so is AUDIO
  * decode ([[decodeAudio]] parses WAV / AIFF / AU containers and extracts
  * PCM frames via `javax.sound.sampled`; q56 gates it the same way), and
  * so is MULTI-FRAME decode ([[decodeGifFrames]] walks an animated GIF's
  * stored frames via the `ImageReader` sequence API; q396 gates per-frame
  * dimensions and pixel means the same way). Only true VIDEO codecs
  * (MP4/H.26x) remain a clearly-marked STUB (`stubDecode` — no such codec
  * in the JDK) deriving deterministic fake features from raw bytes; an
  * unrecognized or corrupt payload falls back to the same stub-derived
  * numbers, flagged `decoded=false`. Everything AROUND the decoders is
  * the real production shape:
  *
  *   - media rides a `binary` column + a `media_meta` struct (mime, size),
  *     exactly how Parquet stores blobs — column pruning means relational
  *     queries never deserialize the payload;
  *   - extraction runs via `mapPartitions` over a typed Dataset — the Scala
  *     analogue of `mapInPandas`: per-partition batch iteration, so a real
  *     decoder would amortize model/codec init once per partition (per
  *     executor-core at scale), not per row;
  *   - output is a flat feature frame joinable back on doc_id.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      first_byte: Int,
      mean_byte: Double,
      n_frames: Int
  )

  /** Attach a synthetic binary media column (utf-8 bytes of a text prefix —
    * a stand-in for real image/audio payload) plus typed metadata.
    *
    * Oracle note: the q50/q51/q52 DuckDB oracles slice the TEXT by
    * characters while the Spark side slices the BLOB by bytes — equivalent
    * only because the driver fixtures are pure ASCII (verified). Real
    * binary payloads have no SQL-text oracle at all; the byte-side plumbing
    * is the part that carries.
    */
  def attachMedia(docs: DataFrame, prefixLen: Int = 64): DataFrame =
    docs
      .withColumn("media", encode(substring(col("text"), 1, prefixLen), "utf-8"))
      .withColumn("media_meta",
        struct(lit("application/octet-stream").as("mime"),
          octet_length(col("media")).as("size_bytes")))

  /** STUB decoder — stands in for image decode / resize / frame sampling.
    * Deterministic features straight from the bytes so tests and oracles
    * can verify the plumbing end-to-end.
    */
  def stubDecode(id: Long, bytes: Array[Byte], frameSize: Int): MediaFeatures = {
    val n = bytes.length
    val first = if (n > 0) bytes(0) & 0xff else 0
    val mean = if (n > 0) bytes.iterator.map(_ & 0xff).sum.toDouble / n else 0.0
    val frames = (n + frameSize - 1) / frameSize // "frame sample": ceil(n/frameSize) chunks
    // HALF_UP to match SQL round() semantics in the cross-engine oracle
    val meanR = BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    MediaFeatures(id, n, first, meanR, frames)
  }

  final case class ImageFeatures(
      doc_id: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      mean_pixel_4: Long // floor(mean-gray-value * 10000): exact cross-engine
  )

  /** Deterministic tiny grayscale-in-RGB test image for doc `id`:
    * width = id%8+1, height = id%4+2, pixel (x,y) = (id+x+y)%256 on all
    * three channels — closed-form, so a SQL oracle can predict what a REAL
    * decoder must read back from the PNG bytes.
    */
  def encodeTestImage(id: Long, format: String = "png"): Array[Byte] = {
    val w = (id % 8 + 1).toInt
    val h = (id % 4 + 2).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id + x + y) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** REAL image decode via `javax.imageio`: dimensions and mean pixel value
    * (red channel — identical to gray for the gray-in-RGB fixtures, and a
    * deterministic projection for arbitrary RGB) from the actual decoded
    * raster. Returns None when no installed codec recognizes the payload.
    * The mean is floor-scaled (×10000) with the division done in double
    * exactly as the oracle writes it, so the value hash-matches DuckDB.
    */
  def decodeImage(id: Long, bytes: Array[Byte]): Option[ImageFeatures] = {
    // NonFatal, not just IOException: JDK codecs throw RuntimeExceptions
    // (ArrayIndexOutOfBounds, CMMException, ...) on malformed-but-recognized
    // payloads, and one bad blob must fall back to the stub, not fail the task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += (im.getRGB(x, y) >> 16) & 0xff; x += 1 }
        y += 1
      }
      val mean4 = math.floor(sum.toDouble / (w * h) * 10000).toLong
      ImageFeatures(id, decoded = true, w, h, mean4)
    }
  }

  /** Partition-batched image feature extraction: real decode where a codec
    * exists, the stub's byte-derived numbers (flagged `decoded=false`,
    * zero dimensions) where none does — so a mixed corpus never loses rows
    * to a missing codec, and downstream can filter on the flag.
    */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[MediaRow]
      .mapPartitions { batch =>
        // ImageIO codec registry init happens once per JVM; per-partition
        // iteration is where a heavier model/codec would init once
        batch.map { row =>
          decodeImage(row.doc_id, row.media).getOrElse {
            val stub = stubDecode(row.doc_id, row.media, frameSize = 16)
            ImageFeatures(row.doc_id, decoded = false, 0, 0,
              math.floor(stub.mean_byte * 10000).toLong)
          }
        }
      }
  }

  final case class PerceptualHash(
      doc_id: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      phash: Long // 8-bit 4×2 average-hash over the decoded raster
  )

  /** 4×2 average-hash over the REAL decoded raster — the integer-exact
    * miniature of the classic aHash/pHash image near-dup fingerprint:
    * sample a fixed 4×2 grid (`px = gx·(w−1) div 3`, `py = gy·(h−1)`,
    * red channel), set bit `gy·4+gx` iff `8·v > Σv`. All comparisons are
    * integer cross-multiplications (no float mean), so a SQL oracle can
    * replay the exact hash a correct decoder must produce from the
    * closed-form fixtures. Returns None when no codec recognizes the
    * payload.
    */
  def perceptualHash(id: Long, bytes: Array[Byte]): Option[PerceptualHash] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      val vs = for (gy <- 0 to 1; gx <- 0 to 3) yield {
        val px = gx * (w - 1) / 3
        val py = gy * (h - 1)
        (im.getRGB(px, py) >> 16) & 0xff
      }
      val sum = vs.sum
      val phash = vs.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (8L * v > sum) acc | (1L << i) else acc
      }
      PerceptualHash(id, decoded = true, w, h, phash)
    }
  }

  /** Partition-batched perceptual hashing with the undecodable fallback
    * (flagged, zero hash) — the near-dup front end of an image pipeline:
    * downstream grouping/banding on `phash` is plain relational work.
    */
  def extractPerceptualHash(spark: SparkSession, media: DataFrame): Dataset[PerceptualHash] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.map { row =>
          perceptualHash(row.doc_id, row.media)
            .getOrElse(PerceptualHash(row.doc_id, decoded = false, 0, 0, 0L))
        }
      }
  }

  final case class AudioFeatures(
      doc_id: Long,
      decoded: Boolean,
      n_samples: Int,
      sample_rate: Int,
      channels: Int,
      mean_abs_4: Long // floor(mean |sample| * 10000): exact cross-engine
  )

  /** Deterministic mono 16-bit PCM WAV for doc `id`: `400 + id%100`
    * samples at 8 kHz, sample i = `(id*31 + i*7) % 65536 - 32768` —
    * closed-form, so a SQL oracle can predict what a REAL container
    * parser + PCM decoder must read back.
    */
  def encodeTestWav(id: Long): Array[Byte] = {
    val n = (400 + id % 100).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(8000 * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31 + i * 7) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL audio decode via `javax.sound.sampled` (the WAV/AIFF/AU readers
    * the JDK itself ships): container parsing + PCM frame extraction from
    * the actual decoded stream. Mean |sample| is computed over 16-bit
    * signed little-endian frames and floor-scaled (×10000) with the
    * division done in double exactly as the oracle writes it. Returns
    * None when no installed reader recognizes the payload or the format
    * is not 16-bit PCM.
    */
  def decodeAudio(id: Long, bytes: Array[Byte]): Option[AudioFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val pcm16 = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16
        if (!pcm16) None
        else {
          val data = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = data.length / 2
          var sum = 0L
          var i = 0
          while (i < n) { sum += math.abs(bb.getShort(i * 2).toLong); i += 1 }
          val samplesPerChannel = n / fmt.getChannels
          val mean4 =
            if (n == 0) 0L else math.floor(sum.toDouble / n * 10000).toLong
          Some(AudioFeatures(id, decoded = true, samplesPerChannel,
            fmt.getSampleRate.toInt, fmt.getChannels, mean4))
        }
      } finally in.close()
    } catch {
      // UnsupportedAudioFileException on unrecognized payloads, plus the
      // same malformed-input RuntimeException caveat as image decode
      case scala.util.control.NonFatal(_) => None
    }

  final case class AudioFingerprint(
      doc_id: Long,
      decoded: Boolean,
      fp: Long // 16 sign-of-delta bits over the first 17 PCM samples
  )

  /** Shazam-lite audio fingerprint from the REAL decoded PCM stream: bit i
    * of `fp` is set iff the UNSIGNED value of sample `i·23` (first
    * channel) lands in the upper half of its mod-17 quantization bucket —
    * 16 strided quantization bits, the bucketing-signature shape audio
    * matchers use, as pure integer arithmetic a SQL oracle can replay
    * from the closed-form WAV fixtures. (Sign or delta bits would be
    * CONSTANT for these sawtooth fixtures — slope 7, small phase — and
    * hash every clip identically; the fine-grained residue varies with
    * both the clip and the position, so one mis-decoded frame flips a
    * bit.) Stride 23 spans 345 frames, inside every fixture's ≥ 400.
    * Returns None when the payload isn't 16-bit PCM or is shorter than
    * the sampled span.
    */
  def audioFingerprint(id: Long, bytes: Array[Byte]): Option[AudioFingerprint] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val pcm16 = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16
        if (!pcm16) None
        else {
          val step = fmt.getChannels // first channel of each frame
          val data = in.readNBytes((15 * 23 + 1) * 2 * step)
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = data.length / 2 / step
          if (n < 15 * 23 + 1) None
          else {
            var fp = 0L
            var i = 0
            while (i < 16) {
              if ((bb.getShort(i * 23 * step * 2) + 32768) % 17 > 8) fp |= 1L << i
              i += 1
            }
            Some(AudioFingerprint(id, decoded = true, fp))
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-batched audio fingerprinting with the undecodable fallback
    * (flagged, zero fp) — the near-dup front end for audio corpora;
    * downstream bucketing on `fp` is plain relational work.
    */
  def extractAudioFingerprints(spark: SparkSession, media: DataFrame): Dataset[AudioFingerprint] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.map { row =>
          audioFingerprint(row.doc_id, row.media)
            .getOrElse(AudioFingerprint(row.doc_id, decoded = false, 0L))
        }
      }
  }

  /** Partition-batched audio feature extraction with the stub fallback for
    * payloads no installed reader recognizes (flagged, zero dimensions) —
    * the audio counterpart of [[extractImageFeatures]].
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.map { row =>
          decodeAudio(row.doc_id, row.media).getOrElse {
            val stub = stubDecode(row.doc_id, row.media, frameSize = 16)
            AudioFeatures(row.doc_id, decoded = false, 0, 0, 0,
              math.floor(stub.mean_byte * 10000).toLong)
          }
        }
      }
  }

  final case class GifFrame(
      doc_id: Long,
      decoded: Boolean,
      frame_id: Int,
      width: Int,
      height: Int,
      mean_pixel_4: Long // floor(mean-gray-value * 10000): exact cross-engine
  )

  /** Deterministic multi-frame animated GIF for doc `id`: `id%3+2` frames
    * of `(id%5+2)×(id%4+2)` pixels, frame f pixel (x,y) =
    * `(id + 11·f + x + y) % 256` gray — closed-form, so a SQL oracle can
    * predict what a REAL multi-frame decoder must read back per frame.
    * Frames are written as palette-indexed rasters over an explicit
    * 256-gray `IndexColorModel`, so the GIF encode is exact by
    * construction (no quantizer in the loop) and full-size (the JDK
    * writer stores each sequence image as given — no inter-frame delta
    * optimization — so `read(i)` returns the complete raster). Each
    * frame's metadata pins `interlaceFlag=FALSE`: the writer's DEFAULT is
    * interlaced, and the JDK's interlace round trip scrambles/drops rows
    * on small rasters (measured: h=4 came back row-permuted with one row
    * zeroed) — progressive rendering is wrong for a data fixture anyway.
    */
  def encodeTestGif(id: Long): Array[Byte] = {
    val w = (id % 5 + 2).toInt
    val h = (id % 4 + 2).toInt
    val nFrames = (id % 3 + 2).toInt
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((id + 11 * f + x + y) % 256).toInt)
          x += 1
        }
        y += 1
      }
      val param = writer.getDefaultWriteParam
      val md = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), param)
      val fmt = md.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = root.getChildNodes
      var i = 0
      while (i < kids.getLength) {
        val node = kids.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        if (node.getNodeName == "ImageDescriptor")
          node.setAttribute("interlaceFlag", "FALSE")
        i += 1
      }
      md.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), param)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** REAL multi-frame decode via `javax.imageio`'s sequence API
    * (`ImageReader.getNumImages(true)` / `read(i)` — the same zero-new-
    * dependency JDK move that made image (q53) and audio (q56) decode
    * real): every stored frame of an animated GIF comes back as its own
    * raster, per-frame dimensions and floor-scaled mean pixel value (red
    * channel — identical to gray for the gray-palette fixtures) computed
    * from the actual decoded pixels. Returns None when no installed codec
    * recognizes the payload; the NonFatal net covers the malformed-but-
    * recognized RuntimeExceptions JDK codecs throw (same caveat as
    * [[decodeImage]]).
    */
  def decodeGifFrames(id: Long, bytes: Array[Byte]): Option[Seq[GifFrame]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            Some((0 until n).map { f =>
              val im = reader.read(f)
              val w = im.getWidth
              val h = im.getHeight
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sum += (im.getRGB(x, y) >> 16) & 0xff; x += 1 }
                y += 1
              }
              GifFrame(id, decoded = true, f, w, h,
                math.floor(sum.toDouble / (w * h) * 10000).toLong)
            })
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-batched multi-frame extraction with frame sampling (keep
    * every `stride`-th stored frame) and the undecodable fallback (one
    * flagged row carrying the stub's byte-derived mean, zero dimensions) —
    * upgrades [[sampleFrames]]'s byte-slicing to REAL per-frame decode
    * while keeping its explode-side shape: output is a flat frame table
    * joinable back on doc_id, payload column pruned unless consumed.
    */
  def extractGifFrames(
      spark: SparkSession, media: DataFrame, stride: Int = 2): Dataset[GifFrame] = {
    require(stride > 0, "stride must be positive")
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.flatMap { row =>
          decodeGifFrames(row.doc_id, row.media) match {
            case Some(frames) => frames.filter(_.frame_id % stride == 0)
            case None =>
              val stub = stubDecode(row.doc_id, row.media, frameSize = 16)
              Seq(GifFrame(row.doc_id, decoded = false, 0, 0, 0,
                math.floor(stub.mean_byte * 10000).toLong))
          }
        }
      }
  }

  /** Frame sampling: slice the media blob into fixed-size frames and keep
    * every `stride`-th one — (doc_id, frame_id, n_bytes, head_byte). This is
    * the explode side of a video pipeline as pure Catalyst (binary substr +
    * posexplode): at scale the payload column is pruned unless a downstream
    * operator actually consumes frame bytes, and the explode runs map-side
    * with no shuffle. A real decoder replaces the byte slicing, not the
    * plumbing.
    */
  def sampleFrames(media: DataFrame, frameSize: Int = 16, stride: Int = 2): DataFrame = {
    require(frameSize > 0 && stride > 0, "frameSize and stride must be positive")
    val nBytes = octet_length(col("media"))
    val frames = when(nBytes > 0,
      transform(sequence(lit(0), expr(s"(octet_length(media) - 1) div $frameSize")),
        i => col("media").substr(i * frameSize + 1, lit(frameSize))))
      .otherwise(array().cast("array<binary>"))
    media
      .select(col("doc_id"), posexplode(frames).as(Seq("frame_id", "frame")))
      .filter(col("frame_id") % stride === 0)
      .select(col("doc_id"), col("frame_id"),
        octet_length(col("frame")).as("n_bytes"),
        ascii(substring(decode(col("frame"), "utf-8"), 1, 1)).as("head_byte"))
  }

  /** Resize/downsample stage: every `factor`-th byte of each media blob —
    * the deterministic stand-in for an image/audio resample, as a codegen'd
    * per-row expression ([[graft.functions.ByteStride]]). Output schema
    * mirrors the input (`media` replaced, metadata updated), so resize
    * composes with [[sampleFrames]]/[[extractFeatures]] like a real codec
    * stage would.
    */
  def resizeMedia(media: DataFrame, factor: Int = 4): DataFrame =
    media
      .withColumn("media", graft.functions.GraftFunctions.byteStride(col("media"), factor))
      .withColumn("media_meta",
        struct(lit("application/octet-stream").as("mime"),
          octet_length(col("media")).as("size_bytes")))

  /** Partition-batched feature extraction over the media column. */
  def extractFeatures(spark: SparkSession, media: DataFrame, frameSize: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[MediaRow]
      .mapPartitions { batch =>
        // real pipeline: init codec/model once here, then stream the batch
        batch.map(row => stubDecode(row.doc_id, row.media, frameSize))
      }
  }
}
