package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed asset record: opaque payload + kind-specific metadata. */
case class AssetMeta(width: Option[Long], height: Option[Long],
                     sampleRate: Option[Long], nFrames: Option[Long])
case class Asset(assetId: Long, kind: String, data: Array[Byte], meta: AssetMeta)

/** Decoded frame: row-major grayscale bytes. */
case class Frame(assetId: Long, frameIdx: Int, width: Int, height: Int,
                 pixels: Array[Byte])

/** Decode / resize / frame-sample plumbing for multimodal assets.
  *
  * Codecs are REAL wherever the JDK carries one, for every modality:
  *  - IMAGE: [[decodeImage]] parses payloads with `javax.imageio`
  *    (PNG/JPEG/BMP/GIF readers ship in every JDK);
  *  - VIDEO: [[decodeGifFrames]] reads every frame of an animated GIF
  *    through the ImageIO sequence API — a genuine multi-frame
  *    container parse (frame count from the payload, not metadata);
  *  - AUDIO: [[decodeWav]] parses RIFF/WAVE PCM (8/16-bit, any
  *    channel count) with a hand-rolled chunk walk — WAV is a spec'd
  *    byte layout, no codec library needed.
  * Payloads some OTHER codec produced (mp4/mp3…, and the synthetic
  * non-media payloads in the test corpus) fall back to [[fakeFrame]],
  * a deterministic stand-in with the same shape — the dispatch point
  * where a production ffmpeg JNI binding would slot in. Everything
  * around the codecs — the typed Dataset API, the per-partition batch
  * loop (the Scala analogue of `mapInPandas` batches), stride-based
  * resize, evenly-spaced frame sampling — is the real distributed
  * shape: narrow transformations, payload read once per partition, no
  * driver collection.
  */
object AssetPipeline {

  /** Documents-derived typed asset Dataset. */
  def ingest(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Multimodal.assets(s, d)
      .select($"asset_id", $"kind", $"data",
        $"meta.width", $"meta.height", $"meta.sample_rate".as("sampleRate"),
        $"meta.n_frames".as("nFrames"))
      .withColumnRenamed("asset_id", "assetId")
      .as[(Long, String, Array[Byte], Option[Long], Option[Long], Option[Long], Option[Long])]
      .map { case (id, kind, data, w, h, sr, nf) =>
        Asset(id, kind, data, AssetMeta(w, h, sr, nf)) }
  }

  /** Deterministic grayscale test pattern (value = mix of position and
    * seed) — the pixel source for [[pngAssets]] fixtures. */
  def patternPixels(w: Int, h: Int, seed: Long): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = ((i * 31 + seed * 17 + (i / w) * 7) & 0xff).toByte
      i += 1
    }
    px
  }

  /** Encode row-major grayscale bytes as a real PNG via the JDK's
    * ImageIO — used by the fixture generator AND usable as a write-side
    * re-encoder. PNG is lossless, so decode(encode(px)) == px. */
  def encodePng(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode via javax.imageio: returns (width, height,
    * row-major grayscale bytes), or None when the payload is not a
    * decodable image (then callers fall back to the stub). Grayscale
    * sources are read raster-direct (bit-exact round trip); color
    * sources are luminance-converted. */
  def decodeImage(data: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val gray =
          if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
          else {
            val g = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val gg = g.createGraphics()
            gg.drawImage(img, 0, 0, null)
            gg.dispose()
            g
          }
        val px = new Array[Byte](w * h)
        gray.getRaster.getDataElements(0, 0, w, h, px)
        Some((w, h, px))
      }
    } catch {
      // ImageIO readers throw RuntimeExceptions (IndexOutOfBounds,
      // NegativeArraySize, …) on truncated/malformed payloads, not just
      // IOException — any decode failure must fall back, never kill the
      // task (one corrupt asset in a 100 TB scan is routine).
      case scala.util.control.NonFatal(_) => None
    }

  /** REAL audio decode: RIFF/WAVE PCM chunk walk. Returns
    * (sampleRate, channels, samples as unsigned bytes — 16-bit input
    * is mapped via its high byte, offset to unsigned), or None if the
    * payload is not PCM WAV. Spec'd little-endian byte layout, so no
    * codec library is involved; 8-bit mono round-trips bit-exactly
    * through [[encodeWav]]. */
  def decodeWav(data: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u16(o: Int) = (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8)
    def u32(o: Int) = (data(o) & 0xff).toLong | ((data(o + 1) & 0xff).toLong << 8) |
      ((data(o + 2) & 0xff).toLong << 16) | ((data(o + 3) & 0xff).toLong << 24)
    def tag(o: Int) = new String(data, o, 4, "US-ASCII")
    if (data.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var (o, fmt, dat) = (12, -1, -1)
    while (o + 8 <= data.length && (fmt < 0 || dat < 0)) {
      val (t, len) = (tag(o), u32(o + 4).toInt)
      if (t == "fmt ") fmt = o + 8 else if (t == "data") dat = o
      o += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmt < 0 || dat < 0 || u16(fmt) != 1) return None // PCM only
    val (channels, rate, bits) = (u16(fmt + 2), u32(fmt + 4).toInt, u16(fmt + 14))
    if (bits != 8 && bits != 16) return None
    val n = math.min(u32(dat + 4).toInt, data.length - dat - 8)
    val samples =
      if (bits == 8) java.util.Arrays.copyOfRange(data, dat + 8, dat + 8 + n)
      else Array.tabulate(n / 2) { i =>
        ((data(dat + 8 + 2 * i + 1) + 128) & 0xff).toByte // high byte, signed→unsigned
      }
    Some((rate, channels, samples))
  }

  /** 8-bit mono PCM WAV encoder (fixture generator + write-side
    * re-encoder; lossless, so decode(encode(x)) == x). */
  def encodeWav(rate: Int, samples: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    def le32(v: Int): Unit = { o.write(v); o.write(v >> 8); o.write(v >> 16); o.write(v >> 24) }
    def le16(v: Int): Unit = { o.write(v); o.write(v >> 8) }
    o.writeBytes("RIFF"); le32(36 + samples.length); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16); le16(1); le16(1) // PCM, mono
    le32(rate); le32(rate); le16(1); le16(8)         // byteRate, align, 8-bit
    o.writeBytes("data"); le32(samples.length); o.write(samples)
    bos.toByteArray
  }

  /** REAL video-container decode: every frame of an animated GIF via
    * the ImageIO sequence reader, luminance-converted like
    * [[decodeImage]]. Returns None when the payload isn't GIF. */
  def decodeGifFrames(data: Array[Byte]): Option[IndexedSeq[(Int, Int, Array[Byte])]] =
    try {
      if (data.length < 6 || new String(data, 0, 3, "US-ASCII") != "GIF") return None
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        Some((0 until n).map { i =>
          val img = reader.read(i)
          val (w, h) = (img.getWidth, img.getHeight)
          val g = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val gg = g.createGraphics()
          gg.drawImage(img, 0, 0, null)
          gg.dispose()
          val px = new Array[Byte](w * h)
          g.getRaster.getDataElements(0, 0, w, h, px)
          (w, h, px)
        })
      } finally { reader.dispose(); iis.close() }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Multi-frame grayscale GIF encoder via the ImageIO sequence writer
    * (fixture generator for the video path). */
  def encodeGif(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.setDataElements(0, 0, w, h, px)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic fake pixels from the payload bytes — the stand-in
    * for codecs the JDK does not carry (mp4/mp3/…) and for
    * synthetic non-media payloads. */
  def fakeFrame(a: Asset, frameIdx: Int): Frame = {
    val w = a.meta.width.getOrElse(64L).toInt
    val h = a.meta.height.getOrElse(64L).toInt
    val px = new Array[Byte](w * h)
    val n = a.data.length
    var i = 0
    while (i < px.length) {
      val b = if (n == 0) 0 else a.data(i % n) & 0xff
      px(i) = ((b + 31 * frameIdx + i / w) & 0xff).toByte
      i += 1
    }
    Frame(a.assetId, frameIdx, w, h, px)
  }

  /** Codec dispatch, real-first for every modality: images through
    * ImageIO, video through the GIF sequence reader (frameIdx selects
    * the decoded frame), audio through the WAV parser (the sample
    * block as a 1-row frame). Only payloads no JDK codec can parse
    * fall back to the deterministic stub. */
  def decode(a: Asset, frameIdx: Int): Frame = a.kind match {
    case "image" =>
      decodeImage(a.data) match {
        case Some((w, h, px)) => Frame(a.assetId, frameIdx, w, h, px)
        case None => fakeFrame(a, frameIdx)
      }
    case "video" =>
      decodeGifFrames(a.data) match {
        case Some(fs) if fs.nonEmpty =>
          val (w, h, px) = fs(math.min(frameIdx, fs.length - 1))
          Frame(a.assetId, frameIdx, w, h, px)
        case _ => fakeFrame(a, frameIdx)
      }
    case "audio" =>
      decodeWav(a.data) match {
        case Some((_, _, samples)) if samples.nonEmpty =>
          Frame(a.assetId, frameIdx, samples.length, 1, samples)
        case _ => fakeFrame(a, frameIdx)
      }
    case _ => fakeFrame(a, frameIdx)
  }

  /** A corpus of REAL PNG assets, one per document id: deterministic
    * pattern pixels encoded to PNG bytes on the executors (the encode
    * is a narrow map — the binary column is born distributed, exactly
    * like a production crawl ingest). */
  def pngAssets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    graft.Tables.documents(s, d).select($"doc_id").as[Long].map { id =>
      val w = 16 + (id % 8).toInt * 8
      val h = 16 + (id % 5).toInt * 8
      val data = encodePng(w, h, patternPixels(w, h, id))
      Asset(id, "image", data, AssetMeta(Some(w.toLong), Some(h.toLong), None, None))
    }
  }

  /** Decode every image asset (real codec), batched per partition. */
  def decodeImages(assets: Dataset[Asset]): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map(decode(_, 0))
    }
  }

  /** Evenly-spaced frame indices (video frame sampling). */
  def frameIndices(nFrames: Long, k: Int): Seq[Int] = {
    val n = nFrames.max(1)
    if (n <= k) (0 until n.toInt)
    else (0 until k).map(i => ((i * n) / k).toInt)
  }

  /** Decode + sample k frames per video asset, batched per partition —
    * the Scala twin of a `mapInPandas` decode UDF. */
  def sampleFrames(assets: Dataset[Asset], k: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { a =>
        frameIndices(a.meta.nFrames.getOrElse(1L), k).map(decode(a, _))
      }
    }
  }

  /** Fixed-length audio windows: segment each audio asset into
    * windowMs-sized sample blocks — the audio analogue of frame
    * sampling, batched per partition. PCM WAV payloads are REALLY
    * decoded (rate and samples from the RIFF chunks, not metadata);
    * anything else windows the raw payload at the metadata rate, the
    * stub shape a production codec binding would replace. */
  def audioWindows(assets: Dataset[Asset], windowMs: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { a =>
        val (rate, samples) = decodeWav(a.data) match {
          case Some((r, _, sm)) if sm.nonEmpty => (r, sm)
          case _ => (a.meta.sampleRate.getOrElse(8000L).toInt, a.data)
        }
        val perWindow = math.max(rate * windowMs / 1000, 1)
        val n = samples.length
        val nWindows = math.max(n / perWindow, 1)
        (0 until math.min(nWindows, 16)).map { w =>
          val px = new Array[Byte](perWindow)
          var i = 0
          while (i < perWindow) {
            px(i) = if (n == 0) 0 else samples((w * perWindow + i) % n)
            i += 1
          }
          Frame(a.assetId, w, perWindow, 1, px)
        }
      }
    }
  }

  /** A corpus of REAL animated-GIF video assets (one per document id,
    * 2–5 pattern frames each) — drives [[sampleFrames]] through the
    * genuine container parse; encode is a narrow executor-side map. */
  def gifAssets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    graft.Tables.documents(s, d).select($"doc_id").as[Long].map { id =>
      val w = 16 + (id % 4).toInt * 8
      val h = 16 + (id % 3).toInt * 8
      val nf = 2 + (id % 4).toInt
      val data = encodeGif(w, h,
        (0 until nf).map(f => patternPixels(w, h, id * 7 + f)))
      Asset(id, "video", data,
        AssetMeta(Some(w.toLong), Some(h.toLong), None, Some(nf.toLong)))
    }
  }

  /** A corpus of REAL PCM WAV audio assets (one per document id) —
    * drives [[audioWindows]] through the genuine RIFF parse. */
  def wavAssets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    graft.Tables.documents(s, d).select($"doc_id").as[Long].map { id =>
      val rate = 8000
      val n = rate / 2 + (id % 1000).toInt // ~0.5 s of samples
      val samples = patternPixels(n, 1, id * 13)
      Asset(id, "audio", encodeWav(rate, samples),
        AssetMeta(None, None, Some(rate.toLong), None))
    }
  }

  /** Nearest-neighbour stride resize (pure array math — runs identically
    * on real decoded pixels). */
  def resize(f: Frame, ow: Int, oh: Int): Frame = {
    val out = new Array[Byte](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * f.height / oh).toInt
      var x = 0
      while (x < ow) {
        out(y * ow + x) = f.pixels(sy * f.width + (x.toLong * f.width / ow).toInt)
        x += 1
      }
      y += 1
    }
    Frame(f.assetId, f.frameIdx, ow, oh, out)
  }

  /** Per-frame brightness features: (assetId, frameIdx, mean, min, max). */
  def frameFeatures(frames: Dataset[Frame]): Dataset[(Long, Int, Double, Int, Int)] = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      var sum = 0L; var mn = 255; var mx = 0
      var i = 0
      while (i < f.pixels.length) {
        val v = f.pixels(i) & 0xff
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        i += 1
      }
      (f.assetId, f.frameIdx, sum.toDouble / f.pixels.length.max(1), mn, mx)
    }
  }
}
