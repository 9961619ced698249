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
  * IMAGE decode is REAL: [[decodeImage]] parses the binary payload
  * with `javax.imageio` (PNG/JPEG/BMP/GIF readers ship in every JDK —
  * no extra jars), and [[pngAssets]] produces a corpus of genuine PNG
  * payloads to drive it. Video/audio codecs genuinely are not in this
  * container, so those kinds (and non-image synthetic payloads) fall
  * back to [[fakeFrame]], a deterministic stand-in with the same
  * shape. Everything around the codec — the typed Dataset API, the
  * per-partition batch loop (the Scala analogue of `mapInPandas`
  * batches), stride-based resize, evenly-spaced frame sampling — is
  * the real distributed shape: narrow transformations, payload read
  * once per partition, no driver collection.
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

  /** Deterministic fake pixels from the payload bytes — the stand-in
    * for codecs not present in this container (video/audio) and for
    * synthetic non-image payloads. */
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

  /** Codec dispatch: images decode for REAL (falling back to the stub
    * only if the payload isn't a parseable image); video/audio stay
    * stubbed — those codecs aren't in the container. */
  def decode(a: Asset, frameIdx: Int): Frame =
    if (a.kind == "image")
      decodeImage(a.data) match {
        case Some((w, h, px)) => Frame(a.assetId, frameIdx, w, h, px)
        case None => fakeFrame(a, frameIdx)
      }
    else fakeFrame(a, frameIdx)

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

  /** Fixed-length audio windows: segment an audio asset's payload into
    * windowMs-sized sample blocks at its metadata sample rate — the
    * audio analogue of frame sampling, batched per partition. The
    * "samples" come from the stub codec; a real decoder swaps in
    * behind the same shape. */
  def audioWindows(assets: Dataset[Asset], windowMs: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { a =>
        val rate = a.meta.sampleRate.getOrElse(8000L).toInt
        val perWindow = math.max(rate * windowMs / 1000, 1)
        val n = a.data.length
        val nWindows = math.max(n / perWindow, 1)
        (0 until math.min(nWindows, 16)).map { w =>
          val px = new Array[Byte](perWindow)
          var i = 0
          while (i < perWindow) {
            px(i) = if (n == 0) 0 else a.data((w * perWindow + i) % n)
            i += 1
          }
          Frame(a.assetId, w, perWindow, 1, px)
        }
      }
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
