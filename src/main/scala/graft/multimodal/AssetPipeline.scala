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
  * The codec itself is STUBBED (no image/audio libraries in this
  * container): [[decode]] produces deterministic fake pixels from the
  * payload bytes. Everything around it — the typed Dataset API, the
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

  /** STUB codec: deterministic fake decode. A real deployment swaps in
    * an image/video library here; the signature and batch shape stay. */
  def decode(a: Asset, frameIdx: Int): Frame = {
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
