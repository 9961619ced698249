package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column support: image/audio/video assets ride through the
  * engine as opaque `binary` columns plus a typed metadata struct.
  *
  * The container has no codec libraries, so asset bytes are derived
  * deterministically from the documents corpus (UTF-8 bytes of `text`)
  * and the "header parse" reads real bytes of that payload — the
  * DataFrame plumbing (binary columns, struct metadata, per-kind
  * dispatch, aggregation) is exactly what a production ingest does,
  * with the codec behind [[AssetPipeline.decode]] stubbed.
  *
  * Everything here is a narrow map + one group-agg: linear at 100 TB,
  * with the binary payload never shuffled except by explicit key.
  */
object Multimodal {

  /** documents → assets: binary payload + kind + parsed typed metadata.
    * Header fields are derived from the first payload bytes with plain
    * integer arithmetic so the DuckDB oracle can reproduce them. */
  def assets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val b1 = ascii(substring($"text", 1, 1))
    val b2 = ascii(substring($"text", 2, 1))
    Tables.documents(s, d)
      .select(
        $"doc_id".as("asset_id"),
        $"text".cast("binary").as("data"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
        length($"text".cast("binary")).cast("long").as("n_bytes"),
        b1.as("b1"), b2.as("b2"))
      .withColumn("meta", struct(
        when($"kind" === "image", (lit(64) * (pmod($"b1", lit(8)) + 1)).cast("long")).as("width"),
        when($"kind" === "image", (lit(64) * (pmod($"b2", lit(8)) + 1)).cast("long")).as("height"),
        when($"kind" === "audio", (lit(8000) * (pmod($"b1", lit(6)) + 1)).cast("long")).as("sample_rate"),
        when($"kind" === "video", (pmod($"b2", lit(240)) + 1).cast("long")).as("n_frames")))
      .drop("b1", "b2")
  }

  /** Per-kind asset inventory over the typed metadata. */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assets(s, d)
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum($"n_bytes").as("total_bytes"),
        sum($"meta.width" * $"meta.height").as("sum_pixels"),
        sum($"meta.sample_rate").as("sum_sample_rate"),
        sum($"meta.n_frames").as("sum_frames"))
  }

  /** Exact duplicate detection on the BINARY payload (md5 over bytes,
    * not text) — the multimodal twin of document dedup: re-crawled or
    * re-encoded-identical assets collapse before any decode work is
    * spent on them. One hash-partitioned groupBy, linear at 100 TB. */
  def qAssetDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assets(s, d)
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_assets"),
        countDistinct(md5($"data")).as("n_unique"),
        countDistinct($"n_bytes").as("n_sizes"))
  }

  /** Deterministic slice for [[qImageDecode]] (bounded codec work). */
  private val ImgMod = 7

  /** REAL IMAGE DECODE, oracle-proven — the one multimodal query that
    * exercises an ACTUAL codec in the distributed path (javax.imageio
    * PNG, not the stub): each sliced doc becomes a deterministic
    * grayscale PNG (closed-form pattern pixels), the engine ENCODES
    * then DECODES the real bytes per partition and aggregates decoded
    * width/height/luminance-sum per source. PNG is lossless, so the
    * DuckDB oracle reproduces the aggregate from the CLOSED FORM alone
    * — a hash match proves decode(encode(px)) == px for every image,
    * through real libpng-class bytes, across every partition. Scale
    * shape: codec work is per-row narrow map (mapPartitions — the
    * legitimate imperative island), one group-agg after; payload bytes
    * never shuffle. */
  def qImageDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val decoded = Tables.documents(s, d)
      .filter($"doc_id" % ImgMod === 0)
      .select($"doc_id", $"source").as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        val w = 16 + (id % 8).toInt * 8
        val h = 16 + (id % 5).toInt * 8
        val png = AssetPipeline.encodePng(
          w, h, AssetPipeline.patternPixels(w, h, id))
        val (dw, dh, px) = AssetPipeline.decodeImage(png).get
        var luma = 0L
        px.foreach(b => luma += (b & 0xff))
        (src, dw.toLong, dh.toLong, luma)
      }).toDF("source", "w", "h", "luma")
    decoded.groupBy($"source")
      .agg(count(lit(1)).as("n_images"), sum($"w").as("sum_width"),
        sum($"h").as("sum_height"), sum($"luma").as("sum_luma"))
  }

  private val RszMod = 12

  /** IMAGE RESIZE in the distributed path — the first multimodal
    * TRANSFORM (the codec queries prove decode; this proves
    * decode → pixel-op → re-encode): each sliced doc's deterministic
    * PNG is decoded, nearest-neighbor 2× downsampled (even-coordinate
    * picks — the exactly-reproducible resize kernel; bilinear would
    * put floats between the engines), re-encoded to a REAL PNG and
    * decoded again (the transform output stays a valid asset —
    * asserted per row), then reported as resized dims + luma with a
    * per-image placement checksum. PNG is lossless, so the oracle
    * reproduces every resized image's luma from the pattern's CLOSED
    * FORM at even coordinates — a hash match proves the whole
    * decode/resize/encode chain per image per partition. Scale shape:
    * per-row narrow mapPartitions + one source-sized agg; pixels never
    * shuffle. */
  def qImageResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val resized = Tables.documents(s, d)
      .filter($"doc_id" % RszMod === 3)
      .select($"doc_id", $"source").as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        val w = 16 + (id % 8).toInt * 8
        val h = 16 + (id % 5).toInt * 8
        val png = AssetPipeline.encodePng(
          w, h, AssetPipeline.patternPixels(w, h, id))
        val (dw, dh, px) = AssetPipeline.decodeImage(png).get
        val rw = dw / 2; val rh = dh / 2
        val rpx = Array.tabulate(rw * rh) { j =>
          val x = (j % rw) * 2; val y = (j / rw) * 2
          px(y * dw + x)
        }
        val (w2, h2, px2) =
          AssetPipeline.decodeImage(AssetPipeline.encodePng(rw, rh, rpx)).get
        require(w2 == rw && h2 == rh && java.util.Arrays.equals(px2, rpx),
          s"resize round-trip broke for doc $id")
        var luma = 0L
        px2.foreach(b => luma += (b & 0xff))
        (id, src, rw.toLong, rh.toLong, luma)
      }).toDF("doc_id", "source", "rw", "rh", "luma")
    resized.groupBy($"source")
      .agg(count(lit(1)).as("n_images"),
        sum($"rw").as("sum_rwidth"),
        sum($"rh").as("sum_rheight"),
        sum($"luma").as("sum_luma"),
        expr("bit_xor(doc_id ^ (luma * 1000003))").as("resize_checksum"))
  }

  private val AudMod = 5

  /** REAL AUDIO DECODE in the distributed path — the WAV twin of
    * [[qImageDecode]]: every selected doc synthesizes a deterministic
    * 8-bit mono PCM clip, encodes it to RIFF bytes and RIFF-walks it
    * back ([[AssetPipeline.encodeWav]]/[[AssetPipeline.decodeWav]] —
    * the real parser, per partition, per row), then reports integer
    * DC and energy (Σs, Σs²) per source. The oracle computes the
    * closed form of the SAME samples directly, so the hash match
    * proves the lossless container round-trip for every clip on every
    * partition. One narrow mapPartitions + one source-sized agg. */
  def qAudioEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val decoded = Tables.documents(s, d)
      .filter($"doc_id" % AudMod === 1)
      .select($"doc_id", $"source").as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        val n = 128 + (id % 4).toInt * 64
        val rate = 8000 * ((id % 3).toInt + 1)
        val samples = Array.tabulate(n)(i => ((id * 31 + i * 7) % 251).toByte)
        val (dRate, ch, dSamples) =
          AssetPipeline.decodeWav(AssetPipeline.encodeWav(rate, samples)).get
        require(ch == 1 && dRate == rate && dSamples.length == n)
        var dc = 0L; var energy = 0L
        dSamples.foreach { b =>
          val v = (b & 0xff).toLong; dc += v; energy += v * v
        }
        (id, src, dRate.toLong, n.toLong, dc, energy)
      }).toDF("doc_id", "source", "rate", "n_samples", "dc", "energy")
    decoded.groupBy($"source")
      .agg(count(lit(1)).as("n_clips"),
        sum($"rate").as("sum_rate"),
        sum($"n_samples").as("sum_samples"),
        sum($"dc").as("sum_dc"),
        sum($"energy").as("sum_energy"),
        expr("bit_xor(doc_id ^ energy)").as("energy_checksum"))
  }

  private val VidMod = 16

  /** REAL VIDEO-CONTAINER DECODE in the distributed path — the
    * multi-frame twin of [[qImageDecode]]/[[qAudioEnergy]]: each
    * selected doc synthesizes a deterministic 2–4-frame grayscale
    * animation, encodes it as an animated GIF (ImageIO sequence
    * writer) and decodes EVERY frame back (sequence reader), then
    * reports per-source frame and luma mass. The closed-form oracle
    * recomputes the same pixels, so the hash match proves the
    * lossless multi-frame round-trip per clip per partition. */
  def qVideoFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val decoded = Tables.documents(s, d)
      .filter($"doc_id" % VidMod === 2)
      .select($"doc_id", $"source").as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        val (w, h) = (8, 8)
        val nf = 2 + (id % 3).toInt
        val frames = (0 until nf).map(f =>
          Array.tabulate(w * h)(i => ((id * 17 + f * 31 + i * 7) % 256).toByte))
        val gif = AssetPipeline.encodeGif(w, h, frames)
        val back = AssetPipeline.decodeGifFrames(gif).get
        require(back.length == nf)
        var luma = 0L
        back.foreach { case (bw, bh, px) =>
          require(bw == w && bh == h)
          px.foreach(b => luma += (b & 0xff))
        }
        (id, src, nf.toLong, luma)
      }).toDF("doc_id", "source", "n_frames", "luma")
    decoded.groupBy($"source")
      .agg(count(lit(1)).as("n_videos"),
        sum($"n_frames").as("sum_frames"),
        sum($"luma").as("sum_luma"),
        expr("bit_xor(doc_id ^ luma)").as("luma_checksum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_asset_dedup" -> (qAssetDedup _),
    "q_image_decode" -> (qImageDecode _),
    "q_image_resize" -> (qImageResize _),
    "q_audio_energy" -> (qAudioEnergy _),
    "q_video_frames" -> (qVideoFrames _)
  )

  val oracle: Map[String, String] = Map(
    "q_video_frames" ->
      s"""WITH d AS (SELECT doc_id, source, 2 + (doc_id % 3) AS nf
         |  FROM documents WHERE doc_id % $VidMod = 2),
         |l AS (SELECT doc_id, source, nf, luma FROM d CROSS JOIN LATERAL
         |  (SELECT CAST(SUM((doc_id * 17 + f * 31 + i * 7) % 256) AS BIGINT)
         |     AS luma
         |   FROM (SELECT unnest(generate_series(0, nf - 1)) AS f),
         |        (SELECT unnest(generate_series(0, 63)) AS i)) t)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_videos,
         |CAST(SUM(nf) AS BIGINT) AS sum_frames,
         |CAST(SUM(luma) AS BIGINT) AS sum_luma,
         |bit_xor(xor(doc_id, luma)) AS luma_checksum
         |FROM l GROUP BY 1""".stripMargin,
    "q_audio_energy" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  128 + (doc_id % 4) * 64 AS n,
         |  8000 * ((doc_id % 3) + 1) AS rate
         |  FROM documents WHERE doc_id % $AudMod = 1),
         |l AS (SELECT doc_id, source, rate, n, dc, energy
         |  FROM d CROSS JOIN LATERAL
         |  (SELECT CAST(SUM((doc_id * 31 + i * 7) % 251) AS BIGINT) AS dc,
         |     CAST(SUM(((doc_id * 31 + i * 7) % 251)
         |       * ((doc_id * 31 + i * 7) % 251)) AS BIGINT) AS energy
         |   FROM (SELECT unnest(generate_series(0, n - 1)) AS i)) t)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_clips,
         |CAST(SUM(rate) AS BIGINT) AS sum_rate,
         |CAST(SUM(n) AS BIGINT) AS sum_samples,
         |CAST(SUM(dc) AS BIGINT) AS sum_dc,
         |CAST(SUM(energy) AS BIGINT) AS sum_energy,
         |bit_xor(xor(doc_id, energy)) AS energy_checksum
         |FROM l GROUP BY 1""".stripMargin,
    "q_image_resize" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  16 + (doc_id % 8) * 8 AS w, 16 + (doc_id % 5) * 8 AS h
         |  FROM documents WHERE doc_id % $RszMod = 3),
         |l AS (SELECT doc_id, source, w // 2 AS rw, h // 2 AS rh, luma
         |  FROM d CROSS JOIN LATERAL
         |  (SELECT CAST(SUM(((2 * y * w + 2 * x) * 31 + doc_id * 17
         |     + 2 * y * 7) % 256) AS BIGINT) AS luma
         |   FROM (SELECT unnest(generate_series(0, w // 2 - 1)) AS x),
         |        (SELECT unnest(generate_series(0, h // 2 - 1)) AS y)) t)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_images,
         |  CAST(SUM(rw) AS BIGINT) AS sum_rwidth,
         |  CAST(SUM(rh) AS BIGINT) AS sum_rheight,
         |  CAST(SUM(luma) AS BIGINT) AS sum_luma,
         |  bit_xor(xor(doc_id, luma * 1000003)) AS resize_checksum
         |FROM l GROUP BY 1""".stripMargin,
    "q_image_decode" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  16 + (doc_id % 8) * 8 AS w, 16 + (doc_id % 5) * 8 AS h
         |  FROM documents WHERE doc_id % $ImgMod = 0),
         |l AS (SELECT source, w, h, luma FROM d CROSS JOIN LATERAL
         |  (SELECT CAST(SUM((i * 31 + doc_id * 17 + (i // w) * 7) % 256)
         |     AS BIGINT) AS luma
         |   FROM (SELECT unnest(generate_series(0, w * h - 1)) AS i)) t)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_images,
         |  CAST(SUM(w) AS BIGINT) AS sum_width,
         |  CAST(SUM(h) AS BIGINT) AS sum_height,
         |  CAST(SUM(luma) AS BIGINT) AS sum_luma
         |FROM l GROUP BY 1""".stripMargin,
    "q_asset_dedup" ->
      """WITH a AS (
        |  SELECT ['image','audio','video'][(doc_id % 3) + 1] AS kind,
        |  md5(text) AS h, -- same bytes: the payload IS encode(text)
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT kind, COUNT(*) AS n_assets,
        |COUNT(DISTINCT h) AS n_unique,
        |COUNT(DISTINCT n_bytes) AS n_sizes
        |FROM a GROUP BY kind""".stripMargin,
    "q_multimodal_meta" ->
      """WITH a AS (
        |  SELECT doc_id,
        |  ['image','audio','video'][(doc_id % 3) + 1] AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  ascii(substr(text,1,1)) AS b1, ascii(substr(text,2,1)) AS b2
        |  FROM documents),
        |m AS (
        |  SELECT kind, n_bytes,
        |  CASE WHEN kind = 'image' THEN CAST(64 * ((b1 % 8) + 1) AS BIGINT) END AS width,
        |  CASE WHEN kind = 'image' THEN CAST(64 * ((b2 % 8) + 1) AS BIGINT) END AS height,
        |  CASE WHEN kind = 'audio' THEN CAST(8000 * ((b1 % 6) + 1) AS BIGINT) END AS sample_rate,
        |  CASE WHEN kind = 'video' THEN CAST((b2 % 240) + 1 AS BIGINT) END AS n_frames
        |  FROM a)
        |SELECT kind, COUNT(*) AS n_assets,
        |CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |CAST(SUM(width * height) AS BIGINT) AS sum_pixels,
        |CAST(SUM(sample_rate) AS BIGINT) AS sum_sample_rate,
        |CAST(SUM(n_frames) AS BIGINT) AS sum_frames
        |FROM m GROUP BY kind""".stripMargin
  )
}
