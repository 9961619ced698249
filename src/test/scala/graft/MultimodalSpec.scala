package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Asset, AssetMeta, AssetPipeline, Frame, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("asset ingest preserves every document with a typed kind") {
    val a = AssetPipeline.ingest(spark, sf).cache()
    assert(a.count() === 500)
    val kinds = a.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    // payload round-trips: bytes are the document text
    assert(a.head().data.length > 0)
  }

  test("video frame sampling emits evenly spaced frames, k max") {
    import spark.implicits._
    assert(AssetPipeline.frameIndices(2, 4) === Seq(0, 1))
    assert(AssetPipeline.frameIndices(240, 4) === Seq(0, 60, 120, 180))
    val frames = AssetPipeline.sampleFrames(AssetPipeline.ingest(spark, sf), 3)
    val perAsset = frames.groupByKey(_.assetId).count().collect()
    assert(perAsset.nonEmpty && perAsset.forall(_._2 <= 3))
  }

  test("decode and audio windowing survive empty payloads") {
    val empty = Asset(1L, "video", Array.emptyByteArray,
      AssetMeta(Some(64L), Some(64L), None, Some(4L)))
    val f = AssetPipeline.decode(empty, 0)
    assert(f.pixels.length === 64 * 64)
    import spark.implicits._
    val ds = Seq(empty.copy(kind = "audio",
      meta = AssetMeta(None, None, Some(8000L), None))).toDS()
    assert(AssetPipeline.audioWindows(ds, 2).collect().nonEmpty)
  }

  test("decode is deterministic and resize preserves value range") {
    val a = Asset(7L, "video", "hello world".getBytes,
      AssetMeta(None, None, None, Some(10L)))
    val f1 = AssetPipeline.decode(a, 2)
    val f2 = AssetPipeline.decode(a, 2)
    assert(f1.pixels.toSeq === f2.pixels.toSeq)
    val r = AssetPipeline.resize(f1, 16, 16)
    assert(r.width === 16 && r.height === 16 && r.pixels.length === 256)
    assert(r.pixels.toSet.subsetOf(f1.pixels.toSet))
  }

  test("audio windowing yields fixed-size sample blocks per asset") {
    import spark.implicits._
    val wins = AssetPipeline.audioWindows(AssetPipeline.ingest(spark, sf), 2)
    val rows = wins.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.assetId).foreach { case (_, fs) =>
      assert(fs.map(_.width).distinct.length === 1) // same rate → same block size
      assert(fs.forall(f => f.pixels.length === f.width))
    }
  }

  test("frame features are bounded brightness stats") {
    val frames = AssetPipeline.sampleFrames(AssetPipeline.ingest(spark, sf), 2)
    val feats = AssetPipeline.frameFeatures(frames).collect()
    assert(feats.nonEmpty)
    feats.foreach { case (_, _, mean, mn, mx) =>
      assert(mn >= 0 && mx <= 255 && mean >= mn && mean <= mx)
    }
  }

  test("PNG encode/decode round-trips pixels bit-exactly (real ImageIO codec)") {
    val (w, h) = (40, 24)
    val px = AssetPipeline.patternPixels(w, h, seed = 42L)
    val png = AssetPipeline.encodePng(w, h, px)
    // a real PNG container, not our bytes echoed back
    assert(png.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val Some((dw, dh, dpx)) = AssetPipeline.decodeImage(png)
    assert((dw, dh) === (w, h))
    assert(dpx.toSeq === px.toSeq)
  }

  test("distributed PNG corpus decodes to the exact generated pixels") {
    import spark.implicits._
    val assets = AssetPipeline.pngAssets(spark, sf)
    val frames = AssetPipeline.decodeImages(assets).cache()
    assert(frames.count() === 500)
    // decoded dimensions match the metadata carried on the asset
    val dims = assets.map(a => (a.assetId, a.meta.width.get, a.meta.height.get))
      .toDF("assetId", "mw", "mh")
    val joined = frames.toDF().join(dims, "assetId")
    assert(joined.filter(org.apache.spark.sql.functions.expr(
      "width <> mw OR height <> mh")).count() === 0)
    // pixel-exact round trip through encode → binary column → decode
    val bad = frames.filter { f =>
      f.pixels.toSeq != AssetPipeline
        .patternPixels(f.width, f.height, f.assetId).toSeq
    }.count()
    assert(bad === 0L)
    // and real decoded frames flow through the downstream kernels
    val r = AssetPipeline.resize(frames.head(), 8, 8)
    assert(r.pixels.length === 64)
    frames.unpersist()
  }

  test("WAV encode/decode round-trips samples bit-exactly (real RIFF parse)") {
    val samples = AssetPipeline.patternPixels(1000, 1, 42L)
    val wav = AssetPipeline.encodeWav(8000, samples)
    val Some((rate, channels, back)) = AssetPipeline.decodeWav(wav)
    assert(rate === 8000 && channels === 1)
    assert(back.toSeq === samples.toSeq)
    assert(AssetPipeline.decodeWav("RIFFnope".getBytes).isEmpty)
    assert(AssetPipeline.decodeWav(Array.emptyByteArray).isEmpty)
  }

  test("16-bit PCM WAV decodes via its high bytes") {
    // hand-rolled 16-bit mono WAV: 4 samples, little-endian
    val vals = Seq[Short](0, 256, -256, 32512) // high bytes 0, 1, -1, 127
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    def le32(v: Int): Unit = { o.write(v); o.write(v >> 8); o.write(v >> 16); o.write(v >> 24) }
    def le16(v: Int): Unit = { o.write(v); o.write(v >> 8) }
    o.writeBytes("RIFF"); le32(36 + 8); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16); le16(1); le16(1)
    le32(16000); le32(32000); le16(2); le16(16)
    o.writeBytes("data"); le32(8); vals.foreach(v => le16(v & 0xffff))
    val Some((rate, _, back)) = AssetPipeline.decodeWav(bos.toByteArray)
    assert(rate === 16000)
    assert(back.map(_ & 0xff).toSeq === Seq(128, 129, 127, 255))
  }

  test("animated GIF corpus decodes every frame via the real container parse") {
    import spark.implicits._
    val assets = AssetPipeline.gifAssets(spark, sf).cache()
    // frame COUNT comes from the payload, and must match the metadata
    val badCounts = assets.filter { a =>
      AssetPipeline.decodeGifFrames(a.data)
        .map(_.length.toLong) != a.meta.nFrames
    }.count()
    assert(badCounts === 0L)
    // decoded pixels are the exact generated pattern, per frame
    val badPixels = assets.filter { a =>
      val fs = AssetPipeline.decodeGifFrames(a.data).get
      fs.zipWithIndex.exists { case ((w, h, px), i) =>
        px.toSeq != AssetPipeline.patternPixels(w, h, a.assetId * 7 + i).toSeq
      }
    }.count()
    assert(badPixels === 0L)
    // and the video sampling path runs on the real codec end-to-end
    val frames = AssetPipeline.sampleFrames(assets, 2).cache()
    val perAsset = frames.groupByKey(_.assetId).count().collect()
    assert(perAsset.length === 500 && perAsset.forall(_._2 <= 2))
    val dims = assets.map(a => (a.assetId, a.meta.width.get, a.meta.height.get))
      .toDF("assetId", "mw", "mh")
    assert(frames.toDF().join(dims, "assetId")
      .filter(org.apache.spark.sql.functions.expr(
        "width <> mw OR height <> mh")).count() === 0)
    assets.unpersist(); frames.unpersist()
  }

  test("audio windowing decodes real WAV payloads (rate and samples from RIFF)") {
    import spark.implicits._
    val assets = AssetPipeline.wavAssets(spark, sf)
    val windows = AssetPipeline.audioWindows(assets, 100).cache()
    // 100 ms at the REAL in-payload rate (8000 Hz) = 800 samples/window
    assert(windows.filter(_.width != 800).count() === 0L)
    // first window's samples are the exact head of the generated signal
    val bad = windows.filter(f => f.frameIdx == 0 &&
      f.pixels.toSeq != AssetPipeline
        .patternPixels(4000 + (f.assetId % 1000).toInt, 1, f.assetId * 13)
        .take(800).toSeq).count()
    assert(bad === 0L)
    windows.unpersist()
  }

  test("non-image payloads fall back to the deterministic stub") {
    val synthetic = Asset(3L, "image", "not a png".getBytes,
      AssetMeta(Some(8L), Some(8L), None, None))
    val f = AssetPipeline.decode(synthetic, 0)
    assert(f.pixels.length === 64) // stub shape, no exception
    assert(f.pixels.toSeq === AssetPipeline.fakeFrame(synthetic, 0).pixels.toSeq)
  }

  test("multimodal metadata query partitions bytes by kind") {
    val rows = Multimodal.qMultimodalMeta(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === Set("image", "audio", "video"))
    assert(rows.map(_.getLong(1)).sum === 500)
  }
}
