package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  test("synthetic assets round-trip parquet with binary payload intact") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    val assets = syntheticAssets(spark, 12)
    assets.write.parquet(s"$dir/assets.parquet")
    val back = spark.read.parquet(s"$dir/assets.parquet").as[Asset]
    assert(back.count() == 12)
    val a0 = back.filter($"asset_id" === 0L).head()
    assert(a0.data.toSeq == FakeCodec.encode(0L, "image", 64, 48, 1).toSeq)
  }

  test("decodeFrames: images/audio yield 1 frame, videos their frame count") {
    val frames = decodeFrames(syntheticAssets(spark, 12))
    val perKind = frames.toDF()
      .join(assetCatalog(syntheticAssets(spark, 12)), "asset_id")
      .groupBy($"kind").agg(countDistinct($"asset_id").as("assets"),
        count(lit(1)).as("frames"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(perKind("image") == ((4L, 4L)))   // 1 frame each
    assert(perKind("audio") == ((4L, 4L)))
    assert(perKind("video") == ((4L, 32L)))  // 8 frames each
  }

  test("sampleFrames keeps every stride-th frame") {
    val frames = decodeFrames(syntheticAssets(spark, 3)) // ids 0,1,2: one video (id 2)
    val sampled = sampleFrames(frames, stride = 4)
    val vid = sampled.filter(_.asset_id == 2L).collect().map(_.frame_idx).sorted
    assert(vid.toSeq == Seq(0, 4))
  }

  test("resize halves dimensions until within maxSide, deterministically") {
    val frames = decodeFrames(syntheticAssets(spark, 1)) // image 64x48
    val r = resize(frames, maxSide = 20).head()
    assert(r.width == 16 && r.height == 12)
    val r2 = resize(decodeFrames(syntheticAssets(spark, 1)), maxSide = 20).head()
    assert(r.pixels.toSeq == r2.pixels.toSeq)
  }

  test("extractFeatures emits fixed-dim vectors usable by Similarity ops") {
    val feats = extractFeatures(syntheticAssets(spark, 6), dim = 8)
    val rows = feats.collect()
    assert(rows.length == 6 && rows.forall(_.features.length == 8))
    // deterministic: same asset -> same vector
    val again = extractFeatures(syntheticAssets(spark, 6), dim = 8).collect()
    assert(rows.sortBy(_.asset_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.asset_id).map(_.features.toSeq).toSeq)
  }

  test("catalog predicates prune on metadata without decoding payloads") {
    val cat = assetCatalog(syntheticAssets(spark, 12))
    val wide = cat.filter($"width" >= 128).select($"asset_id").as[Long].collect()
    assert(wide.nonEmpty)
    assert(cat.filter($"kind" === "audio").select($"width").as[Int].collect().forall(_ == 0))
  }

  test("real PNG payloads decode through javax.imageio to exact pixels") {
    val assets = Multimodal.syntheticPngAssets(spark, 6)
    val frames = Multimodal.decodeFrames(assets).collect()
    assert(frames.length == 6, "PNG assets are single-frame")
    frames.foreach { f =>
      assert(f.pixels.length == f.width * f.height * 3, "true RGB grid")
      // distributed decode ≡ local decode of the same payload
      val local = Multimodal.PngCodec.decode(
        Multimodal.PngCodec.encode(f.asset_id, f.width, f.height))
      assert(local._3.sameElements(f.pixels), s"asset ${f.asset_id} pixels differ")
      // and the pixels are the DETERMINISTIC pattern, not whatever the
      // encoder round-tripped: spot-check (0,0)'s red channel
      assert((f.pixels(0) & 0xff) == ((f.asset_id * 31) & 0xff).toInt)
    }
  }

  test("real JPEG payloads decode through javax.imageio: exact dims, deterministic, near-true pixels") {
    import spark.implicits._
    val assets = spark.createDataset((0 until 4).map { i =>
      val (w, h) = (40 + i * 8, 30 + i * 6)
      Multimodal.Asset(i.toLong, "image", Multimodal.MediaMeta("jpeg", w, h, 0L),
        Multimodal.PngCodec.encodeJpeg(i.toLong, w, h))
    })
    val frames = Multimodal.decodeFrames(assets).collect().sortBy(_.asset_id)
    assert(frames.length == 4, "JPEG assets are single-frame through the REAL path")
    frames.foreach { f =>
      val (w, h) = (40 + f.asset_id.toInt * 8, 30 + f.asset_id.toInt * 6)
      assert(f.width == w && f.height == h, "lossy codec, exact dimensions")
      assert(f.pixels.length == w * h * 3, "true RGB grid, not a fake-codec buffer")
      // Decoder determinism: same bytes → same pixels, twice.
      val bytes = Multimodal.PngCodec.encodeJpeg(f.asset_id, w, h)
      val once = Multimodal.PngCodec.decode(bytes)._3
      val twice = Multimodal.PngCodec.decode(bytes)._3
      assert(once.sameElements(twice))
      assert(once.sameElements(f.pixels), "distributed decode == local decode")
      // Lossy-but-faithful: mean absolute channel error against the true
      // pattern stays small (JPEG quality default ~0.75).
      val truth = (for (y <- 0 until h; x <- 0 until w) yield Seq(
        ((f.asset_id * 31 + x * 7 + y * 13) & 0xff).toInt,
        (x * 5 + y * 3) & 0xff,
        ((f.asset_id + x + y * 11) & 0xff).toInt)).flatten
      val mae = f.pixels.zip(truth).map { case (p, t) =>
        math.abs((p & 0xff) - t) }.sum.toDouble / truth.length
      assert(mae < 48.0, s"mean abs channel error $mae") // high-freq pattern, lossy bound
    }
  }

  test("real WAV/PCM payloads round-trip losslessly and decode distributed==local") {
    import spark.implicits._
    // Lossless container: decode ∘ encode is the identity on samples.
    val bytes = Multimodal.WavCodec.encode(7L, nSamples = 480, sampleRate = 16000)
    val (rate, n, samples) = Multimodal.WavCodec.decode(bytes)
    assert(rate == 16000 && n == 480 && samples.length == 960)
    val expected = java.util.Arrays.copyOfRange(bytes, 44, 44 + 960)
    assert(samples.sameElements(expected))
    // Distributed path: one frame, width = sample count, height = 1.
    val assets = spark.createDataset((0 until 3).map { i =>
      Multimodal.Asset(i.toLong, "audio",
        Multimodal.MediaMeta("wav", 0, 0, (100 + i).toLong),
        Multimodal.WavCodec.encode(i.toLong, 320 + i * 10, 8000))
    })
    val frames = Multimodal.decodeFrames(assets).collect().sortBy(_.asset_id)
    assert(frames.map(f => (f.width, f.height)).toSeq ==
      Seq((320, 1), (330, 1), (340, 1)))
    frames.foreach { f =>
      val local = Multimodal.WavCodec.decode(
        Multimodal.WavCodec.encode(f.asset_id, f.width, 8000))._3
      assert(f.pixels.sameElements(local))
    }
  }

  test("x_mm_audio_stats matches a driver-side decode of the same corpus") {
    val rows = Multimodal.mmAudioStats(spark, "unused").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      val n = 400 + (id.toInt % 7) * 57
      assert(r.getAs[Long]("n_samples") == n.toLong)
      val bytes = Multimodal.WavCodec.encode(id, n, 16000)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var sumAbs = 0L; var peak = 0L
      (0 until n).foreach { i =>
        val a = math.abs(bb.getShort(44 + i * 2).toLong)
        sumAbs += a; if (a > peak) peak = a
      }
      assert(r.getAs[Long]("sum_abs") == sumAbs, s"asset $id")
      assert(r.getAs[Long]("peak") == peak)
      assert(r.getAs[Long]("mean_abs") == sumAbs / n)
    }
  }

  test("mixed PNG + fake-codec corpus decodes in one pass via magic sniffing") {
    val fake = Multimodal.syntheticAssets(spark, 9)
    val png = Multimodal.syntheticPngAssets(spark, 3)
      .map(a => a.copy(asset_id = a.asset_id + 100))
    val frames = Multimodal.decodeFrames(fake.union(png)).collect()
    assert(frames.count(_.asset_id >= 100) == 3)
    assert(frames.count(_.asset_id < 100) > 9, "videos contribute multiple frames")
  }

  test("resize on real frames is 2-D nearest-neighbor at (x*step, y*step)") {
    val assets = Multimodal.syntheticPngAssets(spark, 2)
    val resized = Multimodal.resize(Multimodal.decodeFrames(assets), 16)
      .collect().sortBy(_.asset_id)
    val originals = Multimodal.decodeFrames(assets).collect()
      .map(f => f.asset_id -> f).toMap
    resized.foreach { r =>
      val o = originals(r.asset_id)
      assert(math.max(r.width, r.height) <= 16)
      val step = o.width / r.width
      assert(r.pixels.length == r.width * r.height * 3)
      // every sampled pixel equals the source at the strided 2-D index
      for (y <- 0 until r.height; x <- 0 until r.width; c <- 0 until 3)
        assert(r.pixels((y * r.width + x) * 3 + c) ==
          o.pixels((y * step * o.width + x * step) * 3 + c))
    }
  }

  test("committed sample.png decodes to its pinned dimensions and pattern") {
    val path = new java.io.File(
      new java.io.File(Multimodal.FixturePath).getParentFile, "sample.png")
    assert(path.exists(), s"committed PNG fixture missing at $path")
    val (w, h, px) = Multimodal.PngCodec.decode(
      java.nio.file.Files.readAllBytes(path.toPath))
    assert(w == 48 && h == 32)
    assert(px.sameElements(Multimodal.PngCodec.decode(
      Multimodal.PngCodec.encode(7L, 48, 32))._3))
  }

  test("aHash is invariant under PNG re-encode and separates distinct seeds") {
    val (w, h, px) = Multimodal.PngCodec.decode(Multimodal.PngCodec.encode(5L, 48, 32))
    val h1 = Multimodal.aHash64(w, h, px)
    // independent encode of the same seed: identical pixels, identical bits
    val (w2, h2, px2) = Multimodal.PngCodec.decode(Multimodal.PngCodec.encode(5L, 48, 32))
    assert(Multimodal.aHash64(w2, h2, px2) == h1)
    // distinct pixel seeds → distinct hashes (id-derived channels differ)
    val (w3, h3, px3) = Multimodal.PngCodec.decode(Multimodal.PngCodec.encode(6L, 48, 32))
    assert(Multimodal.aHash64(w3, h3, px3) != h1)
  }

  test("mmPhashDedup recovers exactly the planted duplicate groups") {
    val out = Multimodal.mmPhashDedup(spark, "unused")
      .as[(Long, Long, Long, Long)].collect().toList
    val expectedGroups = Multimodal.PhashAssets / Multimodal.PhashGroup
    assert(out.length == expectedGroups, s"${out.length} != $expectedGroups groups")
    out.foreach { case (_, n, lo, hi) =>
      assert(n == Multimodal.PhashGroup)
      // members are the consecutive ids of one seed group
      assert(lo / Multimodal.PhashGroup == hi / Multimodal.PhashGroup)
      assert(hi - lo == Multimodal.PhashGroup - 1)
    }
    // no two groups share a hash (grouped rows are per-hash already, and
    // every planted group surfaced separately — no collision merged them)
    assert(out.map(_._1).distinct.length == expectedGroups)
  }
}
