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
}
