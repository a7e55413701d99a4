package graft.tools

import org.apache.spark.sql.SparkSession

import graft.multimodal.Multimodal

/** Writes the committed test fixtures that declared queries read — currently
  * the multimodal binary-asset parquet at [[Multimodal.FixturePath]].
  * Deterministic (id-derived payloads, no randomness), so re-running
  * reproduces the committed bytes' content exactly.
  */
object WriteFixtures {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else Multimodal.FixturePath
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Multimodal.syntheticAssets(spark, 24)
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"wrote $out")
    // Tiny committed PNG (real encoder, deterministic pixels): the fixture
    // MultimodalSpec decodes to prove the real-codec path on committed bytes.
    val png = new java.io.File(new java.io.File(out).getParentFile, "sample.png")
    java.nio.file.Files.write(png.toPath, Multimodal.PngCodec.encode(7L, 48, 32))
    println(s"wrote $png")
    spark.stop()
  }
}
