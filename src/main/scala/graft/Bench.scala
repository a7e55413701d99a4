package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line of per-query wall times at the env SF.
  *
  * Each query executes via a `noop`-format write so every output column is
  * actually computed (a bare `count()` would let Spark prune the projections
  * and under-report map-heavy queries). A generic warmup job boots the
  * executor pool, codegen and the parquet reader before the first measurement
  * so query #1 doesn't absorb JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Even with the UI off, SQLAppStatusListener retains up to 1000
      // executions' full plan graphs + metric maps; across a 150-query
      // suite that is real old-gen pressure inside later queries' measured
      // windows (observed: x_pagerank 4.6 s isolated vs 8.2 s mid-suite).
      .config("spark.sql.ui.retainedExecutions", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup: shuffle + agg + parquet scan machinery, not a declared query.
    exec(spark.range(1000000).selectExpr("id % 97 AS k", "id AS v")
      .groupBy("k").sum("v"))
    exec(spark.read.parquet(s"$sfDir/region.parquet"))

    // Best of 2 consecutive runs per query: run 1 pays Janino/JIT compilation
    // of the query-specific generated code (a JVM artifact a steady-state
    // deployment amortizes away); data is re-read from parquet both times.
    // A query that throws is reported as -1 and named in "failed" — a broken
    // query must never bench as fast-and-silent.
    // Optional arg: comma-separated query names for fast perf iteration
    // (the driver passes no args and benches the full surface).
    val only = args.headOption.map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // Before each run (outside the measured window): drop dead
      // localCheckpoint blocks. Several queries pin lineage-truncation
      // blocks in executor storage; the ContextCleaner frees them only
      // after the owning RDD is GC'd, so prior runs' storage pressure
      // bleeds into later measurements (observed: x_pagerank 5.4 s
      // isolated vs 14.9 s mid-suite). Unpersist is deterministic where
      // System.gc() is advisory; the gc still helps with non-storage heap.
      val times = (1 to 2).flatMap { _ =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        try {
          exec(fn(spark, sfDir))
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            None
        }
      }
      name -> times.minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // A failed query must POISON the headline number: excluding it would
    // make a broken round bench FASTER than a working one for any consumer
    // that only reads "value".
    val total =
      if (results.exists(_._2 < 0)) -1.0
      else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
