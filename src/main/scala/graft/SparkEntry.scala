package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Anomaly, AsOf, Attribution, Basket, Benford, Bfs, Bitmap, BloomJoin, BottomK, Intervals, CardEst, Cohort, Diff, Experiment, Forecast, Hll, Incremental, Journey, Layout, Neighbors, PageRank, Paths, PrefixSum, RandWalk, Relational, Rfm, Scd, Series, Sessions, ShortestPath, Sketch, Skew, Stats, Tpch, TpchPs, Triangles, Twap, Upsert, Warehouse}
import graft.dq.DataQuality
import graft.io.Ingest
import graft.llm.{AnnMulti, Bpe, Cluster, Contain, CorpusFilter, DataCard, Dedup, Drift, EditJoin, EmbedStats, Eval, FeatureHash, Ivf, IvfPq, LangId, Pack, Pq, Privacy, Retrieval, Semantic, SimHash, SimJoin, Similarity, SpanDedup, Terms, TextClean, TextOps, WeakLabel}
import graft.multimodal.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query is registered by the module that implements it and
  * aggregated here; `oracleSql` carries the DuckDB-equivalent ANSI SQL the
  * driver hash-compares against at sf0.01. Column names and row order are
  * pinned identically on both sides (SURVEY.md §7.4 determinism rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++
      BloomJoin.queries ++
      Upsert.queries ++
      Warehouse.queries ++
      Diff.queries ++
      PageRank.queries ++
      RandWalk.queries ++
      Bfs.queries ++
      ShortestPath.queries ++
      BottomK.queries ++
      Intervals.queries ++
      Incremental.queries ++
      PrefixSum.queries ++
      Triangles.queries ++
      Tpch.queries ++
      TpchPs.queries ++
      Journey.queries ++
      Sketch.queries ++
      Hll.queries ++
      Series.queries ++
      Bitmap.queries ++
      Sessions.queries ++
      AsOf.queries ++
      DataQuality.queries ++
      Ingest.queries ++
      TextOps.queries ++
      WeakLabel.queries ++
      TextClean.queries ++
      Terms.queries ++
      Bpe.queries ++
      Dedup.queries ++
      Pack.queries ++
      Privacy.queries ++
      Cluster.queries ++
      CorpusFilter.queries ++
      SimHash.queries ++
      SimJoin.queries ++
      Contain.queries ++
      Retrieval.queries ++
      EmbedStats.queries ++
      Layout.queries ++
      LangId.queries ++
      Similarity.queries ++
      Ivf.queries ++
      AnnMulti.queries ++
      Semantic.queries ++
      Drift.queries ++
      DataCard.queries ++
      Pq.queries ++
      IvfPq.queries ++
      Skew.queries ++
      Cohort.queries ++
      Rfm.queries ++
      Basket.queries ++
      Anomaly.queries ++
      Neighbors.queries ++
      EditJoin.queries ++
      SpanDedup.queries ++
      Attribution.queries ++
      Scd.queries ++
      Benford.queries ++
      Twap.queries ++
      Paths.queries ++
      Forecast.queries ++
      FeatureHash.queries ++
      Eval.queries ++
      Stats.queries ++
      CardEst.queries ++
      Experiment.queries ++
      Multimodal.queries ++
      graft.streaming.IncrMv.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++
      BloomJoin.oracles ++
      Upsert.oracles ++
      Warehouse.oracles ++
      Diff.oracles ++
      PageRank.oracles ++
      RandWalk.oracles ++
      Bfs.oracles ++
      ShortestPath.oracles ++
      BottomK.oracles ++
      Intervals.oracles ++
      Incremental.oracles ++
      PrefixSum.oracles ++
      Triangles.oracles ++
      Tpch.oracles ++
      TpchPs.oracles ++
      Journey.oracles ++
      Sketch.oracles ++
      Hll.oracles ++
      Series.oracles ++
      Bitmap.oracles ++
      Sessions.oracles ++
      AsOf.oracles ++
      DataQuality.oracles ++
      Ingest.oracles ++
      TextOps.oracles ++
      WeakLabel.oracles ++
      TextClean.oracles ++
      Terms.oracles ++
      Bpe.oracles ++
      Dedup.oracles ++
      Pack.oracles ++
      Privacy.oracles ++
      Cluster.oracles ++
      CorpusFilter.oracles ++
      SimHash.oracles ++
      SimJoin.oracles ++
      Contain.oracles ++
      Retrieval.oracles ++
      EmbedStats.oracles ++
      Layout.oracles ++
      LangId.oracles ++
      Similarity.oracles ++
      Ivf.oracles ++
      AnnMulti.oracles ++
      Semantic.oracles ++
      Drift.oracles ++
      DataCard.oracles ++
      Pq.oracles ++
      IvfPq.oracles ++
      Skew.oracles ++
      Cohort.oracles ++
      Rfm.oracles ++
      Basket.oracles ++
      Anomaly.oracles ++
      Neighbors.oracles ++
      EditJoin.oracles ++
      SpanDedup.oracles ++
      Attribution.oracles ++
      Scd.oracles ++
      Benford.oracles ++
      Twap.oracles ++
      Paths.oracles ++
      Forecast.oracles ++
      FeatureHash.oracles ++
      Eval.oracles ++
      Stats.oracles ++
      CardEst.oracles ++
      Experiment.oracles ++
      Multimodal.oracles ++
      graft.streaming.IncrMv.oracles
}
