package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Conditional scan widening — spread a CPU-heavy per-row derivation
  * across all cores when its input scan planned FEWER partitions than the
  * cluster has slots.
  *
  * Why this exists: Spark parallelizes a parquet scan by byte-range
  * splits, but a split only yields rows if a row-group STARTS inside it —
  * a single-row-group file is one task no matter what
  * `maxPartitionBytes` says. Per-row derivations fused into the scan
  * stage (md5 chains, shingle/trigram explosion, tokenization) then
  * serialize on one core while the other 31 idle: x_hll_distinct spent
  * 1.9 s of its 2.1 s wall in the single scan task's md5+conv chain, and
  * the whole document-shingling tier showed the same straggler shape
  * (max_task ≈ wall in the bench attribution channels).
  *
  * Why it is a no-op at 100 TB: the widen is CONDITIONAL on the input's
  * planned partition count. A production table (thousands of files /
  * row groups) already arrives wider than the core count, so the frame
  * is returned untouched and no shuffle is ever added at scale. At
  * fixture scale the added exchange carries only the columns the caller
  * projected (project BEFORE widening — a few MB), which buys full-width
  * execution of the expensive derivation downstream. Two consumers of
  * the SAME widened frame compile to one scan + one exchange via
  * Spark's ReuseExchange, so substrates used twice (spanDedup's span
  * frame; oovRate's gram frame was one until round 12 replaced that
  * query's derivation with native expressions) also stop
  * double-scanning.
  *
  * Known limitation (accepted): the gate reads the PLANNED split count,
  * and a split only yields rows if a row group starts inside it — so one
  * large single-row-group file can plan >= target byte-range splits where
  * only one task ever yields rows, and Widen skips exactly the straggler
  * it exists to fix. None of the fixtures or any plausible production
  * writer produce multi-hundred-MB single-row-group files (writers roll
  * row groups at 128 MB); if that shape ever becomes real, gate on
  * per-file row-group counts from the parquet footers instead.
  *
  * Contract (ENFORCED below, not just documented): call this on
  * scan/projection frames only (no upstream shuffle) — partition-count
  * inspection finalizes the physical plan,
  * which under AQE would EXECUTE any upstream exchange stages. Keyed
  * form gives deterministic hash partitioning; keyless falls back to
  * Spark's retry-deterministic round-robin. Callers downstream are
  * aggregates/joins — order-insensitive — so result sets are identical
  * with or without the widen (the hash gate re-proves this per query).
  */
object Widen {
  def apply(df: DataFrame, keys: Column*): DataFrame = {
    // Enforce the scan-only contract instead of trusting the comment:
    // `toRdd` below finalizes the plan, and under AQE that would EXECUTE
    // any upstream exchange stages as a side-effect job at plan-building
    // time — BROADCAST exchanges included (materializing one collects the
    // relation), so the guard matches the Exchange base class, not just
    // shuffles. `sparkPlan` is the compile-time physical view — inspecting
    // it runs nothing — so a caller handing us an exchange-bearing frame
    // fails loudly here rather than silently benching its stages off the
    // books.
    val exchange = df.queryExecution.sparkPlan.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    require(exchange.isEmpty,
      s"Widen is for scan/projection frames only; this plan contains " +
        s"${exchange.get.nodeName} upstream — widen the scan, not the result")
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Planned partition count from the file listing — no job runs for a
    // shuffle-free plan (enforced above).
    val have = df.queryExecution.toRdd.getNumPartitions
    if (have >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
