package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class DataCardSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dataset card totals reconcile with the raw documents table") {
    val rows = DataCard.datasetCard(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val share = r.getAs[Double]("maj_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_exact_dupes") >= 0L)
      assert(r.getAs[Long]("n_langs") >= 1L)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_docs"),
        "every doc has at least one token")
    }
    // majority lang of one source recounted independently
    val src = rows.head.getAs[String]("source")
    val top = Tables.documents(spark, dir).filter($"source" === src)
      .groupBy($"lang").count().orderBy($"count".desc, $"lang")
      .select($"lang").as[String].head()
    assert(rows.head.getAs[String]("maj_lang") == top)
  }

  test("cluster size distribution accounts for every clustered doc") {
    val dist = Cluster.clusterSizeDist(spark, dir)
      .as[(Long, Long, Long)].collect()
    val comp = Cluster.dedupClusterVerified(spark, dir).collect()
    assert(dist.map(_._3).sum == comp.length, "n_docs sums to clustered docs")
    dist.foreach { case (size, nc, nd) =>
      assert(size >= 2, "a component needs at least one pair")
      assert(nd == size * nc)
    }
    // sizes recomputed from the component assignment itself
    val bySize = comp.groupBy(_.getAs[Long]("cluster_id")).values
      .map(_.size).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(dist.map(d => d._1.toInt -> d._2).toMap == bySize.map { case (k, v) => k -> v })
  }

  test("lang mismatch counts agree with the declared lang-id query") {
    val byDoc = LangId.langIdQuery(spark, dir)
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"lang")
      .as[(Long, String, String)].collect()
    val expected = docs.groupBy(_._2).view.mapValues { ds =>
      (ds.length.toLong, ds.count(d => byDoc(d._1) != d._3).toLong)
    }.toMap
    val got = DataCard.langMismatch(spark, dir)
      .select($"source", $"n_docs", $"n_mismatch")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected)
  }

  test("source overlap matrix is upper-triangular and covers every verified pair") {
    val rows = DataCard.sourceOverlap(spark, dir)
      .as[(String, String, Long)].collect()
    rows.foreach { case (x, y, n) =>
      assert(x <= y, s"($x,$y) not normalized")
      assert(n >= 1)
    }
    val nPairs = Dedup.dedupJaccard(spark, dir)
      .filter($"jaccard" >= Cluster.VerifyThreshold).count()
    assert(rows.map(_._3).sum == nPairs, "matrix total == verified pair count")
  }

  test("lsh precision deciles bucket the exact integer jaccard ratio") {
    val deciles = Dedup.lshPrecision(spark, dir)
      .as[(Long, Long)].collect().toMap
    val scored = Dedup.dedupJaccard(spark, dir)
      .select($"n_common", $"n_union").as[(Long, Long)].collect()
    assert(deciles.values.sum == scored.length, "every candidate bucketed")
    val expected = scored.groupBy { case (c, u) => c * 10 / math.max(u, 1) }
      .view.mapValues(_.length.toLong).toMap
    assert(deciles == expected)
  }

  test("rolling covariance numerator matches a scala recomputation") {
    import graft.analytics.Warehouse
    val rows = Warehouse.rollingCov(spark, dir)
      .select($"n_days", $"cov_num").as[(Long, Long)].collect()
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(graft.util.Det.cents($"o_totalprice")).as("y"))
      .orderBy($"day")
      .select($"x", $"y").as[(Long, Long)].collect()
    rows.zipWithIndex.foreach { case ((n, cov), i) =>
      val w = daily.slice(math.max(0, i - 6), i + 1)
      assert(n == w.length, s"row $i n_days")
      val (sx, sy) = (w.map(_._1).sum, w.map(_._2).sum)
      val sxy = w.map { case (x, y) => x * y }.sum
      assert(cov == n * sxy - sx * sy, s"row $i cov")
    }
  }

  test("fertility aggregates tokenBpe per language exactly") {
    val perDoc = TextOps.tokenBpe(spark, dir)
      .join(Tables.documents(spark, dir).select($"doc_id", $"lang"), "doc_id")
      .select($"lang", $"n_subtokens", $"n_words")
      .as[(String, Long, Long)].collect()
    val expected = perDoc.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum)
    }.toMap
    val got = TextOps.fertility(spark, dir)
      .select($"lang", $"n_docs", $"n_subtokens", $"n_words")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == expected)
  }

  test("dup inflation keeps exactly one copy's tokens per fingerprint") {
    val r = Dedup.dupInflation(spark, dir).collect().head
    val nDocs = Tables.documents(spark, dir).count()
    assert(r.getAs[Long]("n_docs") == nDocs)
    val distinctFps = Tables.documents(spark, dir)
      .select(md5(TextClean.canonicalize($"text"))).distinct().count()
    assert(r.getAs[Long]("n_dup_docs") == nDocs - distinctFps)
    assert(r.getAs[Long]("n_dup_tokens") <= r.getAs[Long]("n_tokens"))
    assert(r.getAs[Double]("token_dup_rate") >= 0.0)
  }
}
