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
}
