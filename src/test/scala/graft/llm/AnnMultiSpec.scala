package graft.llm

import graft.SparkSpec

class AnnMultiSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("multi-probe recall clears the bar the single-table route craters under") {
    val rows = AnnMulti.annRecallMulti(spark, sf)
      .select($"query_id", $"n_true", $"n_cand", $"n_overlap", $"recall")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length == Similarity.RecallProbes)
    val avg = rows.map(_._5).sum / rows.length
    // the point of the query: the nprobe=8/16 route retrieves (vs ≈0.035
    // for the single 8-bit sign table measured by x_ann_recall)
    assert(avg >= 0.5, s"avg recall@10 $avg below 0.5")
    rows.foreach { case (q, nTrue, nCand, nOv, rec) =>
      assert(nTrue == Similarity.RecallK, s"query $q truth size $nTrue")
      assert(nOv <= nTrue)
      assert(rec == nOv.toDouble / nTrue, s"query $q recall not the ratio")
      // multi-probe must stay sublinear: candidates < the whole corpus
      assert(nCand < 2000, s"query $q scanned $nCand candidates")
    }
  }

  test("multiprobe search ranks agree with the recall eval's overlap") {
    val topk = AnnMulti.multiprobeTopK(spark, sf)
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect()
    val perQuery = topk.groupBy(_._1)
    assert(perQuery.keySet == (0L until Similarity.RecallProbes).toSet)
    perQuery.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
      assert(rows.map(_._2).distinct.length == rows.length)
    }
    // the search's result set IS what the eval counted as n_approx
    val eval = AnnMulti.annRecallMulti(spark, sf)
      .select($"query_id", $"n_approx").as[(Long, Long)].collect().toMap
    perQuery.foreach { case (q, rows) =>
      assert(rows.length.toLong == eval(q),
        s"query $q: search returned ${rows.length}, eval counted ${eval(q)}")
    }
  }

  test("nprobe curve is monotone in both recall and scanned candidates") {
    val rows = AnnMulti.annNprobeCurve(spark, sf)
      .select($"nprobe", $"mean_recall", $"total_cand")
      .as[(Int, Double, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == AnnMulti.CurveProbes)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 >= lo._2, s"recall dropped ${lo._1}→${hi._1}")
      assert(hi._3 >= lo._3, s"candidates shrank ${lo._1}→${hi._1}")
    }
    // the deepest point must agree with the standalone eval's route
    val deep = rows.last
    assert(deep._1 == AnnMulti.MultiNProbe)
  }

  test("probed cells bound the candidate set by construction") {
    val rows = AnnMulti.annRecallMulti(spark, sf)
      .select($"n_cand").as[Long].collect()
    // nprobe of nlist cells: every query scans a strict subset of the
    // corpus, and at least its own cell's members minus itself
    assert(rows.forall(_ > 0), "some query generated zero candidates")
  }

  test("filtered search with nprobe = nlist equals brute-force same-label top-k") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = AnnMulti.filteredTopK(spark, dir)
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect().toSet
    val emb = graft.io.Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"),
        $"label")
    val probes = emb.filter($"vec_id" < Similarity.RecallProbes)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"label".as("qlabel"))
    // brute force: exact micro-cosine over ALL same-label vectors — the
    // filtered route probes every cell, so it must reproduce this exactly
    val w = Window.partitionBy($"query_id").orderBy($"s".desc, $"neighbor_id")
    val brute = probes.join(emb.select($"vec_id".as("neighbor_id"),
        $"v".as("nv"), $"label"), $"qlabel" === $"label")
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        round(Similarity.cosineFast(spark, $"qv", $"nv") * 1000000L)
          .cast("long").as("s"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= Similarity.RecallK)
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == brute)
    // and every result really carries the probe's own label
    val labels = emb.select($"vec_id", $"label").as[(Long, Long)].collect().toMap
    out.foreach { case (q, n, _) => assert(labels(q) == labels(n)) }
  }
}
