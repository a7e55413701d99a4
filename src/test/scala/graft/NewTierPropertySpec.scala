package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.analytics.{Bitmap, Hll, Series}
import graft.dq.DataQuality

/** Generated-data invariants for the round-7 continuation tier, driven
  * through the LIBRARY's frame-parametric cores (ewmaOver/cusumOver/
  * overlapOver/checksumOver/jRho) — not re-implementations — so the
  * properties pin the shipped code paths on inputs the fixtures never
  * produce (disjoint segments, constant series, adversarial batching).
  * Same seeded-sampling idiom as PropertySpec (the scalatest↔scalacheck
  * bridge is not in the offline cache).
  */
class NewTierPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1042L + i)))

  // ---- EWMA: kernel model + truncation bound vs the infinite recurrence

  private val seriesGen: Gen[List[Long]] =
    Gen.listOfN(60, Gen.chooseNum(0L, 100000L))

  test("ewmaOver equals the kernel model and tracks the recurrence within 2^(1-K)·max") {
    samples(seriesGen, 5).foreach { ys =>
      val daily = ys.zipWithIndex.map { case (y, i) => (i.toLong + 100L, y) }
      val got = Series.ewmaOver(daily.toDF("d", "y")).collect()
        .map(r => r.getAs[Long]("d") -> r.getAs[Double]("ewma")).toMap
      // Driver kernel model.
      val byDay = daily.toMap
      daily.foreach { case (d, _) =>
        val terms = (0 until Series.K).flatMap { k =>
          byDay.get(d - k).map(y => (y * (1L << (Series.K - 1 - k)), 1L << (Series.K - 1 - k)))
        }
        val model = terms.map(_._1).sum.toDouble / terms.map(_._2).sum.toDouble
        assert(got(d) == model)
      }
      // Infinite recurrence s_t = (y_t + s_{t-1}) / 2 off s_0 = y_0: past
      // the K-day warm-up the truncated kernel must sit within 2^(1−K) of
      // the scale (the scaladoc's bound).
      val rec = ys.tail.scanLeft(ys.head.toDouble)((s, y) => (s + y) / 2.0)
      val maxY = ys.max.toDouble.max(1.0)
      daily.drop(Series.K).zip(rec.drop(Series.K)).foreach { case ((d, _), s) =>
        assert(math.abs(got(d) - s) <= 2.0 * maxY / (1L << (Series.K - 1)).toDouble,
          s"day $d kernel ${got(d)} vs recurrence $s")
      }
    }
  }

  // ---- CUSUM: model argmax + telescoping identity, constant-series edge

  test("cusumOver matches the model argmax; constant series telescopes to day one") {
    val gens = samples(seriesGen, 5) :+ List.fill(40)(7L) // constant edge
    gens.foreach { ys =>
      val daily = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
      val n = daily.length.toLong
      val sy = ys.sum
      var s = 0L
      val cusum = daily.map { case (d, y) => s += y * n - sy; (d, s) }
      assert(cusum.last._2 == 0L)
      val (dStar, sStar) = cusum.maxBy { case (d, v) => (math.abs(v), -d) }
      val row = Series.cusumOver(daily.toDF("d", "y")).collect().head
      assert(row.getAs[Long]("d_star") == dStar)
      assert(row.getAs[Long]("s_scaled") == sStar)
    }
  }

  // ---- Bitmap: popcount algebra == set algebra, incl. the disjoint edge

  private val segGen: Gen[List[(String, Long)]] = for {
    a <- Gen.listOfN(80, Gen.chooseNum(0L, 400L)).map(_.map(("a", _)))
    b <- Gen.listOfN(80, Gen.chooseNum(200L, 600L)).map(_.map(("b", _)))
    c <- Gen.listOfN(40, Gen.chooseNum(5000L, 5400L)).map(_.map(("c", _))) // disjoint from a
  } yield a ++ b ++ c

  test("overlapOver equals exact set arithmetic and emits zero rows for disjoint pairs") {
    samples(segGen, 5).foreach { members =>
      val sets = members.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val segs = sets.keys.toSeq.sorted
      val expected = (for {
        i <- segs.indices; j <- (i + 1) until segs.length
        sa = segs(i); sb = segs(j)
        ov = (sets(sa) intersect sets(sb)).size.toLong
        na = sets(sa).size.toLong; nb = sets(sb).size.toLong
      } yield (sa, sb, na, nb, ov, ov * 1000 / (na + nb - ov))).toSet
      val got = Bitmap.overlapOver(members.toDF("seg", "id"))
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      assert(got == expected)
      // The (a, c) pair is disjoint by construction and MUST still appear.
      assert(got.exists { case (x, y, _, _, ov, _) => x == "a" && y == "c" && ov == 0L })
    }
  }

  // ---- HLL: merge of arbitrary splits ≡ direct sketch, bit for bit

  private val keysGen: Gen[List[Long]] =
    Gen.listOfN(300, Gen.chooseNum(0L, 1000000L))

  test("HLL registers of a union equal the max-merge of any split's registers") {
    samples(keysGen, 5).foreach { keys =>
      def regs(ks: Seq[Long]) = ks.toDF("id")
        .select(md5($"id".cast("string")).as("h"))
        .select(Hll.jRho("h"): _*)
        .groupBy($"j").agg(max($"rho").as("r"))
        .as[(Long, Long)].collect().toMap
      val (left, right) = keys.splitAt(keys.length / 3)
      val direct = regs(keys)
      val merged = (regs(left).toSeq ++ regs(right).toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(direct == merged)
    }
  }

  // ---- Checksum: order/partition invariance + single-flip sensitivity

  private val fpGen: Gen[List[(Long, Long)]] = Gen.listOfN(100, for {
    d <- Gen.chooseNum(0L, 5L)
    f <- Gen.chooseNum(0L, (1L << 60) - 1)
  } yield (d, f))

  test("checksumOver is row-order and partitioning invariant; one flip flips the day") {
    samples(fpGen, 5).foreach { rows =>
      val a = DataQuality.checksumOver(rows.toDF("day", "fp").repartition(7))
        .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("checksum"))).toSet
      val shuffled = new scala.util.Random(11).shuffle(rows)
      val b = DataQuality.checksumOver(shuffled.toDF("day", "fp").repartition(3))
        .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("checksum"))).toSet
      assert(a == b)
      // Flip one fingerprint bit: only that day's checksum may change, and
      // it MUST change.
      val (fd, ff) = rows.head
      val flipped = ((fd, ff ^ 1L) :: rows.tail).toDF("day", "fp")
      val c = DataQuality.checksumOver(flipped).collect()
        .map(r => r.getAs[Long]("day") -> r.getAs[Long]("checksum")).toMap
      val aMap = a.map(t => t._1 -> t._3).toMap
      assert(c(fd) != aMap(fd))
      (aMap.keySet - fd).foreach(d => assert(c(d) == aMap(d)))
    }
  }

  // ---- PIT join: interval containment ≡ the latest-strictly-earlier-event
  // model (an INDEPENDENT characterization: the library resolves the probe
  // through SCD2 interval containment; the model never builds intervals)

  private val eventsGen: Gen[List[(Long, Long, String, Long)]] =
    Gen.listOfN(150, for {
      user <- Gen.chooseNum(0L, 5L)
      tpe <- Gen.oneOf("view", "click", "purchase")
      // tiny time domain FORCES tus ties within a user — the boundary the
      // half-open intervals and the 1µs probe must agree on
      tus <- Gen.chooseNum(1000L, 1040L)
    } yield (user, tpe, tus)).map(_.zipWithIndex.map {
      case ((u, tp, t), i) => (i.toLong, u, tp, t)
    })

  test("pitJoinOver equals the latest-earlier-event model, ties included") {
    samples(eventsGen, 5).foreach { evs =>
      val df = evs.toDF("event_id", "user_id", "event_type", "tus")
        .withColumn("ts", timestamp_micros($"tus"))
        .drop("tus")
      val got = graft.analytics.Scd.pitJoinOver(df).collect()
        .map(r => r.getAs[String]("prior_state") ->
          (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_users"))).toMap
      val model = evs.filter(_._3 == "purchase").map { case (_, u, _, t) =>
        val earlier = evs.filter(e => e._2 == u && e._4 < t)
        val state =
          if (earlier.isEmpty) "(none)"
          else earlier.maxBy(e => (e._4, e._1))._3
        (u, state)
      }
      val expected = model.groupBy(_._2).map { case (s, xs) =>
        s -> ((xs.length.toLong, xs.map(_._1).distinct.length.toLong))
      }
      assert(got == expected)
    }
  }
}
