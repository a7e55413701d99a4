package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.util.Det

/** Property-based invariants (SURVEY.md §5.2-3): ScalaCheck generators
  * sampled with fixed seeds (the scalatest↔scalacheck bridge artifact is not
  * in the offline cache, so sampling is driven manually), checked against
  * brute-force models computed driver-side.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val moneyGen: Gen[List[Double]] =
    Gen.listOfN(40, Gen.chooseNum(0L, 999999L).map(_ / 100.0))

  test("Det.decSum equals exact decimal arithmetic regardless of order/partitioning") {
    samples(moneyGen, 10).foreach { xs =>
      val expected = xs.map(x => BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val shuffled = new scala.util.Random(7).shuffle(xs)
      val a = xs.toDF("v").repartition(4).agg(Det.decSum($"v")).as[Double].head()
      val b = shuffled.toDF("v").repartition(7).agg(Det.decSum($"v")).as[Double].head()
      assert(a == expected && b == expected)
    }
  }

  private val gapsGen: Gen[List[Int]] = Gen.listOfN(30, Gen.chooseNum(1, 3600))

  test("sessionize agrees with a driver-side model on generated gap sequences") {
    val thresholdSec = 1800L
    samples(gapsGen, 10).foreach { gaps =>
      val ts = gaps.scanLeft(0L)(_ + _) // cumulative seconds
      val df = ts.zipWithIndex.map { case (t, i) =>
        (i.toLong, 1L, new java.sql.Timestamp(1700000000000L + t * 1000))
      }.toDF("event_id", "user_id", "ts")
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sess = df
        .withColumn("ts_us", unix_micros($"ts".cast("timestamp")))
        .withColumn("prev", lag($"ts_us", 1).over(w))
        .withColumn("new_sess",
          when($"prev".isNull || ($"ts_us" - $"prev") > thresholdSec * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum($"new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"event_id", $"sid").as[(Long, Long)].collect().sortBy(_._1)
      var sid = 0L
      val model = ts.zipWithIndex.map { case (t, i) =>
        if (i == 0 || t - ts(i - 1) > thresholdSec) sid += 1
        (i.toLong, sid)
      }
      assert(sess.toSeq == model)
    }
  }

  private val docsGen: Gen[List[String]] = Gen.listOfN(8,
    Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
      .map(_.mkString(" ")))

  test("exact dedup keeps one representative per distinct text and is idempotent") {
    samples(docsGen, 5).foreach { texts =>
      val dir = java.nio.file.Files.createTempDirectory("prop").toString
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      val once = graft.llm.Dedup.dedupExact(spark, dir)
      assert(once.count() == texts.distinct.size)
      val dir2 = java.nio.file.Files.createTempDirectory("prop2").toString
      once.select($"doc_id", $"text_hash".as("text"))
        .write.parquet(s"$dir2/documents.parquet")
      assert(graft.llm.Dedup.dedupExact(spark, dir2).count() == once.count())
    }
  }

  test("funnel stage counts are monotone under event removal") {
    val eventsGen = Gen.listOfN(60, for {
      u <- Gen.chooseNum(1L, 8L)
      t <- Gen.oneOf("view", "click", "purchase", "signup", "error")
    } yield (u, t))
    samples(eventsGen, 5).foreach { evs =>
      def stages(rows: Seq[(Long, String)]): (Long, Long) = {
        val byUser = rows.groupBy(_._1)
        (byUser.count(_._2.exists(_._2 == "view")).toLong,
          byUser.count(u => u._2.exists(_._2 == "view") && u._2.exists(_._2 == "purchase")).toLong)
      }
      val (fullView, fullConv) = stages(evs)
      val (subView, subConv) = stages(evs.take(evs.length / 2))
      assert(subView <= fullView && subConv <= fullConv)
      assert(fullConv <= fullView) // conversion never exceeds the upper stage
    }
  }

  test("PngCodec decode∘encode is the identity on the pixel pattern") {
    import graft.multimodal.Multimodal.PngCodec
    val dims = for {
      w <- Gen.chooseNum(1, 97)
      h <- Gen.chooseNum(1, 61)
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (w, h, id)
    samples(dims, 25).foreach { case (w, h, id) =>
      val (dw, dh, px) = PngCodec.decode(PngCodec.encode(id, w, h))
      assert(dw == w && dh == h && px.length == w * h * 3)
      // spot-check the deterministic pattern at the corners
      for ((x, y) <- Seq((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1))) {
        val i = (y * w + x) * 3
        assert((px(i) & 0xff) == ((id * 31 + x * 7 + y * 13) & 0xff).toInt)
        assert((px(i + 1) & 0xff) == ((x * 5 + y * 3) & 0xff))
        assert((px(i + 2) & 0xff) == ((id + x + y * 11) & 0xff).toInt)
      }
    }
  }

  test("pyJsonEnvelope output parses back to the input map for ASCII values") {
    import graft.gen.EventGen
    val asciiVal: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '"', '\\', '/', ':', ',', '{', '}')))
      .map(_.mkString).map(_.take(30))
    val rowGen = for { a <- asciiVal; b <- asciiVal } yield (a, b)
    samples(rowGen, 20).foreach { case (a, b) =>
      val env = EventGen.pyJsonEnvelope(Seq((a, b)).toDF("k1", "k2"))
        .as[String].head()
      // parse with Spark's own JSON reader: escaping must round-trip
      val back = spark.read.json(Seq(env).toDS()).collect().head
      assert(back.getAs[String]("k1") == a, s"k1 mangled for ${a.map(_.toInt)}")
      assert(back.getAs[String]("k2") == b)
    }
  }

  test("tokenBudget admitted totals never exceed the budget and are order-stable") {
    // the declared query's aggregate over the fixture, re-checked as an
    // invariant: admitted_tokens ≤ budget for EVERY source at every SF
    for (sf <- Seq("0.001", "0.01")) {
      val rows = graft.llm.Pack.tokenBudget(spark, s"/root/testdata/sf$sf")
        .select($"admitted_tokens").as[Long].collect()
      assert(rows.forall(_ <= graft.llm.Pack.SourceTokenBudget))
    }
  }
}
