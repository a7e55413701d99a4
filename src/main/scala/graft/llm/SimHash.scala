package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** SimHash near-duplicate detection over `documents` — the bit-vote companion
  * to MinHash (Charikar's similarity-preserving fingerprint): each token
  * hashes to 60 bits; per document, bit j of the fingerprint is 1 iff more
  * than half the tokens have bit j set. Near-duplicate candidates are pairs
  * within a small Hamming distance, blocked by exact-match on 15-bit bands
  * (hamming ≤ 3 ⟹ at least one of the 4 bands is identical).
  *
  * All arithmetic is integer (shift/and/popcount over a 60-bit value parsed
  * from md5 hex) so the DuckDB oracle reproduces fingerprints bit-for-bit.
  * Shape: explode tokens → one groupBy(doc) with 20 packed vote sums (three
  * 21-bit counters per long) — a single shuffle carrying 21 longs per doc;
  * pairs come from bucket-local combination like Dedup.dedupMinhash.
  */
object SimHash {

  val Bits = 60          // 15 hex chars: always positive in a signed 64-bit long
  val BandBits = 15
  val NumBands: Int = Bits / BandBits

  val GroupBits = 21     // counter width: bounds docs at 2^21 tokens
  val GroupSize = 3      // counters packed per long (3·21 = 63 bits used)
  val NumGroups: Int = Bits / GroupSize

  /** vote_j > 0  ⟺  2 * sum(bit_j) > token_count.
    *
    * The per-bit vote counters are PACKED, three 21-bit counters per long, so
    * the aggregate is one count + 20 sums instead of the naive 60 — a third
    * of the generated agg-update code (the round-1 60-column form spent most
    * of its first-run bench time in Janino compilation) with identical exact
    * integer math. Bounds: counters overflow past 2^21 tokens per doc, and
    * the packed long sum stays inside signed-64 up to that bound — 2M tokens
    * per document, far above any sane corpus chunking.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val packs = (0 until NumGroups).map { g =>
      sum(
        shiftright($"h", GroupSize * g).bitwiseAND(1) +
          shiftright($"h", GroupSize * g + 1).bitwiseAND(1) * lit(1L << GroupBits) +
          shiftright($"h", GroupSize * g + 2).bitwiseAND(1) * lit(1L << (2 * GroupBits)))
        .as(s"p$g")
    }
    val hash: Column = (0 until Bits).map { j =>
      val vote = shiftright(col(s"p${j / GroupSize}"), GroupBits * (j % GroupSize))
        .bitwiseAND((1L << GroupBits) - 1)
      when(lit(2) * vote > col("n_toks"), lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    // Widened before the token explode + per-token md5 (see
    // [[graft.util.Widen]] — no-op on a production-wide scan).
    graft.util.Widen(
      Tables.documents(spark, dir).select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .select($"doc_id", conv(substring(md5($"t"), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"), packs: _*)
      .select($"doc_id", hash.as("simhash"))
  }

  private def fingerprintsSqlCore: String = {
    val bitSums = (0 until Bits)
      .map(j => s"sum((h >> $j) & 1) AS b$j").mkString(",\n  ")
    val hash = (0 until Bits)
      .map(j => s"CASE WHEN 2 * b$j > n_toks THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""th AS (
       | SELECT doc_id, CAST('0x' || substr(md5(t.tok), 1, 15) AS BIGINT) AS h
       | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t),
       |votes AS (
       | SELECT doc_id, count(*) AS n_toks,
       |  $bitSums
       | FROM th GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($hash AS BIGINT) AS simhash FROM votes)""".stripMargin
  }

  /** x_simhash — the per-doc 60-bit fingerprint (strong oracle check). */
  def simhashQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fingerprints(spark, dir).orderBy($"doc_id")
  }

  val simhashSql: String =
    s"""WITH ${fingerprintsSqlCore}
       |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin

  val MaxHamming = 3

  /** x_dedup_simhash — candidate pairs within Hamming ≤ 3 via 4×15-bit band
    * blocking (pigeonhole: ≤3 flipped bits cannot touch all 4 bands), exact
    * distance via bit_count(xor). Deterministically empty when the corpus has
    * no near-dups — the unit test pins the behavior on crafted ones.
    * Per-bucket pair expansion is bounded by [[Dedup.BucketCap]] (same
    * adversarial-corpus argument + representative-edge overflow policy;
    * overflow edges past the cap connect to the bucket's first doc and still
    * pass through the Hamming filter).
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    dedupSimhashOver(fingerprints(spark, dir))

  /** Same pipeline from a prepared (doc_id, simhash) table — the seam the
    * adversarial bucket-cap test injects through.
    */
  def dedupSimhashOver(fp: DataFrame): DataFrame = {
    import fp.sparkSession.implicits._
    val bandStructs = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        shiftright($"simhash", b * BandBits).bitwiseAND((1L << BandBits) - 1).as("bh"))
    }
    val bands = fp.select($"doc_id", $"simhash", explode(array(bandStructs: _*)).as("x"))
      .select($"doc_id", $"simhash", $"x.band".as("band"), $"x.bh".as("bh"))
    val buckets = bands.groupBy($"band", $"bh")
      .agg(sort_array(collect_list(struct($"doc_id", $"simhash"))).as("ds"))
      .filter(size($"ds") >= 2)
    val pairStructs = Dedup.cappedPairs($"ds",
      (a, b) => struct(a.getField("doc_id").as("doc_a"), b.getField("doc_id").as("doc_b"),
        bit_count(a.getField("simhash").bitwiseXOR(b.getField("simhash"))).as("hamming")))
    buckets.select(explode(pairStructs).as("p"))
      .select($"p.doc_a".as("doc_a"), $"p.doc_b".as("doc_b"), $"p.hamming".as("hamming"))
      .filter($"hamming" <= MaxHamming)
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** Oracle mirrors the CAPPED expansion exactly (full pairs among the
    * BucketCap smallest ids per bucket + representative edges first→overflow)
    * — an uncapped self-join oracle diverges the moment a real fixture
    * bucket exceeds the cap, which sf0.1's band skew already does.
    */
  val dedupSimhashSql: String = {
    val cap = Dedup.BucketCap
    val bandRows = (0 until NumBands).map { b =>
      val u = if (b == 0) "" else "UNION ALL "
      s"${u}SELECT doc_id, simhash, $b AS band, (simhash >> ${b * BandBits}) & ${(1L << BandBits) - 1} AS bh FROM fp"
    }.mkString("\n ")
    s"""WITH ${fingerprintsSqlCore},
       |bands AS (
       | $bandRows),
       |ranked AS (
       | SELECT doc_id, simhash, band, bh,
       |  row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn,
       |  first_value(doc_id) OVER (PARTITION BY band, bh ORDER BY doc_id) AS f_doc,
       |  first_value(simhash) OVER (PARTITION BY band, bh ORDER BY doc_id) AS f_sim
       | FROM bands),
       |expanded AS (
       | SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |  bit_count(xor(l.simhash, r.simhash)) AS hamming
       | FROM ranked l JOIN ranked r
       |  ON l.band = r.band AND l.bh = r.bh AND l.rn < r.rn AND r.rn <= $cap
       | UNION ALL
       | SELECT f_doc, doc_id, bit_count(xor(f_sim, simhash))
       | FROM ranked WHERE rn > $cap)
       |SELECT DISTINCT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
       |FROM expanded
       |WHERE hamming <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_simhash" -> (simhashQuery _),
    "x_dedup_simhash" -> (dedupSimhash _))

  val oracles: Map[String, String] = Map(
    "x_simhash" -> simhashSql,
    "x_dedup_simhash" -> dedupSimhashSql)
}
