package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-dimensional data layout for scan pruning — the write-side half of
  * "don't read what you don't need". Sorting a table by ONE column gives
  * file/row-group min-max stats that prune filters on that column only; a
  * filter on any other column overlaps every file. Z-ORDERING interleaves
  * the bits of two (quantized) sort keys, so files cover small RECTANGLES of
  * the 2-D key space instead of thin slices of one axis — and a selective
  * box predicate on EITHER or BOTH dimensions overlaps only the files whose
  * rectangle intersects it. At 100 TB the difference is reading a few
  * hundred files vs the whole table; this is the layout trick behind
  * Delta/Iceberg's OPTIMIZE ZORDER, expressed with nothing but native
  * column arithmetic.
  *
  * Everything is deterministic: min-max quantization to a fixed bit budget,
  * an unrolled bit-interleave expression (codegen'd — no UDF), and a range
  * repartition + in-partition sort on the z-value. LayoutSpec PROVES the
  * pruning effect from the written files' own min-max stats: a 2-D box
  * predicate overlaps strictly fewer z-ordered files than linearly-sorted
  * files of the same count.
  */
object Layout {

  /** Bits per dimension; 2·16 = 32-bit z-values fit comfortably in a long. */
  val BitsPerDim = 16

  /** Interleave the low [[BitsPerDim]] bits of two non-negative columns:
    * bit b of x lands at position 2b, bit b of y at 2b+1. Unrolled into
    * 2·bits shift/mask terms — one codegen'd expression, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int = BitsPerDim): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** Min-max quantization of a numeric column to [0, 2^bits): exact integer
    * arithmetic, monotone, so z-order locality mirrors value locality.
    * `mn`/`mx` are the column's global bounds (joined in by the caller —
    * one tiny bounds aggregate, broadcast).
    */
  def quantize(v: Column, mn: Column, mx: Column, bits: Int = BitsPerDim): Column = {
    val span = greatest(mx - mn, lit(1L))
    // the multiply runs in 38-digit decimal: (v-mn)*(2^bits-1) overflows
    // long once span exceeds ~1.4e14 (wide-domain ids/timestamps), which
    // would produce non-monotone z-values and silently break file pruning.
    // Truncating the decimal quotient back to long equals the integer
    // division for the non-negative domain, so narrow columns are unchanged.
    ((v - mn).cast(DecimalType(38, 0)) * ((1L << bits) - 1) / span).cast("long")
  }

  /** Write `df` z-ordered on (colX, colY) into `nFiles` parquet files, each
    * covering a contiguous z-range (range repartition + in-partition sort).
    * File-level min-max stats on colX/colY then bound small rectangles of
    * the key plane — the pruning LayoutSpec asserts.
    */
  def zorderWrite(df: DataFrame, colX: String, colY: String, path: String,
      nFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(colX)).cast("long").as("mnx"), max(col(colX)).cast("long").as("mxx"),
      min(col(colY)).cast("long").as("mny"), max(col(colY)).cast("long").as("mxy"))
    val z = df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(
        quantize(col(colX).cast("long"), col("mnx"), col("mxx")),
        quantize(col(colY).cast("long"), col("mny"), col("mxy"))))
      .drop("mnx", "mxx", "mny", "mxy")
    z.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The single-axis baseline: same file count, sorted by colX only. */
  def linearWrite(df: DataFrame, colX: String, path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(colX))
      .sortWithinPartitions(col(colX))
      .write.mode("overwrite").parquet(path)
}
