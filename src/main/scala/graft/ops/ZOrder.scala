package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve clustering — the multi-dimensional data
  * layout lever: interleaving the bits of two sort keys gives a single
  * sort order in which rows close in EITHER dimension land close on
  * disk, so parquet min/max (or partition) pruning skips data for
  * predicates on any prefix of the dimensions — not just the leading
  * sort column. The standard technique behind Delta/Iceberg
  * `ZORDER BY`; here as plain Column arithmetic so it stays inside
  * whole-stage codegen and mirrors 1:1 into the DuckDB oracle.
  *
  * At 100 TB: `clusterByZ` = one range shuffle on the z-value (same
  * cost as any global sort) + in-partition sort; every written file
  * then covers a compact z-range = a small rectangle in (a, b) space,
  * so a scan with `a BETWEEN ..` AND/OR `b BETWEEN ..` prunes most
  * files from footer stats alone.
  */
object ZOrder {

  private val Masks = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit value (magic-number bit spreading, exact long math). */
  def spread16(x: Column): Column =
    Masks.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (acc, (sh, m)) => acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of two 16-bit dimensions: bits of `a` at even
    * positions, bits of `b` at odd. Values are masked to 16 bits —
    * callers bucket/quantize wider domains first (e.g. `pmod`). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The same spread as [[spread16]] over a SQL subexpression —
    * generates the oracle-side (or `expr`-side) text with identical
    * masks so both engines compute bit-identical codes. */
  def spread16Sql(e: String): String =
    Masks.foldLeft(s"(($e) & 65535)") {
      case (acc, (sh, m)) => s"(($acc | ($acc << $sh)) & $m)"
    }

  /** SQL mirror of [[zValue]]. */
  def zValueSql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Physically cluster `df` along the z-curve of (a, b): range
    * shuffle on the z-value, then sort within partitions, so each
    * output partition/file covers one compact z-range. The `_z`
    * column is dropped from the result. */
  def clusterByZ(df: DataFrame, a: Column, b: Column,
                 numPartitions: Int): DataFrame = {
    require(!df.columns.contains("_z"), "input must not already have a _z column")
    df.withColumn("_z", zValue(a, b))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
