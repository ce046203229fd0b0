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

  private val Masks3 = Seq(
    (32, 0x1f00000000ffffL), (16, 0x1f0000ff0000ffL),
    (8, 0x100f00f00f00f00fL), (4, 0x10c30c30c30c30c3L),
    (2, 0x1249249249249249L))

  /** Spread the low 21 bits of `x` to every third bit position
    * (3-way interleave; standard Morton3D magic constants). */
  def spread21(x: Column): Column =
    Masks3.foldLeft(x.cast("long").bitwiseAND(lit(0x1FFFFFL))) {
      case (acc, (sh, m)) => acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }

  /** 63-bit Morton code of three 21-bit dimensions (a at bit 0, b at
    * bit 1, c at bit 2 of each triple). Values masked to 21 bits. */
  def zValue3(a: Column, b: Column, c: Column): Column =
    spread21(a).bitwiseOR(shiftleft(spread21(b), 1))
      .bitwiseOR(shiftleft(spread21(c), 2))

  /** SQL mirrors of [[spread21]]/[[zValue3]]. The JVM's `<<` wraps
    * mod 2⁶⁴ (which the magic-constant algorithm is designed for),
    * but DuckDB RAISES on BIGINT shift overflow — so the SQL form
    * pre-masks with `m >> sh` before each shift: algebraically
    * `(acc | acc << sh) & m  ==  (acc & m) | ((acc & (m >> sh)) << sh)`,
    * and the pre-masked operand can never carry a bit past 62. */
  def spread21Sql(e: String): String =
    Masks3.foldLeft(s"(($e) & 2097151)") {
      case (acc, (sh, m)) =>
        s"((($acc & $m) | (($acc & ${m >> sh}) << $sh)))"
    }

  def zValue3Sql(a: String, b: String, c: String): String =
    s"(${spread21Sql(a)} | (${spread21Sql(b)} << 1) | (${spread21Sql(c)} << 2))"

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
