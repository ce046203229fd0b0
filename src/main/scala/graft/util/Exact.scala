package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-deterministic aggregation of double columns.
  *
  * Floating-point sums depend on accumulation order, which differs across
  * partitionings, runs, and engines. Any aggregated double that must
  * hash-match an external oracle (DuckDB) goes through a scaled-integer
  * path: round to a fixed decimal scale, sum as Long (exact, associative,
  * commutative), and divide back once at the end. The final division is a
  * single deterministic double op, so both engines produce identical bits.
  *
  * At 100 TB the same property matters for reproducibility: integer sums
  * are stable under AQE re-partitioning, speculative retries, and skew
  * splitting, where double sums are not.
  */
object Exact {
  /** Column scaled to an exact Long at `scale` decimal digits.
    * `round` first so the double→long cast is applied to an
    * integer-valued double (cast semantics then agree across engines). */
  def scaled(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale).toLong).cast("long")

  /** Exact sum of a double column at `scale` decimals, returned as double.
    * Oracle-SQL mirror: CAST(SUM(CAST(ROUND(x * 10^s) AS BIGINT)) AS DOUBLE) / 10^s */
  def sumExact(c: Column, scale: Int = 2): Column =
    sum(scaled(c, scale)).cast("double") / math.pow(10, scale)

  /** Exact mean of a double column at `scale` decimals.
    * Oracle mirror: CAST(SUM(CAST(ROUND(x*10^s) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 10^s) */
  def avgExact(c: Column, scale: Int = 2): Column =
    sum(scaled(c, scale)).cast("double") / (count(lit(1)) * math.pow(10, scale))
}
