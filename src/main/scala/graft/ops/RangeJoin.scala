package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — match every point row to every
  * interval row with lo <= point < hi. Spark's planner turns the
  * naive non-equi formulation into a broadcast-nested-loop (or worse,
  * a cartesian) — fine for a tiny interval side, fatal when both
  * sides are large. The scale-safe restatement is GRID BUCKETING:
  *
  *  - pick a cell size; each point hashes to exactly one cell
  *    (floor(p / cell));
  *  - each interval explodes to the cells it covers
  *    (sequence(floor(lo/cell), floor((hi-ε)/cell)));
  *  - equi-join on the cell key, then re-check lo <= p < hi.
  *
  * Each (point, interval) pair meets in at most ONE cell (the point's),
  * so no dedup pass is needed. Cost: a hash shuffle on the cell key —
  * the same shape as any equi join, AQE-skew-splittable — plus an
  * interval amplification of ~(len/cell + 1) rows, tunable via
  * `cellSize` (set it near the typical interval length).
  */
object RangeJoin {

  import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

  private def isIntegral(dt: DataType) = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // Double math loses integer precision beyond 2^53, and a row whose
  // cell id rounds differently from another side's exploded range is
  // silently DROPPED (the re-check filter only removes false
  // positives). When every input is integral and the cell size is
  // whole, stay in exact long arithmetic: floorDiv built from pmod +
  // SQL `div` (plain `/` on longs yields double again; `div` alone
  // truncates toward zero, wrong for negatives — but after
  // subtracting pmod the dividend is an exact multiple).
  // Domain assumption: `e - pmod(e, cs)` wraps for values within
  // cellSize of Long.MinValue (ANSI mode would raise). Inputs here are
  // timestamps / surrogate keys, which never sit at the Long boundary;
  // callers with adversarial domains should pre-shift into
  // [MinValue + cellSize, MaxValue - cellSize].
  private def cellFn(exact: Boolean, cellSize: Double): String => org.apache.spark.sql.Column =
    e =>
      if (exact) {
        val cs = s"${cellSize.toLong}L"
        expr(s"cast(((($e) - pmod(($e), $cs)) div $cs) as long)")
      } else floor(expr(e).cast("double") / cellSize).cast("long")

  /** @param points    left side; every column is kept
    * @param intervals right side; every column is kept (callers
    *                  prefix/rename to avoid collisions)
    * @param pointCol  numeric point column on `points`
    * @param loCol     interval start (inclusive) on `intervals`
    * @param hiCol     interval end (exclusive) on `intervals`
    * @param cellSize  grid cell width (> 0) */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    require(!points.columns.contains("_cell") && !intervals.columns.contains("_cell"),
      "inputs must not already have a _cell column")
    val exact = cellSize.isWhole && cellSize <= Long.MaxValue.toDouble &&
      isIntegral(points.schema(pointCol).dataType) &&
      isIntegral(intervals.schema(loCol).dataType) &&
      isIntegral(intervals.schema(hiCol).dataType)
    val cellOf = cellFn(exact, cellSize)
    val p = points.withColumn("_cell", cellOf(s"`$pointCol`"))
    // last covered cell: the one containing the largest value < hi.
    // For half-open [lo, hi) that is cell(hi) when hi is interior to
    // it, cell(hi)-1 when hi lands exactly on a cell boundary — for
    // integral inputs, exactly cell(hi - 1).
    val loCell = cellOf(s"`$loCol`")
    val hiCell =
      if (exact) cellOf(s"`$hiCol` - 1L")
      else (ceil(col(hiCol).cast("double") / cellSize) - 1).cast("long")
    val i = intervals
      .filter(col(loCol) < col(hiCol)) // empty intervals match nothing
      .withColumn("_cell", explode(sequence(loCell, greatest(loCell, hiCell))))
    p.join(i, Seq("_cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_cell")
  }

  /** Interval-overlap join — match every pair of rows whose half-open
    * intervals [loA, hiA) × [loB, hiB) intersect. Same grid-bucketing
    * shape as [[pointInInterval]], with an EXACTLY-ONCE twist: an
    * overlapping pair shares every cell in the intersection, so the
    * join would emit it once per shared cell — instead of a dedup
    * pass, keep the pair only in the single cell containing
    * max(loA, loB) (the intersection's first point, covered by both
    * sides by definition). Cost: one hash shuffle on the cell key,
    * amplification ~(len/cell + 1) per side.
    *
    * Column names must be disjoint across the two inputs (rename/
    * prefix first) — the result carries all columns of both. */
  def overlapJoin(a: DataFrame, b: DataFrame,
                  loA: String, hiA: String, loB: String, hiB: String,
                  cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    require(!a.columns.contains("_cell") && !b.columns.contains("_cell"),
      "inputs must not already have a _cell column")
    val overlapCols = a.columns.toSet.intersect(b.columns.toSet)
    require(overlapCols.isEmpty,
      s"column names must be disjoint across sides; shared: ${overlapCols.mkString(", ")}")
    val exact = cellSize.isWhole && cellSize <= Long.MaxValue.toDouble &&
      Seq(a.schema(loA), a.schema(hiA), b.schema(loB), b.schema(hiB))
        .forall(f => isIntegral(f.dataType))
    val cellOf = cellFn(exact, cellSize)
    def explodeCells(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loCell = cellOf(s"`$lo`")
      val hiCell =
        if (exact) cellOf(s"`$hi` - 1L")
        else (ceil(col(hi).cast("double") / cellSize) - 1).cast("long")
      df.filter(col(lo) < col(hi))
        .withColumn("_cell", explode(sequence(loCell, greatest(loCell, hiCell))))
    }
    explodeCells(a, loA, hiA).join(explodeCells(b, loB, hiB), Seq("_cell"))
      .filter(col(loA) < col(hiB) && col(loB) < col(hiA))
      .filter(col("_cell") === cellOf(s"greatest(`$loA`, `$loB`)"))
      .drop("_cell")
  }
}
