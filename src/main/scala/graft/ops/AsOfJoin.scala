package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.graftbridge.Bridge

/** As-of (temporal) join — for every left row, attach the payload of
  * the latest right row with the same key whose timestamp is at or
  * before (inclusive) / strictly before (strict) the left timestamp.
  * The operator a feature-store / market-data / slowly-changing-
  * dimension lookup needs, and one Spark has no built-in for.
  *
  * Spark-first formulation: NOT a range join (whose naive plan is a
  * per-key cross product) but the single-shuffle union+window
  * technique — tag each side, union, then one window pass per key
  * ordered by (ts, side) where the side bit makes the window see
  * right rows at-or-before (or strictly-before) the left row; a
  * running `last(payload, ignoreNulls)` is then exactly the as-of
  * match. Cost: ONE shuffle on the key columns + a sort within
  * partitions — same shape as any windowed aggregation, no pair
  * explosion, driver state O(0); at 100 TB it scales exactly as far
  * as sessionization does.
  *
  * Determinism: if several right rows share (keys, ts), the window
  * order among them is unspecified — pre-reduce the right side to one
  * row per (keys, ts) (see q59's arg-max reduction) when that matters.
  *
  * Null semantics (both formulations, matching SQL equi joins and
  * DuckDB ASOF): a null in any right key or in the right ts means the
  * row can never be matched; a left row with a null key or ts gets a
  * null payload.
  */
object AsOfJoin {

  /** @param on       equi-key column names (both sides)
    * @param leftTs   left ordering column (any orderable type; both
    *                 sides must be mutually comparable)
    * @param rightTs  right ordering column
    * @param payload  right columns to carry onto matched left rows
    *                 (null when no right row precedes the left row)
    * @param prefix   prefix for the attached payload columns
    * @param inclusive true → right.ts <= left.ts (default as-of
    *                 semantics); false → strictly earlier only
    */
  def asOf(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           prefix: String = "asof_", inclusive: Boolean = true): DataFrame = {
    val reserved = Set("_ts", "_side", "_lrow", "_p", "_asof")
    val clash = (left.columns ++ right.columns).filter(reserved).distinct
    require(clash.isEmpty,
      s"inputs must not already have ${clash.mkString("/")} columns (reserved by asOf)")
    val lCols = left.columns.toSeq
    val dup = payload.map(prefix + _).filter(lCols.contains)
    require(dup.isEmpty,
      s"prefixed payload column(s) ${dup.mkString(", ")} collide with left columns — pick another prefix")
    // at equal ts the window must include right rows iff inclusive:
    // window order is (ts, side), rows from unbounded preceding to
    // CURRENT row — right sorts before left when its side bit is lower
    val (rSide, lSide) = if (inclusive) (0, 1) else (1, 0)

    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct.as("_p")).schema("_p").dataType
    val lStruct = struct(lCols.map(col): _*)
    val lType = left.select(lStruct.as("_lrow")).schema("_lrow").dataType

    val l = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(lSide).as("_side"),
        lStruct.as("_lrow"), lit(null).cast(pType).as("_p")): _*)
    // SQL null semantics: right rows with a null key or ts can never
    // match (a left null key then sees an empty partition → null
    // payload, exactly like the SQL equi condition)
    val r = right
      // fold (not reduce) so the keyless global as-of still works
      .filter(on.map(col(_).isNotNull)
        .foldLeft(col(rightTs).isNotNull)(_ && _))
      .select(
        on.map(col) ++ Seq(
          col(rightTs).as("_ts"), lit(rSide).as("_side"),
          lit(null).cast(lType).as("_lrow"), pStruct.as("_p")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === lSide)
      .select(lCols.map(c => col(s"_lrow.$c").as(c)) ++
        payload.map(p => col(s"_asof.$p").as(prefix + p)): _*)
  }

  /** Same contract as [[asOf]], executed by the NATIVE sort-merge
    * operator ([[graft.plans.AsOfJoinExec]]) instead of the
    * union+window plan — a whole-operator Catalyst extension (logical
    * node + planner strategy + physical exec). Registers the strategy
    * on the session idempotently; result-equal to [[asOf]]
    * (AsOfJoinSpec + the shared q59/q63 oracle prove it). */
  def asOfMerge(left: DataFrame, right: DataFrame, on: Seq[String],
                leftTs: String, rightTs: String, payload: Seq[String],
                prefix: String = "asof_", inclusive: Boolean = true): DataFrame = {
    // the exec clusters and merges on the key columns — a keyless
    // global as-of has no distribution to require; use asOf for that
    require(on.nonEmpty, "asOfMerge requires at least one key column (use asOf for a global as-of)")
    val dup = payload.map(prefix + _).filter(left.columns.contains)
    require(dup.isEmpty,
      s"prefixed payload column(s) ${dup.mkString(", ")} collide with left columns — pick another prefix")
    val spark = left.sparkSession
    Bridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    // SQL null semantics (same filter the window formulation applies):
    // right rows with a null key or ts can never match. Re-alias the
    // result so self-joins don't carry duplicate attribute ids.
    val r0 = right
      .filter(on.map(col(_).isNotNull)
        .foldLeft(col(rightTs).isNotNull)(_ && _))
      .queryExecution.analyzed
    val rPlan = Project(r0.output.map(a => Alias(a, a.name)()), r0)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${out.map(_.name)}"))
    // the exec compares keys/ts with orderings built from the LEFT
    // types — fail loudly on mismatched sides instead of mis-reading
    // the right rows (the window formulation would coerce via union)
    on.foreach { k =>
      val (lt, rt) = (attr(lPlan.output, k).dataType, attr(rPlan.output, k).dataType)
      require(lt == rt, s"key '$k' type mismatch: $lt vs $rt — cast one side first")
    }
    require(attr(lPlan.output, leftTs).dataType == attr(rPlan.output, rightTs).dataType,
      s"ts type mismatch: ${attr(lPlan.output, leftTs).dataType} vs " +
        s"${attr(rPlan.output, rightTs).dataType} — cast one side first")
    val payloadAttrs = payload.map(attr(rPlan.output, _))
    val payloadOut = payloadAttrs.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    Bridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      on.map(attr(lPlan.output, _)), on.map(attr(rPlan.output, _)),
      attr(lPlan.output, leftTs), attr(rPlan.output, rightTs),
      payloadAttrs, payloadOut, inclusive))
  }
}
