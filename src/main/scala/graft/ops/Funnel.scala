package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence FUNNEL analysis — the product-analytics operator:
  * per user, the first stage-1 event, the first stage-2 event STRICTLY
  * AFTER it, the first stage-3 event strictly after that, and so on
  * through `stages`. "Strictly after" is lexicographic on
  * (ts, event_id), so equal-timestamp events order deterministically
  * and the whole funnel replays cross-engine (oracle q152).
  *
  * Shape: one narrow scan + one user-keyed min-struct aggregation per
  * stage (partial-agg — no per-user event sort, no sessionize window);
  * every join stays on the user key, so a 100 TB event log funnels in
  * `stages.length` key shuffles. Output: (user, <stage>_us per stage,
  * stage = furthest 1-based stage reached); users who never performed
  * stage 1 are absent (they are not in the funnel).
  */
object Funnel {

  def funnel(events: DataFrame, userCol: String, typeCol: String,
             usCol: String, idCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col(userCol), col(typeCol),
      col(usCol).as("us"), col(idCol).as("eid"))
    // first event of `typ` per user, strictly after `prev`'s struct col
    def firstAfter(prev: Option[(DataFrame, String)], typ: String,
                   out: String): DataFrame = {
      val base = ev.filter(col(typeCol) === typ)
      val gated = prev match {
        case Some((df, p)) => base.join(df.select(col(userCol), col(p)), userCol)
          .filter(struct(col("us"), col("eid")) > col(p))
        case None => base
      }
      gated.groupBy(col(userCol))
        .agg(min(struct(col("us"), col("eid"))).as(out))
    }
    val firsts = stages.zipWithIndex.scanLeft(Option.empty[(DataFrame, String)]) {
      case (prev, (typ, i)) => Some((firstAfter(prev, typ, s"s$i"), s"s$i"))
    }.flatten
    val joined = firsts.tail.foldLeft(firsts.head._1) {
      case (acc, (df, p)) => acc.join(df, Seq(userCol), "left")
    }
    val stageExpr = firsts.tail.map { case (_, p) => col(p).isNotNull.cast("long") }
      .foldLeft(lit(1L): org.apache.spark.sql.Column)(_ + _)
    joined.select(
      col(userCol) +:
        stages.zipWithIndex.map { case (typ, i) =>
          col(s"s$i.us").as(s"${typ}_us")
        } :+
        stageExpr.as("stage"): _*)
  }
}
