package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime filtering — the join-driven data-skipping Spark applies at
  * scale (SURVEY scale notes): dynamic partition pruning skips fact
  * partitions a filtered dimension can't match, and runtime bloom
  * filters semi-filter the big side before its shuffle. Both are
  * free consequences of declarative plans — these tests pin that the
  * engine's query shapes actually trigger them.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    graft.io.Tables.orders(spark, TestSession.sf)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dimension filtered on a DIFFERENT column than the join key — a
    // literal filter on the key itself would be propagated statically
    // (constant folding beats DPP); filtering on status forces the
    // runtime subquery that computes which partitions can match
    val dim = graft.io.Tables.orders(spark, TestSession.sf)
      .select(col("o_orderpriority").as("p"), col("o_orderstatus").as("st"))
      .distinct()
      .filter(col("st") === "F")
    val joined = fact.join(dim, fact("o_orderpriority") === dim("p"))
      .groupBy(col("st")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery in:\n${plan.take(1500)}")
    assert(joined.collect().nonEmpty)
  }

  test("runtime bloom filter semi-filters the big side of a selective join") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production thresholds gate on sizes: creation side must be
      // SMALL (under creationSideThreshold) and the application side
      // LARGE (over the scan threshold) — relax the latter so the
      // tiny test fact table still qualifies
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = graft.io.Tables.lineitem(spark, TestSession.sf)
      val o = graft.io.Tables.orders(spark, TestSession.sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter_agg") ||
          plan.contains("BloomFilter"),
        s"expected a runtime bloom filter in:\n${plan.take(1500)}")
      assert(joined.collect().head.getLong(0) > 0)
    }
  }
}
