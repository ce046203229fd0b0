package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Storage-layout levers for 100 TB (SURVEY scale notes): bucketing
  * eliminates the join shuffle entirely; partitioned writes give the
  * scan partition pruning. Demonstrated on real writes + plan asserts.
  */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("bucketed tables join without any shuffle exchange") {
    // warehouse.dir is static — tables land in ./spark-warehouse
    // (gitignored); drop tables AND their leftover locations up front
    // (a previous failed run may have left the directory behind)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    import scala.reflect.io.Directory
    Seq("orders_b", "lineitem_b").foreach(t =>
      new Directory(new java.io.File(s"spark-warehouse/$t")).deleteRecursively())
    val o = graft.io.Tables.orders(spark, TestSession.sf)
    val li = graft.io.Tables.lineitem(spark, TestSession.sf)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    // at test scale the optimizer would broadcast the small side; turn
    // that off so the plan shows what a 100 TB fact-fact join does
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // co-located bucket join: no Exchange feeds the join (only the
    // aggregation above it may shuffle)
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan)
    assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning(l_orderkey"),
      "join input should be bucket-co-located, not shuffled")
    // same result as joining the raw tables
    val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("partitioned write gives partition-pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    graft.io.Tables.lineitem(spark, TestSession.sf)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(l_returnflag"), scan)
    // count matches the unpartitioned filter
    val expect = graft.io.Tables.lineitem(spark, TestSession.sf)
      .filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == expect)
  }

  test("dynamic partition pruning: a dim filter prunes the fact scan at runtime") {
    // The 100 TB star-join workhorse: the filter lives on the DIM
    // side, so static pruning can't help — DPP turns the dim's
    // matched keys into a runtime IN-subquery on the fact's
    // partition column. Fact = lineitem partitioned by returnflag;
    // dim = a 3-row flag table filtered to one description.
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    graft.io.Tables.lineitem(spark, TestSession.sf)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    import spark.implicits._
    // the dim must be a REAL scan: a literal Seq folds to a
    // LocalRelation at optimization time and PartitionPruning then
    // sees no selective predicate to propagate
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    Seq(("R", "returned"), ("A", "ack"), ("N", "none"))
      .toDF("flag", "descr").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val q = spark.read.parquet(dir)
      .join(dim.filter(col("descr") === "returned"),
        col("l_returnflag") === col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val n = q.collect().head.getLong(0)
    val expect = graft.io.Tables.lineitem(spark, TestSession.sf)
      .filter(col("l_returnflag") === "R").count()
    assert(n == expect)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the fact scan:\n$plan")
  }
}
