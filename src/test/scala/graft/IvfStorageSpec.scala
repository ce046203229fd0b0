package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The IVF storage claim made concrete (IvfIndex Scaladoc: "at 100 TB
  * the bucket column becomes the table's partition key, so a probe
  * touches only nProbe partitions"): write the indexed corpus
  * `partitionBy("bucket")`, probe a handful of lists, and assert the
  * scan plan actually prunes — `PartitionFilters` on `bucket` and no
  * post-scan filter doing the work. This is the data-skipping path a
  * real deployment takes; the in-session q47/q93 joins are the
  * query-time equivalent.
  */
class IvfStorageSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("a written IVF index prunes to the probed lists at the scan") {
    import graft.ops.IvfIndex
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf)
    val cs = IvfIndex.train(emb, "embedding", k = 8, seed = 42L)
    val dir = java.nio.file.Files.createTempDirectory("ivf_store").toString
    IvfIndex.index(emb, "embedding", cs)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

    val stored = spark.read.parquet(dir)
    val probes = Seq(1, 3) // the nProbe=2 lists a query would rank
    val probed = stored.filter(col("bucket").isin(probes: _*))

    // the probe only reads rows from the probed lists...
    val buckets = probed.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(buckets.subsetOf(probes.toSet))
    // ...and the plan proves it's partition PRUNING, not a scan+filter:
    // the bucket predicate appears as PartitionFilters on the file scan
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition filters at the scan:\n$plan")
    val pruned = probed.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(pruned.nonEmpty && pruned.forall(_ <= probes.length),
      s"expected <= ${probes.length} selected partitions, got $pruned")
  }
}
