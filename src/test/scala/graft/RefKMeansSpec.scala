package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Sinks
import graft.cluster.{KMeansSparse, KMeansParallel}

/** Part-2 structural checks on the reference's own fixtures (SURVEY §5
  * plan #2): the committed TFIDF.txt doc vectors (2,224 rows) and
  * weight.txt candidates drive the sparse K-Means and K-Means||
  * machinery through the reference text formats end-to-end.
  */
class RefKMeansSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val Ref = "/root/reference/BigDataLab02"

  lazy val refVectors = {
    spark.read.option("sep", "\t").csv(s"$Ref/KMeans/Input/TFIDF.txt-r-00000")
      .select(col("_c0").cast("long").as("doc_id"),
        Sinks.parseSparseVector(col("_c1")).as("vec"))
      .coalesce(4)
      .cache()
  }

  test("reference TFIDF.txt parses to 2,224 sparse vectors") {
    assume(new java.io.File(s"$Ref/KMeans/Input/TFIDF.txt-r-00000").isFile)
    assert(refVectors.count() == 2224)
    val sample = refVectors.filter(col("doc_id") === 1)
      .select("vec").collect().head.getMap[String, Double](0)
    // golden line 1 starts "24377:0.5234,24780:0.3079,..."
    assert(math.abs(sample("24377") - 0.5234) < 1e-12)
    assert(math.abs(sample("24780") - 0.3079) < 1e-12)
  }

  test("sparse K-Means on reference vectors: k clusters, WSSSE decreases") {
    assume(new java.io.File(s"$Ref/KMeans/Input/TFIDF.txt-r-00000").isFile)
    val init = KMeansSparse.seedRandom(refVectors, "doc_id", "vec", 5, seed = 7L)
    val l0 = KMeansSparse.wssse(
      KMeansSparse.assign(refVectors, "vec", init), "vec", init)
    val (cs, iters) = KMeansSparse.fit(refVectors, "vec", init, maxIter = 4)
    val l1 = KMeansSparse.wssse(
      KMeansSparse.assign(refVectors, "vec", cs), "vec", cs)
    assert(cs.size == 5 && iters >= 1)
    assert(l1 <= l0 + 1e-6, s"WSSSE should not increase: $l0 -> $l1")
    // every doc lands in a valid cluster; all clusters real
    val sizes = KMeansSparse.assign(refVectors, "vec", cs)
      .groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == 2224)
    assert(sizes.keys.forall(c => c >= 0 && c < 5))
  }

  test("reference weight.txt drives the weighted recluster (A8)") {
    assume(new java.io.File(s"$Ref/KMeans/Input/weight.txt").isFile)
    val wdf = spark.read.option("sep", "\t").csv(s"$Ref/KMeans/Input/weight.txt")
      .select(Sinks.parseSparseVector(col("_c0")).as("vec"),
        col("_c1").cast("double").as("w"))
      .collect()
    val cands = wdf.map(_.getMap[String, Double](0).toMap).toIndexedSeq
    val ws = wdf.map(_.getDouble(1)).toIndexedSeq
    assert(cands.size == 31)
    val cs = KMeansParallel.recluster(cands, ws, k = 5, conv = 0.8, maxIter = 10)
    assert(cs.size == 5 && cs.forall(_.nonEmpty))
  }
}
