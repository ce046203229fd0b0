package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Skew

class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    graft.io.Tables.documents(spark, TestSession.sf)
      .limit(20).createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(split(text, ' ')) AS fp FROM docs_v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = spark.table("docs_v")
      .select(col("doc_id"),
        graft.functions.SimHash.simhash64(split(col("text"), " ")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // hamming + minhash_sig callable from SQL
    val h = spark.sql("SELECT hamming(7L, 1L)").collect().head.getInt(0)
    assert(h == 2)
    val sig = spark.sql("SELECT minhash_sig(array('a','b'), 8)")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 8)
    // code_sqdist callable from SQL: (1-4)² + (2-6)² = 25
    val cd = spark.sql("SELECT code_sqdist(array(1, 2), array(4, 6))")
      .collect().head.getLong(0)
    assert(cd == 25L)
  }
}

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("salted count equals plain groupBy count under heavy skew") {
    import spark.implicits._
    // 10k rows of one hot key + a tail
    val df = (Seq.fill(10000)("hot") ++ Seq("a", "a", "b")).toDF("k")
    val salted = Skew.saltedCount(df, Seq(col("k")), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 10000L, "a" -> 2L, "b" -> 1L))
  }

  test("salted plan has two aggregation stages over the salt") {
    import spark.implicits._
    val df = Seq("x", "y").toDF("k")
    val plan = Skew.saltedCount(df, Seq(col("k")), 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), plan)
  }

  test("salted join equals the plain join (inner + left, shuffle path)") {
    import spark.implicits._
    val big = (Seq.fill(5000)(("hot", 1.0)) ++ Seq(("a", 2.0), ("orphan", 3.0)))
      .toDF("k", "v")
    val small = Seq(("hot", 10L), ("a", 20L), ("unused", 30L)).toDF("k", "w")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (jt <- Seq("inner", "left")) {
        val salted = Skew.saltedJoin(big, small, Seq("k"), 8, jt)
          .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap
        val plain = big.join(small, Seq("k"), jt)
          .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap
        assert(salted == plain, s"joinType=$jt")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class TopKAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("aggregate top-k equals the window formulation (incl. ties)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    // ties on value force the key tie-break; group "b" smaller than k
    val df = Seq(("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 7.0, 3L),
      ("a", 1.0, 4L), ("a", 7.0, 5L), ("b", 2.0, 6L)).toDF("g", "value", "id")
    val topk = udaf(new graft.functions.TopKAggregator(3))
    val viaAgg = df.groupBy(col("g")).agg(topk(col("value"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rk"),
        col("kv._2").as("id"), col("kv._1").as("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val viaWindow = graft.text.TopK.perGroup(df, "g", "id", "value", 3)
      .select(col("g"), col("rk"), col("id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg == Set(("a", 1L, 3L, 7.0), ("a", 2L, 5L, 7.0), ("a", 3L, 1L, 5.0),
      ("b", 1L, 6L, 2.0)))
  }
}

class SparseMeanAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("one-pass UDAF centroid means equal the explode-groupBy means") {
    import graft.cluster.KMeansSparse
    val dv = graft.queries.Clustering.docVectors(spark, TestSession.sf)
    val init = KMeansSparse.seedByMinId(dv, "doc_id", "vec", 3)
    val assigned = KMeansSparse.assign(dv, "vec", init).cache()
    val a = KMeansSparse.meanCentroids(assigned, "vec", 3, init)
    val b = KMeansSparse.meanCentroidsOnePass(assigned, "vec", 3, init)
    a.zip(b).foreach { case (ma, mb) =>
      assert(ma.keySet == mb.keySet)
      ma.foreach { case (k, v) => assert(math.abs(v - mb(k)) < 1e-9) }
    }
  }

  test("native nearest-centroid expression equals the Scala kernel") {
    import spark.implicits._
    import graft.linalg.Sparse
    // seeded pseudo-random sparse vectors over a small term space so
    // centroid overlap (and cosine ties after 3-dec rounding) occur
    val rnd = new scala.util.Random(7)
    def vec(): Map[String, Double] =
      (0 until (1 + rnd.nextInt(6)))
        .map(_ => s"t${rnd.nextInt(10)}" -> (rnd.nextInt(9) + 1) / 4.0).toMap
    val rows = (1 to 300).map(i => (i.toLong, vec()))
    val centroids = IndexedSeq(vec(), vec(), vec(), Map.empty[String, Double])
    val df = rows.toDF("id", "vec")
    val native = graft.cluster.KMeansSparse.assign(df, "vec", centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val expected = rows.map { case (id, v) =>
      id -> Sparse.nearestByCosine(v, centroids) }.toMap
    assert(native == expected)
    // min-sqdist and per-centroid sqdist kernels vs the Scala reference
    import graft.functions.SparseCosineFunctions
    val d2 = df.select(col("id"),
        SparseCosineFunctions.minSqDistCentroids(col("vec"), centroids).as("m"),
        SparseCosineFunctions.sqDistToCentroid(col("vec"), lit(1), centroids).as("d1"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (id, v) =>
      assert(math.abs(d2(id)._1 - Sparse.minSqDist(v, centroids)) < 1e-9, s"minSqDist id=$id")
      assert(math.abs(d2(id)._2 - Sparse.sqDist(v, centroids(1))) < 1e-9, s"sqDistTo id=$id")
    }
    // empty input vector: cosine 0 everywhere -> first centroid
    val e = graft.cluster.KMeansSparse.assign(
      Seq((9L, Map.empty[String, Double])).toDF("id", "vec"), "vec", centroids)
      .collect().head.getInt(2)
    assert(e == 0)
  }

  test("nearest-centroid expression stays inside whole-stage codegen") {
    val dv = graft.queries.Clustering.docVectors(spark, TestSession.sf)
    val init = graft.cluster.KMeansSparse.seedByMinId(dv, "doc_id", "vec", 3)
    val plan = graft.cluster.KMeansSparse.assign(dv, "vec", init)
      .queryExecution.executedPlan.toString
    assert(plan.contains("nearestcentroidcosine") || plan.contains("NearestCentroidCosine"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"), plan)
  }

  test("NFC normalization: composed == normalized decomposed, codegen'd, SQL-registered") {
    import spark.implicits._
    val composed = "caf\u00e9"      // e-acute as one code point
    val decomposed = "cafe\u0301"   // e + combining acute
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain"), (4L, null))
      .toDF("id", "s")
    val out = df.select(col("id"), graft.functions.Normalize.nfc(col("s")).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == composed)
    assert(out(2L) == composed, "decomposed input must normalize to composed")
    assert(out(3L) == "plain")
    assert(out(4L) == null)
    // SQL surface + codegen (no interpreted fallback markers)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("nfc_v")
    val viaSql = spark.sql("SELECT id, nfc(s) AS n FROM nfc_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(viaSql == out)
  }

  test("optimizer rule: nested nfc() collapses to one pass (any depth)") {
    graft.functions.GraftFunctions.register(spark) // installs the rule too
    // non-local source: a Project over a local Seq relation would be
    // constant-folded whole before the count could see it
    val df = spark.range(3).select(col("id"),
      concat(lit("cafe\u0301 "), col("id").cast("string")).as("s"))
    val nfc = graft.functions.Normalize.nfc _
    val nested = df.select(col("id"), nfc(nfc(nfc(col("s")))).as("n"))
    val count = nested.queryExecution.optimizedPlan.expressions.map(e =>
      e.collect { case _: graft.functions.NfcNormalize => 1 }.sum).sum
    assert(count == 1, nested.queryExecution.optimizedPlan.toString)
    // semantics unchanged by the rewrite (idempotence: PropertySpec);
    // the decomposed input comes out composed
    val got = nested.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "caf\u00e9 1")
  }

  test("aggregator semantics: absent terms count as zero in the mean") {
    import org.apache.spark.sql.functions.udaf
    import spark.implicits._
    val df = Seq((0, Map("a" -> 2.0)), (0, Map("b" -> 4.0))).toDF("c", "vec")
    val meanVec = udaf(new graft.functions.SparseMeanAggregator)
    val m = df.groupBy(col("c")).agg(meanVec(col("vec")))
      .collect().head.getMap[String, Double](1)
    assert(m("a") == 1.0 && m("b") == 2.0) // divided by cluster size 2
  }
}
