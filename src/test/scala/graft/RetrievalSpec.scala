package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, ZOrder}

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Bit-by-bit reference interleave (the definition, not the magic-
    * number implementation under test). */
  private def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
    z
  }

  test("zValue == bit-by-bit Morton reference on corners and seeded values") {
    val vals = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (65535, 0), (0, 65535)) ++
      (1 to 200).map(i => (math.abs(i * 2654435761L % 65536).toInt,
        math.abs(i * 40503L % 65536).toInt))
    val df = vals.toDF("a", "b")
      .withColumn("z", ZOrder.zValue(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  private def morton3Ref(a: Int, b: Int, c: Int): Long = {
    var z = 0L
    for (i <- 0 until 21)
      z |= (((a >> i) & 1).toLong << (3 * i)) |
        (((b >> i) & 1).toLong << (3 * i + 1)) |
        (((c >> i) & 1).toLong << (3 * i + 2))
    z
  }

  test("zValue3 == bit-by-bit 3-D Morton reference on corners and seeded values") {
    val m = (1 << 21) - 1
    val vals = Seq((0, 0, 0), (m, m, m), (m, 0, 0), (0, m, 0), (0, 0, m)) ++
      (1 to 150).map(i => (
        math.abs(i * 2654435761L % (m + 1)).toInt,
        math.abs(i * 40503L % (m + 1)).toInt,
        math.abs(i * 69069L % (m + 1)).toInt))
    val df = vals.toDF("a", "b", "c")
      .withColumn("z", ZOrder.zValue3(col("a"), col("b"), col("c")))
    df.collect().foreach { r =>
      assert(r.getLong(3) == morton3Ref(r.getInt(0), r.getInt(1), r.getInt(2)),
        s"(${r.getInt(0)}, ${r.getInt(1)}, ${r.getInt(2)})")
    }
  }

  test("SQL mirrors equal the Column forms over the full domain (incl. >=2^16 3-D inputs)") {
    // the 3-D SQL form must pre-mask before shifting (DuckDB raises on
    // BIGINT shift overflow where the JVM wraps) — assert the rewritten
    // algebra still computes the same codes, over values that exercise
    // the high bits
    val m = (1 << 21) - 1
    val df = spark.range(2000).select(
      ((col("id") * 7919) % (m + 1)).as("a"),
      ((col("id") * 40503) % (m + 1)).as("b"),
      ((col("id") * 149999) % (m + 1)).as("c"))
    val cmp3 = df.select(
        ZOrder.zValue3(col("a"), col("b"), col("c")).as("zc"),
        expr(ZOrder.zValue3Sql("a", "b", "c")).as("zs"))
      .filter(col("zc") =!= col("zs")).count()
    assert(cmp3 == 0)
    val cmp2 = df.select(
        ZOrder.zValue(col("a") % 65536, col("b") % 65536).as("zc"),
        expr(ZOrder.zValueSql("a % 65536", "b % 65536")).as("zs"))
      .filter(col("zc") =!= col("zs")).count()
    assert(cmp2 == 0)
  }

  test("values above 16 bits are masked, not corrupted") {
    val got = Seq((65536 + 5, 3)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"))).head.getLong(0)
    assert(got == mortonRef(5, 3))
  }

  test("clusterByZ: partitions cover disjoint compact z-ranges (pruning shape)") {
    val df = spark.range(4096).select(
      (col("id") % 64).cast("int").as("a"), (col("id") / 64).cast("int").as("b"))
    val clustered = ZOrder.clusterByZ(df, col("a"), col("b"), 8)
    assert(clustered.columns.toSeq == Seq("a", "b")) // _z dropped
    val ranges = clustered
      .withColumn("z", ZOrder.zValue(col("a"), col("b")))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.map(_._3).sum == 4096)
    // range partitioning on z ⇒ successive partitions' [lo, hi] don't overlap
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // z-clustering bounds each partition's (a, b) extent: a rectangle
    // predicate overlaps few partitions' z-ranges — the footer-stat
    // pruning a linear sort on `a` alone can't give for `b`
    assert(ranges.length > 1)
    val rej = intercept[IllegalArgumentException] {
      ZOrder.clusterByZ(df.withColumn("_z", lit(1)), col("a"), col("b"), 4)
    }
    assert(rej.getMessage.contains("_z"))
  }
}

class PosNGramsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.graftbridge.Bridge

  private def gen(n: Int) = Seq(
    (1L, "a b c d"), (2L, "x y"), (3L, ""), (4L, null.asInstanceOf[String]))
    .toDF("id", "text")
    .select(col("id"), Bridge.column(graft.functions.PosNGrams(
      Bridge.expression(col("text")), n)))

  test("generator emits (pos, ngram) rows; short/empty/null docs emit none") {
    val got = gen(3).collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set((1L, 0, "a b c"), (1L, 1, "b c d")))
    // n=1: every token with its position
    val uni = gen(1).filter(col("id") === 2L)
      .collect().map(r => (r.getInt(1), r.getString(2))).toSet
    assert(uni == Set((0, "x"), (1, "y")))
  }

  test("SQL surface: LATERAL VIEW pos_ngrams") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, "a b c d")).toDF("id", "text").createOrReplaceTempView("png_docs")
    val got = spark.sql(
      """SELECT id, pos, ngram FROM png_docs
        |LATERAL VIEW pos_ngrams(text, 2) AS pos, ngram""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set((1L, 0, "a b"), (1L, 1, "b c"), (1L, 2, "c d")))
  }

  test("SQL builder rejects non-literal / null / missing n with a clear message") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, "a b c", 2)).toDF("id", "text", "n").createOrReplaceTempView("png_bad")
    val e1 = intercept[Exception] {
      spark.sql("SELECT id, pos, ngram FROM png_bad LATERAL VIEW pos_ngrams(text, n) AS pos, ngram").collect()
    }
    assert(e1.getMessage.contains("integer literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT id, pos, ngram FROM png_bad LATERAL VIEW pos_ngrams(text, NULL) AS pos, ngram").collect()
    }
    assert(e2.getMessage.contains("NULL"))
    val e3 = intercept[Exception] {
      spark.sql("SELECT id, pos, ngram FROM png_bad LATERAL VIEW pos_ngrams(text) AS pos, ngram").collect()
    }
    assert(e3.getMessage.contains("at least 2 arguments"))
  }

  test("generator == the HOF sliding-window formulation on real docs") {
    val docs = TestSession.spark.read
      .parquet(s"${TestSession.sf}/documents.parquet").limit(50)
    val viaGen = docs.select(col("doc_id"), Bridge.column(
        graft.functions.PosNGrams(Bridge.expression(col("text")), 3)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaHof = docs.select(col("doc_id"),
        posexplode(filter(transform(
          split(col("text"), "\\s+"),
          (_, i) => concat_ws(" ",
            get(split(col("text"), "\\s+"), i),
            get(split(col("text"), "\\s+"), i + 1),
            get(split(col("text"), "\\s+"), i + 2))),
          s => size(split(s, " ")) === 3)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaGen == viaHof)
    assert(viaGen.nonEmpty)
  }
}

class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "red fox jumps"),
    (2L, "red red dog"),
    (3L, "blue fox"),
    (4L, "")).toDF("doc_id", "text")

  test("invertedIndex: doc_freq == postings length, repeats collapse, empty docs drop") {
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(idx("red") == ((2L, Seq(1L, 2L))))  // doc 2's repeat collapses
    assert(idx("fox") == ((2L, Seq(1L, 3L))))
    assert(idx("dog") == ((1L, Seq(2L))))
    assert(!idx.contains(""))
    idx.values.foreach { case (dfreq, posts) =>
      assert(dfreq == posts.length && posts == posts.sorted)
    }
  }

  test("coOccurrencePmi: presence counts, pair order, PMI sign") {
    val pmi = TextAnalysis.coOccurrencePmi(docs, "doc_id", "text", minPairDocs = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // "red fox" co-occur in doc 1 only; c_red=2, c_fox=2, N=4 → PMI = ln(4·1/4) = 0
    assert(pmi(("fox", "red"))._1 == 1L)
    assert(pmi(("fox", "red"))._2 == 0.0)
    // pairs are unordered (tok_a < tok_b): no reversed duplicates
    pmi.keys.foreach { case (a, b) => assert(a < b && !pmi.contains((b, a))) }
    // "dog red" only ever appear together (doc 2): PMI = ln(4·1/(1·2)) = ln 2 > 0
    assert(pmi(("dog", "red"))._2 > 0.69 && pmi(("dog", "red"))._2 < 0.70)
  }

  test("bm25: higher tf scores higher within a doc; rarer term beats common at equal tf") {
    val corpus = Seq(
      (1L, "apple apple apple banana common"),
      (2L, "banana common"),
      (3L, "cherry common"),
      (4L, "common")).toDF("doc_id", "text")
    val s = TextAnalysis.bm25(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    // tf monotonicity: apple (tf=3) > banana (tf=1) in doc 1 (equal df=... apple df=1, banana df=2 — both effects point the same way)
    assert(s((1L, "apple")) > s((1L, "banana")))
    // rarer beats common at equal tf in the same doc (same dl): cherry df=1 vs common df=4
    assert(s((3L, "cherry")) > s((3L, "common")))
    // df monotonicity across idf: same tf=1, same dl: banana (df=2) > common (df=4) in doc 2
    assert(s((2L, "banana")) > s((2L, "common")))
  }
}
