package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Sinks
import graft.text.{Dictionary, TopK}

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("sparse vector string round-trips through parse") {
    import spark.implicits._
    val df = Seq((1L, Map("b" -> 0.5234, "a" -> 1.25)))
      .toDF("id", "vec")
      .withColumn("s", Sinks.sparseVectorString(col("vec")))
    val s = df.select("s").as[String].collect().head
    assert(s == "a:1.2500,b:0.5234") // key-sorted, %.4f
    val back = df.withColumn("m", Sinks.parseSparseVector(col("s")))
      .select("m").as[Map[String, Double]].collect().head
    assert(back == Map("a" -> 1.25, "b" -> 0.5234))
  }

  test("tsv sink writes golden-format lines; fan-out writes each sink once") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sinks").toString
    val df = Seq((1L, "x", 0.5), (2L, "y", 1.0)).toDF("id", "term", "w")
      .withColumn("w", Sinks.fmt4(col("w")))
    Sinks.writeTsv(df, tmp, "golden.mtx")
    val lines = spark.read.text(s"$tmp/golden.mtx").as[String].collect().sorted
    assert(lines.toSeq == Seq("1\tx\t0.5000", "2\ty\t1.0000"))

    var written = Vector.empty[String]
    Sinks.fanOut(df,
      "all" -> identity[org.apache.spark.sql.DataFrame] _,
      "big" -> ((d: org.apache.spark.sql.DataFrame) => d.filter(col("id") > 1))) {
      (d, name) => written :+= s"$name:${d.count()}"
    }
    assert(written == Vector("all:2", "big:1"))
  }

  test("composite key encode matches reference forms") {
    import spark.implicits._
    val df = Seq((3L, 7L)).toDF("doc", "term")
    val r = df.select(
      Sinks.tabKey(col("doc"), col("term")).as("t"),
      Sinks.underscoreKey(col("doc"), col("term")).as("u")).collect().head
    assert(r.getString(0) == "3\t7" && r.getString(1) == "3_7")
  }
}

class DictionarySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("windowed and scalable dense ids agree") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    val toks = graft.text.Tokenizer.tokens(docs, "text")
    val a = Dictionary.denseIds(toks.select(col("token")), "token")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Dictionary.denseIdsScalable(toks.select(col("token")), "token")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
    assert(a.map(_._2) == (1L to a.size).toSet)
  }
}

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("compat mode collapses ties like the reference TreeMap") {
    import spark.implicits._
    // values: a=5, b=5, c=3, d=2, e=1 — compat top-3 keeps one row per
    // distinct value: (b,5) [lex-last wins], (c,3), (d,2); ascending.
    val df = Seq(("a", 5L), ("b", 5L), ("c", 3L), ("d", 2L), ("e", 1L))
      .toDF("term", "cnt")
    val compat = TopK.globalCompat(df, "term", "cnt", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(compat == Seq(("d", 2L), ("c", 3L), ("b", 5L)))
    val correct = TopK.global(df, "term", "cnt", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(correct == Seq(("a", 5L), ("b", 5L), ("c", 3L)))
  }

  test("per-group compat keeps k largest distinct values per group") {
    import spark.implicits._
    val df = Seq(("g1", "a", 2.0), ("g1", "b", 2.0), ("g1", "c", 1.0),
      ("g2", "x", 9.0)).toDF("cat", "term", "w")
    val r = TopK.perGroupCompat(df, "cat", "term", "w", 2)
      .select("cat", "term", "w").collect()
      .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    assert(r == Set(("g1", "b", 2.0), ("g1", "c", 1.0), ("g2", "x", 9.0)))
  }
}

class KMeans2DGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val Ref = "/root/reference/BigDataLab02"

  test("reference data_points.txt: k=3 invariants (SURVEY §5 plan #2)") {
    assume(new java.io.File(s"$Ref/KMeans/Input/data_points.txt").isFile)
    import spark.implicits._
    val pts = spark.read.text(s"$Ref/KMeans/Input/data_points.txt")
      .select(split(col("value"), "\\s+").as("xy"))
      .select(col("xy").getItem(0).cast("double").as("x"),
        col("xy").getItem(1).cast("double").as("y"))
      .cache()
    assert(pts.count() == 300)
    val init = IndexedSeq((20.0, 20.0), (50.0, 50.0), (80.0, 80.0))
    val (cs, iters) = graft.cluster.KMeans2D.fit(pts, "x", "y", init, 30, 0.5)
    assert(cs.size == 3 && iters >= 1)
    // every point assigned to its argmin centroid; WSSSE non-increasing
    // across one more step
    val assigned = graft.cluster.KMeans2D.assign(pts, "x", "y", cs)
    val rows = assigned.collect()
    rows.take(100).foreach { r =>
      val (x, y) = (r.getDouble(0), r.getDouble(1))
      val d = cs.map(c => (x - c._1) * (x - c._1) + (y - c._2) * (y - c._2))
      assert(r.getInt(2) == d.indexOf(d.min))
    }
    def wssse(c: IndexedSeq[(Double, Double)]): Double =
      graft.cluster.KMeans2D.assign(pts, "x", "y", c)
        .select(sum(
          (col("x") - element_at(typedLit(c.map(_._1)), col("cluster") + 1))
            * (col("x") - element_at(typedLit(c.map(_._1)), col("cluster") + 1))
          + (col("y") - element_at(typedLit(c.map(_._2)), col("cluster") + 1))
            * (col("y") - element_at(typedLit(c.map(_._2)), col("cluster") + 1))))
        .collect()(0).getDouble(0)
    val next = graft.cluster.KMeans2D.step(pts, "x", "y", cs)
    assert(wssse(next) <= wssse(cs) + 1e-9)
  }
}
