package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Invariant specs for the round-6 ingest operators: the quality-rule
  * suite, substring-span dedup, hard-negative mining, and the
  * largest-remainder mixture sampler. (Their end-to-end values are
  * oracle-checked as q124/q125/q126/q127 — these tests pin the
  * properties an oracle diff can't name.)
  */
class IngestOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ---- qualityFilter -------------------------------------------------

  test("qualityFilter: every rule splits the corpus, keep == conjunction") {
    val out = TextAnalysis.qualityFilter(
      graft.io.Tables.documents(spark, TestSession.sf), "doc_id", "text").cache()
    for (f <- Seq("ok_len", "ok_wordlen", "ok_top", "ok_bigram", "ok_stop")) {
      val vals = out.select(col(f)).distinct().as[Long].collect().toSet
      assert(vals == Set(0L, 1L), s"rule $f does not split the corpus: $vals")
    }
    val broken = out.filter(col("keep") =!=
      col("ok_len") * col("ok_wordlen") * col("ok_top") *
        col("ok_bigram") * col("ok_stop")).count()
    assert(broken == 0L)
    out.unpersist(blocking = false)
  }

  test("qualityFilter: hand-built docs trip the intended rules") {
    val docs = Seq(
      // 40 in-range tokens, mean len (3 + 39·5)/40 = 4.95 ∈ [4, 5],
      // varied, has a stop word
      (1L, (Seq("the") ++ (1 to 39).map(i => f"wrd$i%02d")).mkString(" ")),
      (2L, "tiny doc"),                        // fails ok_len (2 tokens)
      (3L, (Seq("the") ++ Seq.fill(39)("same")).mkString(" ")) // repetition
    ).toDF("doc_id", "text")
    val m = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("ok_len") == 1L && m(1L).getAs[Long]("keep") == 1L)
    assert(m(2L).getAs[Long]("ok_len") == 0L && m(2L).getAs[Long]("keep") == 0L)
    assert(m(3L).getAs[Long]("ok_top") == 0L, "39/40 same word must fail ok_top")
    assert(m(3L).getAs[Long]("ok_bigram") == 0L, "same-same bigrams must fail ok_bigram")
  }

  // ---- spanDedup -----------------------------------------------------

  test("spanDedup: shared span detected, unique doc clean, short doc zero spans") {
    val shared = "A" * 40 // exactly one full-length span per doc at len 40
    val docs = Seq(
      (1L, shared),             // span shared with doc 2
      (2L, shared),
      (3L, "B" * 40),           // unique full-length span
      (4L, "short")             // < spanLen: no spans at all
    ).toDF("doc_id", "text")
    val m = Dedup.spanDedup(docs, "doc_id", "text", spanLen = 40, stride = 20)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_frac"))).toMap
    assert(m(1L) == ((1L, 1L, 1.0)) && m(2L) == ((1L, 1L, 1.0)))
    assert(m(3L) == ((1L, 0L, 0.0)))
    assert(m(4L) == ((0L, 0L, 0.0)))
  }

  test("spanDedup: repeats WITHIN one doc don't count as duplication") {
    // one doc made of the same 40-char block repeated: every span may
    // collide with itself, but span_docs == 1 => nothing is "duplicated"
    val docs = Seq((1L, ("C" * 40) * 3)).toDF("doc_id", "text")
    val r = Dedup.spanDedup(docs, "doc_id", "text", 40, 20).collect().head
    assert(r.getAs[Long]("n_dup_spans") == 0L)
  }

  // ---- hardNegatives -------------------------------------------------

  test("hardNegatives: wrong-label only, below ceiling, cosine-ranked") {
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf)
    val out = Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", "label", k = 5).cache()
    val qLab = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("neighbor_label") != qLab(r.getAs[Long]("query_id")),
        "a hard negative must have a different label")
      assert(r.getAs[Double]("cos") < 0.999)
    }
    // within a query, rank order == descending cosine
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    out.unpersist(blocking = false)
  }

  // ---- mixtureSample -------------------------------------------------

  test("mixtureSample: exact total, near-proportional, partition-invariant") {
    val df = graft.io.Tables.documents(spark, TestSession.sf)
    val w = regexp_extract(col("source"), "src(\\d+)", 1).cast("long") + 1L
    val sel = TextAnalysis.mixtureSample(df, "source", "doc_id", w, total = 100L)
      .cache()
    assert(sel.count() == 100L, "largest-remainder must hit the total EXACTLY")
    // per-group allocation within 1 of the real-valued share
    val wsum = (1 to 20).map(_.toLong).sum // src0..src19 -> weights 1..20
    sel.groupBy(col("source")).agg(count(lit(1)).as("n"), first(col("alloc")).as("a"))
      .collect().foreach { r =>
        val src = r.getAs[String]("source")
        val share = 100.0 * (src.drop(3).toLong + 1) / wsum
        assert(r.getAs[Long]("n") == r.getAs[Long]("a"))
        assert(math.abs(r.getAs[Long]("a") - share) < 1.0,
          s"$src alloc ${r.getAs[Long]("a")} vs share $share")
      }
    val again = TextAnalysis.mixtureSample(df.repartition(13), "source",
      "doc_id", w, total = 100L)
    assert(sel.select("source", "doc_id").except(
      again.select("source", "doc_id")).count() == 0L,
      "selection must not depend on physical partitioning")
    sel.unpersist(blocking = false)
  }

  // ---- shardAssign ---------------------------------------------------

  test("shardAssign: exact balance, disjoint cover, partition-invariant") {
    val df = graft.io.Tables.documents(spark, TestSession.sf)
    val n = df.count()
    val a = TextAnalysis.shardAssign(df, "doc_id", nShards = 8).cache()
    assert(a.count() == n, "every row gets exactly one shard")
    val sizes = a.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(sizes.size == 8)
    assert(sizes.values.max - sizes.values.min <= 1L,
      s"round-robin deal must balance within 1: $sizes")
    // shard_pos is dense 0..size-1 within each shard
    val dense = a.groupBy("shard")
      .agg(count(lit(1)).as("c"), max(col("shard_pos")).as("m"))
      .filter(col("m") =!= col("c") - 1).count()
    assert(dense == 0L)
    val b = TextAnalysis.shardAssign(df.repartition(17), "doc_id", 8)
    assert(a.select("doc_id", "gpos").except(b.select("doc_id", "gpos")).count() == 0L,
      "global order must not depend on physical partitioning")
    a.unpersist(blocking = false)
  }

  // ---- Spectral.topDirection -----------------------------------------

  test("topDirection: finds a planted dominant axis, partition-invariant") {
    // 40 vectors hugging e3 (with tiny structured noise), 4 along e1:
    // the Gram matrix's top eigenvector is ≈ ±e3
    val rows = (0 until 40).map { i =>
      (i.toLong, Array(0.01 * (i % 3), 0.02, 1.0 + 0.001 * (i % 5)))
    } ++ (40 until 44).map(i => (i.toLong, Array(0.5, 0.0, 0.0)))
    val df = rows.toDF("vec_id", "embedding")
    val v = graft.ops.Spectral.topDirection(df, "embedding", iters = 3)
      .orderBy(col("dim")).collect()
    assert(v.length == 3)
    val comps = v.map(r => math.abs(r.getAs[Double]("comp")))
    assert(comps(2) == 1.0, "dominant axis must carry the max component")
    assert(comps(0) < 0.1 && comps(1) < 0.1, comps.mkString(","))
    // ∞-normalization: max |v9| is exactly the scale
    assert(v.map(r => math.abs(r.getAs[Long]("v9"))).max == 1000000000L)
    val v2 = graft.ops.Spectral.topDirection(df.repartition(7), "embedding", 3)
      .orderBy(col("dim")).collect()
    assert(v.map(_.getAs[Long]("v9")).toSeq == v2.map(_.getAs[Long]("v9")).toSeq,
      "scaled-long recurrence must be partition-invariant")
  }

  test("projections: planted-axis vectors lead the leverage ranking, partition-invariant") {
    val rows = (0 until 40).map { i =>
      (i.toLong, Array(0.01 * (i % 3), 0.02, 1.0 + 0.001 * (i % 5)))
    } ++ (40 until 44).map(i => (i.toLong, Array(0.5, 0.0, 0.0)))
    val df = rows.toDF("vec_id", "embedding")
    val top = graft.ops.Spectral.projections(df, "vec_id", "embedding",
      iters = 3, k = 10).collect()
    assert(top.length == 10)
    // every top-leverage row is one of the 40 e3-hugging vectors, and
    // ranking is by |proj9| desc
    assert(top.forall(_.getAs[Long]("vec_id") < 40L),
      "e1 outliers must not out-lever the dominant-axis rows")
    val abs9 = top.map(r => math.abs(r.getAs[Long]("proj9"))).toSeq
    assert(abs9 == abs9.sorted.reverse, "ordered by |proj9| desc")
    val t2 = graft.ops.Spectral.projections(df.repartition(5), "vec_id",
      "embedding", iters = 3, k = 10).collect()
    assert(top.map(_.getAs[Long]("proj9")).toSeq ==
      t2.map(_.getAs[Long]("proj9")).toSeq, "partition-invariant")
  }

  test("naiveBayes: separable synthetic corpus self-classifies perfectly, partition-invariant") {
    // two classes with disjoint-but-overlapping vocab: 'a' docs say
    // apple/fruit, 'b' docs say bolt/steel; 'the' is shared noise
    val rows = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "the apple fruit apple", "a")
      else (i.toLong, "the bolt steel bolt", "b")
    }
    val df = rows.toDF("doc_id", "text", "cls")
    val out = graft.ops.NaiveBayes.classify(df, "doc_id", "text", "cls")
      .orderBy(col("doc_id")).collect()
    assert(out.length == 20)
    assert(out.forall(_.getAs[Long]("correct") == 1L),
      out.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("pred"))).mkString(","))
    val out2 = graft.ops.NaiveBayes.classify(df.repartition(7), "doc_id",
      "text", "cls").orderBy(col("doc_id")).collect()
    assert(out.map(_.getAs[Long]("score9")).toSeq ==
      out2.map(_.getAs[Long]("score9")).toSeq,
      "scaled-long log-posteriors must be partition-invariant")
  }

  test("leakageSafeSplit: group members share a side, singletons match withSplit") {
    val docs = (0L until 50L).toDF("doc_id")
    // groups: {0,1,2} rep 0, {10,11} rep 10; rest singleton
    val groups = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "rep_id")
    val out = TextAnalysis.leakageSafeSplit(docs, "doc_id", groups)
      .select(col("doc_id"), col("rep_id"), col("split")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep_id"), r.getAs[String]("split"))).toMap
    assert(Set(out(0L), out(1L), out(2L)).size == 1,
      "near-dup group must land on one side of the boundary")
    assert(out(10L) == out(11L))
    // singletons: same assignment as the plain per-doc hash split
    val plain = TextAnalysis.withSplit(docs, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    for (id <- 3L until 10L) assert(out(id) == (id, plain(id)))
  }

  test("spanCorrupt: masked spans round-trip — splicing targets back rebuilds the doc") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ") // 25 toks: 2 full blocks
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.spanCorrupt(df, "doc_id", "text",
      blockLen = 10, spanLen = 2).collect().head
    assert(r.getAs[Long]("n_tok") == 25L)
    assert(r.getAs[Long]("n_masked") == 4L, "two complete blocks × span 2")
    val input = r.getAs[String]("input")
    val target = r.getAs[String]("target")
    // target: "<extra_id_a> wX wY <extra_id_b> wZ wW" — splice back
    val spans = target.split("<extra_id_").filter(_.nonEmpty)
      .map { s => val i = s.indexOf('>'); (s.take(i).toInt, s.drop(i + 1).trim) }
      .toMap
    val rebuilt = input.split(" ").flatMap { t =>
      if (t.startsWith("<extra_id_"))
        spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt).split(" ")
      else Array(t)
    }.mkString(" ")
    assert(rebuilt == text, s"round-trip failed:\n$rebuilt\n$text")
    assert(input.contains("<extra_id_0>") && input.contains("<extra_id_1>"))
    // partial third block (5 tokens) stays unmasked
    assert((21 to 25).count(i => input.contains(s"w$i")) == 5)
  }

  test("lmWindows: stride windows with next-token labels, none crossing the doc") {
    val df = Seq((1L, (1 to 13).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmWindows(df, "doc_id", "text", ctx = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("win_id")) ->
        (r.getAs[String]("context"), r.getAs[String]("target"))).toMap
    // doc 1: 13 tokens → windows at 0 and 4
    assert(out.size == 2, out.keys.toString)
    assert(out((1L, 0L)) == (((1 to 8).map("t" + _).mkString(" "), "t9")))
    assert(out((1L, 1L)) == (((5 to 12).map("t" + _).mkString(" "), "t13")))
  }

  test("contrastivePairs: positive is the next chunk, negative is deterministic and never the anchor") {
    val docs = (0 until 30).map(i => (i.toLong, ("x" * 90 + s" d$i ") * 3))
      .toDF("doc_id", "text")
    val out = TextAnalysis.contrastivePairs(docs, "doc_id", "text", 100)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, cid) = (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"))
      assert(r.getAs[String]("neg_key") != s"$id:$cid",
        "negative must not be the anchor itself")
      assert(r.getAs[String]("anchor") != r.getAs[String]("positive"))
    }
    val out2 = TextAnalysis.contrastivePairs(docs.repartition(7), "doc_id",
      "text", 100).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(4))).sorted.toSeq ==
      out2.map(r => (r.getLong(0), r.getLong(1), r.getString(4))).sorted.toSeq,
      "hash-order negatives must be partition-invariant")
  }

  test("marginMutualNN: planted aligned pairs are mutual; one-sided attraction is not") {
    // A-side 1 ↔ B-side 11 share axis e1; A 2 ↔ B 12 share e2.
    // A 3 points between e1/e2 — its top-1 (11 or 12) prefers its own
    // partner, so 3 must not emerge as a mutual pair.
    val a = Seq(
      (1L, Array(1.0, 0.1, 0.0)), (2L, Array(0.1, 1.0, 0.0)),
      (3L, Array(0.6, 0.6, 0.1))).toDF("vec_id", "embedding")
    val b = Seq(
      (11L, Array(1.0, 0.0, 0.1)), (12L, Array(0.0, 1.0, 0.1)),
      (13L, Array(0.0, 0.0, 1.0))).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.marginMutualNN(a, b, "vec_id",
        "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.get(1L).contains(11L), out.toString)
    assert(out.get(2L).contains(12L))
    assert(!out.contains(3L), "one-sided neighbor must fail the mutual filter")
  }

  test("marginMutualNNBucketed: full probe equals the brute-force arm exactly") {
    // nProbe = lists makes every query's candidate set the whole other
    // side, so the bucketed plan must reproduce marginMutualNN
    // value-for-value — the same provable-equality anchor as q75/q93,
    // here for the mutual-NN machinery (q266 then declares the PRUNED
    // configuration under its own oracle).
    val e = graft.io.Tables.embeddings(spark, TestSession.sf)
    val ev = e.filter(col("label") % 2 === 0)
    val od = e.filter(col("label") % 2 === 1)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val brute = graft.ops.Similarity.marginMutualNN(ev, od, "vec_id",
      "embedding", k = 4).collect().map(key).sorted.toSeq
    val full = graft.ops.Similarity.marginMutualNNBucketed(ev, od, "vec_id",
      "embedding", k = 4, lists = 8, nProbe = 8).collect().map(key).sorted.toSeq
    assert(full == brute, s"full-probe bucketed (${full.size}) != brute (${brute.size})")
    val pruned = graft.ops.Similarity.marginMutualNNBucketed(ev, od, "vec_id",
      "embedding", k = 4, lists = 8, nProbe = 3).collect()
    assert(pruned.nonEmpty, "pruned probe found no mutual pairs")
  }

  test("crossGroupOverlap: identical groups hit jaccard 1, disjoint pairs absent") {
    val df = Seq(
      (1L, "a", "one two three four five"),
      (2L, "b", "one two three four five"),   // identical to a
      (3L, "c", "six seven eight nine ten"),  // disjoint from a/b
      (4L, "d", "one two three zz qq")        // partial overlap with a/b
    ).toDF("doc_id", "g", "text")
    val out = Dedup.crossGroupOverlap(df, "g", "text")
      .collect().map(r => (r.getAs[String]("g_a"), r.getAs[String]("g_b")) ->
        (r.getAs[Long]("inter"), r.getAs[Double]("jaccard9"),
          r.getAs[Double]("containment9"))).toMap
    assert(out(("a", "b")) == ((3L, 1.0, 1.0)), s"identical: ${out(("a", "b"))}")
    assert(!out.contains(("a", "c")) && !out.contains(("b", "c")),
      "disjoint sources must not produce a pair row")
    val (i, j, c) = out(("a", "d"))
    assert(i == 1L && j > 0.0 && j < 1.0 && c > 0.0 && c < 1.0)
  }

  test("giniConcentration: uniform counts give 0, dominance raises it") {
    // group u: 4 terms × 3 occurrences each (uniform → G = 0)
    // group s: one term 20×, four terms 1× (heavily concentrated)
    val df = Seq(
      ("u", "w x y z w x y z w x y z"),
      ("s", ("dom " * 20) + "p q r s")
    ).toDF("g", "text")
    val out = graft.ops.CorpusStats.giniConcentration(df, "g", "text")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("gini9")).toMap
    assert(out("u") == 0.0, s"uniform distribution: ${out("u")}")
    assert(out("s") > 0.5 && out("s") < 1.0, s"concentrated: ${out("s")}")
  }

  test("correlationMatrix: planted linear/anti-linear pairs hit ±1, partition-invariant") {
    // dim2 = 2·dim1 (ρ=1), dim3 = 1 − dim1 (ρ=−1); values on a 0.1
    // grid so every scaled-long product is exact
    val rows = (1 to 20).map { i =>
      val x = 0.1 * (i % 7 + 1)
      (i.toLong, Array(x, 2.0 * x, 1.0 - x))
    }
    val df = rows.toDF("vec_id", "embedding")
    val c = graft.ops.Spectral.correlationMatrix(df, "embedding")
      .orderBy(col("i"), col("j")).collect()
    assert(c.length == 3) // upper triangle of d=3
    val byPair = c.map(r => ((r.getAs[Long]("i"), r.getAs[Long]("j")),
      r.getAs[Double]("corr9"))).toMap
    assert(byPair((1L, 2L)) == 1.0, s"linear pair: ${byPair((1L, 2L))}")
    assert(byPair((1L, 3L)) == -1.0, s"anti pair: ${byPair((1L, 3L))}")
    assert(byPair((2L, 3L)) == -1.0)
    assert(c.forall(_.getAs[Long]("n") == 20L))
    val c2 = graft.ops.Spectral.correlationMatrix(df.repartition(7), "embedding")
      .orderBy(col("i"), col("j")).collect()
    assert(c.map(_.getAs[Long]("sxy9")).toSeq ==
      c2.map(_.getAs[Long]("sxy9")).toSeq, "scaled-long moments partition-invariant")
    assert(c.map(_.getAs[Double]("corr9")).toSeq ==
      c2.map(_.getAs[Double]("corr9")).toSeq)
  }

  test("mixtureSample: total larger than some groups caps at group size") {
    // 3 groups of 4 rows, weights 1/1/8: group c wants 20 of 24 slots
    // but only has 4 rows — alloc is the demand; selection caps at size.
    val df = (0 until 12).map(i => (Seq("a", "b", "c")(i % 3), i.toLong))
      .toDF("g", "id")
    val w = when(col("g") === "c", 8L).otherwise(1L)
    val sel = TextAnalysis.mixtureSample(df, "g", "id", w, total = 10L)
    val perG = sel.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perG("c") == 4L, "cannot select more rows than the group has")
    assert(perG.values.sum <= 10L)
  }

  // ---- segmentDedup (C4 keep-first) ----------------------------------

  private def seg(words: String*): String = words.mkString(" ")

  test("segmentDedup: cross-doc and within-doc repeats drop, first stays") {
    val s1 = seg((1 to 8).map(i => s"a$i"): _*)
    val s2 = seg((1 to 8).map(i => s"b$i"): _*)
    val s3 = seg((1 to 8).map(i => s"c$i"): _*)
    val docs = Seq(
      (1L, s1 + " " + s2),  // both novel: kept
      (2L, s1 + " " + s3),  // first segment repeats doc 1: dropped
      (3L, s3 + " " + s3)   // within-doc repeat AND repeats doc 2
    ).toDF("doc_id", "text")
    val m = Dedup.segmentDedup(docs, "doc_id", "text", segWords = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_kept") == 2L)
    assert(m(1L).getAs[String]("clean_text") == s1 + " " + s2)
    assert(m(2L).getAs[Long]("n_kept") == 1L)
    assert(m(2L).getAs[String]("clean_text") == s3,
      "doc 2 must lose the segment doc 1 already owns, keep the novel one")
    assert(m(3L).getAs[Long]("n_segs") == 2L && m(3L).getAs[Long]("n_kept") == 0L,
      "doc 3's segments all occurred earlier (doc 2, then within-doc)")
    assert(m(3L).getAs[String]("clean_text") == "")
  }

  test("segmentDedup: duplicate-free corpus reconstructs byte-for-byte") {
    // ragged tails included: lengths not divisible by segWords
    val docs = Seq(
      (1L, (1 to 11).map(i => s"u$i").mkString(" ")),
      (2L, (1 to 8).map(i => s"v$i").mkString(" ")),
      (3L, "lone")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", segWords = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, text) <- Seq(1L -> (1 to 11).map(i => s"u$i").mkString(" "),
                           2L -> (1 to 8).map(i => s"v$i").mkString(" "),
                           3L -> "lone")) {
      assert(out(id).getAs[String]("clean_text") == text)
      assert(out(id).getAs[Long]("n_kept") == out(id).getAs[Long]("n_segs"))
    }
  }

  test("segmentDedup: each distinct segment survives exactly once corpus-wide") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    val out = Dedup.segmentDedup(docs, "doc_id", "text", segWords = 8)
    val kept = out.agg(sum("n_kept")).as[Long].head()
    // distinct segment texts, computed independently of the operator
    val segsIndep = docs.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), greatest(lit(1L),
            ceil(size(split(col("text"), "\\s+")).cast("double") / 8)
              .cast("long")) - 1),
          i => concat_ws(" ",
            slice(split(col("text"), "\\s+"), (i * 8).cast("int") + 1, lit(8)))))
          .as(Seq("seg_idx", "seg_text")))
    val distinctTexts = segsIndep.select("seg_text").distinct().count()
    assert(kept == distinctTexts,
      s"keep-first must retain each distinct segment once: $kept vs $distinctTexts")
  }

  // ---- semDedup (SemDeDup) -------------------------------------------

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("semDedup: near-dup cluster-mates drop, lowest id survives") {
    val emb = Seq(
      (0L, vec(1, 0, 0)),      // centroid 0 (codebook member, kept)
      (1L, vec(0, 1, 0)),      // centroid 1
      (10L, vec(2, 0, 0)),     // cos(·, id 0) = 1 → dropped (0 < 10)
      (11L, vec(3, 0.001, 0)), // ≈ same direction → dropped
      (20L, vec(0, 5, 1))      // cluster 1, cos vs centroid = 0.98 < τ: kept
    ).toDF("vec_id", "embedding")
    val m = Similarity.semDedup(emb, "vec_id", "embedding",
        nClusters = 2, tau = 0.99)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(m.size == 5, "one output row per input vector")
    assert(m(0L).getAs[Int]("keep") == 1 && m(1L).getAs[Int]("keep") == 1)
    assert(m(10L).getAs[Long]("cluster") == 0L)
    assert(m(10L).getAs[Int]("keep") == 0 && m(11L).getAs[Int]("keep") == 0)
    assert(m(20L).getAs[Long]("cluster") == 1L)
    assert(m(20L).getAs[Int]("keep") == 1)
  }

  test("semDedup: tau > 1 keeps everything; tau = -1 keeps one per cluster") {
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf)
    val all = Similarity.semDedup(emb, "vec_id", "embedding",
      nClusters = 16, tau = 1.1)
    assert(all.filter(col("keep") === 0).count() == 0L)
    val one = Similarity.semDedup(emb, "vec_id", "embedding",
        nClusters = 16, tau = -1.0).cache()
    val survivors = one.filter(col("keep") === 1)
    val perCluster = survivors.groupBy("cluster").count()
      .filter(col("count") =!= 1L).count()
    assert(perCluster == 0L, "cos >= -1 always holds: exactly one per cluster")
    // and the survivor is the cluster's minimum id
    val badMin = one.groupBy("cluster").agg(min("vec_id").as("mn")).join(
        survivors.select(col("cluster"), col("vec_id").as("sv")), "cluster")
      .filter(col("mn") =!= col("sv")).count()
    assert(badMin == 0L)
    one.unpersist(blocking = false)
  }

  // ---- dsirScore (DSIR importance resampling) ------------------------

  test("dsirScore: target-like docs outrank pool-like docs, exactly k selected") {
    // alpha/beta/delta land in distinct buckets (59/43/17) of the
    // 64-bucket portable hash — no collision muddies the ordering
    val docs = Seq(
      (1L, "alpha alpha alpha alpha", "en"),  // pure target vocabulary
      (2L, "beta beta beta beta", "fr"),      // pure pool vocabulary
      (3L, "alpha alpha beta beta", "fr"),    // mixed
      (4L, "delta delta delta delta", "fr")   // vocabulary absent from target
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.dsirScore(docs, "doc_id", "text",
        col("lang") === "en", dim = 64, select = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 4, "every doc is scored, selected or not")
    val lw = (i: Long) => out(i).getAs[Double]("logw")
    assert(lw(1L) > lw(3L), "all-target beats mixed")
    assert(lw(3L) > lw(2L), "mixed beats all-pool")
    assert(out.values.map(_.getAs[Int]("selected")).sum == 2)
    assert(out(1L).getAs[Int]("selected") == 1, "the most target-like doc is picked")
  }

  // ---- removeTopResidual (all-but-the-top) ---------------------------

  test("removeTopResidual: vectors along the dominant axis have zero residual") {
    import spark.implicits._
    // every vector an exact multiple of e1 → the 3-iteration direction
    // is e1 exactly, proj9 == x9[0], and the residual vanishes
    val df = (1 to 8).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == 0) i.toFloat / 10 else 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Spectral.removeTopResidual(df, "vec_id", "embedding",
      iters = 3, k = 8).collect()
    assert(out.length == 8)
    out.foreach(r => assert(r.getAs[Long]("rss12") == 0L,
      s"axis-aligned vector ${r.getLong(0)} must have zero residual"))
  }

  test("removeTopResidual: an orthogonal vector keeps its full energy") {
    import spark.implicits._
    // seven vectors on e1 dominate the direction; the e2 outlier's
    // projection is 0 so its residual energy is its own norm
    val rows = (1 to 7).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == 0) 1f else 0f))) :+
      (8L, Array.tabulate(4)(j => if (j == 1) 0.5f else 0f))
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.ops.Spectral.removeTopResidual(df, "vec_id", "embedding",
      iters = 3, k = 8).collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("proj9"), r.getAs[Long]("rss12"))).toMap
    assert(out(8L)._1 == 0L, "orthogonal vector projects to zero")
    // r9 = 0.5e9 → r6 = 5e5 → rss12 = 2.5e11
    assert(out(8L)._2 == 250000000000L)
    (1L to 7L).foreach(i => assert(out(i)._2 == 0L))
  }

  test("removeTopResidual: partition-invariant on the real table") {
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf)
    val a = graft.ops.Spectral.removeTopResidual(emb, "vec_id", "embedding",
      iters = 2, k = 20)
    val b = graft.ops.Spectral.removeTopResidual(emb.repartition(7),
      "vec_id", "embedding", iters = 2, k = 20)
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
  }

  // ---- tokenEntropy --------------------------------------------------

  test("tokenEntropy: repeated token → 0, uniform distinct → ln(n)") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),
      (2L, "a b c d"),
      (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tok"), r.getAs[Double]("ent"))).toMap
    assert(out(1L)._1 == 4L && math.abs(out(1L)._2) < 1e-9)
    assert(math.abs(out(2L)._2 - math.log(4)) < 1e-6)
    assert(out(3L)._1 == 1L && math.abs(out(3L)._2) < 1e-9)
  }

  test("tokenEntropy: skewed distribution scores below uniform") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a a a a a a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ent")).toMap
    assert(out(2L) < out(1L))
  }

  // ---- vocabGrowth ---------------------------------------------------

  test("vocabGrowth: per-batch new terms and cumulative vocabulary") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b"), (1L, "b c"),   // bucket 0: new {a, b, c}
      (2L, "c d"), (3L, "a e")    // bucket 1: new {d, e}
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(df, "doc_id", "text", bucketSize = 2L)
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L))
    assert(out.map(_.getAs[Long]("vocab_new")).toSeq == Seq(3L, 2L))
    assert(out.map(_.getAs[Long]("vocab_cum")).toSeq == Seq(3L, 5L))
  }

  test("vocabGrowth: cumulative vocabulary ends at the distinct term count") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    val out = TextAnalysis.vocabGrowth(docs, "doc_id", "text", 10L)
      .orderBy(col("bucket").desc).limit(1).collect().head
    val distinctTerms = docs
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .distinct().count()
    assert(out.getAs[Long]("vocab_cum") == distinctTerms)
  }

  // ---- dedupReport ---------------------------------------------------

  test("dedupReport: exact copies and component members counted per group") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "x y z"), (2L, "srcA", "x y z"),   // exact dup pair
      (3L, "srcA", "p q r"),
      (4L, "srcB", "x y z"),                          // dup of 1 across groups
      (5L, "srcB", "u v w")
    ).toDF("doc_id", "source", "text")
    val comp = Seq((3L, 3L), (5L, 3L)).toDF("doc_id", "rep_id") // fake near pair
    val out = Dedup.dedupReport(docs, "doc_id", "text", "source", comp)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("srcA")
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("n_exact_dups") == 1L, "doc 2 copies doc 1")
    assert(a.getAs[Long]("n_near_dup_docs") == 1L, "doc 3 is in a component")
    val b = out("srcB")
    assert(b.getAs[Long]("n_exact_dups") == 1L, "doc 4 copies doc 1 cross-group")
    assert(b.getAs[Long]("n_near_dup_docs") == 1L)
    assert(math.abs(b.getAs[Double]("near_frac") - 0.5) < 1e-12)
  }

  // ---- cdcChunkDedup -------------------------------------------------

  test("cdcChunkDedup: exact copies fully duplicated, unique/short docs clean") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val t = (1 to 300).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val u = (1 to 300).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, t), (2L, t), (3L, u), (4L, "short")).toDF("doc_id", "text")
    val m = Dedup.cdcChunkDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"),
          r.getAs[Double]("dup_frac"))).toMap
    assert(m(1L)._1 > 0 && m(1L)._3 == 1.0, s"copy pair fully dup: ${m(1L)}")
    assert(m(2L) == m(1L))
    assert(m(3L)._2 == 0L, "unique doc has no duplicated chunks")
    assert(m(4L)._1 == 1L && m(4L)._2 == 0L,
      "a sub-window doc is one whole-doc chunk")
  }

  test("cdcChunkDedup: boundaries survive a prefix insertion (the CDC property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val t = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, t), (2L, "zzz " + t)).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_dup_chunks")).toMap
    assert(cdc(1L) > 0L && cdc(2L) > 0L,
      "content-defined boundaries re-align after the insertion")
    // the fixed-stride family CANNOT re-align: every window of doc 2
    // is shifted 4 chars, so span dedup sees zero shared spans
    val fixed = Dedup.spanDedup(docs, "doc_id", "text", spanLen = 40, stride = 20)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_dup_spans")).toMap
    assert(fixed(1L) == 0L && fixed(2L) == 0L,
      "fixed-stride windows all shift under the same insertion")
  }

  // ---- normOutliers --------------------------------------------------

  test("normOutliers: a zeroed vector leads the deviation ranking") {
    import spark.implicits._
    // nine near-unit vectors + one zeroed row (the broken-shard case)
    val rows = (1 to 9).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == 0) 1f else 0.01f * i))) :+
      (10L, Array.fill(4)(0f))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.normOutliers(df, "vec_id", "embedding", k = 10)
      .collect()
    assert(out.head.getAs[Long]("vec_id") == 10L,
      "the zero vector must be the top outlier")
    assert(out.head.getAs[Long]("nsq9") == 0L)
    val devs = out.map(_.getAs[Long]("dev")).toSeq
    assert(devs == devs.sorted.reverse, "ordered by dev desc")
  }

  test("normOutliers: partition-invariant on the real table") {
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf)
    val a = Similarity.normOutliers(emb, "vec_id", "embedding", 20)
    val b = Similarity.normOutliers(emb.repartition(7), "vec_id", "embedding", 20)
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
  }

  // ---- sourceStats ---------------------------------------------------

  test("sourceStats: totals, max, and discrete percentiles on a known table") {
    import spark.implicits._
    val df = Seq(
      ("web", "a b c"), ("web", "a b"), ("web", "a b c d e"),
      ("book", "x y z w")).toDF("source", "text")
    val out = TextAnalysis.sourceStats(df, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert(web.getAs[Long]("n_docs") == 3L)
    assert(web.getAs[Long]("tok_total") == 10L)
    assert(web.getAs[Long]("tok_max") == 5L)
    assert(web.getAs[Long]("tok_p50") == 3L)
    assert(web.getAs[Long]("tok_p95") == 5L)
    assert(web.getAs[Long]("char_total") == 5L + 3L + 9L)
    val book = out("book")
    assert(book.getAs[Long]("n_docs") == 1L &&
      book.getAs[Long]("tok_p50") == 4L)
  }
}

class SpanRemovalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("duplicated windows merge into maximal spans; unique text emits none") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // docs 1 and 2 share chars [0, 80) exactly (4 overlapping windows at
    // stride 20 over an 80-char prefix), then diverge; doc 3 is unique.
    val shared = "A" * 25 + "B" * 30 + "C" * 25 // 80 chars
    val docs = Seq(
      (1L, shared + ("x" * 40) + shared.take(40) + "ZZ" * 20),
      (2L, shared + ("y" * 40)),
      (3L, (0 until 120).map(i => ('a' + (i * 7 + i / 3) % 26).toChar).mkString))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup
      .spanRemovalList(docs, "doc_id", "text", spanLen = 40, stride = 20)
      .orderBy("doc_id", "span_rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 3 never appears
    assert(!out.exists(_._1 == 3L), "unique doc must emit no removal span")
    // doc 2: one maximal span covering the shared 80-char prefix
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == 0L && d2.head._4 == 80L,
      s"doc 2 must merge its 3 full-windows into [0, 80): ${d2.toSeq}")
    // doc 1 has the prefix span; every cut is maximal (no two spans
    // touch or overlap) and span_rk is dense from 1
    val d1 = out.filter(_._1 == 1L)
    assert(d1.head._3 == 0L && d1.head._4 >= 80L)
    assert(d1.map(_._2).toSeq == (1L to d1.length).toSeq, "dense span_rk")
    d1.sliding(2).foreach {
      case Array(a, b) => assert(b._3 > a._4, s"spans must not touch: $a $b")
      case _ =>
    }
  }

  test("jlProject: hash-sign matrix is deterministic and linear") {
    import spark.implicits._
    def md5sign(i: Int, j: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_$j".getBytes("UTF-8"))
      val c = f"${h(0) & 0xff}%02x".charAt(0)
      if ("89abcdef".contains(c)) 1L else -1L
    }
    // one-hot at coordinate 2 (0-based) → proj9(j) = s(3, j)·10^9
    // (signs index 1-based coordinates)
    val oneHot = Seq((7L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.Spectral.jlProject(oneHot, "vec_id", "embedding", m = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    (0 to 3).foreach { j =>
      assert(got(j.toLong) == md5sign(3, j) * 1000000000L, s"dim $j sign") }
    // linearity: proj(2·v) = 2·proj(v)
    val doubled = Seq((7L, Array(0.0f, 0.0f, 2.0f))).toDF("vec_id", "embedding")
    val got2 = graft.ops.Spectral.jlProject(doubled, "vec_id", "embedding", m = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    (0 to 3).foreach { j => assert(got2(j.toLong) == 2 * got(j.toLong)) }
  }

  test("chiSquareSelect: 2×2 contingency hand case, positive-only, tie order") {
    import spark.implicits._
    val docs = Seq((1L, "A", "x y"), (2L, "A", "x z"), (3L, "B", "y z"),
      (4L, "B", "z w")).toDF("id", "cls", "text")
    val got = graft.ops.TextAnalysis.chiSquareSelect(docs, "id", "text",
        "cls", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(6), r.getLong(7)))
    // x|A: a=2 b=0 c=0 d=2 → χ² = 4·16/16 = 4; y diff=0 and z|A diff<0
    // drop; w|B and z|B tie at 4·4/12 = 1.333333333 → tok asc
    val t = BigDecimal(4.0 * 2.0 * 2.0 / 12.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(("A", "x", 2L, 4.0, 1L),
      ("B", "w", 1L, t, 1L), ("B", "z", 2L, t, 2L)))
  }

  test("sortedNeighborhoodPairs: window pairs over the sorted order") {
    import spark.implicits._
    val df = Seq((10L, 1L), (40L, 10L), (20L, 2L), (30L, 3L))
      .toDF("id", "k")
    val got = graft.ops.Dedup.sortedNeighborhoodPairs(df, "id", Seq("k"), 3)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 20L, 1L), (10L, 30L, 2L), (20L, 30L, 1L),
      (20L, 40L, 2L), (30L, 40L, 1L)))
  }

  test("sortedNeighborhoodPairs: ties in the key break by id (total order)") {
    import spark.implicits._
    val df = Seq((7L, 5L), (3L, 5L), (5L, 5L)).toDF("id", "k")
    val got = graft.ops.Dedup.sortedNeighborhoodPairs(df, "id", Seq("k"), 2)
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((3L, 5L), (5L, 7L)))
  }

  test("joinCardinality: predicts fan-out without running the join") {
    import spark.implicits._
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k").withColumn("ka", col("k"))
    val b = Seq(1L, 1L, 2L, 4L).toDF("k").withColumn("kb", col("k"))
    val got = graft.ops.Profile.joinCardinality(a, "ka", b, "kb", topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    // key 1: 3·2 = 6, key 2: 1·1 = 1; keys 3/4 unmatched; total 7
    assert(got.toSeq == Seq((1L, 1L, 6L, 7L, 2L), (2L, 2L, 1L, 7L, 2L)))
    assert(got.head._3 == a.join(b, col("ka") === col("kb")).count() - 1,
      "prediction matches the real join size (key 1's 6 of 7 rows)")
  }

  test("columnProfile: null and distinct counts per column") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), 1.5), (2L, None, 1.5), (3L, Some("a"), 2.5))
      .toDF("id", "s", "x")
    val got = graft.ops.Profile.columnProfile(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("id") == ((3L, 0L, 3L)))
    assert(got("s") == ((3L, 1L, 1L)), "null excluded from distinct")
    assert(got("x") == ((3L, 0L, 2L)))
  }

  test("paddingWaste: sorted batching never wastes more than arrival order") {
    import spark.implicits._
    // alternating short/long docs: arrival batches mix them (waste
    // high), sorted batches separate them (waste 0 — all equal within)
    val docs = (0 until 64).map(i =>
      (i.toLong, if (i % 2 == 0) "a b" else (1 to 20).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.paddingWaste(docs, "doc_id", "text", batchSize = 32)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("padded_tokens"))).toMap
    assert(out("arrival")._1 == out("sorted")._1, "totals identical")
    assert(out("sorted")._2 == out("sorted")._1,
      "equal lengths within sorted batches ⇒ zero padding")
    assert(out("arrival")._2 > out("arrival")._1,
      "mixed batches must pad")
  }

  test("vOptimalHistogram: buckets land on the planted cluster gaps, zero within-SSE") {
    import spark.implicits._
    // three tight clusters far apart: the 3-bucket V-optimal solution
    // is exactly one cluster per bucket with SSE 0 in each
    val vals = Seq.fill(40)(100L) ++ Seq.fill(30)(5000L) ++ Seq.fill(30)(9900L)
    val df = vals.toDF("v")
    val out = graft.ops.Profile.vOptimalHistogram(df, "v", preBins = 16,
      buckets = 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(40L, 30L, 30L),
      out.map(_.getAs[Long]("n")).mkString(","))
    assert(out.forall(_.getAs[Long]("sse2") == 0L),
      "single-valued clusters must have zero within-bucket SSE")
    // bucket ranges must cover each cluster's value
    val r1 = out(0)
    assert(r1.getAs[Long]("bin_lo_value") <= 100L &&
      r1.getAs[Long]("bin_hi_value") >= 100L)
  }

  test("skewAdvisor: verdicts flip at the declared share thresholds") {
    import spark.implicits._
    // col 'hot': one key holds 50% → salt; col 'warm': top 5% → hybrid;
    // col 'cold': uniform → plain
    val df = (0 until 100).map { i =>
      (if (i < 50) 0L else i.toLong,            // hot
        if (i < 5) 0L else i.toLong,            // warm
        i.toLong)                               // cold
    }.toDF("hot", "warm", "cold")
    val out = graft.ops.Skew.skewAdvisor(df, "t", Seq("hot", "warm", "cold"))
      .collect().map(r => r.getString(1) ->
        (r.getAs[Long]("top_cnt"), r.getString(7))).toMap
    assert(out("hot") == ((50L, "salt")))
    assert(out("warm") == ((5L, "hybrid")))
    assert(out("cold") == ((1L, "plain")))
  }

  test("trendingTerms: a term absent from slice A tops the rise ranking") {
    import spark.implicits._
    val df = Seq(
      ("old", "alpha beta beta"), ("old", "alpha beta"),
      ("new", "alpha nova nova nova"), ("new", "nova beta")
    ).toDF("crawl", "text")
    val out = graft.ops.CorpusStats.trendingTerms(df, "text",
        inA = col("crawl") === "old", inB = col("crawl") === "new", k = 3)
      .collect()
    assert(out.head.getAs[String]("term") == "nova",
      out.map(_.getString(0)).mkString(","))
    assert(out.head.getAs[Long]("c_a") == 0L &&
      out.head.getAs[Long]("c_b") == 4L)
    assert(out.head.getAs[Double]("ratio9") == 5.0) // (4+1)/(0+1)
  }

  test("deltaPostings: gaps reconstruct sorted ids, varint ladder byte-exact") {
    import spark.implicits._
    val df = Seq((5L, "apple"), (7L, "apple"), (200L, "apple"), (3L, "pear"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.deltaPostings(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("doc_freq"), r.getAs[String]("gaps"),
          r.getAs[Long]("varint_bytes"))).toMap
    // apple: ids 5,7,200 → gaps 5,2,193; bytes 1+1+2 = 4
    assert(out("apple") == ((3L, "5,2,193", 4L)), out("apple").toString)
    assert(out("pear") == ((1L, "3", 1L)))
  }

  test("tableDiff: added/removed/changed/same with exact changed-column lists") {
    import spark.implicits._
    val o = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val n = Seq((1L, "a", 10L), (2L, "B", 25L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    val out = graft.ops.Reconcile.tableDiff(o, n, "k", Seq("s", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == (("same", "")))
    assert(out(2L) == (("changed", "s,v")))
    assert(out(3L) == (("removed", "")))
    assert(out(4L) == (("added", "")))
  }

  test("quality checks: violation counts exact, uniqueness and ref integrity flag bad rows") {
    import spark.implicits._
    import graft.ops.Profile._
    val t = Seq((1L, 5L), (2L, -3L), (2L, 60L)).toDF("k", "v")
    val rows = rowRuleChecks(t, "t", Seq(
        "v_pos" -> (col("v") > 0), "v_le_50" -> (col("v") <= 50)))
      .collect().map(r => r.getString(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rows("v_pos") == ((1L, 0L)) && rows("v_le_50") == ((1L, 0L)))
    val u = uniqueCheck(t, "t", "k").collect().head
    assert(u.getLong(3) == 1L && u.getLong(4) == 0L, "duplicate key 2 counted")
    val parent = Seq(1L, 2L).toDF("pk")
    val ri = refIntegrityCheck(Seq(1L, 3L, 3L).toDF("fk"), "fk",
      parent, "pk", "t").collect().head
    assert(ri.getLong(3) == 2L, "two orphan rows on fk=3")
  }

  test("groupKFold: cluster-mates share a fold, folds cover [0,k)") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val groups = Seq((0L, 0L), (1L, 0L), (2L, 0L), (50L, 50L), (51L, 50L))
      .toDF("doc_id", "rep_id")
    val out = TextAnalysis.groupKFold(docs, "doc_id", groups, k = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fold")).toMap
    assert(out(0L) == out(1L) && out(1L) == out(2L),
      "dup cluster must stay within one fold")
    assert(out(50L) == out(51L))
    assert(out.values.toSet == Set(0L, 1L, 2L, 3L, 4L),
      s"200 docs should cover all 5 folds: ${out.values.toSet}")
  }

  test("leaveOneGroupOut: closed-form deltas match a direct recomputation") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("a", 20L), ("b", 100L), ("c", 40L))
      .toDF("g", "v")
    val out = graft.ops.CorpusStats.leaveOneGroupOut(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mean_wo9"), r.getAs[Double]("delta9"))).toMap
    // all mean = 42.5; without a → 70, without b → 23.333333333
    assert(out("a") == ((70.0, -27.5)))
    assert(out("b")._1 == 23.333333333)
    assert(math.abs(out("b")._2 - (42.5 - 23.333333333)) < 1e-9)
  }

  test("momentsProfile: symmetric two-point mass → skew 0, kurt 1; shape detects outliers") {
    import spark.implicits._
    // sym: 50×(+10), 50×(−10) → var 100, skew 0, kurtosis exactly 1
    // tail: 99×0 with one huge outlier → kurtosis ≈ n (heavy tail)
    val rows = (0 until 50).map(i => ("sym", 10L)) ++
      (0 until 50).map(i => ("sym", -10L)) ++
      (0 until 99).map(i => ("tail", 0L)) ++ Seq(("tail", 1000L))
    val out = graft.ops.Profile.momentsProfile(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("var2"), r.getAs[Double]("skew9"),
          r.getAs[Double]("kurt9"))).toMap
    assert(out("sym") == ((100.0, 0.0, 1.0)), out("sym").toString)
    val (_, sk, ku) = out("tail")
    assert(sk > 5.0 && ku > 50.0, s"heavy tail: skew=$sk kurt=$ku")
    val out2 = graft.ops.Profile.momentsProfile(
        rows.toDF("g", "v").repartition(7), "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("var2"), r.getAs[Double]("skew9"),
          r.getAs[Double]("kurt9"))).toMap
    assert(out == out2, "integer power sums ⇒ partition-invariant")
  }

  test("pngAverageHash: exact mean split, duplicates collide, zero-variance all-dark") {
    import spark.implicits._
    // text bytes are the pixels: 'a'*64 + 'z'*64 → low half 0s, high
    // half 1s; a duplicate payload must produce the identical hash
    val t = ("a" * 64) + ("z" * 64)
    val df = Seq((1L, t), (2L, t), (3L, "b" * 128)).toDF("doc_id", "text")
    val out = graft.ops.Multimodal.pngAverageHash(df, "doc_id", "text",
        width = 16, height = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_set"), r.getAs[String]("ahash"))).toMap
    assert(out(1L)._1 == 64L)
    assert(out(1L)._2 == ("0" * 64) + ("1" * 64))
    assert(out(1L) == out(2L), "identical images must collide")
    assert(out(3L)._1 == 0L, "constant image: no pixel exceeds the mean")
  }

  test("columnLineage: aliases fold reference sources, pass-throughs reach the leaf") {
    import spark.implicits._
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    val q = docs.filter(col("n_chars") > 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars") * length(col("source"))).as("mix"))
    val lin = graft.plans.Lineage.columnLineage(q).toMap
    assert(lin("lang") == Seq("documents.lang"))
    assert(lin("n") == Seq())
    assert(lin("mix") == Seq("documents.n_chars", "documents.source"))
  }

  test("sq8ReconError: grid-aligned vectors reconstruct exactly, off-grid do not") {
    import spark.implicits._
    // dims span [0, 255]: integer values sit exactly on the 255-step
    // grid → zero loss; a fractional value cannot
    val df = Seq(
      (1L, Array(0.0f, 255.0f)), (2L, Array(255.0f, 0.0f)),
      (3L, Array(128.0f, 10.5f))).toDF("vec_id", "embedding")
    val out = graft.ops.Quantize.sq8ReconError(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("sse9")).toMap
    assert(out(1L) == 0L && out(2L) == 0L, out.toString)
    assert(out(3L) > 0L, "off-grid component must lose precision")
  }

  test("bitHamming kernel == interpreted HOF fold on random bit strings") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = (0 until 50).map { i =>
      (Seq.fill(128)(if (rng.nextBoolean()) '1' else '0').mkString,
        Seq.fill(128)(if (rng.nextBoolean()) '1' else '0').mkString)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
        graft.functions.StringSimFunctions.bitHamming(col("a"), col("b"))
          .as("k"),
        expr("aggregate(sequence(0, 127), 0L, (acc, i) -> acc + " +
          "IF(substring(a, i+1, 1) = substring(b, i+1, 1), 0L, 1L))")
          .as("h"))
      .collect()
    assert(got.forall(r => r.getLong(0) == r.getLong(1)))
    // length-mismatch overhang counts as all-different
    val m = Seq(("0101", "01")).toDF("a", "b").select(
      graft.functions.StringSimFunctions.bitHamming(col("a"), col("b")))
      .head().getLong(0)
    assert(m == 2L)
  }

  test("ahashPairs: pigeonhole banding finds every pair within the bound, none beyond") {
    import spark.implicits._
    // hashes: h1/h2 differ in 3 bits, h1/h3 in 30 — threshold 8 keeps
    // only (1,2); a duplicate of h1 pairs at distance 0
    val h1 = "01" * 64
    def flip(s: String, ps: Int*): String = ps.foldLeft(s) { (acc, p) =>
      acc.updated(p, if (acc(p) == '0') '1' else '0')
    }
    val h2 = flip(h1, 5, 60, 100)       // 3 differing bits
    val h3 = flip(h1, 0 until 30: _*)   // 30 differing bits
    val fps = Seq((1L, h1), (2L, h2), (3L, h3), (4L, h1))
      .toDF("media_id", "ahash")
    val out = graft.ops.Multimodal.ahashPairs(fps, "media_id", "ahash",
        maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.contains((1L, 4L)) && out((1L, 4L)) == 0L, "exact dup at 0")
    assert(out.contains((1L, 2L)) && out((1L, 2L)) == 3L, out.toString)
    assert(out.contains((2L, 4L)) && out((2L, 4L)) == 3L)
    assert(!out.keys.exists(p => p._1 == 3L || p._2 == 3L),
      "distance-30 pair must not survive")
  }

  test("greedyCoverage: picks by marginal gain, saturates early") {
    import spark.implicits._
    // 3-gram shingles: doc 1 = {a b c, b c d}, doc 2 ⊂ doc 1,
    // doc 3 = {c e f, e f g}, doc 4 too short for any shingle
    val docs = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "c e f g"),
      (4L, "a b")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.greedyCoverage(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // round 1: doc 1 covers 2 (ties doc 3, lower id wins); round 2:
    // doc 3 adds its 2; then saturation → only 2 rows
    assert(got == Seq((1L, 1L, 2L), (2L, 3L, 2L)))
  }

  test("centroidDrift: aligned halves → cos 1, orthogonal halves → cos 0") {
    import spark.implicits._
    // label 0: both halves along +x (different magnitudes — cosine is
    // scale-invariant); label 1: even half +x, odd half +y
    val rows = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(3.0f, 0.0f)),
      (1L, 0, Array(2.0f, 0.0f)),
      (10L, 1, Array(1.0f, 0.0f)), (11L, 1, Array(0.0f, 5.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = graft.ops.Similarity
      .centroidDrift(rows, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(6))).toMap
    assert(got(0) == ((2L, 1L, 1.0)), "collinear sums → exactly 1.0")
    assert(got(1) == ((1L, 1L, 0.0)), "orthogonal sums → exactly 0.0")
  }

  test("prefixJaccardPairs ≡ exactJaccardPairs at several thresholds") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val exact = graft.ops.Dedup
        .exactJaccardPairs(docs, "doc_id", "text", threshold = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      val pruned = graft.ops.Dedup
        .prefixJaccardPairs(docs, "doc_id", "text", threshold = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      assert(pruned == exact, s"prefix filter must be lossless at tau=$tau")
    }
  }

  // ---- phraseSearch --------------------------------------------------

  test("phraseSearch: adjacency, overlap, and repeated-term phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big data on spark big data"),   // 2 hits of "big data"
      (2L, "data big"),                      // reversed: no hit
      (3L, "big x data"),                    // not adjacent: no hit
      (4L, "x x x x"))                       // overlapping "x x x": 2 hits
      .toDF("doc_id", "text")
    val bg = TextAnalysis.phraseSearch(docs, "doc_id", "text", "big data")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(bg == Map(1L -> ((2L, 0))))
    val xxx = TextAnalysis.phraseSearch(docs, "doc_id", "text", "x x x")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(xxx == Map(4L -> ((2L, 0))))
    val three = TextAnalysis.phraseSearch(docs, "doc_id", "text", "data on spark")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(three == Map(1L -> ((1L, 1))))
  }

  // ---- containmentPairs ----------------------------------------------

  test("containmentPairs: fragment-in-superset found where Jaccard misses") {
    import spark.implicits._
    val frag = "alpha beta gamma delta epsilon"          // 3 shingles
    val filler = (1 to 40).map(i => s"w$i").mkString(" ") // 38+ shingles
    val docs = Seq(
      (1L, frag),
      (2L, s"$frag $filler"),   // superset: frag fully contained
      (3L, "zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.containmentPairs(docs, "doc_id", "text", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // direction 1→2 passes at containment 1.0; the reverse direction
    // (superset contained in fragment) must NOT
    assert(got.count(t => t._1 == 1L && t._2 == 2L && t._3 == 1.0) == 1)
    assert(!got.exists(t => t._1 == 2L && t._2 == 1L))
    // and plain Jaccard at the same tau sees nothing
    val jac = graft.ops.Dedup.exactJaccardPairs(docs, "doc_id", "text",
      threshold = 0.8).count()
    assert(jac == 0L)
  }

  test("containmentPairsPrefix ≡ containmentPairs at several thresholds " +
    "(directed prefix filter is lossless), corpus + hand case") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    for (tau <- Seq(0.5, 0.8)) {
      val exact = graft.ops.Dedup
        .containmentPairs(docs, "doc_id", "text", tau = tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
        .sorted.toSeq
      val pruned = graft.ops.Dedup
        .containmentPairsPrefix(docs, "doc_id", "text", tau = tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
        .sorted.toSeq
      assert(pruned == exact, s"prefix filter must be lossless at tau=$tau")
    }
    // the hand case: asymmetric direction survives the prefix filter
    import spark.implicits._
    val frag = "alpha beta gamma delta epsilon"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val hand = Seq((1L, frag), (2L, s"$frag $filler"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val got = graft.ops.Dedup
      .containmentPairsPrefix(hand, "doc_id", "text", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.count(t => t._1 == 1L && t._2 == 2L && t._3 == 1.0) == 1)
    assert(!got.exists(t => t._1 == 2L && t._2 == 1L))
  }

  test("containmentPairsAdaptive: budget picks the plan (rank window " +
    "present only on the prefix side), output identical either way") {
    import spark.implicits._
    val frag = "alpha beta gamma delta epsilon"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val hand = Seq((1L, frag), (2L, s"$frag $filler"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val asNaive = graft.ops.Dedup.containmentPairsAdaptive(
      hand, "doc_id", "text", tau = 0.8, naivePairBudget = Long.MaxValue)
    val asPrefix = graft.ops.Dedup.containmentPairsAdaptive(
      hand, "doc_id", "text", tau = 0.8, naivePairBudget = 0L)
    // the switch is observable in the PLAN (the prefix side carries
    // the canonical-order rank window; the naive grid has no window)
    assert(!asNaive.queryExecution.optimizedPlan.toString
      .contains("row_number"))
    assert(asPrefix.queryExecution.optimizedPlan.toString
      .contains("row_number"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sorted.toSeq
    assert(rows(asNaive) == rows(asPrefix))
  }

  test("containmentPairsPrefix: ⌈n·τ⌉ is exact decimal, not double " +
    "(τ=0.3, n=10 — the ADVICE r10 rounding edge)") {
    import spark.implicits._
    // A has 10 shingles: 7 rare (df=1) rank first in canonical order,
    // the 3 shared with B (df=2) rank 8-10. Exact ⌈10·0.3⌉ = 3 keeps
    // a prefix of 10−3+1 = 8 — one shared shingle probes B. The
    // double-arithmetic bug (10·0.3 → 3.0000000000000004, ceil 4)
    // shrinks the prefix to 7 rare-only shingles and silently drops
    // the pair at exactly containment = τ.
    val a = "u1 u2 u3 u4 u5 u6 u7 u8 u9 x y z" // 10 shingles
    val b = "u8 u9 x y z"                      // its last 3 shingles
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val naive = graft.ops.Dedup
      .containmentPairs(docs, "doc_id", "text", tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = graft.ops.Dedup
      .containmentPairsPrefix(docs, "doc_id", "text", tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.contains((1L, 2L)), "A→B at exactly containment 0.3")
    assert(pruned == naive, "prefix filter must be lossless AT the edge")
  }

  test("containmentCandidateReport: hand-checkable volumes, " +
    "partition-invariant (tie-break-free sums)") {
    import spark.implicits._
    // doc1 ≡ doc2 ("a b c d e" → 3 shingles each, df = 2); doc3 disjoint
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val r = graft.ops.Dedup
      .containmentCandidateReport(docs, "doc_id", "text", tau = 0.8)
      .collect().head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_shingle_rows") == 9L)
    assert(r.getAs[Long]("n_distinct_shingles") == 6L)
    // naive = 3 shared shingles × C(2,2) = 3
    assert(r.getAs[Long]("join_rows_naive") == 3L)
    // prefix cut at n=3, τ=.8: 3 − ⌈2.4⌉ + 1 = 1 prefix shingle/doc;
    // Σ(df−1) = 1 (doc1) + 1 (doc2) + 0 (doc3) = 2
    assert(r.getAs[Long]("n_prefix_rows") == 3L)
    assert(r.getAs[Long]("join_rows_prefix") == 2L)
    assert(r.getAs[Long]("reduction_ratio6") == 1500000L)
    // the sums are functions of the df multiset only — invariant to
    // partitioning (and therefore to any rank tie-break)
    val r2 = graft.ops.Dedup
      .containmentCandidateReport(docs.repartition(7), "doc_id", "text",
        tau = 0.8)
      .collect().head
    assert(r.toSeq == r2.toSeq)
  }

  // ---- mmrRerank -----------------------------------------------------

  test("mmrRerank: diversity beats redundancy on a hand-built pool") {
    import spark.implicits._
    // query q=(1,0); a≈b are near-duplicates close to q; c is a
    // distinct facet. rel: a=.60 b=.59 c=.50 → plain top-2 = (a, b);
    // MMR scores at round 2: b = .59−sim(b,a)=.59−.365=.225,
    // c = .50−sim(c,a)=.50−.22=.28 → the redundancy penalty swaps
    // b for c at rank 2.
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)),          // query
      (1L, Seq(0.6f, 0.1f)),          // a
      (2L, Seq(0.59f, 0.11f)),        // b ≈ a
      (3L, Seq(0.5f, -0.8f)))         // c: different direction
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(rows, "vec_id", "embedding",
        queryId = 0L, pool = 3, k = 2)
      .orderBy(col("sel_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 3L)))
  }

  test("mmrRerank: rank-1 equals the plain relevance argmax on real data") {
    import graft.functions.VectorFunctions.dotScaled
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf)
    val out = Similarity.mmrRerank(emb, "vec_id", "embedding",
        queryId = 0L, pool = 10, k = 3)
      .orderBy(col("sel_rank")).collect()
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .collect().head.getSeq[Float](0)
    val top = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), dotScaled(col("embedding"), typedlit(qv)).as("rel9"))
      .orderBy(col("rel9").desc, col("vec_id")).limit(1)
      .collect().head
    assert(out(0).getLong(1) == top.getLong(0))
    assert(out(0).getLong(2) == top.getLong(1))
    // mmr9 scores are non-increasing is NOT guaranteed, but each row's
    // mmr9 must equal rel9 − maxsim9 by construction
    out.foreach(r => assert(r.getLong(4) == r.getLong(2) - r.getLong(3)))
  }

  // ---- kCenterGreedy -------------------------------------------------

  test("kCenterGreedy: farthest-point order on a 1-D line, ties to min id") {
    import spark.implicits._
    // points on a line at 0, 1, 10, 20 (encoded as 2-dim vectors):
    // seed = id 1 (min id, at 0); farthest = 20, then 10, then 1
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(10.0f, 0.0f)), (4L, Seq(20.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterGreedy(pts, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 4L), (3L, 3L), (4L, 2L)))
  }

  test("kCenterGreedy: selected-set min-distances are monotone non-increasing") {
    val emb = graft.io.Tables.embeddings(spark, TestSession.sf).limit(200)
    val d2s = Similarity.kCenterGreedy(emb, "vec_id", "embedding", k = 6)
      .orderBy(col("sel_rank")).collect().map(_.getLong(2)).drop(1)
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b },
      s"greedy radii must not increase: ${d2s.toSeq}")
  }

  // ---- kneserNeyBigrams ----------------------------------------------

  test("kneserNeyBigrams: hand-computed rational on a 3-bigram corpus") {
    import spark.implicits._
    // corpus: "a b", "a b", "a c"  →  c(a)=3, t1(a)=2 ({b,c}), B=2,
    // l2(b)=1, l2(c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyBigrams(docs, "doc_id", "text", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // (a,b): num = 2·max(8−3,0) + 3·2·1 = 16, den = 4·3·2 = 24
    assert(got(("a", "b")) == ((2L, 16L, 24L)))
    // (a,c): num = 2·max(4−3,0) + 3·2·1 = 8
    assert(got(("a", "c")) == ((1L, 8L, 24L)))
  }

  test("kneserNeyBigrams: P(·|w1) sums to exactly 1 over the full vocab") {
    // Σ_seen num + Σ_unseen 3·t1·l2 must equal den for every context —
    // the smoothing conserves probability mass exactly in the rationals.
    val docs = graft.io.Tables.documents(spark, TestSession.sf).limit(40)
    val seen = TextAnalysis.kneserNeyBigrams(docs, "doc_id", "text", minCount = 1)
      .collect()
    val byW1 = seen.groupBy(_.getString(0))
    // reconstruct l2 over the vocab and t1 per context from the output
    val l2 = seen.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val bTotal = seen.length.toLong
    byW1.foreach { case (w1, rows) =>
      val den = rows.head.getLong(4)
      val t1 = rows.length.toLong
      val seenNum = rows.map(_.getLong(3)).sum
      val seenL2 = rows.map(r => l2(r.getString(1))).sum
      val unseenNum = 3L * t1 * (bTotal - seenL2)
      assert(seenNum + unseenNum == den,
        s"mass for context '$w1': ${seenNum + unseenNum} != $den")
    }
  }
}
