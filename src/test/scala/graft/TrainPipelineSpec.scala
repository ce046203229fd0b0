package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TrainPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("stratifiedSample: rate 1 keeps all, rate 0 keeps none, default applies") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
        rates = Map("en" -> 1.0, "de" -> 0.0), defaultRate = 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == perLang("en"))
    assert(!kept.contains("de"))
    // default-rate strata keep a nonzero strict subset
    val others = perLang.keySet - "en" - "de"
    assert(others.forall(l => kept.getOrElse(l, 0L) > 0 && kept(l) < perLang(l)))
  }

  test("stratifiedSample: rates rounding up to 1.0 keep everything (no hex overflow)") {
    val df = spark.range(1000).select(col("id"), lit("s").as("g"))
    // 0.9999999 rounds to 65536/65536 — must keep all rows, not ~6%
    val n = TextAnalysis.stratifiedSample(df, "id", "g", Map("s" -> 0.9999999)).count()
    assert(n == 1000L)
  }

  test("stratifiedSample: rate is approximately honored and deterministic") {
    val df = spark.range(20000).select(col("id"), lit("s").as("g"))
    val n1 = TextAnalysis.stratifiedSample(df, "id", "g", Map("s" -> 0.3)).count()
    val n2 = TextAnalysis.stratifiedSample(df, "id", "g", Map("s" -> 0.3)).count()
    assert(n1 == n2, "same inputs must select the same rows")
    assert(math.abs(n1 / 20000.0 - 0.3) < 0.02, s"rate off: ${n1 / 20000.0}")
  }

  test("stratifiedSample: samples NEST as the rate grows (threshold monotone)") {
    // the property that makes deterministic sampling usable for data
    // scaling: the 10% sample is a strict subset of the 50% sample
    val df = spark.range(5000).select(col("id"), lit("s").as("g"))
    val sets = Seq(0.1, 0.3, 0.5, 0.9, 0.99999).map { r =>
      TextAnalysis.stratifiedSample(df, "id", "g", Map("s" -> r))
        .select("id").collect().map(_.getLong(0)).toSet
    }
    sets.sliding(2).foreach { w =>
      assert(w(0).subsetOf(w(1)), s"${w(0).size} not nested in ${w(1).size}")
    }
    assert(sets.last.size > sets.head.size)
  }

  test("weightedSample: partition-invariant, exhaustive when k >= group, weight-dominant") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val df = Seq(
      // stratum A: one item 10^7x heavier — must win rank 1
      ("A", 1L, 10000000L), ("A", 2L, 1L), ("A", 3L, 1L),
      // stratum B: equal weights, sample decided purely by the hash race
      ("B", 10L, 5L), ("B", 11L, 5L), ("B", 12L, 5L), ("B", 13L, 5L),
      // zero weight excluded entirely
      ("C", 20L, 0L), ("C", 21L, 3L)
    ).toDF("source", "doc_id", "n_chars")
    def run(d: org.apache.spark.sql.DataFrame, k: Int) =
      TextAnalysis.weightedSample(d, "doc_id", "n_chars", "source", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(df.repartition(1), 2)
    val b = run(df.repartition(7, $"doc_id"), 2)
    assert(a == b, "sample must not depend on partitioning")
    assert(a.contains(("A", 1L, 1L)), "the 10^7x-heavier item must rank first")
    assert(!a.exists(t => t._1 == "C" && t._3 == 20L), "zero weight never sampled")
    // k >= group size: every positive-weight row included, ranks contiguous
    val all = run(df, 10)
    assert(all.count(_._1 == "B") == 4 &&
      all.filter(_._1 == "B").map(_._2).toSeq.sorted == Seq(1L, 2L, 3L, 4L))
    assert(all.count(_._1 == "C") == 1)
  }

  test("packSequences: contiguous fill, bounded overflow, bins start at 0") {
    val docs = Seq(
      // shard 0: tokens 60,60,60,60 with budget 100 → bins 0,0,1,1
      (0L, 0L, 60L), (1L, 0L, 60L), (2L, 0L, 60L), (3L, 0L, 60L),
      // shard 1: a single over-budget doc still gets a bin
      (4L, 1L, 250L), (5L, 1L, 10L)
    ).toDF("doc_id", "shard", "n_tokens")
    val got = TextAnalysis.packSequences(docs, "shard", "doc_id", "n_tokens", 100L)
      .select("doc_id", "pack_bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L,
      4L -> 0L, 5L -> 2L))
  }

  test("packSequences invariants on the corpus: bins contiguous per shard") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf).select(col("doc_id"),
      (col("doc_id") % 4).as("shard"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    val bins = TextAnalysis.packSequences(docs, "shard", "doc_id", "n_tokens", 256L)
      .groupBy("shard").agg(min("pack_bin").as("mn"), max("pack_bin").as("mx"),
        countDistinct("pack_bin").as("nd"))
      .collect()
    bins.foreach { r =>
      assert(r.getLong(1) == 0L, "first bin must be 0")
      assert(r.getLong(3) == r.getLong(2) + 1, "bins must be contiguous")
    }
  }

  // ------------------------------------------------------------------
  // unigramLmSegment (q324) — the Viterbi tokenizer's intrinsic
  // properties on planted corpora.
  // ------------------------------------------------------------------

  test("unigramLmSegment: a frequent unit segments as ONE piece") {
    // 'abcd' is in the vocabulary (length ≤ maxPieceLen), and a
    // single piece at ln p always beats two pieces at ln p₁ + ln p₂ —
    // the Viterbi must keep it whole; the hapax splits
    val docs = (Seq.fill(50)("abcd") ++ Seq("xy zq")).toDF("text")
    val rows = TextAnalysis.unigramLmSegment(docs, "text")
      .collect().map(r => r.getString(0) -> ((r.getInt(2), r.getString(3))))
      .toMap
    assert(rows("abcd") == ((1, "abcd")), s"got ${rows("abcd")}")
    // ties between equal-score splits go to the LONGER LAST piece
    val tie = (Seq.fill(10)("abcdef") ++ Seq("zz")).toDF("text")
    val seg6 = TextAnalysis.unigramLmSegment(tie, "text")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // all substrings of 'abcdef' have count 10 → every 2-piece split
    // of the 6-char unit ties; k DESC keeps the longest last piece
    assert(seg6("abcdef") == "ab|cdef", s"got ${seg6("abcdef")}")
  }

  test("unigramLmSegment: totality — every unit segments, even hapaxes") {
    val docs = Seq("abcd abcd", "qzkj").toDF("text") // qzkj appears once
    val rows = TextAnalysis.unigramLmSegment(docs, "text").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val unit = r.getString(0); val seg = r.getString(3)
      assert(seg.replace("|", "") == unit,
        s"segmentation must spell the unit: $unit vs $seg")
      assert(r.getLong(4) < 0, "log-prob scores are negative")
    }
  }

  test("unigramLmSegment: piece count + score are consistent and " +
    "repartition-invariant") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    val a = TextAnalysis.unigramLmSegment(docs, "text")
      .orderBy("unit").collect()
    val b = TextAnalysis.unigramLmSegment(docs.repartition(7), "text")
      .orderBy("unit").collect()
    assert(a.length == b.length && a.length > 100)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    a.foreach { r =>
      assert(r.getString(3).split("\\|").length == r.getInt(2),
        "n_pieces must count the seg separators")
    }
  }

  test("unigramLmSegment: multiplicity rides the unit, not the rows") {
    val docs = Seq.fill(7)("abcd").toDF("text")
    val rows = TextAnalysis.unigramLmSegment(docs, "text").collect()
    assert(rows.length == 1 && rows.head.getLong(1) == 7L)
  }

  // ------------------------------------------------------------------
  // wordPieceSegment (q338) — greedy longest-match-first subword
  // segmentation, the BERT-family sibling of BPE and unigram-LM.
  // ------------------------------------------------------------------

  private def wpMap(texts: Seq[String]): Map[String, (Long, Long, String)] =
    TextAnalysis.wordPieceSegment(texts.toDF("text"), "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap

  test("wordPieceSegment: frequent word stays whole; greedy takes the " +
    "longest match even when a shorter split would use fewer pieces later") {
    // 'abcd' (len ≤ maxPieceLen) is itself a vocabulary piece — one piece
    val m = wpMap(Seq.fill(30)("abcd") :+ "zq")
    assert(m("abcd") == ((30L, 1L, "abcd")))
    assert(m("zq")._2 == 1L) // 'zq' itself is a candidate piece (len 2)
  }

  test("wordPieceSegment: continuation pieces carry the ## marker and " +
    "spell the word back") {
    val m = wpMap(Seq.fill(5)("abcdefgh"))
    val (_, np, seg) = m("abcdefgh")
    // greedy: 'abcd' then '##efgh' (both frequent, maxPieceLen 4)
    assert(seg == "abcd|##efgh" && np == 2L, s"got $seg")
    val spelled = seg.split("\\|").map(_.stripPrefix("##")).mkString
    assert(spelled == "abcdefgh")
  }

  test("wordPieceSegment: totality — a hapax over unseen multi-char " +
    "pieces falls back to single chars, initial vs ## forms distinct") {
    // corpus vocab is dominated by 'wwww' pieces; 'qzkj' appears once —
    // its multi-char pieces may miss the top list but singles always exist
    val m = wpMap(Seq.fill(500)("wwww") :+ "qzkj")
    val (_, _, seg) = m("qzkj")
    assert(seg.replace("|", "").replace("##", "") == "qzkj")
    seg.split("\\|").zipWithIndex.foreach { case (p, i) =>
      if (i == 0) assert(!p.startsWith("##"))
      else assert(p.startsWith("##"), s"non-initial piece '$p' unmarked")
    }
  }

  test("wordPieceSegment: lowercasing, word capping, and multiplicity") {
    val m = wpMap(Seq("ABCD abcd", "abcdefghijklmnop"))
    assert(m("abcd")._1 == 2L) // case-folded into one word
    // words cap at maxWordLen=12 chars
    assert(m.keySet.contains("abcdefghijkl"))
    assert(m.keys.forall(_.length <= 12))
  }

  test("wordPieceSegment: repartition-invariant and piece-count consistent") {
    val docs = graft.io.Tables.documents(spark, TestSession.sf)
    val a = TextAnalysis.wordPieceSegment(docs, "text")
      .orderBy("word").collect()
    val b = TextAnalysis.wordPieceSegment(docs.repartition(7), "text")
      .orderBy("word").collect()
    assert(a.length == b.length && a.length > 10)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    a.foreach { r =>
      assert(r.getString(3).split("\\|").length.toLong == r.getLong(2))
      assert(r.getString(3).replace("|", "").replace("##", "")
        == r.getString(0))
    }
  }
}
