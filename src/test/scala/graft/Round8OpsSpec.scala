package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The session's new operators: incremental (delta-vs-corpus) LSH
  * dedup equals the exact cross-side grid; Newman–Girvan modularity
  * matches hand-computed fixtures and its structural invariants; the
  * ANN recall audit is sound (found ⊆ truth, planes = 0 ⇒ recall 1).
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import graft.ops.{Dedup, Graph, Similarity}

  // ---- incremental dedup -------------------------------------------------

  private val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d e f g h"),            // exact dup of 1
    (3L, "a b c d e f g x"),            // near dup of 1/2
    (4L, "p q r s t u v w"),
    (10L, "a b c d e f g h"),           // delta: dup of 1/2
    (11L, "p q r s t u v z"),           // delta: near dup of 4
    (12L, "m n o aa bb cc dd ee"))      // delta: novel

  test("incrementalNearDupPairs equals the exact cross-side pair grid") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val corpus = df.filter(col("doc_id") < 10)
    val delta = df.filter(col("doc_id") >= 10)
    val got = Dedup.incrementalNearDupPairs(corpus, delta, "doc_id", "text",
        threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.exactJaccardPairs(df, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 < 10 && p._2 >= 10)
    assert(got == exact)
    assert(got.nonEmpty)                      // dup + near-dup pairs exist
    assert(!got.exists { case (a, b) => a >= 10 || b < 10 }) // cross only
  }

  test("incrementalNearDupPairs never re-pairs the corpus with itself") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    // docs 1/2 are exact dups INSIDE the corpus: the incremental pass
    // must not surface them
    val got = Dedup.incrementalNearDupPairs(
        df.filter(col("doc_id") < 10), df.filter(col("doc_id") >= 10),
        "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!got.contains((1L, 2L)))
  }

  // ---- modularity --------------------------------------------------------

  /** Plain-Scala Newman–Girvan reference over an undirected simple
    * graph: Q_c·4m² = 4·m·e_c − d_c². */
  private def refModularity(edges: Seq[(Long, Long)],
                            comm: Map[Long, Long]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val m = und.size.toLong
    val deg = (und.map(_._1) ++ und.map(_._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    comm.values.toSeq.distinct.map { c =>
      val members = comm.filter(_._2 == c).keySet
      val ec = und.count(e => members(e._1) && members(e._2)).toLong
      val dc = members.toSeq.map(n => deg.getOrElse(n, 0L)).sum
      c -> (4L * m * ec - dc * dc)
    }.toMap
  }

  test("modularity matches the reference on two triangles + a bridge") {
    import spark.implicits._
    // classic fixture: triangles {1,2,3} and {4,5,6} joined by 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val comm = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    val got = Graph.modularity(edges.toDF("src", "dst"),
        comm.toSeq.toDF("node", "community"))
      .select("community", "contrib_num").as[(Long, Long)].collect().toMap
    assert(got == refModularity(edges, comm))
    // known value: m=7, each community e_c=3, d_c=7 ⇒ 4·7·3−49 = 35
    assert(got == Map(1L -> 35L, 4L -> 35L))
    // global Q = Σ/(4m²) = 70/196 ≈ 0.357 — the textbook figure
    assert(math.abs(got.values.sum.toDouble / (4.0 * 7 * 7) - 70.0 / 196) < 1e-12)
  }

  test("modularity invariants: all-one-community scores zero; " +
    "duplicate/reversed edges collapse") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 1L), (1L, 1L))
    val oneComm = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("node", "community")
    val row = Graph.modularity(edges.toDF("src", "dst"), oneComm)
      .select("n_nodes", "intra_edges", "total_deg", "contrib_num", "m")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // simple graph = triangle: m=3, e_c=3, d_c=6 ⇒ 4·3·3 − 36 = 0
    assert(row == Seq((3L, 3L, 6L, 0L, 3L)))
  }

  test("modularity on a seeded random graph matches the reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val comm = nodes.map(n => n -> (n % 4)).toMap
    val got = Graph.modularity(edges.toDF("src", "dst"),
        comm.toSeq.toDF("node", "community"))
      .select("community", "contrib_num").as[(Long, Long)].collect().toMap
    assert(got == refModularity(edges, comm))
  }

  // ---- ANN recall audit --------------------------------------------------

  test("recall audit: flagged pairs are exactly the LSH output; " +
    "planes=0 would find everything") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val emb = Seq.tabulate(60)(i =>
        (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val truth = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = Similarity.lshNearDupPairsPortable(emb, "vec_id",
        "embedding", threshold = 0.3, planes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.subsetOf(truth)) // verify stage: no false positives
    // the degenerate single-bucket config recovers every true pair
    val all = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.3, planes = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(all == truth)
  }
}
