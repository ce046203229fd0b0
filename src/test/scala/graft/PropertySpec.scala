package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.linalg.Sparse

/** Property-based kernel checks (SURVEY §5 test plan #3). */
class SparsePropertySpec extends AnyFunSuite {

  /** Minimal property driver (the scalatest-scalacheck bridge artifact
    * is not on the offline classpath). */
  def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val seeded = org.scalacheck.rng.Seed(42L)
    var seed = seeded
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next; i += 1
    }
  }
  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  val vecGen: Gen[Map[String, Double]] = Gen.mapOf(for {
    k <- Gen.oneOf((1 to 20).map(i => s"t$i"))
    v <- Gen.choose(0.0001, 10.0)
  } yield k -> v)

  test("cosine is symmetric and within [0,1] for non-negative vectors") {
    forAll(vecGen, vecGen) { (a, b) =>
      val ab = Sparse.cosine(a, b, round3 = false)
      val ba = Sparse.cosine(b, a, round3 = false)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= 0.0 && ab <= 1.0 + 1e-12)
    }
  }

  test("cosine self-similarity is 1 for non-empty vectors") {
    forAll(vecGen.suchThat(_.nonEmpty)) { a =>
      assert(math.abs(Sparse.cosine(a, a, round3 = false) - 1.0) < 1e-9)
    }
  }

  test("sqDist is symmetric, non-negative, zero iff equal") {
    forAll(vecGen, vecGen) { (a, b) =>
      val d = Sparse.sqDist(a, b)
      assert(d >= 0.0)
      assert(math.abs(d - Sparse.sqDist(b, a)) < 1e-9)
      if (a == b) assert(d == 0.0)
    }
  }

  test("nearestByCosine returns a valid index achieving the max") {
    val centroidsGen = Gen.nonEmptyListOf(vecGen.suchThat(_.nonEmpty))
      .map(_.toIndexedSeq)
    forAll(vecGen.suchThat(_.nonEmpty), centroidsGen) { (v, cs) =>
      val idx = Sparse.nearestByCosine(v, cs)
      assert(idx >= 0 && idx < cs.length)
      val best = cs.map(Sparse.cosine(v, _)).max
      assert(Sparse.cosine(v, cs(idx)) == best)
    }
  }

  test("simhash hamming distance bounded by 64; equal inputs -> 0") {
    import graft.functions.SimHashKernel
    forAll(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(Long.MinValue, Long.MaxValue)) { (a, b) =>
      val h = SimHashKernel.hamming(a, b)
      assert(h >= 0 && h <= 64)
      assert(SimHashKernel.hamming(a, a) == 0)
    }
  }

  test("centroid mean stays within member bounds per coordinate") {
    val members = Gen.nonEmptyListOf(vecGen.suchThat(_.nonEmpty))
    forAll(members) { ms =>
      val n = ms.size
      val keys = ms.flatMap(_.keys).toSet
      val mean = keys.map(k => k -> ms.map(_.getOrElse(k, 0.0)).sum / n).toMap
      mean.foreach { case (k, v) =>
        val vals = ms.map(_.getOrElse(k, 0.0))
        assert(v >= vals.min - 1e-12 && v <= vals.max + 1e-12)
      }
    }
  }
}

/** Generative kernel properties beyond the fixture strings in the
  * functions specs: NFC normalization (char-level), the Space-Saving
  * aggregator's reduce/merge guarantees over random streams and merge
  * trees, and the q99 chunk-window arithmetic over random
  * (len, chunkSize, stride). */
class KernelPropertySpec extends AnyFunSuite {
  def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(7L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next; i += 1
    }
  }

  private val charGen = Gen.oneOf(
    'a', 'z', '0', ' ', '\t', 'é', 'e', '́', '̈', 'ß',
    '中', 'ñ', 'n', '̃', 'ö', 'o')

  test("nfc kernel is idempotent and agrees with java.text.Normalizer") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.listOf(charGen)) { chars =>
      val s = chars.mkString
      val once = graft.functions.NormalizeKernel.nfc(UTF8String.fromString(s))
      val twice = graft.functions.NormalizeKernel.nfc(once)
      assert(once == twice, s"not idempotent on ${s.map(_.toInt)}")
      assert(once.toString ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  // driver-side property checks of the Space-Saving aggregator kernel
  // (plain Scala reduce/merge — no Spark session needed): random
  // streams, random merge trees, the classic guarantees must hold
  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf((1 to 25).map(i => s"k$i")))

  test("space-saving: random streams + random merge splits keep the bounds") {
    val agg = new graft.functions.FreqItemsAggregator(capacity = 6, k = 6)
    forAll(Gen.zip(streamGen, Gen.choose(1, 5)), n = 100) { case (stream, nSplits) =>
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // split the stream into contiguous partials, reduce each, then
      // merge left-to-right (models map partials + reduce tree)
      val parts = stream.grouped(math.max(1, stream.size / nSplits)).toList
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      val out = agg.finish(merged)
      out.foreach { case (key, est, err) =>
        val t = truth.getOrElse(key, 0L)
        assert(est >= t, s"$key: est $est < true $t")
        assert(est - err <= t, s"$key: est-err ${est - err} > true $t")
      }
      // summary keeps every key whose true count exceeds n/capacity
      val n = stream.size.toLong
      val heavy = truth.filter(_._2 > n / 6).keySet
      val kept = merged.keySet
      assert(heavy.subsetOf(kept), s"lost heavy keys ${heavy -- kept}")
      // exact regime: while nothing ever evicted, result == truth
      if (partials.forall(_.size < 6) && merged.size == truth.size)
        assert(out.map(e => e._1 -> e._2).toMap ==
          truth.toSeq.sortBy { case (k2, c) => (-c, k2) }.take(6).toMap)
    }
  }

  test("chunk windowing arithmetic: count/coverage for arbitrary lengths") {
    // the q99 window formula, checked driver-side over random
    // (len, chunkSize, stride) — counts match, windows tile the text
    forAll(Gen.zip(Gen.choose(0, 2000), Gen.choose(1, 300), Gen.choose(1, 300)),
        n = 300) { case (len, a, b) =>
      val chunkSize = math.max(a, b); val stride = math.min(a, b)
      val nChunks =
        if (len <= chunkSize) 1
        else 1 + math.ceil((len - chunkSize).toDouble / stride).toInt
      // every char index < len falls inside at least one window, and
      // the last window's start is within the text
      val lastStart = (nChunks - 1) * stride
      assert(lastStart < math.max(len, 1),
        s"len=$len cs=$chunkSize st=$stride: empty trailing chunk")
      assert(lastStart + chunkSize >= len,
        s"len=$len cs=$chunkSize st=$stride: tail uncovered")
      // one fewer chunk would leave a tail uncovered (minimality)
      if (nChunks > 1)
        assert((nChunks - 2) * stride + chunkSize < len,
          s"len=$len cs=$chunkSize st=$stride: chunk count not minimal")
    }
  }
}
