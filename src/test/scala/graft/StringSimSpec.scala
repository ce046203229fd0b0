package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.StringSimImpl

/** Jaro–Winkler conventions — the exact values DuckDB's independent
  * implementation produces (fixtures cross-checked against
  * `jaro_winkler_similarity` when q117's oracle was built). */
class StringSimSpec extends AnyFunSuite {
  private def jw(a: String, b: String): Double =
    StringSimImpl.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic fixtures match the published values") {
    assert(jw("martha", "marhta") == 0.9611111111111111) // 1 transposition + boost
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964) // no common prefix
    assert(jw("low", "lower") == 0.9066666666666667) // 3-char prefix boost
    assert(jw("spark", "sprak") == 0.9466666666666665)
  }

  test("boundary conventions: equality, empties, disjoint, boost threshold") {
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0 && jw("a", "") == 0.0 && jw("", "") == 1.0)
    assert(jw("x", "y") == 0.0)
    // below the 0.7 boost threshold the prefix must NOT be applied:
    // dwayne/duane jaro = 0.82 -> boosted; abcdef/fedcba has matches
    // but low jaro -> unboosted value must equal plain jaro
    val plain = jw("abcdxx", "xxdcba")
    assert(plain < 0.7 + 1e-9)
  }

  private def dl(a: String, b: String): Int =
    graft.functions.DamerauImpl.damerauLevenshtein(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("damerau-levenshtein: unrestricted variant (transposition then edit)") {
    assert(dl("CA", "ABC") == 2)   // OSA would say 3 — the defining case
    assert(dl("ab", "ba") == 1)
    assert(dl("abc", "ca") == 2)
    assert(dl("kitten", "sitting") == 3)
    assert(dl("abcdef", "abcfad") == 3)
    assert(dl("", "abc") == 3 && dl("abc", "") == 3 && dl("", "") == 0)
    assert(dl("same", "same") == 0)
  }

  test("damerau-levenshtein: bounded by plain levenshtein, symmetric") {
    val rnd = new scala.util.Random(5)
    def s() = Seq.fill(rnd.nextInt(10))("abcd".charAt(rnd.nextInt(4))).mkString
    for (_ <- 1 to 300) {
      val (a, b) = (s(), s())
      val d = dl(a, b)
      assert(d == dl(b, a))
      val lev = UTF8String.fromString(a)
        .levenshteinDistance(UTF8String.fromString(b))
      assert(d <= lev && d >= 0)
      assert(d >= math.abs(a.length - b.length))
    }
  }

  test("symmetry and prefix cap at 4") {
    for ((a, b) <- Seq(("martha", "marhta"), ("dixon", "dicksonx"),
        ("prefixes", "prefixed"))) assert(jw(a, b) == jw(b, a))
    // 7 common chars of 8: prefix contribution capped at 4
    val j = jw("abcdefgh", "abcdefgx")
    assert(j == {
      val jaro = (7.0 / 8 + 7.0 / 8 + 7.0 / 7) / 3.0
      jaro + 4 * 0.1 * (1.0 - jaro)
    })
  }
}
