package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen kernel — the
  * record-linkage scorer next to Spark's built-in `levenshtein`
  * (Spark has no JW built-in; DuckDB does, which makes q117 a TRUE
  * cross-IMPLEMENTATION oracle: two independent codebases must agree
  * on every double bit, not one recurrence replayed twice).
  *
  * Conventions (verified bit-identical to DuckDB's
  * `jaro_winkler_similarity` on fixtures including transposition,
  * boost-threshold, and empty-string cases): match window
  * ⌊max(l1,l2)/2⌋−1, transpositions = half the order-mismatched
  * matches, jaro = (m/l1 + m/l2 + (m−t)/m)/3 — in exactly that
  * association order — and the Winkler boost j + ℓp·0.1·(1−j) applied
  * only when jaro > 0.7, common prefix capped at 4. Comparison is by
  * Unicode CODE POINT (like DuckDB's), so astral/surrogate-pair text
  * scores identically cross-engine — not just the ASCII/BMP corpus.
  */
object StringSimImpl {
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    if (ua.equals(ub)) return 1.0
    val s1 = ua.toString.codePoints().toArray
    val s2 = ub.toString.codePoints().toArray
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(i + md + 1, l2)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var pre = 0
      val cap = math.min(4, math.min(l1, l2))
      while (pre < cap && s1(pre) == s2(pre)) pre += 1
      jaro + pre * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

object DamerauImpl {
  /** TRUE (unrestricted) Damerau–Levenshtein — Lowrance–Wagner DP
    * with the per-character last-match table, so a transposed pair
    * can still participate in later edits ("CA"→"ABC" = 2, where the
    * restricted OSA variant says 3). Matches DuckDB's
    * `damerau_levenshtein` (fuzz-verified on 500 random pairs while
    * building the q118 oracle). O(|a|·|b|) time, O(|a|·|b|) ints. */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Int = {
    // code-point alphabet (matches DuckDB's code-point counting on
    // astral text; a surrogate pair is ONE symbol, not two)
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxd
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxd; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = maxd; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val kBox = da.get(Integer.valueOf(b(j - 1)))
        val k = if (kBox == null) 0 else kBox.intValue()
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1, d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))
        j += 1
      }
      da.put(Integer.valueOf(a(i - 1)), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein requires (string, string), got ($l, $r)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauImpl.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DamerauImpl.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got ($l, $r)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimImpl.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringSimImpl.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Hamming distance between '0'/'1' bit strings — the verify kernel
  * of the perceptual-hash dedup join (q240), where the banded
  * candidate set still needs one exact distance per pair: byte-wise
  * over the UTF8 bytes (one branchless pass, no per-position lambda
  * dispatch — the interpreted HOF formulation evaluates a lambda per
  * bit per pair). A length mismatch counts the overhang as
  * all-different (defensive; callers compare fixed-width
  * fingerprints). */
object BitHammingImpl {
  def hamming(a: UTF8String, b: UTF8String): Long = {
    val ba = a.getBytes
    val bb = b.getBytes
    val n = math.min(ba.length, bb.length)
    var d = math.abs(ba.length - bb.length).toLong
    var i = 0
    while (i < n) {
      if (ba(i) != bb(i)) d += 1
      i += 1
    }
    d
  }
}

case class BitStringHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bit_hamming requires (string, string), got ($l, $r)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    BitHammingImpl.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitHammingImpl.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object StringSimFunctions {
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  def damerauLevenshtein(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))

  def bitHamming(a: Column, b: Column): Column =
    Bridge.column(BitStringHamming(Bridge.expression(a), Bridge.expression(b)))
}
