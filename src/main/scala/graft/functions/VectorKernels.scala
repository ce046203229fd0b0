package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the hot loops of similarity search and
  * MinHash dedup (SURVEY §2.10 custom-Expression tier). These replace
  * interpreted `zip_with`/`transform` HOF chains with tight static
  * loops that whole-stage codegen calls directly — the difference is
  * ~10× on the all-pairs similarity join at sf0.1.
  *
  * Determinism contract (shared with graft.util.Exact and the DuckDB
  * oracles): element products are rounded to a fixed decimal scale and
  * summed as longs — order-independent, engine-independent. Rounding is
  * half-away-from-zero, matching both Spark's `round` (BigDecimal
  * HALF_UP) and DuckDB's `round`.
  */
object VectorKernelsImpl {
  final val Scale = 1e9

  @inline private def roundAway(x: Double): Long =
    if (x >= 0) Math.round(x) else -Math.round(-x)

  /** Σ_i round(a(i)·b(i)·1e9) as long; arrays must be same length. */
  def dotScaledFloat(a: ArrayData, b: ArrayData): Long = {
    val n = checkPair(a, b, "dot_scaled"); var s = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElem("dot_scaled", i)
      s += roundAway(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale)
      i += 1
    }
    s
  }

  def dotScaledDouble(a: ArrayData, b: ArrayData): Long = {
    val n = checkPair(a, b, "dot_scaled"); var s = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElem("dot_scaled", i)
      s += roundAway(a.getDouble(i) * b.getDouble(i) * Scale); i += 1
    }
    s
  }

  def normSqScaledFloat(a: ArrayData): Long = {
    val n = a.numElements(); var s = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullElem("normsq_scaled", i)
      val v = a.getFloat(i).toDouble; s += roundAway(v * v * Scale); i += 1
    }
    s
  }

  def normSqScaledDouble(a: ArrayData): Long = {
    val n = a.numElements(); var s = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullElem("normsq_scaled", i)
      val v = a.getDouble(i); s += roundAway(v * v * Scale); i += 1
    }
    s
  }

  /** `round(v)` exactly as Spark's `Round` on DoubleType (BigDecimal
    * HALF_UP) followed by a truncating long cast — byte-identical to
    * the SQL `cast(round(v) as long)` these kernels replace, so a
    * query swapped onto a kernel keeps its oracle hash. (The older
    * [[roundAway]] kernels use Math.round — fine for their own
    * oracles, but NOT interchangeable with SQL `round`.)
    *
    * Round-12: pure long/double arithmetic — `BigDecimal.valueOf(v)`
    * (a Double.toString + decimal parse PER ELEMENT) dominated the
    * kernel loops. Equality proof, case by case:
    *  - NaN/±Inf: Spark's Round returns the input unchanged and the
    *    long cast maps NaN→0, ±Inf→Long.Max/MinValue — exactly
    *    `v.toLong`. (The BigDecimal path THREW here — r11 ADVICE; the
    *    guard also fixes that semantic gap.)
    *  - |v| ≥ 2^52: ulp(v) ≥ 1, so v is an integer and HALF_UP at
    *    scale 0 is the identity; `v.toLong` saturates exactly like
    *    `BigDecimal.doubleValue().toLong` did.
    *  - |v| < 2^52: t = v.toLong (truncation) is exact, and v − t is
    *    EXACT in IEEE arithmetic (v and t are both multiples of
    *    ulp(v), and the difference needs < 53 significant bits).
    *    Comparing that exact binary fraction against 0.5 decides the
    *    same way as comparing BigDecimal.valueOf(v) — the value of
    *    v's SHORTEST decimal representation d — against x.5: x.5 is
    *    a representable double here, so d ≥ x.5 iff v ≥ x.5 (were d
    *    on the other side of x.5 from v, the double x.5 would be
    *    strictly closer to d than v is, contradicting that d
    *    round-trips to v), and d < t is impossible (t is a double
    *    with t ≤ v, same argument). Ties (frac == ±0.5) round away
    *    from zero — BigDecimal HALF_UP's rule.
    * VectorKernelsSpec cross-checks this against the BigDecimal form
    * on adversarial inputs (exact x.5 ties, nextUp/nextDown of ties,
    * negatives, NaN/Inf, 2^52 boundary, random). */
  @inline private[graft] def roundHalfUp0(v: Double): Long = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      return v.toLong
    if (math.abs(v) >= 4503599627370496.0) return v.toLong // 2^52
    val t = v.toLong
    val frac = v - t
    if (frac >= 0.5) t + 1L
    else if (frac <= -0.5) t - 1L
    else t
  }

  /** The pre-round-12 BigDecimal form, kept ONLY as the spec's
    * reference implementation for the fast-path equality proof. */
  private[graft] def roundHalfUp0Reference(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Shared argument guard for the two-array kernels (r11 ADVICE): the
    * zip_with HOFs these kernels replaced null-padded a length
    * mismatch; the kernels read out of bounds. Fail loudly instead —
    * a length mismatch in a similarity query is always a caller bug. */
  @inline private def checkPair(a: ArrayData, b: ArrayData,
                                name: String): Int = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$name: mismatched vector lengths ($n vs ${b.numElements()})")
    n
  }

  @inline private def nullElem(name: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name: null element at position $i (dense numeric vectors required)")

  @inline private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Σ_i round((a(i)−b(i))²·1e9) as long — the scaled-long centroid
    * distance of the IVF family, previously a zip_with+aggregate
    * HOF fold (interpreted per element; round-11, guide §4). Same
    * left-to-right order and HALF_UP rounding as the SQL form. */
  def sqDistScaled9(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Long = {
    val n = checkPair(a, b, "sqdist_scaled9"); var s = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElem("sqdist_scaled9", i)
      val d = elem(a, aF, i) - elem(b, bF, i)
      s += roundHalfUp0(d * d * Scale)
      i += 1
    }
    s
  }

  /** Σ_i round(a(i)²·1e9) as long with SQL-round semantics (the
    * q264 energy denominator — see [[roundHalfUp0]]). */
  def normSqScaled9HalfUp(a: ArrayData, aF: Boolean): Long = {
    val n = a.numElements(); var s = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullElem("normsq_scaled9", i)
      val v = elem(a, aF, i); s += roundHalfUp0(v * v * Scale); i += 1
    }
    s
  }

  /** Plain IEEE Σ_i (a(i)−b(i))² double, left-to-right — the
    * distributed probe planner's centroid distance. */
  def sqDistPlain(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = checkPair(a, b, "sqdist_plain"); var s = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElem("sqdist_plain", i)
      val d = elem(a, aF, i) - elem(b, bF, i); s = s + d * d; i += 1
    }
    s
  }

  /** Portable md5-Rademacher LSH bucket: r9_i = round(v_i·1e9) (SQL
    * HALF_UP), proj_p = Σ_i r9_i·signs(p)(i) in long, bucket =
    * Σ_p 1[proj_p > 0]·2^p — the whole per-row transform +
    * planes×(zip_with+aggregate) HOF chain as ONE codegen call. */
  def portableLshBucket(a: ArrayData, aF: Boolean,
                        signs: Array[Array[Long]]): Long = {
    val n = a.numElements()
    val r9 = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullElem("portable_lsh_bucket", i)
      r9(i) = roundHalfUp0(elem(a, aF, i) * Scale); i += 1
    }
    var bucket = 0L; var p = 0
    while (p < signs.length) {
      val sp = signs(p); var s = 0L; var j = 0
      while (j < n) { s += r9(j) * sp(j); j += 1 }
      if (s > 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }

  /** Σ_i (a(i)−b(i))² over int code arrays — EXACT long arithmetic
    * (the asymmetric-free SQ8 candidate distance: all-integer, so any
    * engine computes the identical value). */
  def sqDistInt(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"sqDistInt: mismatched code-vector lengths ($n vs ${b.numElements()})")
    var s = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElem("code_sqdist", i)
      val d = (a.getInt(i) - b.getInt(i)).toLong; s += d * d; i += 1
    }
    s
  }

  // SplitMix64 — deterministic per-hash-function constants for the
  // "one strong hash + affine rehash" minhash scheme (Broder-style
  // universal hashing: h_i(x) = a_i·h(x) + b_i).
  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val coefCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes, n => {
      val a = new Array[Long](n); val b = new Array[Long](n)
      var i = 0
      while (i < n) {
        a(i) = splitmix64(2L * i) | 1L // odd multiplier
        b(i) = splitmix64(2L * i + 1)
        i += 1
      }
      (a, b)
    })

  /** Number of equal positions between two minhash signatures.
    * matches/H is an unbiased Jaccard estimator (sd ≈ √(J(1−J)/H)) —
    * the cheap prefilter between LSH banding and the exact verify. */
  def sigMatches(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var m = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) m += 1; i += 1 }
    m
  }

  /** Distinct word n-gram shingles of a text, one pass — semantics
    * identical to the HOF chain
    * `array_distinct(transform(sequence(0, greatest(size(toks)-n, 0)),
    * i -> concat_ws(' ', slice(toks, i+1, n))))` with
    * `toks = split(text, "\s+")` (including its quirks: docs shorter
    * than n yield one short shingle; empty text yields [""]), but
    * ~10× cheaper: the HOF chain re-splits and re-allocates per
    * offset, this builds each shingle once into a dedup set. */
  /** Content-defined-chunking boundaries in ONE rolling pass —
    * replaces the `filter(pos, i -> Σ element_at·pow)` HOF whose
    * O(n·w) per-doc element_at evaluations dominated the CDC dedup
    * wall. Semantics are bit-identical to the HOF (and to the DuckDB
    * oracle): window hash at 1-based start i is
    * Σ_j code(c_{i+j})·B^{w−1−j} mod M over per-char code points, a
    * cut lands at i+w−1 when hash % maskMod == 0, and the result is
    * distinct ascending {0, cuts…, n}. The rolling update keeps the
    * running value congruent mod M, so every cut decision matches the
    * direct sum exactly. */
  def cdcBounds(text: UTF8String, w: Int, maskMod: Long): ArrayData = {
    val M = 1000000007L
    val B = 131L
    val s = text.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    out += 0
    if (n >= w) {
      // B^(w-1) mod M for the outgoing char
      var powTop = 1L
      var j = 1
      while (j < w) { powTop = powTop * B % M; j += 1 }
      var h = 0L
      var i = 0
      while (i < w) { h = (h * B + s.charAt(i).toLong) % M; i += 1 }
      // i is the 0-based index one past the window end; window start
      // k = i - w (cut position = k + w = i)
      // a cut equal to n would duplicate the trailing bound — skip it,
      // the HOF's array_distinct collapses the same way
      var k = 0
      if (h % maskMod == 0 && w != n) out += w
      while (i < n) {
        val cOld = s.charAt(k).toLong
        h = ((h + M - cOld * powTop % M) % M * B + s.charAt(i).toLong) % M
        i += 1; k += 1
        if (h % maskMod == 0 && i != n) out += i
      }
    }
    out += n
    // distinct ascending by construction except a possible repeat of 0
    // (n == 0) — the HOF's array_distinct handles the same way
    val res =
      if (out.length >= 2 && out(0) == out(1)) out.distinct else out
    new GenericArrayData(res.toArray)
  }

  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    // String.split(regex, -1) == Spark's split(str, regex) semantics
    val toks = text.toString.split("\\s+", -1)
    val last = math.max(toks.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]((last + 1) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature: one xxhash64 per shingle, then numHashes affine
    * rehashes, tracking minima. O(S + S·H) cheap ops per row. */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val (ca, cb) = coefs(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var t = 0
    while (t < n) {
      if (!shingles.isNullAt(t)) {
        val s = shingles.getUTF8String(t)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < numHashes) {
          val g = ca(i) * h + cb(i)
          if (g < sig(i)) sig(i) = g
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }
}

private object VectorKernels {
  def checkFloatArray(e: Expression, name: String): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$name requires array<float|double>, got $t")
  }
  def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Scaled-long dot product of two numeric arrays (LongType out). */
case class DotScaled(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkFloatArray(left, "dot_scaled") match {
      case TypeCheckResult.TypeCheckSuccess => VectorKernels.checkFloatArray(right, "dot_scaled")
      case f => f
    }
  private def m = if (VectorKernels.isFloat(left)) "dotScaledFloat" else "dotScaledDouble"
  override def nullSafeEval(a: Any, b: Any): Any =
    if (VectorKernels.isFloat(left))
      VectorKernelsImpl.dotScaledFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorKernelsImpl.dotScaledDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernelsImpl.$m($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Scaled-long squared L2 norm of a numeric array (LongType out). */
case class NormSqScaled(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkFloatArray(child, "normsq_scaled")
  private def m = if (VectorKernels.isFloat(child)) "normSqScaledFloat" else "normSqScaledDouble"
  override def nullSafeEval(a: Any): Any =
    if (VectorKernels.isFloat(child))
      VectorKernelsImpl.normSqScaledFloat(a.asInstanceOf[ArrayData])
    else VectorKernelsImpl.normSqScaledDouble(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernelsImpl.$m($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Scaled-long squared distance Σ round((a−b)²·1e9) (LongType out) —
  * SQL-round semantics, see VectorKernelsImpl.roundHalfUp0. */
case class SqDistScaled9(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkFloatArray(left, "sqdist_scaled9") match {
      case TypeCheckResult.TypeCheckSuccess =>
        VectorKernels.checkFloatArray(right, "sqdist_scaled9")
      case f => f
    }
  private def aF = VectorKernels.isFloat(left)
  private def bF = VectorKernels.isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelsImpl.sqDistScaled9(
      a.asInstanceOf[ArrayData], aF, b.asInstanceOf[ArrayData], bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernelsImpl.sqDistScaled9($a, $aF, $b, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Plain IEEE squared distance Σ (a−b)² (DoubleType out). */
case class SqDistPlain(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkFloatArray(left, "sqdist_plain") match {
      case TypeCheckResult.TypeCheckSuccess =>
        VectorKernels.checkFloatArray(right, "sqdist_plain")
      case f => f
    }
  private def aF = VectorKernels.isFloat(left)
  private def bF = VectorKernels.isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelsImpl.sqDistPlain(
      a.asInstanceOf[ArrayData], aF, b.asInstanceOf[ArrayData], bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernelsImpl.sqDistPlain($a, $aF, $b, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ round(a²·1e9) with SQL-round semantics (LongType out). */
case class NormSqScaled9(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkFloatArray(child, "normsq_scaled9")
  private def aF = VectorKernels.isFloat(child)
  override def nullSafeEval(a: Any): Any =
    VectorKernelsImpl.normSqScaled9HalfUp(a.asInstanceOf[ArrayData], aF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernelsImpl.normSqScaled9HalfUp($a, $aF)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Portable md5-Rademacher LSH bucket of a vector (LongType out);
  * the sign matrix rides inside the expression as a reference object. */
case class PortableLshBucketExpr(child: Expression, signs: Array[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkFloatArray(child, "portable_lsh_bucket")
  private def aF = VectorKernels.isFloat(child)
  override def nullSafeEval(a: Any): Any =
    VectorKernelsImpl.portableLshBucket(a.asInstanceOf[ArrayData], aF, signs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSigns", signs, "long[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernelsImpl.portableLshBucket($a, $aF, $ref)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Equal-position count between two array<long> minhash signatures. */
case class SigMatches(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_matches requires (array<long>, array<long>), got ($l, $r)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelsImpl.sigMatches(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernelsImpl.sigMatches($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Distinct word n-gram shingles of a string → array<string>. */
/** CDC boundary array of a string (see VectorKernelsImpl.cdcBounds). */
case class CdcBounds(child: Expression, w: Int, maskMod: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cdc_bounds requires string, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernelsImpl.cdcBounds(a.asInstanceOf[UTF8String], w, maskMod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernelsImpl.cdcBounds($a, $w, ${maskMod}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles requires string, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernelsImpl.wordShingles(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernelsImpl.wordShingles($a, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MinHash signature of an array<string> shingle set → array<long>. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernelsImpl.minhashSig(a.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernelsImpl.minhashSig($a, $numHashes)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Exact integer squared distance between two array<int> code vectors
  * (SQ8 candidate scoring — symmetric distance on quantized codes). */
case class CodeSqDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"code_sqdist requires (array<int>, array<int>), got ($l, $r)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelsImpl.sqDistInt(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernelsImpl.sqDistInt($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** Bit-deterministic scaled dot product (long) — see Exact. */
  def dotScaled(a: Column, b: Column): Column =
    Bridge.column(DotScaled(Bridge.expression(a), Bridge.expression(b)))

  /** Exact integer squared distance between int code arrays. */
  def codeSqDist(a: Column, b: Column): Column =
    Bridge.column(CodeSqDist(Bridge.expression(a), Bridge.expression(b)))

  /** Bit-deterministic scaled squared norm (long). */
  def normSqScaled(a: Column): Column =
    Bridge.column(NormSqScaled(Bridge.expression(a)))

  /** Scaled-long squared distance with SQL-round semantics. */
  def sqDistScaled9(a: Column, b: Column): Column =
    Bridge.column(SqDistScaled9(Bridge.expression(a), Bridge.expression(b)))

  /** Plain IEEE squared distance (double). */
  def sqDistPlain(a: Column, b: Column): Column =
    Bridge.column(SqDistPlain(Bridge.expression(a), Bridge.expression(b)))

  /** Scaled squared norm with SQL-round semantics (long). */
  def normSqScaled9(a: Column): Column =
    Bridge.column(NormSqScaled9(Bridge.expression(a)))

  /** Portable md5-Rademacher LSH bucket. */
  def portableLshBucket(vec: Column, signs: Array[Array[Long]]): Column =
    Bridge.column(PortableLshBucketExpr(Bridge.expression(vec), signs))

  /** MinHash signature column. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), numHashes))

  /** Equal-position count between two minhash signature columns. */
  def sigMatches(a: Column, b: Column): Column =
    Bridge.column(SigMatches(Bridge.expression(a), Bridge.expression(b)))

  /** Distinct word n-gram shingles of a string column. */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** Content-defined-chunking boundary array of a string column. */
  def cdcBounds(text: Column, w: Int, maskMod: Long): Column =
    Bridge.column(CdcBounds(Bridge.expression(text), w, maskMod))
}
