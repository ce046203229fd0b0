package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash fingerprint of a token array — a native Catalyst
  * `Expression` (SURVEY §2.10's custom-Expression tier): one pass over
  * the tokens per row, no 64× explode amplification, and codegen'd via
  * a static kernel call so it composes with whole-stage codegen.
  *
  * Algorithm (Charikar 2002, as used in web-scale near-dup pipelines):
  * each token hashes to 64 bits (xxhash64); bit i of the fingerprint is
  * set iff Σ_tokens (bit_i(h) ? +1 : −1) > 0. Near-duplicate docs have
  * fingerprints within a small Hamming distance.
  */
object SimHashKernel {
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** Hamming distance between two fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit ENGINE-NEUTRAL per-token hash: the first 15 hex chars of
    * md5 parsed as an integer == the big-endian u64 of the digest's
    * first 8 bytes shifted right one nibble. Exactly what ANSI SQL
    * computes with `CAST('0x' || substr(md5(tok),1,15) AS BIGINT)` —
    * the primitive that makes [[simhashPortable]] cross-engine
    * checkable (oracle q98). */
  def md5Hash60(s: UTF8String): Long = {
    val d = md5Digest.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Same Charikar vote fold as [[simhash]] but over [[md5Hash60]]
    * and 60 bits — the native kernel behind oracle-anchor q98. */
  def simhashPortable(arr: ArrayData): Long = {
    val counts = new Array[Int](60)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        if (s.numBytes > 0) {
          val h = md5Hash60(s)
          var i = 0
          while (i < 60) {
            if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
            i += 1
          }
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 60) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }
}

/** 60-bit md5-based SimHash (the portable/cross-engine variant) —
  * same shape as [[SimHash64]], kernel = `SimHashKernel.simhashPortable`.
  * Empty tokens are skipped inside the kernel (mirrors the oracle's
  * `length(tok) > 0`). */
case class SimHashPortable60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_portable60 requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhashPortable(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashKernel.simhashPortable($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashPortable60 =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashKernel.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Hamming distance between two simhash fingerprints, codegen'd. */
case class HammingDistance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object SimHash {
  /** Column API: 64-bit simhash of an array<string> column. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** Column API: 60-bit md5-based portable simhash (oracle q98). */
  def simhashPortable60(tokens: Column): Column =
    Bridge.column(SimHashPortable60(Bridge.expression(tokens)))

  /** Column API: Hamming distance between two long fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    Bridge.column(
      HammingDistance(Bridge.expression(a), Bridge.expression(b)))
}
