package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real greedy byte-pair-encoding APPLY (not the regex stand-in): the
  * token counter an LLM-data pipeline runs to budget sequences against
  * a trained tokenizer. Words start as character sequences; the
  * adjacent pair with the LOWEST merge rank merges first (the exact
  * greedy loop of the original BPE apply — Sennrich et al. '16 / the
  * GPT-2 encoder), repeated until no listed pair remains.
  *
  * The merge table rides into generated code as a codegen reference
  * object (one HashMap per operator instance, never per row), so the
  * loop runs inside whole-stage codegen like the other native kernels.
  * With an EMPTY merge table every word stays characters, so the count
  * provably equals the non-whitespace character count — the family's
  * oracle anchor regime (q115); real merge lists are pinned by
  * hand-computed fixtures in BpeSpec (greedy order, rank priority,
  * termination).
  */
object BpeImpl {
  /** Greedy BPE of one word against `ranks` ("a b" → rank); returns
    * the final token list (spec/debug surface). */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    // seed units are CODE POINTS, not UTF-16 code units: an astral char
    // (surrogate pair) is one seed symbol, matching the oracle's
    // code-point semantics (DuckDB length/regexp count code points)
    val parts = scala.collection.mutable.ArrayBuffer[String](
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp))): _*)
    var done = false
    while (!done && parts.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.get(parts(i) + " " + parts(i + 1))
        if (r != null && r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) done = true
      else {
        parts(best) = parts(best) + parts(best + 1)
        parts.remove(best + 1)
      }
    }
    parts.toArray
  }

  /** Total BPE token count over whitespace-split words. */
  def countTokens(text: UTF8String, ranks: java.util.HashMap[String, Integer]): Long = {
    var total = 0L
    val words = text.toString.split("\\s+")
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) total += encodeWord(words(i), ranks).length
      i += 1
    }
    total
  }

  def buildRanks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Codegen entry for [[BpeTokens]]: encode one word → ArrayData. */
  def tokensArray(word: UTF8String,
                  ranks: java.util.HashMap[String, Integer])
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      encodeWord(word.toString, ranks)
        .map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])

  /** Apply ONE merge (a,b)→ab to a token array, simultaneous
    * left-to-right with skip — identical to repeated leftmost-first
    * single merges of the same pair, which is [[encodeWord]]'s order.
    * The incremental trainer's per-round update: each adopted merge is
    * applied once to the LIVE token arrays instead of re-encoding every
    * word from characters through the whole merge table (the
    * sequential-application ≡ greedy-rank-apply equivalence: a merge's
    * parts can never contain tokens created by LATER merges, so rank
    * order is a topological order — BpeTrainerSpec pins it). */
  def mergeAdjacent(toks: org.apache.spark.sql.catalyst.util.ArrayData,
                    a: UTF8String, b: UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = toks.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && toks.getUTF8String(i).equals(a) &&
          toks.getUTF8String(i + 1).equals(b)) {
        out += UTF8String.concat(a, b); i += 2
      } else { out += toks.getUTF8String(i); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `merge_adjacent(toks)` — one BPE merge applied to a token array. */
case class MergeAdjacentPair(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"merge_adjacent expects array<string>, got ${other.catalogString}")
  }

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)

  override def nullSafeEval(v: Any): Any =
    BpeImpl.mergeAdjacent(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], ua, ub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("mergeA", ua, "org.apache.spark.unsafe.types.UTF8String")
    val rb = ctx.addReferenceObj("mergeB", ub, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.mergeAdjacent($c, $ra, $rb)")
  }
  override protected def withNewChildInternal(newChild: Expression): MergeAdjacentPair =
    copy(child = newChild)
}

/** `bpe_token_count(text)` against a static merge table. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string column, got ${child.dataType.catalogString}")

  @transient private lazy val ranks = BpeImpl.buildRanks(merges)

  override def nullSafeEval(v: Any): Any =
    BpeImpl.countTokens(v.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.countTokens($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** `bpe_tokens(word)` — the token array of ONE word under a static
  * merge table (the trainer's re-encode step; pair statistics come
  * from adjacent elements of this array). */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects a string column, got ${child.dataType.catalogString}")

  @transient private lazy val ranks = BpeImpl.buildRanks(merges)

  override def nullSafeEval(v: Any): Any =
    BpeImpl.tokensArray(v.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.tokensArray($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeFunctions {
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text), merges))

  def bpeTokens(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokens(Bridge.expression(word), merges))

  def mergeAdjacent(toks: Column, a: String, b: String): Column =
    Bridge.column(MergeAdjacentPair(Bridge.expression(toks), a, b))
}
