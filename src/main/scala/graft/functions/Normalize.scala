package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd `Expression` — the
  * canonicalization pass a corpus pipeline runs BEFORE fingerprinting
  * or dedup, so that composed ("é") and decomposed ("e"+U+0301)
  * encodings of the same text hash identically. Backed by the JDK's
  * `java.text.Normalizer` (ICU-equivalent NFC); DuckDB's
  * `nfc_normalize` agrees, which is what lets q66 hash-check it
  * cross-engine.
  */
object NormalizeKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized avoids allocating for the
    // (overwhelmingly common) already-NFC case
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"nfc requires string, got $t")
    }
  override def nullSafeEval(input: Any): Any =
    NormalizeKernel.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeKernel.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object Normalize {
  /** Column API: NFC-normalize a string column. */
  def nfc(s: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(s)))
}
