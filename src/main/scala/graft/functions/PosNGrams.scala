package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-valued (Generator/UDTF) expression: emit one row per word
  * n-gram of a text column, with its 0-based token position —
  * `pos_ngrams(text, n)` → rows of (pos INT, ngram STRING).
  *
  * The UDTF quadrant of the §2.10 surface (scalar Expression, UDAF
  * Aggregator, SQL registration, and closures are covered elsewhere):
  * a custom [[Generator]] planned through the same `GenerateExec` as
  * built-in `explode`/`posexplode` — usable from the DataFrame API
  * (wrapped as a Column) and from SQL as `LATERAL VIEW pos_ngrams(…)`.
  *
  * Tokenization matches the engine-wide convention (whitespace split,
  * empty tokens dropped); a doc with fewer than n tokens emits no
  * rows, like the `WordShingles` kernel and the DuckDB oracle's
  * lead()-window trigram CTE.
  */
case class PosNGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pos_ngrams expects a string column, got ${child.dataType.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString
        .split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Nil
      else (0 to toks.length - n).map { i =>
        InternalRow(i, UTF8String.fromString(
          toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PosNGrams =
    copy(child = newChild)
}
