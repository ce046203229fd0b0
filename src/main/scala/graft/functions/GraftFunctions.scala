package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL surface for the engine's native expressions: register once and
  * every `spark.sql(...)` query can call them like built-ins —
  * `simhash64(arr)`, `hamming(a,b)`, `dot_scaled(a,b)`,
  * `normsq_scaled(a)`, `minhash_sig(arr, n)`.
  *
  * Two registration paths:
  *  - [[GraftExtensions]]: `SparkSessionExtensions.injectFunction` for
  *    sessions built with `.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions`;
  *  - [[register]]: runtime registration into an existing session's
  *    function registry (used by tests and the harness mains).
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[SimHash64].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Builders run inside analysis — surface bad static arguments as a
    * clear message instead of a raw eval crash (an attribute argument
    * would throw UnsupportedOperationException, a NULL literal an NPE,
    * a missing argument IndexOutOfBounds). */
  private def literalInt(es: Seq[Expression], idx: Int, fn: String): Int = {
    require(es.length > idx, s"$fn expects at least ${idx + 1} arguments, got ${es.length}")
    val e = es(idx)
    require(e.foldable, s"$fn: argument ${idx + 1} must be an integer literal, got ${e.sql}")
    val v = e.eval()
    require(v != null, s"$fn: argument ${idx + 1} must not be NULL")
    v match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${idx + 1} must be an integer literal, got a ${other.getClass.getSimpleName}")
    }
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash fingerprint"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    (FunctionIdentifier("hamming"),
      info("hamming", "hamming(bigint, bigint) - Hamming distance between fingerprints"),
      (es: Seq[Expression]) => HammingDistance(es(0), es(1))),
    (FunctionIdentifier("dot_scaled"),
      info("dot_scaled", "dot_scaled(arr, arr) - deterministic scaled-long dot product"),
      (es: Seq[Expression]) => DotScaled(es(0), es(1))),
    (FunctionIdentifier("normsq_scaled"),
      info("normsq_scaled", "normsq_scaled(arr) - deterministic scaled-long squared norm"),
      (es: Seq[Expression]) => NormSqScaled(es.head)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<string>, n) - MinHash signature"),
      (es: Seq[Expression]) => {
        // validate arity BEFORE touching es(0) — Scala evaluates
        // constructor args left-to-right, so es(0) on an empty list
        // would throw raw IndexOutOfBounds ahead of the clear message
        val n = literalInt(es, 1, "minhash_sig"); MinHashSig(es(0), n)
      }),
    (FunctionIdentifier("sig_matches"),
      info("sig_matches", "sig_matches(array<bigint>, array<bigint>) - equal minhash signature positions"),
      (es: Seq[Expression]) => SigMatches(es(0), es(1))),
    (FunctionIdentifier("code_sqdist"),
      info("code_sqdist", "code_sqdist(array<int>, array<int>) - exact integer squared distance between SQ8 code vectors"),
      (es: Seq[Expression]) => CodeSqDist(es(0), es(1))),
    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(string, string) - Jaro-Winkler similarity (DuckDB-convention)"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
    (FunctionIdentifier("nfc"),
      info("nfc", "nfc(string) - Unicode NFC normalization"),
      (es: Seq[Expression]) => NfcNormalize(es.head)),
    (FunctionIdentifier("pos_ngrams"),
      info("pos_ngrams", "pos_ngrams(text, n) - generator: (pos, ngram) per word n-gram"),
      (es: Seq[Expression]) => {
        val n = literalInt(es, 1, "pos_ngrams"); PosNGrams(es(0), n)
      })
  )

  /** Runtime registration into an existing session: SQL functions +
    * the engine optimizer rule (same surface [[GraftExtensions]]
    * injects at session build time). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "internal")
    }
    org.apache.spark.sql.graftbridge.Bridge
      .addOptimization(spark, graft.plans.CollapseNfcNormalize)
  }
}

/** `spark.sql.extensions`-compatible injection point: native SQL
  * functions, the engine optimizer rule, and the whole-operator as-of
  * join planner strategy. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.CollapseNfcNormalize)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
