package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Nearest-centroid-by-cosine over sparse `map<string,double>` document
  * vectors as a native Catalyst expression — the codegen replacement
  * for the Scala-UDF assignment in sparse K-Means (SURVEY §2.10's
  * custom-Expression tier). The UDF pays a catalyst↔scala `Map`
  * conversion (allocation + boxing of every entry) per row per
  * iteration; this kernel reads the `MapData` key/value arrays in
  * place and probes prebuilt per-centroid `UTF8String` hash maps.
  *
  * Semantics match `graft.linalg.Sparse.nearestByCosine` (and the
  * reference's comparator, task2_2.java:148-180,272-279) exactly:
  * cosine rounded to 3 decimals (half-up), 0.0 on empty/zero-norm
  * vectors, strict `>` comparison so the lowest index wins ties.
  *
  * The centroid set rides inside the expression (serialized with the
  * plan → shipped once per task binary, same O(k·nnz) footprint a
  * broadcast would have); the UTF8String lookup tables are rebuilt
  * lazily per executor, not serialized.
  */
final class SparseNearestKernel(val centroids: IndexedSeq[Map[String, Double]])
    extends Serializable {

  // values boxed EXPLICITLY: with a primitive-typed map, `get` on a
  // missing key unboxes null to 0.0 and the null guards below would
  // silently never fire (correct dot/distance only by accident)
  @transient private lazy val tables: Array[java.util.HashMap[UTF8String, java.lang.Double]] =
    centroids.map { c =>
      val m = new java.util.HashMap[UTF8String, java.lang.Double](c.size * 2)
      c.foreach { case (k, v) => m.put(UTF8String.fromString(k), Double.box(v)) }
      m
    }.toArray

  @transient private lazy val normSqs: Array[Double] =
    centroids.map(c => c.valuesIterator.map(x => x * x).sum).toArray

  @transient private lazy val norms: Array[Double] = normSqs.map(math.sqrt)

  /** argmax_i round3(cosine(v, centroid_i)); first max wins. */
  def nearest(v: MapData): Int = {
    val n = v.numElements()
    val keys = v.keyArray()
    val vals = v.valueArray()
    var nsq = 0.0
    var i = 0
    while (i < n) { val x = vals.getDouble(i); nsq += x * x; i += 1 }
    val vnorm = math.sqrt(nsq)
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < tables.length) {
      var sim = 0.0
      if (n != 0 && vnorm != 0.0 && norms(c) != 0.0 && !tables(c).isEmpty) {
        var dot = 0.0
        var j = 0
        val t = tables(c)
        while (j < n) {
          val w = t.get(keys.getUTF8String(j))
          if (w != null) dot += vals.getDouble(j) * w.doubleValue()
          j += 1
        }
        sim = math.round(dot / (vnorm * norms(c)) * 1000.0) / 1000.0
      }
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** Squared Euclidean distance to centroid `c` over the key union —
    * same value as `Sparse.sqDist`: start from the centroid's ‖c‖²,
    * and each row key k replaces w_k² with (v_k−w_k)² (keys absent
    * from the centroid contribute v_k²). */
  def sqDistTo(v: MapData, c: Int): Double = {
    val n = v.numElements()
    val keys = v.keyArray()
    val vals = v.valueArray()
    val t = tables(c)
    var s = normSqs(c)
    var j = 0
    while (j < n) {
      val x = vals.getDouble(j)
      val w = t.get(keys.getUTF8String(j))
      if (w == null) s += x * x
      else { val wv = w.doubleValue(); val d = x - wv; s += d * d - wv * wv }
      j += 1
    }
    s
  }

  /** min_c sqDistTo(v, c) — the K-Means‖ point cost (ψ summand). */
  def minSqDist(v: MapData): Double = {
    var m = Double.PositiveInfinity
    var c = 0
    while (c < tables.length) {
      val d = sqDistTo(v, c); if (d < m) m = d; c += 1
    }
    m
  }
}

/** `cluster = nearest_centroid_cosine(vec)` — IntegerType out. */
case class NearestCentroidCosine(child: Expression,
    centroids: IndexedSeq[Map[String, Double]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_cosine requires map<string,double>, got $t")
  }

  @transient private lazy val kernel = new SparseNearestKernel(centroids)

  override def nullSafeEval(input: Any): Any =
    kernel.nearest(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sparseNearestKernel",
      new SparseNearestKernel(centroids), classOf[SparseNearestKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.nearest($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidCosine =
    copy(child = newChild)
}

/** `psi_term = min_sqdist_centroids(vec)` — DoubleType out. */
case class MinSqDistCentroids(child: Expression,
    centroids: IndexedSeq[Map[String, Double]]) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_sqdist_centroids requires map<string,double>, got $t")
  }

  @transient private lazy val kernel = new SparseNearestKernel(centroids)

  override def nullSafeEval(input: Any): Any =
    kernel.minSqDist(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sparseMinSqKernel",
      new SparseNearestKernel(centroids), classOf[SparseNearestKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.minSqDist($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinSqDistCentroids =
    copy(child = newChild)
}

/** `d2 = sqdist_to_centroid(vec, cluster)` — DoubleType out; `cluster`
  * indexes the centroid list (the WSSSE summand). */
case class SqDistToCentroid(left: Expression, right: Expression,
    centroids: IndexedSeq[Map[String, Double]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (MapType(StringType, DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sqdist_to_centroid requires (map<string,double>, int), got ($l, $r)")
    }

  @transient private lazy val kernel = new SparseNearestKernel(centroids)

  override def nullSafeEval(v: Any, c: Any): Any =
    kernel.sqDistTo(v.asInstanceOf[MapData], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sparseSqDistKernel",
      new SparseNearestKernel(centroids), classOf[SparseNearestKernel].getName)
    defineCodeGen(ctx, ev, (v, c) => s"$ref.sqDistTo($v, $c)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object SparseCosineFunctions {
  /** Column API: index of the max-cosine centroid for a sparse vector
    * column (3-decimal round, strict `>` ties — reference semantics). */
  def nearestCentroidCosine(vec: Column,
                            centroids: IndexedSeq[Map[String, Double]]): Column =
    Bridge.column(NearestCentroidCosine(Bridge.expression(vec), centroids))

  /** Column API: min squared distance to any centroid (ψ summand). */
  def minSqDistCentroids(vec: Column,
                         centroids: IndexedSeq[Map[String, Double]]): Column =
    Bridge.column(MinSqDistCentroids(Bridge.expression(vec), centroids))

  /** Column API: squared distance to the row's assigned centroid. */
  def sqDistToCentroid(vec: Column, cluster: Column,
                       centroids: IndexedSeq[Map[String, Double]]): Column =
    Bridge.column(SqDistToCentroid(Bridge.expression(vec),
      Bridge.expression(cluster), centroids))
}
