package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Round-11 HOF→codegen kernel parity: each native kernel must be
  * bit-identical to the interpreted zip_with/aggregate fold it
  * replaced (same left-to-right order, same SQL-round HALF_UP
  * semantics), because the declared ANN queries' oracle hashes were
  * pinned on the HOF forms.
  */
class VectorKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // deterministic vectors with negative components and values that
  // land on exact .5 rounding boundaries after the ×1e9 scaling
  // (2.5e-9·1e9 → 2.5: HALF_UP away-from-zero must give 3 / −3 —
  // a Math.round-based kernel would give 2 / −2 on the negative side)
  private def fixture = {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.1, -0.2, 0.3, -0.4), Seq(0.05, 0.05, -0.05, -0.05)),
      (2L, Seq(2.5e-9, -2.5e-9, 1.5e-9, -1.5e-9), Seq(0.0, 0.0, 0.0, 0.0)),
      (3L, Seq(0.999, -0.999, 0.123456789, -0.987654321),
        Seq(-0.5, 0.5, 0.25, -0.25)),
      (4L, Seq(1e-12, -1e-12, 0.7071067811865476, -0.5773502691896258),
        Seq(0.3333333333333333, -0.6666666666666666, 0.1, -0.1)))
    vecs.toDF("id", "a", "b")
  }

  test("sqDistScaled9 ≡ zip_with+aggregate(round(d²·1e9)) fold") {
    val hof = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => round((x - y) * (x - y) * lit(1e9)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val bad = fixture
      .select(hof.as("h"), VectorFunctions.sqDistScaled9(col("a"), col("b")).as("k"))
      .filter(col("h") =!= col("k")).count()
    assert(bad == 0)
  }

  test("normSqScaled9 ≡ aggregate(round(a²·1e9)) fold") {
    val hof = aggregate(col("a"), lit(0L),
      (acc, x) => acc + round(x * x * lit(1e9)).cast("long"))
    val bad = fixture
      .select(hof.as("h"), VectorFunctions.normSqScaled9(col("a")).as("k"))
      .filter(col("h") =!= col("k")).count()
    assert(bad == 0)
  }

  test("sqDistPlain ≡ IEEE left-to-right double fold") {
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val bad = fixture
      .select(hof.as("h"), VectorFunctions.sqDistPlain(col("a"), col("b")).as("k"))
      .filter(col("h") =!= col("k")).count()
    assert(bad == 0)
  }

  test("portableLshBucket ≡ transform+zip_with+aggregate plane chain") {
    val signs = Array(
      Array(1L, -1L, 1L, -1L),
      Array(-1L, -1L, 1L, 1L),
      Array(1L, 1L, 1L, 1L))
    val r9 = transform(col("a"),
      x => round(x * lit(1e9)).cast("long"))
    val bucketCol = signs.indices.map { p =>
      val proj = aggregate(
        zip_with(col("r9"), typedlit(signs(p).toSeq), (a, s) => a * s),
        lit(0L), (acc, x) => acc + x)
      (proj > 0).cast("long") * lit(1L << p)
    }.reduce(_ + _)
    val bad = fixture
      .withColumn("r9", r9)
      .select(bucketCol.as("h"),
        VectorFunctions.portableLshBucket(col("a"), signs).as("k"))
      .filter(col("h") =!= col("k")).count()
    assert(bad == 0)
  }

  test("roundHalfUp0 fast path ≡ BigDecimal HALF_UP reference (round-12)") {
    import graft.functions.VectorKernelsImpl._
    // adversarial: exact .5 ties (positive and negative), the doubles
    // immediately beside them, the largest-double-below-0.5 case that
    // breaks the floor(v+0.5) idiom, the 2^52 integer boundary, huge
    // magnitudes past Long range, and a deterministic pseudo-random
    // sweep at the kernels' working scale (d²·1e9)
    val p52 = 4503599627370496.0
    val cases = Seq(
      0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 1e9 + 0.5, -(1e9 + 0.5),
      Math.nextUp(0.5), Math.nextDown(0.5), Math.nextUp(-0.5),
      Math.nextDown(-0.5), 0.49999999999999994, -0.49999999999999994,
      p52, -p52, p52 - 0.5, -(p52 - 0.5), Math.nextDown(p52),
      p52 * 4096, -p52 * 4096, 1e300, -1e300,
      Long.MaxValue.toDouble, Long.MinValue.toDouble)
    val rnd = new scala.util.Random(42)
    val random = Seq.fill(100000) {
      val m = rnd.nextInt(4) match {
        case 0 => 1.0; case 1 => 1e9; case 2 => 1e15; case _ => 1e-3
      }
      (rnd.nextDouble() - 0.5) * m
    }
    (cases ++ random).foreach { v =>
      assert(roundHalfUp0(v) == roundHalfUp0Reference(v),
        s"fast path diverges from BigDecimal HALF_UP at v=$v")
    }
    // NaN/Inf: the reference THROWS (the r11 ADVICE gap); the fast
    // path must match Spark's round-then-cast-to-long semantics
    assert(roundHalfUp0(Double.NaN) == 0L)
    assert(roundHalfUp0(Double.PositiveInfinity) == Long.MaxValue)
    assert(roundHalfUp0(Double.NegativeInfinity) == Long.MinValue)
  }

  test("two-array kernels reject length mismatches loudly (round-12)") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.sqDistScaled9(col("a"), col("b"))).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    assert(rootMsg(e).contains("mismatched vector lengths"))
  }

  test("kernels work on float arrays (the stored embedding encoding)") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.25f, -0.5f, 2.5e-9f), Seq(0.0f, 0.125f, -1.0f)))
      .toDF("id", "af", "bf")
    val asD = (c: String) => col(c).cast("array<double>")
    val viaFloat = df.select(
      VectorFunctions.sqDistScaled9(col("af"), col("bf")).as("d9"),
      VectorFunctions.normSqScaled9(col("af")).as("n9"),
      VectorFunctions.sqDistPlain(col("af"), col("bf")).as("dp")).collect().head
    val viaDouble = df.select(
      VectorFunctions.sqDistScaled9(asD("af"), asD("bf")).as("d9"),
      VectorFunctions.normSqScaled9(asD("af")).as("n9"),
      VectorFunctions.sqDistPlain(asD("af"), asD("bf")).as("dp")).collect().head
    assert(viaFloat == viaDouble)
  }
}
