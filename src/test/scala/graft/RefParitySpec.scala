package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.text.{Tokenizer, TfIdf}

/** Golden-output parity against the reference's own corpus and committed
  * outputs (SURVEY §5 test plan #1): the full Part-1 TF-IDF pipeline run
  * on BigDataLab02/DataProcessing/Input must reproduce Output1_* —
  * dictionaries, postings matrix, frequency filter, global top-10 (with
  * the reference's TreeMap tie-collapse semantics), the %.4f-quantized
  * TF-IDF doc vectors, and the per-category top-5.
  *
  * Comparisons are set-equality on (key, value) rows — the reference's
  * physical line order inside part files is a HashMap-iteration artifact,
  * not semantics.
  *
  * Quantization chain replicated exactly (task1_4_1 → 1_4_2 → 1_4_3_2
  * pass values through %.4f text files): tf4 = round(tf,4),
  * idf4 = round(ln(N/df),4), w = "%.4f".format(tf4·idf4).
  */
class RefParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  val Ref = "/root/reference/BigDataLab02"
  def refAvailable: Boolean = new java.io.File(s"$Ref/DataProcessing/Input").isDirectory

  // ---- reference inputs ----
  lazy val stopWords: Seq[String] =
    scala.io.Source.fromFile(s"$Ref/DataProcessing/StopWords/stop_words.txt")
      .getLines().map(_.trim).filter(_.nonEmpty).toSeq

  /** Corpus lines with (category, doc) from the file path —
    * doc = "<category>.<basename-without-.txt>" (task1_1_1.java:79-95). */
  lazy val corpus: DataFrame = {
    spark.read.option("recursiveFileLookup", "true")
      .text(s"$Ref/DataProcessing/Input")
      .withColumn("category",
        regexp_extract(input_file_name(), "Input/([^/]+)/[^/]+$", 1))
      .withColumn("doc",
        concat(col("category"), lit("."),
          regexp_extract(input_file_name(), "([^/]+)\\.txt$", 1)))
      .cache()
  }

  lazy val tokens: DataFrame =
    Tokenizer.tokens(corpus, "value", stopWords).cache()

  // golden loaders (terms are \w-only post-strip → safe as TSV)
  def goldenTsv(path: String, cols: (String, String)*): DataFrame = {
    val df = spark.read.option("sep", "\t").csv(path)
    cols.zipWithIndex.foldLeft(df) { case (d, ((name, typ), i)) =>
      d.withColumn(name, F.col(s"_c$i").cast(typ))
    }.select(cols.map(c => F.col(c._1)): _*)
  }

  lazy val goldTermId = goldenTsv(s"$Ref/Output/Output1_1_1/termid.mtx-r-00000",
    "term" -> "string", "id" -> "long").cache()
  lazy val goldDocId = goldenTsv(s"$Ref/Output/Output1_1_2/docid.mtx-r-00000",
    "doc" -> "string", "id" -> "long").cache()
  lazy val goldCounts = goldenTsv(s"$Ref/Output/Output1_1/task_1_1.mtx-r-00000",
    "docid" -> "long", "termid" -> "long", "cnt" -> "long").cache()
  lazy val goldFiltered = goldenTsv(s"$Ref/Output/Output1_2/task_1_2.mtx-r-00000",
    "docid" -> "long", "termid" -> "long", "cnt" -> "long").cache()

  /** Our clean (doc,term,cnt) matrix translated to golden ids. */
  lazy val ourCounts: DataFrame =
    TfIdf.termCounts(tokens, "doc")
      .join(goldTermId, "term").withColumnRenamed("id", "termid")
      .join(goldDocId, "doc").withColumnRenamed("id", "docid")
      .select(col("docid"), col("termid"), col("cnt"))
      .cache()

  /** The reference's counting semantics replicated bit-for-bit,
    * INCLUDING its stale-key bug (task1_1.java:155-158: `word` is a
    * mapper field only reassigned on dictionary hit, but written on
    * every non-stop token — a punctuation-only token strips to "",
    * misses the term dict, and re-counts the previous term; the field
    * persists across lines of a file). Test-only model — the engine's
    * public pipeline (graft.text) keeps the correct semantics per
    * SURVEY §7.4.3. */
  lazy val refCounts: DataFrame = {
    val sess = spark
    import sess.implicits._
    val stop = spark.sparkContext.broadcast(stopWords.toSet)
    val emissions = spark.sparkContext
      .wholeTextFiles(s"$Ref/DataProcessing/Input/*/*.txt", 16)
      .flatMap { case (path, content) =>
        val parts = path.split("/")
        val doc = parts(parts.length - 2) + "." +
          parts(parts.length - 1).stripSuffix(".txt")
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var carry: String = null
        val itr = new java.util.StringTokenizer(content)
        while (itr.hasMoreTokens) {
          val t = itr.nextToken().toLowerCase.replaceAll("[^\\w\\s]", "")
          if (!stop.value.contains(t)) {
            if (t.nonEmpty) { carry = t; out += ((doc, t)) }
            else if (carry != null) out += ((doc, carry)) // stale re-emit
          }
        }
        out.iterator
      }
    emissions.toDF("doc", "term")
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("cnt"))
      .join(goldTermId, "term").withColumnRenamed("id", "termid")
      .join(goldDocId, "doc").withColumnRenamed("id", "docid")
      .select(col("docid"), col("termid"), col("cnt"))
      .cache()
  }

  lazy val ourFiltered: DataFrame = refCounts.filter(col("cnt") >= 3).cache()

  /** symmetric difference must be empty */
  def assertSetEqual(ours: DataFrame, gold: DataFrame, label: String): Unit = {
    val diff = ours.exceptAll(gold).count() + gold.exceptAll(ours).count()
    assert(diff == 0, s"$label: $diff rows differ")
  }

  test("dictionaries: vocabulary and doc ids match goldens exactly") {
    assume(refAvailable)
    val ourTerms = tokens.select(col("token").as("term")).distinct()
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("term"))).cast("long"))
    assert(ourTerms.count() == 33988L)
    assertSetEqual(ourTerms, goldTermId, "termid dictionary")
    val ourDocs = corpus.select(col("doc")).distinct()
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc"))).cast("long"))
    assert(ourDocs.count() == 2225L)
    assertSetEqual(ourDocs, goldDocId, "docid dictionary")
  }

  test("postings matrix (reference semantics) and filter match goldens") {
    assume(refAvailable)
    assert(refCounts.count() == 331417L)
    assertSetEqual(refCounts, goldCounts, "task_1_1 counts")
    assert(ourFiltered.count() == 25843L)
    assertSetEqual(ourFiltered, goldFiltered, "task_1_2 filtered")
  }

  test("clean pipeline differs from golden only by the stale-key inflation") {
    assume(refAvailable)
    // same (doc,term) key set; clean counts never exceed golden counts
    val joined = ourCounts.withColumnRenamed("cnt", "clean")
      .join(goldCounts.withColumnRenamed("cnt", "gold"),
        Seq("docid", "termid"), "full")
    assert(joined.filter(col("clean").isNull || col("gold").isNull).count() == 0)
    assert(joined.filter(col("clean") > col("gold")).count() == 0)
  }

  // task1_3: reducer keyed by termid-as-Text (lexicographic string
  // order); TreeMap<count,term> collapses equal counts (last wins),
  // evicts smallest when >10 (task1_3.java:85-92). Emitted ascending
  // by count (TreeMap iteration order).
  private def treeMapTop10(totals: Seq[(String, Long)]): Seq[(Long, Long)] = {
    val tm = new java.util.TreeMap[Long, String]()
    totals.sortBy(_._1).foreach { case (t, c) =>
      tm.put(c, t)
      if (tm.size > 10) tm.remove(tm.firstKey)
    }
    import scala.jdk.CollectionConverters._
    tm.entrySet().asScala.toSeq.map(e => (e.getValue.toLong, e.getKey))
  }

  private def totalsOf(m: DataFrame): Seq[(String, Long)] =
    m.groupBy(col("termid"))
      .agg(sum(col("cnt")).as("total")).collect()
      .map(r => (r.getLong(0).toString, r.getLong(1))).toSeq

  test("global top-10 with TreeMap tie-collapse matches task_1_3") {
    assume(refAvailable)
    val gold = goldenTsv(s"$Ref/Output/Output1_3/task_1_3.mtx-r-00000",
      "termid" -> "long", "cnt" -> "long")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fromFiltered = treeMapTop10(totalsOf(ourFiltered))
    val fromRaw = treeMapTop10(totalsOf(ourCounts))
    assert(fromFiltered == gold || fromRaw == gold,
      s"top-10 mismatch: filtered=$fromFiltered raw=$fromRaw gold=$gold")
  }

  /** TF-IDF with the reference's %.4f quantization chain, on golden ids. */
  lazy val ourTfIdf4: DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("docid"))
    val tf4 = ourFiltered.withColumn("tf",
        col("cnt").cast("double") / sum(col("cnt")).over(w).cast("double"))
      .withColumn("tf4", round(col("tf"), 4))
    val n = ourFiltered.select(col("docid")).distinct().count()
    val idf4 = ourFiltered.groupBy(col("termid"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf4",
        round(log(lit(n.toDouble) / col("df").cast("double")), 4))
    tf4.join(broadcast(idf4.select(col("termid"), col("idf4"))), "termid")
      .withColumn("w", format_string("%.4f", col("tf4") * col("idf4")))
      .select(col("docid"), col("termid"), col("w"))
      .cache()
  }

  test("quantized TF-IDF doc vectors match TFIDF.mtx exactly") {
    assume(refAvailable)
    val gold = spark.read.text(s"$Ref/Output/Output1_4/TFIDF.mtx-r-00000")
      .select(split(col("value"), "\t").as("kv"))
      .select(col("kv").getItem(0).cast("long").as("docid"),
        explode(split(col("kv").getItem(1), ",")).as("tw"))
      .select(col("docid"),
        split(col("tw"), ":").getItem(0).cast("long").as("termid"),
        split(col("tw"), ":").getItem(1).as("w"))
    assert(ourTfIdf4.select(col("docid")).distinct().count() == 2224L)
    assertSetEqual(ourTfIdf4, gold, "TFIDF.mtx")
  }

  test("per-category top-5 terms match cTFIDF_5.mtx") {
    assume(refAvailable)
    // 1_5_1: mean of %.4f-parsed tfidf per (category, termNAME), %.4f out;
    // 1_5_2: TreeMap<Double,String> per category over termname-lex order.
    val means = ourTfIdf4
      .join(goldDocId.withColumnsRenamed(Map("id" -> "docid", "doc" -> "docname")), "docid")
      .withColumn("category", split(col("docname"), "\\.").getItem(0))
      .join(goldTermId.withColumnsRenamed(Map("id" -> "termid")), "termid")
      .groupBy(col("category"), col("term"))
      .agg(format_string("%.4f", avg(col("w").cast("double"))).as("mean4"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val ours = means.groupBy(_._1).map { case (cat, rows) =>
      val tm = new java.util.TreeMap[Double, String]()
      rows.sortBy(_._2).foreach { case (_, term, m4) =>
        tm.put(m4.toDouble, term)
        if (tm.size > 5) tm.remove(tm.firstKey)
      }
      import scala.jdk.CollectionConverters._
      val joined = tm.entrySet().iterator.asScala.toSeq // ascending order
        .map(e => s"${e.getValue}:${e.getKey.toString}").mkString(", ")
      cat -> joined
    }
    val gold = scala.io.Source.fromFile(s"$Ref/Output/Output1_5/cTFIDF_5.mtx-r-00000")
      .getLines().map { line =>
        val Array(k, v) = line.split("\t", 2)
        k.stripSuffix(":") -> v
      }.toMap
    assert(ours == gold, s"cTFIDF_5 mismatch:\nours=$ours\ngold=$gold")
  }

  /** Full-file EMISSION parity, end to end: the S4 text sink writes the
    * dictionary outputs and the resulting part file byte-equals the
    * reference's committed reducer output (MapReduce TextOutputFormat:
    * `key\tvalue\n`, byte-lexicographic key order — Spark's UTF8String
    * binary ordering matches Text's). Set-equality tests above pin the
    * CONTENT; this pins the serialized bytes. */
  private def emitAndDiff(df: DataFrame, sortKey: org.apache.spark.sql.Column,
                          basename: String, goldenPath: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    graft.io.Sinks.writeTsv(
      df.repartition(1).sortWithinPartitions(sortKey), tmp.getPath, basename)
    val part = new java.io.File(tmp, basename).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val ours = java.nio.file.Files.readAllBytes(part.toPath)
    val gold = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(goldenPath))
    assert(java.util.Arrays.equals(ours, gold),
      s"$basename: emitted ${ours.length} bytes != golden ${gold.length} bytes")
  }

  test("S4 sink emits dictionary files byte-for-byte (Output1_1_1/1_1_2)") {
    assume(refAvailable)
    import org.apache.spark.sql.expressions.Window
    emitAndDiff(
      tokens.select(col("token").as("term")).distinct()
        .withColumn("id", row_number().over(Window.orderBy(col("term"))).cast("long")),
      col("term"), "termid", s"$Ref/Output/Output1_1_1/termid.mtx-r-00000")
    emitAndDiff(
      corpus.select(col("doc")).distinct()
        .withColumn("id", row_number().over(Window.orderBy(col("doc"))).cast("long")),
      col("doc"), "docid", s"$Ref/Output/Output1_1_2/docid.mtx-r-00000")
  }

  test("S4 sink emits the count matrices byte-for-byte (Output1_1/1_2)") {
    assume(refAvailable)
    // MapReduce emits these keyed by the composite Text "docid\ttermid";
    // the physical line order is the lexicographic order of that STRING
    // (verified: both goldens sort as text, not as (int,int)) — so the
    // sink reproduces the files exactly by sorting on the same string.
    val key = concat_ws("\t", col("docid").cast("string"), col("termid").cast("string"))
    emitAndDiff(refCounts.select(col("docid"), col("termid"), col("cnt")),
      key, "task_1_1", s"$Ref/Output/Output1_1/task_1_1.mtx-r-00000")
    emitAndDiff(ourFiltered.select(col("docid"), col("termid"), col("cnt")),
      key, "task_1_2", s"$Ref/Output/Output1_2/task_1_2.mtx-r-00000")
  }

  test("S4 sink emits the top-10 file byte-for-byte (Output1_3)") {
    assume(refAvailable)
    // task1_3 runs over Output1_2 (verified: the filtered totals — not
    // the raw ones — reproduce the committed golden). The TreeMap
    // reducer state is O(10) driver-side, like the reference's single
    // reducer; the file is its ascending-count iteration.
    val top = treeMapTop10(totalsOf(ourFiltered))
    import spark.implicits._
    val df = top.toDF("termid", "cnt")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    graft.io.Sinks.writeTsv(
      df.repartition(1).sortWithinPartitions(col("cnt")), tmp.getPath, "task_1_3")
    val part = new java.io.File(tmp, "task_1_3").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val ours = java.nio.file.Files.readAllBytes(part.toPath)
    val gold = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$Ref/Output/Output1_3/task_1_3.mtx-r-00000"))
    assert(java.util.Arrays.equals(ours, gold),
      s"task_1_3: emitted ${ours.length} bytes != golden ${gold.length} bytes")
  }

  test("TFIDF matrix emits byte-for-byte via the Hadoop-order compat sink") {
    assume(refAvailable)
    // The goldens' within-line term order is Hadoop's UNSTABLE map-side
    // QuickSort permuting equal docid keys — not derivable from the
    // data. MrOrderCompat replays the emission through Hadoop's real
    // LocalJobRunner on OUR tf-idf values; input order is the upstream
    // job's file order: docid as Text (ASCII), then TreeMap term order.
    val lines = ourTfIdf4.collect()
      .map(r => (r.getLong(0).toString, r.getLong(1).toString, r.getString(2)))
      .sortBy { case (d, t, _) => (d, t) }
      .map { case (d, t, w) => s"${d}_$t\t$w" }
    val tmp = java.nio.file.Files.createTempDirectory("graft_mrorder").toFile
    val ours = graft.io.MrOrderCompat.tfidfHadoopOrder(lines.toSeq, tmp.getPath)
    for (golden <- Seq(s"$Ref/Output/Output1_4/TFIDF.mtx-r-00000",
                       s"$Ref/KMeans/Input/TFIDF.txt-r-00000")) {
      val gold = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(golden))
      assert(java.util.Arrays.equals(ours, gold),
        s"$golden: emitted ${ours.length} bytes != golden ${gold.length} bytes")
    }
  }
}
