package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.{Job, Mapper, Reducer}
import org.apache.hadoop.mapreduce.lib.input.FileInputFormat
import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat

/** Mapper for [[MrOrderCompat.tfidfHadoopOrder]]: `docid_termid<TAB>w`
  * → key `docid`, value `termid:w` — the same reshaping the reference's
  * TFIDF emission job performs (`task1_4_3_2.java:88-100`, with the
  * tf×idf product already folded into `w` by our Spark pipeline).
  */
class TfidfLineMapper extends Mapper[LongWritable, Text, Text, Text] {
  private val outK = new Text()
  private val outV = new Text()
  override def map(key: LongWritable, value: Text,
      ctx: Mapper[LongWritable, Text, Text, Text]#Context): Unit = {
    val s = value.toString
    val tab = s.indexOf('\t')
    val us = s.indexOf('_')
    outK.set(s.substring(0, us))
    outV.set(s.substring(us + 1, tab) + ":" + s.substring(tab + 1))
    ctx.write(outK, outV)
  }
}

/** Reducer for [[MrOrderCompat.tfidfHadoopOrder]]: comma-joins values
  * in arrival order (`task1_4_3_2.java:102-116`). The arrival order is
  * the whole point — see the object scaladoc.
  */
class TfidfConcatReducer extends Reducer[Text, Text, Text, Text] {
  private val outV = new Text()
  override def reduce(key: Text, values: java.lang.Iterable[Text],
      ctx: Reducer[Text, Text, Text, Text]#Context): Unit = {
    val sb = new StringBuilder
    val it = values.iterator()
    while (it.hasNext) sb.append(it.next().toString).append(',')
    sb.setLength(sb.length - 1)
    outV.set(sb.toString)
    ctx.write(key, outV)
  }
}

/** Hadoop-order compat emission for the TFIDF matrix.
  *
  * The reference's `TFIDF.mtx` / `TFIDF.txt` within-line term order is
  * not a property of the data: its emission job maps each
  * `docid_termid` TF line to key=`docid` and its reducer concatenates
  * values in arrival order (`task1_4_3_2.java:88-116`). That arrival
  * order is produced by Hadoop's map-side sort — an UNSTABLE QuickSort
  * (`org.apache.hadoop.util.QuickSort`) over the map-output buffer —
  * so records with equal `docid` keys end up in a permutation that
  * depends only on the buffer layout, not on any user-visible key.
  *
  * Rather than approximate that permutation, this compat sink replays
  * it exactly: it runs the same two MapReduce steps through Hadoop's
  * real LocalJobRunner (the `hadoop-client` jars Spark already ships)
  * on OUR Spark-computed TFIDF matrix. Same framework code ⇒ same
  * unstable-sort permutation ⇒ byte-identical part files. This is a
  * parity/compat tool for small exports, NOT a data path — every
  * analytical consumer reads the order-independent parquet/DataFrame
  * form; RefParitySpec proves the emitted bytes equal both committed
  * goldens.
  */
object MrOrderCompat {

  /** Runs the reference's TFIDF emission reshape+concat through a real
    * local Hadoop MR job and returns the produced part file's bytes.
    *
    * @param lines `docid_termid<TAB>%.4f` records, already in the
    *              upstream job's file order: reducer key order (doc id
    *              as Text, i.e. ASCII-lexicographic) then TreeMap term
    *              order within a doc (`task1_4_1.java:57-123`).
    * @param workDir scratch directory (created; caller cleans up)
    */
  def tfidfHadoopOrder(lines: Seq[String], workDir: String): Array[Byte] = {
    val in = Paths.get(workDir, "input")
    Files.createDirectories(in)
    Files.write(in.resolve("tf.txt"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val out = Paths.get(workDir, "output")

    val conf = new Configuration()
    conf.set("fs.defaultFS", "file:///")
    conf.set("mapreduce.framework.name", "local")
    val job = Job.getInstance(conf, "graft-tfidf-order-compat")
    job.setMapperClass(classOf[TfidfLineMapper])
    job.setReducerClass(classOf[TfidfConcatReducer])
    job.setNumReduceTasks(1)
    job.setOutputKeyClass(classOf[Text])
    job.setOutputValueClass(classOf[Text])
    FileInputFormat.addInputPath(job, new Path(in.toUri.toString))
    FileOutputFormat.setOutputPath(job, new Path(out.toUri.toString))
    require(job.waitForCompletion(false), "local MR compat job failed")
    Files.readAllBytes(out.resolve("part-r-00000"))
  }
}
