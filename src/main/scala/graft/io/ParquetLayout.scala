package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PARQUET FOOTER INTROSPECTION — the storage-layout planning pass a
  * lakehouse service runs WITHOUT scanning data: per (file, row group,
  * column), the footer's value count, null count, and min/max
  * statistics. These are the numbers that decide zone-map pruning
  * (q167/q347's cost model), compaction, and clustering-depth audits —
  * and they come from O(KB) footer reads, never the column pages.
  *
  * Scale shape: the file list fans out over the cluster and each task
  * opens ONLY its files' footers (a tail read per file) through the
  * same parquet-hadoop reader Spark's scans use — at 100 TB this is a
  * metadata sweep measured in seconds. Restricted to INT64 columns so
  * min/max decode portably (the cross-engine oracle: DuckDB's own
  * independent `parquet_metadata()` must agree on every value — a true
  * cross-IMPLEMENTATION footer check, the q117 Jaro–Winkler
  * discipline applied to the storage layer).
  *
  * @param cols INT64 leaf columns to report (dot-string paths).
  * @return (file_name, row_group_id, column_name, n_values,
  *         null_count, min_v, max_v) — file_name is the basename.
  */
object ParquetLayout {
  def report(spark: SparkSession, paths: Seq[String],
             cols: Seq[String]): DataFrame = {
    import spark.implicits._
    require(paths.nonEmpty, "ParquetLayout.report: empty path list")
    val colSet = cols.toSet
    val conf0 = spark.sessionState.newHadoopConf()
    // Accept table DIRECTORIES as well as bare files (round-11): a
    // lakehouse table is a directory of part files, and the footer
    // sweep fans out over its parts. Driver-side listing is O(file
    // names) — the footers themselves are still read by the tasks.
    val expanded = paths.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf0)
      val st = fs.getFileStatus(hp)
      if (!st.isDirectory) Seq(p)
      else fs.listStatus(hp).toSeq
        .filter(f => f.isFile && {
          val n = f.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
        .map(_.getPath.toString)
    }
    require(expanded.nonEmpty, "ParquetLayout.report: no data files")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf0))
    val rows = spark.createDataset(expanded)
      .repartition(math.min(expanded.size, 64))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { p =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p), conf))
          try {
            val blocks = reader.getFooter.getBlocks
            val base = p.substring(p.lastIndexOf('/') + 1)
            (0 until blocks.size()).flatMap { g =>
              val bl = blocks.get(g)
              (0 until bl.getColumns.size()).flatMap { ci =>
                val cc = bl.getColumns.get(ci)
                val name = cc.getPath.toDotString
                if (!colSet.contains(name)) None
                else {
                  val st = cc.getStatistics
                  // physical type may be INT32 or INT64 — both decode
                  // to an integral Number; anything else is a misuse
                  // of the INT-columns contract and fails loudly.
                  // A writer may legally OMIT min/max (all-null row
                  // group, or stats disabled): genericGetMin returns
                  // null there — report the row with null min/max
                  // instead of tripping the misuse guard on null
                  // (ADVICE r10: `other.getClass` NPE'd first).
                  def asLong(v: Any): java.lang.Long = v match {
                    case null => null
                    case n: java.lang.Number => n.longValue
                    case other => throw new IllegalArgumentException(
                      s"$name: non-integral parquet stats ${other.getClass}")
                  }
                  val hasMinMax = st != null && st.hasNonNullValue
                  Some((base, g.toLong, name, cc.getValueCount,
                    if (st == null) null
                    else (st.getNumNulls: java.lang.Long),
                    if (hasMinMax) asLong(st.genericGetMin) else null,
                    if (hasMinMax) asLong(st.genericGetMax) else null))
                }
              }
            }.iterator
          } finally reader.close()
        }
      }
    rows.toDF("file_name", "row_group_id", "column_name", "n_values",
      "null_count", "min_v", "max_v")
  }
}
