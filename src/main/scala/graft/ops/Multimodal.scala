package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed partition-wise in batches —
  * the Spark-side shape (schema, partitioning, batch iteration) is
  * real; the media decode itself is STUBBED (no image/audio libs in
  * this container) behind [[StubDecoder]], which derives deterministic
  * fake features from the bytes. Swap `StubDecoder.decode` for a real
  * codec (javacv / a JNI codec / an inference runtime) without touching
  * any of the Spark plumbing.
  *
  * Scale shape: decode runs in `mapPartitions` so per-partition
  * initialization (codec contexts, model weights) amortizes across the
  * batch — the same reason Python pipelines use mapInPandas. Payloads
  * stay columnar-binary end to end; no driver collection.
  */
object Multimodal {

  /** A media record: opaque payload + source metadata. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded (stub) features. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int, checksum: Long)

  /** STUB: stands in for a real image/audio decoder. Deterministic
    * fake: dimensions and checksum derived from the payload bytes.
    * The signature — bytes in, features out, called once per record
    * inside a partition batch — is the real contract. */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum = sum * 31 + (r.payload(i) & 0xff); i += 1 }
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
        width = 16 + (math.abs(sum) % 1024).toInt,
        height = 16 + (math.abs(sum / 7) % 1024).toInt,
        checksum = sum)
    }
  }

  /** Wrap a text/binary source as media records. For the synthetic
    * corpus the payload is the UTF-8 text — at 100 TB this column is
    * the raw image/audio bytes read from parquet/binaryFile sources. */
  def asMediaRecords(df: DataFrame, idCol: String, textCol: String,
                     kind: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Partition-wise batched decode: the real plumbing around the stub.
    * One decoder init per partition, streaming iterator (no partition
    * materialization). */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition decoder/codec init would go here
      it.map(StubDecoder.decode)
    }
  }

  /** Deterministic frame-sampling shape: pick every `stride`-th chunk
    * of `chunkBytes` from the payload (a video frame-sample stand-in).
    * Output one row per sampled chunk with its offset. */
  def sampleChunks(records: Dataset[MediaRecord], chunkBytes: Int,
                   stride: Int): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.flatMap { r =>
      val n = r.payload.length
      Iterator.range(0, n, chunkBytes * stride).map { off =>
        val end = math.min(off + chunkBytes, n)
        (r.media_id, off.toLong, (end - off).toLong)
      }
    }.toDF("media_id", "chunk_offset", "chunk_len")
  }
}
