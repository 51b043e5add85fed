package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (north star): image/audio/video as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side plumbing is real — binary columns, schema, partition
  * batching via `mapPartitions` (the JVM analogue of `mapInPandas`: one
  * iterator per partition, amortized per-batch setup, no per-row
  * driver involvement). The actual media decode is a clearly-marked
  * STUB (`FakeDecoder`): the real implementation would link an image/
  * audio library unavailable in this environment; the stub derives
  * deterministic metadata from the bytes so the pipeline is testable
  * end-to-end and oracle-checkable.
  *
  * Scale notes: decode cost dominates at 100 TB, so the operator must
  * (a) run per-partition with zero driver round-trips — it does, via
  * mapPartitions; (b) avoid shuffles — it is map-only; (c) let the
  * scan prune to the binary column + id only — schema keeps media in a
  * single binary field per row.
  */
object Multimodal {
  /** Typed metadata extracted from a media blob. */
  case class MediaMeta(n_bytes: Long, format: String, width: Int,
      height: Int, n_frames: Int)

  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])

  case class DecodedRow(media_id: Long, media_type: String, n_bytes: Long,
      format: String, width: Int, height: Int, n_frames: Int)

  /** STUB decoder — deterministic pseudo-metadata from raw bytes.
    * Replace `decode` with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) in a deployment; everything else stays as-is.
    */
  object FakeDecoder {
    def decode(mediaType: String, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      // ??? real decode goes here; the arithmetic below is a stand-in
      MediaMeta(
        n_bytes = n,
        format = mediaType match {
          case "image" => if (n % 2 == 0) "png" else "jpeg"
          case "audio" => "wav"
          case _ => "mp4"
        },
        width = (64 + (n % 577)).toInt,
        height = (64 + ((n * 31 + first) % 513)).toInt,
        n_frames = if (mediaType == "video") (n % 24 + 1).toInt else 1)
    }

    /** STUB resize: metadata-only transform (a real impl would re-encode). */
    def resize(m: MediaMeta, maxSide: Int): MediaMeta = {
      val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
      m.copy(width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }

    /** STUB frame sampling: every k-th frame index. */
    def sampleFrames(m: MediaMeta, every: Int): Seq[Int] =
      0 until m.n_frames by math.max(1, every)
  }

  /** Batch decode over partitions — the mapInPandas-shaped operator. */
  def decodeMeta(rows: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition (per-batch) decoder setup happens ONCE here
      it.map { r =>
        val m = FakeDecoder.decode(r.media_type, r.content)
        DecodedRow(r.media_id, r.media_type, m.n_bytes, m.format, m.width,
          m.height, m.n_frames)
      }
    }
  }

  /** Documents-as-blobs fixture: utf-8 bytes of the text as the binary
    * payload, media type cycled deterministically.
    */
  def documentBlobs(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("media_type"),
        encode(col("text"), "utf-8").as("content"))
      .as[MediaRow]
  }
}
