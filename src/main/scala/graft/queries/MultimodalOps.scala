package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import graft.functions.expressions.LongDotProduct.longDot
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the multimodal plumbing and embedding
  * near-duplicate detection (north star).
  */
object MultimodalOps {
  /** Binary-column decode pipeline over document blobs. Image rows are
    * REAL planted PNG/JPEG payloads decoded through `javax.imageio`
    * ([[Multimodal.ImageCodec]]); audio rows are REAL planted PCM WAV
    * payloads decoded through `javax.sound.sampled`
    * ([[Multimodal.AudioCodec]] — width/height/n_frames carry sample
    * rate/channels/frame count for audio); video rows are REAL planted
    * MP4 containers parsed by the pure-JVM ISO-BMFF box walker
    * ([[Multimodal.VideoCodec]] — width/height from tkhd, frame count
    * from stsz). The oracle predicts what a correct decode of each
    * planted payload must return (parameters were derived from the text
    * at encode time), so the hash match proves the decode chain reads
    * genuine image, RIFF, and MP4 box headers. n_bytes is projected out:
    * encoded payload size is a codec artifact (deflate/DCT/RIFF/box
    * framing) no SQL engine can predict — the field stays on
    * [[Multimodal.DecodedRow]] and is spec-checked instead.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.decodeMeta(Multimodal.documentBlobs(spark, dir))
      .toDF()
      .select(col("media_id"), col("media_type"), col("format"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("media_id"))
  }

  val multimodalMetaSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |    length(text) AS len, ascii(substring(text, 1, 1)) AS first
      |  FROM documents
      |)
      |SELECT media_id, media_type,
      |  CASE media_type
      |    WHEN 'image' THEN (CASE WHEN len % 2 = 0 THEN 'png' ELSE 'jpeg' END)
      |    WHEN 'audio' THEN 'wav'
      |    ELSE 'mp4' END AS format,
      |  CAST(CASE media_type WHEN 'image' THEN 32 + (len % 300)
      |       WHEN 'audio' THEN 8000 + (len % 577)
      |       ELSE 64 + (len % 577) END AS INT) AS width,
      |  CAST(CASE media_type WHEN 'image' THEN 32 + ((len * 31 + first) % 280)
      |       WHEN 'audio' THEN 1
      |       ELSE 64 + ((len * 31 + first) % 513) END AS INT) AS height,
      |  CAST(CASE media_type WHEN 'audio' THEN 40 + ((len * 31 + first) % 400)
      |       WHEN 'video' THEN len % 24 + 1
      |       ELSE 1 END AS INT) AS n_frames
      |FROM m
      |ORDER BY media_id""".stripMargin

  /** Full media pipeline: decode → resize (max side 256, visual media
    * only) → frame-sample (every 4th) → per-type accounting. For images
    * the resize is REAL: full pixel decode, `Graphics2D` bilinear
    * rescale, re-encode, and a second decode of the resized payload — the
    * reported dimensions are read back from actual image bytes. For audio
    * the decode is REAL (RIFF header) and the per-4 sampling decimates
    * genuine PCM frame counts; "resize" does not apply to audio (its dims
    * are rate/channels, not pixels) so they pass through. For video the
    * decode is REAL (MP4 tkhd/stsz box parse) and resize/frame-sample are
    * METADATA-PLANE planning over the parsed dimensions — transcoding
    * would need a codec binding, and a 100 TB pipeline plans its sampling
    * from container headers anyway. One `mapPartitions` pass, no shuffles
    * until the final aggregation; the oracle replays the scale arithmetic
    * the visual paths share (IEEE double divide/multiply then truncation,
    * computed bit-identically by both engines).
    */
  def frameSampleStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sampled = Multimodal.documentBlobs(spark, dir)
      .mapPartitions { it =>
        it.map { r =>
          r.media_type match {
            case "image" =>
              val resized = Multimodal.ImageCodec.resize(r.content, 256)
              val m = Multimodal.ImageCodec.decodeMeta(resized)
              (r.media_type, m.width, m.height,
                Multimodal.sampleFrames(m.n_frames, 4).size)
            case "audio" =>
              val m = Multimodal.AudioCodec.decodeMeta(r.content)
              (r.media_type, m.width, m.height,
                Multimodal.sampleFrames(m.n_frames, 4).size)
            case _ =>
              val m = Multimodal.VideoCodec.decodeMeta(r.content)
              val (rw, rh) = Multimodal.scaledDims(m.width, m.height, 256)
              (r.media_type, rw, rh,
                Multimodal.sampleFrames(m.n_frames, 4).size)
          }
        }
      }.toDF("media_type", "rw", "rh", "n_sampled")
    sampled.groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_sampled")).as("total_sampled_frames"),
        max(col("rw")).as("max_resized_w"),
        max(col("rh")).as("max_resized_h"))
      .orderBy(col("media_type"))
  }

  val frameSampleStatsSql: String =
    """WITH d AS (
      |  SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |    length(text) AS len, ascii(substring(text, 1, 1)) AS first
      |  FROM documents
      |), m AS (
      |  SELECT media_type,
      |    CAST(CASE media_type WHEN 'image' THEN 32 + (len % 300)
      |         WHEN 'audio' THEN 8000 + (len % 577)
      |         ELSE 64 + (len % 577) END AS INT) AS w,
      |    CAST(CASE media_type WHEN 'image' THEN 32 + ((len * 31 + first) % 280)
      |         WHEN 'audio' THEN 1
      |         ELSE 64 + ((len * 31 + first) % 513) END AS INT) AS h,
      |    CAST(CASE media_type WHEN 'audio' THEN 40 + ((len * 31 + first) % 400)
      |         WHEN 'video' THEN len % 24 + 1
      |         ELSE 1 END AS INT) AS n_frames
      |  FROM d
      |), r AS (
      |  SELECT media_type,
      |    CASE WHEN media_type = 'audio' THEN w
      |      ELSE GREATEST(1, CAST(trunc(w * LEAST(1.0, 256.0 / GREATEST(w, h))) AS INT))
      |      END AS rw,
      |    CASE WHEN media_type = 'audio' THEN h
      |      ELSE GREATEST(1, CAST(trunc(h * LEAST(1.0, 256.0 / GREATEST(w, h))) AS INT))
      |      END AS rh,
      |    (n_frames + 3) // 4 AS n_sampled
      |  FROM m
      |)
      |SELECT media_type, COUNT(*) AS n_media,
      |  CAST(SUM(n_sampled) AS BIGINT) AS total_sampled_frames,
      |  MAX(rw) AS max_resized_w, MAX(rh) AS max_resized_h
      |FROM r GROUP BY media_type ORDER BY media_type""".stripMargin

  /** Embedding near-duplicate detection, LSH-bucketed (scale path):
    * collection = embeddings ∪ planted perturbed copies (+7 in quantized
    * space — preserves every pairwise component comparison, so planted
    * pairs land in the same bucket by construction). Bucket = 16 sign
    * bits of component comparisons; candidates bucket-join (equi-join,
    * shuffle on bucket — never O(N²)); verify exact quantized cosine
    * >= 0.999.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
    val planted = base.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("q"), x => x + 7L).as("q"))
    val all = base.unionByName(planted)
    val bucket = (0 until 16).map { k =>
      when(element_at(col("q"), 2 * k + 1) >= element_at(col("q"), 2 * k + 2), lit(1L << k))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    // persist: the quantize+norm pipeline feeds both sides of the
    // self-join; without materialization a broadcast-join election would
    // recompute it per side (exchange reuse only matches shuffle plans).
    // LRU-bounded via PersistRegistry, one entry per distinct dir.
    val withBucket = graft.ops.PersistRegistry.cached("q22:" + dir,
      all
        .withColumn("bucket", bucket)
        .withColumn("norm", sqrt(longDot("q", "q").cast("double")))
        .repartition(col("bucket")),
      sourcePath = s"$dir/embeddings.parquet")
    val a = withBucket.select(col("bucket"), col("vec_id").as("id_a"),
      col("q").as("qa"), col("norm").as("na"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("id_b"),
      col("q").as("qb"), col("norm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", graft.functions.VectorFunctions.safeCos(
        longDot("qa", "qb").cast("double"), col("na") * col("nb")))
      .filter(col("cos") >= 0.999)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val embeddingNearDupSql: String = {
    val bucketExpr = (0 until 16).map { k =>
      s"(CASE WHEN qv[${2 * k + 1}] >= qv[${2 * k + 2}] THEN (CAST(1 AS BIGINT) << $k) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
       |  FROM embeddings
       |), allv AS (
       |  SELECT vec_id, qv FROM base
       |  UNION ALL
       |  SELECT vec_id + 100000, list_transform(qv, x -> x + 7) FROM base
       |), bucketed AS (
       |  SELECT vec_id, qv, $bucketExpr AS bucket,
       |    sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS nrm
       |  FROM allv
       |)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  ${graft.functions.VectorFunctions.safeCosSql(
        "CAST(list_sum(list_transform(list_zip(a.qv, b.qv), z -> z[1] * z[2])) AS DOUBLE)",
        "a.nrm * b.nrm")} AS cos
       |FROM bucketed a JOIN bucketed b
       |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${graft.functions.VectorFunctions.safeCosSql(
        "CAST(list_sum(list_transform(list_zip(a.qv, b.qv), z -> z[1] * z[2])) AS DOUBLE)",
        "a.nrm * b.nrm")} >= 0.999
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q90: error-tolerant decode over a corpus with planted corruption —
    * every `media_id % 7 == 0` blob is truncated to its first 5 bytes
    * (too short for any container's header: PNG needs its 8-byte
    * signature, the JPEG walker a start-of-frame, RIFF/MP4 their box
    * headers), run through [[Multimodal.decodeMetaTotal]], and profiled
    * per media type. The oracle predicts the failure set from the
    * corruption rule alone and the ok-side meta sums from the plants —
    * a hash match proves corrupt rows are FLAGGED (never fatal, never
    * silently dropped: n_media counts them, n_err isolates them) while
    * surviving rows still decode exactly. The scale point: a 100 TB
    * corpus WILL contain corrupt blobs, so decode must be total — one
    * bad row must cost one error value, not four task retries and the
    * job.
    */
  def decodeErrors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corrupted = Multimodal.documentBlobs(spark, dir).map { r =>
      if (r.media_id % 7 == 0) r.copy(content = r.content.take(5)) else r
    }
    Multimodal.decodeMetaTotal(corrupted).toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        count(col("error")).as("n_err"),
        sum(when(col("error").isNull, col("width"))).as("sum_ok_width"),
        sum(when(col("error").isNull, col("n_frames"))).as("sum_ok_frames"))
      .orderBy(col("media_type"))
  }

  val decodeErrorsSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |    length(text) AS len, ascii(substring(text, 1, 1)) AS first,
      |    (doc_id % 7 = 0) AS corrupt
      |  FROM documents
      |)
      |SELECT media_type,
      |  COUNT(*) AS n_media,
      |  COUNT(*) FILTER (corrupt) AS n_err,
      |  CAST(SUM(CASE WHEN NOT corrupt THEN
      |    CASE media_type WHEN 'image' THEN 32 + (len % 300)
      |         WHEN 'audio' THEN 8000 + (len % 577)
      |         ELSE 64 + (len % 577) END END) AS BIGINT) AS sum_ok_width,
      |  CAST(SUM(CASE WHEN NOT corrupt THEN
      |    CASE media_type WHEN 'audio' THEN 40 + ((len * 31 + first) % 400)
      |         WHEN 'video' THEN len % 24 + 1
      |         ELSE 1 END END) AS BIGINT) AS sum_ok_frames
      |FROM m
      |GROUP BY media_type
      |ORDER BY media_type""".stripMargin

  /** One-table-pair state snapshot for [[quarantineLoop]]: per media
    * type, the maintained table's row count and width sum plus the
    * quarantine's active/resolved membership. Collected EAGERLY by the
    * caller — cycle 2 mutates both tables, so a lazy snapshot taken
    * after cycle 1 would silently observe post-repair state.
    */
  private[queries] def quarantineSnapshot(spark: SparkSession, mainT: String,
      quarT: String, cycle: Int): DataFrame = {
    val m = graft.merge.MergeTable.read(spark, mainT)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("main_rows"),
        sum(col("width")).cast("long").as("main_sum_width"))
    val q = graft.merge.MergeTable.read(spark, quarT)
      .groupBy(col("media_type"))
      .agg(count(when(col("status") === lit("quarantined"), lit(1)))
          .as("quar_active"),
        count(when(col("status") === lit("resolved"), lit(1)))
          .as("quar_resolved"))
    m.join(q, Seq("media_type"), "full_outer")
      .na.fill(0L,
        Seq("main_rows", "main_sum_width", "quar_active", "quar_resolved"))
      .select(lit(cycle).as("cycle"), col("media_type"), col("main_rows"),
        col("main_sum_width"), col("quar_active"), col("quar_resolved"))
  }

  /** q91: the full "updating datasets under corruption" loop — q90's
    * error-tolerant decode wired end-to-end into the maintained dataset
    * (round-13 verdict item 1).
    *
    * Cycle 1 ingests the corpus with the SAME planted corruption as q90
    * (`media_id % 7 == 0` truncated to 5 bytes): the decode plan feeds
    * [[Multimodal.quarantineRoute]], whose normalization stage
    * materializes it once; the route upserts the ok rows into
    * a bucketed [[graft.merge.MergeTable]] meta table and lands the
    * error rows in a keyed quarantine table. Cycle 2 is the repair pass:
    * pristine blobs arrive for exactly the quarantined keys (a semi-join
    * — NOT a broadcast: at a real corruption rate the quarantine is
    * data-scale), re-decode clean, upsert into the maintained table, and
    * leave quarantine via `status='resolved'` tombstones.
    *
    * The declared result states BOTH tables after EACH cycle (2 cycles ×
    * one row per media type), and the oracle predicts every cell from
    * the planted `% 7` rule alone: cycle 1 must show the maintained
    * table missing exactly the corrupt rows and quarantine holding
    * exactly them; cycle 2 must show the maintained table complete and
    * quarantine fully resolved. Replay idempotence (re-routing the same
    * decoded batch changes nothing) is spec-pinned in
    * VectorAndMultimodalSpec.
    *
    * The two `collect()`s here are metadata-scale by construction (one
    * row per media type per cycle, ≤ 3 each) and REQUIRED for
    * correctness: the cycle-1 snapshot must be materialized before
    * cycle 2 rewrites the tables it reads.
    */
  def quarantineLoop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Scope shuffle partitions to 8 for the loop, like the streaming
    // drains do (StreamingQueries.withDrainPartitions): the loop is a
    // chain of ~15 small sequential jobs (stages, merges, snapshots)
    // whose per-partition constants dominate at bench scale; a
    // deployment sizes the conf to its data instead.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // AQE off for the loop's bounded merge jobs, same rationale and
    // measurement as StreamingQueries.withDrainPartitions
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val base = java.nio.file.Files.createTempDirectory("graft-q91-").toString
    try {
      val mainT = s"$base/media_meta"
      val quarT = s"$base/quarantine"
      val nB = 16
      // lazy decode plans go straight into the route — the route's own
      // normalization stage is the single materialization (one staging
      // pair per cycle, not two; the codec pass still executes once)
      val corrupted = Multimodal.documentBlobs(spark, dir).map { r =>
        if (r.media_id % 7 == 0) r.copy(content = r.content.take(5)) else r
      }
      Multimodal.quarantineRoute(Multimodal.decodeMetaTotal(corrupted).toDF(),
        mainT, quarT, nB, s"$base/scratch1", seq = 1L)
      val snap1 = quarantineSnapshot(spark, mainT, quarT, 1)
      val schema = snap1.schema
      val s1 = snap1.collect()
      val quarKeys = graft.merge.MergeTable.read(spark, quarT)
        .filter(col("status") === lit("quarantined")).select("media_id")
      val repaired = Multimodal.documentBlobs(spark, dir).toDF()
        .join(quarKeys, Seq("media_id"), "left_semi")
        .as[Multimodal.MediaRow]
      // `repaired` lazily reads the quarantine table (quarKeys), which
      // executes inside the route's normalization write — BEFORE the
      // route's quarantine merge starts its swaps, so the single-writer
      // discipline holds
      Multimodal.quarantineRoute(Multimodal.decodeMetaTotal(repaired).toDF(),
        mainT, quarT, nB, s"$base/scratch2", seq = 2L)
      val s2 = quarantineSnapshot(spark, mainT, quarT, 2).collect()
      import scala.jdk.CollectionConverters._
      spark.createDataFrame((s1 ++ s2).toSeq.asJava, schema)
        .orderBy(col("cycle"), col("media_type"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base)))
    }
  }

  val quarantineLoopSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |    length(text) AS len,
      |    (doc_id % 7 = 0) AS corrupt
      |  FROM documents
      |), per AS (
      |  SELECT media_type,
      |    COUNT(*) AS n_all,
      |    COUNT(*) FILTER (corrupt) AS n_corrupt,
      |    CAST(SUM(CASE media_type WHEN 'image' THEN 32 + (len % 300)
      |         WHEN 'audio' THEN 8000 + (len % 577)
      |         ELSE 64 + (len % 577) END) AS BIGINT) AS sum_all_width,
      |    CAST(SUM(CASE WHEN NOT corrupt THEN
      |      CASE media_type WHEN 'image' THEN 32 + (len % 300)
      |         WHEN 'audio' THEN 8000 + (len % 577)
      |         ELSE 64 + (len % 577) END END) AS BIGINT) AS sum_ok_width
      |  FROM m GROUP BY media_type
      |)
      |SELECT 1 AS cycle, media_type, n_all - n_corrupt AS main_rows,
      |  sum_ok_width AS main_sum_width, n_corrupt AS quar_active,
      |  CAST(0 AS BIGINT) AS quar_resolved
      |FROM per
      |UNION ALL
      |SELECT 2 AS cycle, media_type, n_all AS main_rows,
      |  sum_all_width AS main_sum_width, CAST(0 AS BIGINT) AS quar_active,
      |  n_corrupt AS quar_resolved
      |FROM per
      |ORDER BY cycle, media_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_multimodal_meta" -> (multimodalMeta _),
    "q22_embedding_neardup" -> (embeddingNearDup _),
    "q47_frame_sample" -> (frameSampleStats _),
    "q90_decode_errors" -> (decodeErrors _),
    "q91_quarantine_loop" -> (quarantineLoop _))

  val oracle: Map[String, String] = Map(
    "q21_multimodal_meta" -> multimodalMetaSql,
    "q22_embedding_neardup" -> embeddingNearDupSql,
    "q47_frame_sample" -> frameSampleStatsSql,
    "q90_decode_errors" -> decodeErrorsSql,
    "q91_quarantine_loop" -> quarantineLoopSql)
}
