package graft.tools

import graft.ingest.Ingest
import graft.merge.Merge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The deployable two-stage pipeline CLI — entry-point parity with the
  * reference's two spark-submit scripts (`scripts/spark_processing.py:
  * 266-285` runs the ingest job, `scripts/spark_merge_dfs.py:131-160`
  * runs the merge/publish job; the DAG invokes them in sequence,
  * `dags/kafka_stream_dag.py:69-77`). Same division of labor here:
  *
  *  - `ingest`: topic → envelope transform → headered CSV delta, as a
  *    checkpointed AvailableNow drain (restart-safe where the reference
  *    destroyed the topic for progress tracking);
  *  - `merge`: season tgz ∪ delta CSV → deterministic upsert → republish
  *    the tgz artifact (sorted by the dedup keys so identical data
  *    publishes identical bytes — what lets a restarted pipeline prove
  *    convergence);
  *  - `run`: both stages, one command.
  *
  * Usage (spark-submit provides the master/cluster conf; local runs fall
  * back to local[*]):
  * {{{
  *   PipelineMain ingest --servers <brokers|kafka-log root> --topic shots \
  *     --out /data/ongoing --checkpoint /data/ckpt \
  *     [--format kafka|kafka-log] [--min-partitions N] [--max-offsets N]
  *   PipelineMain merge --season /data/shots-2025.tgz --delta /data/ongoing \
  *     [--publish <out tgz, default = --season>] [--csv-name shots-2025.csv]
  *   PipelineMain run  <all of the above>
  * }}}
  *
  * The stages are public methods so tests (PipelineE2ESpec) drive the
  * SAME code the command line runs, not parallel plumbing.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, usage)
    val cmd = args.head
    val opts = parseOpts(args.tail)
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    cmd match {
      case "ingest" => ingest(spark, opts)
      case "merge" => mergePublish(spark, opts)
      case "run" => ingest(spark, opts); mergePublish(spark, opts)
      case "quarantine" => quarantine(spark, opts)
      case other => throw new IllegalArgumentException(
        s"unknown command '$other'\n$usage")
    }
  }

  val usage: String =
    """usage: PipelineMain <ingest|merge|run|quarantine> [--key value ...]
      |  ingest: --servers --topic --out --checkpoint
      |          [--format kafka|kafka-log] [--min-partitions] [--max-offsets]
      |          [--typed true]
      |  merge:  --season --delta [--publish] [--csv-name] [--tmp]
      |  quarantine: --blobs --main --quar --checkpoint
      |          [--buckets N (default: existing table's _meta, else
      |           MergeTable.suggestBuckets(--table-bytes, default 0))]
      |          [--table-bytes N] [--retire-horizon N] [--tmp dir]
      |          [--crash-after-batch N (fault-injection seam)]""".stripMargin

  private[graft] def parseOpts(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0, s"dangling flag in ${args.mkString(" ")}\n$usage")
    args.grouped(2).map { pair =>
      require(pair(0).startsWith("--"), s"expected --flag, got '${pair(0)}'\n$usage")
      pair(0).stripPrefix("--") -> pair(1)
    }.toMap
  }

  private def req(opts: Map[String, String], k: String): String =
    opts.getOrElse(k, throw new IllegalArgumentException(
      s"missing required --$k\n$usage"))

  /** Stage 1: drain the topic through the envelope transform into the
    * headered `ongoing/` CSV delta (spark_processing.py's job). The
    * checkpoint makes re-runs drain only unseen offsets — an empty
    * incremental drain leaves the delta as-is.
    *
    * `--typed true` is the gated capability-add of SURVEY §1.2: it
    * APPENDS the typed twin columns ([[Ingest.typedLayer]] — q94's
    * oracle-gated semantics) after the parse chain. Default OFF: the
    * legacy all-string artifact (the reference's net schema,
    * `scripts/spark_processing.py:78-133`) stays the default output,
    * and the typed layer never touches the legacy columns, so flag-off
    * output is identical to pre-flag output (PipelineE2ESpec pins
    * both).
    */
  def ingest(spark: SparkSession, opts: Map[String, String]): Unit = {
    val transformed = Ingest.transform(Ingest.kafkaStreamSource(spark,
      servers = req(opts, "servers"),
      topic = req(opts, "topic"),
      minPartitions = opts.getOrElse("min-partitions", "0").toInt,
      maxOffsetsPerTrigger = opts.getOrElse("max-offsets", "0").toLong,
      format = opts.getOrElse("format", "kafka")))
    val out = if (opts.get("typed").exists(_.toBoolean))
      Ingest.typedLayer(transformed) else transformed
    Ingest.streamToCsv(out, req(opts, "out"), req(opts, "checkpoint"))
  }

  /** Stage 2: season tgz ∪ delta CSV → [[Merge.mergeDeterministic]] →
    * republish (spark_merge_dfs.py's job). A missing season bootstraps
    * from the delta alone (day-0 run). Rows are sorted by the dedup keys
    * before packaging so the artifact is byte-reproducible.
    */
  def mergePublish(spark: SparkSession, opts: Map[String, String]): Unit = {
    val seasonTgz = req(opts, "season")
    val deltaDir = req(opts, "delta")
    // "publish", not "out": `run` shares one opts map across both
    // stages and --out is the ingest stage's CSV delta dir
    val outTgz = opts.getOrElse("publish", seasonTgz)
    val csvName = opts.getOrElse("csv-name",
      new org.apache.hadoop.fs.Path(outTgz).getName.stripSuffix(".tgz") + ".csv")
    val tmpDir = opts.getOrElse("tmp", outTgz + ".publish-tmp")
    val delta = Merge.readCsv(spark, deltaDir)
    val seasonPath = new org.apache.hadoop.fs.Path(seasonTgz)
    val fs = seasonPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(seasonPath))
        Merge.mergeDeterministic(Merge.readSeasonTgz(spark, seasonTgz), delta)
      else delta.dropDuplicates(Merge.dedupKeys)
    Merge.publishTgz(merged.orderBy(Merge.dedupKeys.map(col): _*),
      tmpDir, outTgz, csvName)
  }

  /** Stage 3 (the engine extension beyond the reference's two jobs): the
    * corruption-tolerant media ingest — a checkpointed AvailableNow drain
    * of a blob parquet dir through [[graft.multimodal.Multimodal
    * .decodeMetaTotal]] and [[graft.multimodal.Multimodal
    * .quarantineRoute]]: ok rows upsert the maintained bucketed meta
    * table, corrupt rows land in the keyed quarantine table, and a blob
    * re-arriving clean resolves its quarantine row. Re-running the
    * command drains only unseen files (restart = catch-up), and a run
    * killed mid-drain replays its uncommitted batch idempotently —
    * exactly the q92/q93 semantics, CLI-shaped.
    *
    * `--retire-horizon N` additionally ages out `resolved` tombstones
    * older than N batches behind the checkpoint's LAST COMMITTED batch
    * (quarantine size then tracks active corruption, not history). The
    * anchor is read from the checkpoint's commits log, not from batches
    * drained in THIS invocation — a pure-retention run against a
    * caught-up source (zero new batches) still retires on the true
    * horizon instead of silently no-oping.
    *
    * `--crash-after-batch N` is a fault-injection seam for restart
    * drills (PipelineE2ESpec uses it): the drain throws AFTER batch N's
    * route is applied but BEFORE its checkpoint commit — the adversarial
    * exactly-once window.
    */
  def quarantine(spark: SparkSession, opts: Map[String, String]): Unit = {
    import graft.multimodal.Multimodal
    val blobs = req(opts, "blobs")
    val mainT = req(opts, "main")
    val quarT = req(opts, "quar")
    val cp = req(opts, "checkpoint")
    // --buckets: explicit N wins; otherwise an EXISTING main table's
    // persisted `_meta` layout wins (bucket counts are immutable per
    // table — a different count would scatter keys across layouts and
    // fail checkMeta loudly); otherwise the measured sizing rule
    // ([[graft.merge.MergeTable.suggestBuckets]]) over --table-bytes
    // (the caller's estimate of the EVENTUAL meta-table size, not the
    // blob bytes — meta rows are ~100 B/blob). With no estimate either,
    // the rule's floor (16) applies: media-meta/quarantine tables are
    // MB-GB scale, the regime the 100× matrix confirmed 16 for.
    val nBuckets = opts.get("buckets").map(_.toInt).getOrElse {
      graft.merge.MergeTable.meta(spark, mainT).map(_._1).getOrElse(
        graft.merge.MergeTable.suggestBuckets(
          opts.get("table-bytes").map(_.toLong).getOrElse(0L)))
    }
    val tmp = opts.getOrElse("tmp", mainT + ".quarantine-tmp")
    val crashAfter = opts.get("crash-after-batch").map(_.toLong)
    val schema = org.apache.spark.sql.Encoders
      .product[Multimodal.MediaRow].schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(blobs)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // the lazy decode plan goes straight into the route — its one
        // materialization is the route's own normalization stage, so the
        // expensive codec pass still executes exactly once per batch
        // (quarantineRoute's input contract; pre-r16 this staged the
        // decoded batch to parquet first, a redundant write+read pair
        // every micro-batch)
        Multimodal.quarantineRoute(
          Multimodal.decodeMetaTotal(
            batch.as[Multimodal.MediaRow](
              org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
            .toDF(),
          mainT, quarT, nBuckets, scratch = s"$tmp/scratch", seq = id)
        if (crashAfter.contains(id))
          throw new RuntimeException(s"injected crash after batch $id route")
      }
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    opts.get("retire-horizon").map(_.toLong).foreach { horizon =>
      val anchor = lastCommittedBatch(spark, cp)
      if (anchor >= 0)
        Multimodal.quarantineRetire(spark, quarT,
          retireBefore = anchor - horizon + 1)
      else System.err.println(
        "PipelineMain quarantine: --retire-horizon skipped — no committed " +
          "batches in the checkpoint, so there is no batch horizon to age " +
          "against yet")
    }
  }

  /** Last committed batch id in a streaming checkpoint's commits log, or
    * -1 when nothing has ever committed. This is the durable form of
    * "how far has this pipeline progressed": batches drained in the
    * current invocation are a subset of it (a caught-up source drains
    * zero), and a batch that routed but crashed before its commit is
    * deliberately NOT counted — retirement must never assume effects
    * newer than what a replay is still allowed to rewrite. The commit
    * log is one file per batch named by its id (Spark's HDFSMetadataLog
    * layout — public on-disk contract of the checkpoint dir).
    */
  private[graft] def lastCommittedBatch(spark: SparkSession,
      checkpoint: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(checkpoint, "commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return -1L
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .foldLeft(-1L)((m, n) => math.max(m, n.toLong))
  }
}
