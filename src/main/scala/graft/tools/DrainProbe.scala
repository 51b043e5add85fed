package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-stage attribution for the streaming-drain constant (r15 verdict
  * item 1: the 13 drain queries q79–q93 were ~37 s of the 92 s bench,
  * with a "~1.2 s per micro-batch" overhead class nobody had split into
  * its parts). Replicates q93's exact shape — the most drain-heavy
  * query: two AvailableNow drains on one checkpoint, 3 corruption + 2
  * repair micro-batches, full quarantine route per batch — and
  * attributes every second three ways:
  *
  *  1. WALL segments (nanoTime): fixture prep, each drain's
  *     start()→awaitTermination() span, final snapshot.
  *  2. The ENGINE's own per-trigger breakdown
  *     (StreamingQueryProgress.durationMs): addBatch (our foreachBatch
  *     body), walCommit + commitOffsets (checkpoint fsyncs), latestOffset
  *     + getBatch (source listing), queryPlanning, vs triggerExecution
  *     total — what the drain spends OUTSIDE the route.
  *  3. The route's own phase seam ([[graft.multimodal.Multimodal
  *     .quarantineRoute]] `probe`): norm_stage (decode + normalization
  *     shuffle + parquet stage), main_merge, qdelta_stage (resolved-side
  *     semi-join + stage), quar_merge, cleanup — what the route spends
  *     INSIDE addBatch.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.tools.DrainProbe [repeats]"
  * Prints one JSON line per run; the BUILD_NOTES R16 attribution table
  * is transcribed from this output.
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = args.headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    (1 to repeats).foreach { run =>
      val phases = mutable.Map[String, Double]().withDefaultValue(0.0)
      val probe: (String, Long) => Unit =
        (ph, ns) => phases.synchronized { phases(ph) += ns / 1e9 }
      val durations = mutable.Map[String, Double]().withDefaultValue(0.0)
      var nTriggers = 0
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          durations.synchronized {
            nTriggers += 1
            e.progress.durationMs.forEach((k, v) => durations(k) += v / 1000.0)
          }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)

      def sec[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }

      val base = java.nio.file.Files
        .createTempDirectory("graft-drainprobe-").toString
      val mainT = s"$base/media_meta"
      val quarT = s"$base/quarantine"
      val src = s"$base/src"
      val blobs = graft.multimodal.Multimodal.documentBlobs(spark, sfDir)
      val (_, fixtureSec) = sec {
        blobs.map { r =>
          if (r.media_id % 7 == 0) r.copy(content = r.content.take(5)) else r
        }.toDF().repartitionByRange(3, col("media_id")).write.parquet(src)
      }
      val schema = spark.read.parquet(src).schema
      def drain(): Double = {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.adaptive.enabled",
          sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
        try sec {
          val q = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src)
            .writeStream
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              graft.multimodal.Multimodal.quarantineRoute(
                graft.multimodal.Multimodal.decodeMetaTotal(
                  batch.as[graft.multimodal.Multimodal.MediaRow]).toDF(),
                mainT, quarT,
                // SPARK_GRAFT_NBUCKETS: the r17 bucket-count drill runs
                // this q93-shaped probe at production bucket counts
                nBuckets = sys.env.getOrElse("SPARK_GRAFT_NBUCKETS", "16").toInt,
                scratch = s"$base/scratch", seq = batchId, probe = probe)
            }
            .option("checkpointLocation", s"$base/cp")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }._2
        finally {
          spark.conf.set("spark.sql.shuffle.partitions", prev)
          spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        }
      }
      val drain1Sec = drain()
      val (_, repairSec) = sec {
        blobs.filter(_.media_id % 7 == 0).toDF()
          .repartitionByRange(2, col("media_id"))
          .write.mode("append").parquet(src)
      }
      val drain2Sec = drain()
      val (_, snapSec) = sec {
        // q93's snapshot equivalent: one aggregate over each table
        graft.merge.MergeTable.read(spark, mainT)
          .groupBy("media_type").count().collect()
        graft.merge.MergeTable.read(spark, quarT)
          .groupBy("media_type", "status").count().collect()
      }
      // Progress events are delivered asynchronously on the listener
      // bus — removing the listener right after awaitTermination can
      // drop late events and undercount the durationMs attribution.
      // The bus-flush API is private[spark], so poll for quiescence:
      // the totals must hold still across two consecutive reads
      // (bounded at ~2 s — a missing final event skews one trigger's
      // share, never the wall segments).
      locally {
        def snap(): (Int, Double) =
          durations.synchronized { (nTriggers, durations.values.sum) }
        var prev = snap()
        var settled = 0
        var waited = 0
        while (settled < 2 && waited < 20) {
          Thread.sleep(100); waited += 1
          val cur = snap()
          if (cur == prev) settled += 1 else { settled = 0; prev = cur }
        }
      }
      spark.streams.removeListener(listener)
      val total = fixtureSec + drain1Sec + repairSec + drain2Sec + snapSec
      def m(map: mutable.Map[String, Double]): String = map.toSeq.sortBy(-_._2)
        .map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
      val trig = durations("triggerExecution")
      val add = durations("addBatch")
      println(f"""{"probe":"drain","run":$run,"sf":"$sfDir","total":$total%.2f,""" +
        f""""fixture":$fixtureSec%.2f,"drain1":$drain1Sec%.2f,""" +
        f""""repair_fixture":$repairSec%.2f,"drain2":$drain2Sec%.2f,""" +
        f""""snapshot":$snapSec%.2f,"n_triggers":$nTriggers,""" +
        f""""outside_triggers":${drain1Sec + drain2Sec - trig}%.2f,""" +
        f""""outside_addBatch":${trig - add}%.2f,""" +
        f""""route_unattributed":${add - phases.values.sum}%.2f,""" +
        s""""durationMs":{${m(durations)}},"route":{${m(phases)}}}""")
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base)))
    }
    spark.stop()
  }
}
