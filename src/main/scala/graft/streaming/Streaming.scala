package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (BASELINE.json `spark_approach`;
  * SURVEY.md §2.9): the reference drains a Kafka topic as a batch and
  * destroys it for progress tracking — here the same drain-and-stop
  * semantics are Trigger.AvailableNow + checkpointed offsets, plus the
  * event-time operators the reference lacks (watermarks, windows,
  * streaming dedup, custom state).
  *
  * Every transform takes a DataFrame so the identical code runs over
  * `readStream` (production) and a batch frame (tests/oracle twins).
  */
object Streaming {
  /** Typed event row for stateful ops. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, total_value: Double)

  case class SessionState(startUs: Long, endUs: Long, n: Int, value: Double)

  /** File-based streaming source over the events schema — the
    * broker-free twin of the Kafka source (same frame shape downstream).
    */
  def fileEventSource(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file stream source needs a directory; stage the single-file
    // fixture into one (testdata is read-only).
    val src = java.nio.file.Paths.get(dir, "events.parquet")
    // stage dir keyed by the md5 of the full path: collision-proof,
    // bounded length; always refreshed so a regenerated fixture is never
    // streamed stale
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val staged = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-events-$key")
    java.nio.file.Files.createDirectories(staged)
    val dst = staged.resolve("events.parquet")
    java.nio.file.Files.copy(src, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(dst.toString).schema
    spark.readStream.schema(schema).parquet(staged.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** D2: streaming dedup — exactly-one-row-per-key across micro-batches,
    * state bounded by the watermark.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked tumbling or sliding window rollup — the streaming twin
    * of EventOps.hourlyRollup (slide == window) and q49's sliding rollup
    * (slide < window; each event lands in window/slide overlapping
    * windows). Same expressions, append-mode safe.
    */
  def windowedRollup(events: DataFrame, watermark: String = "1 hour",
      windowDur: String = "1 hour", slide: String = ""): DataFrame = {
    val win = if (slide.isEmpty) window(col("ts"), windowDur)
      else window(col("ts"), windowDur, slide)
    events.withWatermark("ts", watermark)
      .groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("total_value"))
  }

  /** Event-time session windows via the built-in session_window (30-minute
    * gap) — state-store backed, watermark-bounded.
    */
  def sessionWindowRollup(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"), col("total_value"))

  /** Custom stateful sessionization with flatMapGroupsWithState — the
    * escape hatch for session semantics session_window can't express
    * (here: emit a session when 30 min of event-time silence passes,
    * tracked per user with explicit state + event-time timeout).
    */
  def statefulSessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import org.apache.spark.sql.Encoders
    implicit val stateEnc: org.apache.spark.sql.Encoder[SessionState] =
      Encoders.product[SessionState]
    implicit val outEnc: org.apache.spark.sql.Encoder[SessionOut] =
      Encoders.product[SessionOut]
    val gapUs = gapMinutes * 60L * 1000000L
    // Timestamp.getTime is millis; keep the full microsecond precision the
    // event-time column carries (batch twin uses unix_micros).
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.startUs, s.endUs, s.n, s.value))
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption.orNull
            rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val us = micros(e.ts)
              cur match {
                case null =>
                  cur = SessionState(us, us, 1, e.value)
                case s if us - s.endUs > gapUs =>
                  closed ::= SessionOut(userId, s.startUs, s.endUs, s.n, s.value)
                  cur = SessionState(us, us, 1, e.value)
                case s =>
                  cur = SessionState(s.startUs, math.max(s.endUs, us), s.n + 1,
                    s.value + e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.endUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval self-join: each error event joined to the
    * same user's events in the preceding `windowMinutes` of event time —
    * the streaming twin of PipelineOps.intervalJoin's matched set. Both
    * sides carry watermarks and the join condition bounds event time on
    * both ends, so Spark can size the state store and evict rows once
    * the watermark passes (an unbounded-time stream join would hold
    * state forever — the condition IS the state bound).
    */
  def errorContextJoin(events: DataFrame, windowMinutes: Int = 10,
      watermark: String = "30 minutes"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    val ctx = events
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value"))
      .withWatermark("c_ts", watermark)
    errors.join(ctx,
      col("e_user") === col("c_user") &&
        col("c_ts") >= col("e_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") < col("e_ts"))
      .select(col("event_id"), col("e_user").as("user_id"),
        col("c_ts"), col("value"))
  }

  /** Streaming upsert sink: the reference's merge job (season ∪ delta →
    * one row per key) as a foreachBatch sink, i.e. continuous ingestion
    * straight into the maintained dataset instead of a separate batch
    * merge pass. Each micro-batch: read current season parquet → merge
    * deterministically (delta wins) → atomically republish. Exactly-once
    * end-to-end: the checkpoint replays unacked batches and the merge is
    * idempotent by key.
    *
    * Scale backends, same interface and idempotence contract:
    *  - `nBuckets = 0` (default): whole-season read → merge → atomic
    *    swap — the reference's shape, fine for small seasons.
    *  - `nBuckets > 0`: partition-pruned MERGE via [[graft.merge
    *    .MergeTable]] — the season lives as hash-bucketed partition
    *    dirs and each micro-batch rewrites only the buckets its keys
    *    touch, so per-batch cost is O(delta + affected partitions)
    *    instead of O(season). This is the plain-parquet form of a
    *    Delta/Iceberg MERGE INTO (no such jars exist in this
    *    environment); swapping in a transactional format later changes
    *    only the storage call, not this sink.
    */
  def upsertSink(delta: DataFrame, seasonPath: String, checkpoint: String,
      keys: Seq[String] = graft.merge.Merge.dedupKeys,
      nBuckets: Int = 0): Unit = {
    val q = delta.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (nBuckets > 0)
          graft.merge.MergeTable.merge(batch.toDF(), seasonPath, keys, nBuckets)
        else legacyWholeSeasonMerge(batch.toDF(), seasonPath, keys)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming duplicate clustering: documents arrive on a stream and the
    * maintained dataset is their cluster MEMBERSHIP — the streaming twin
    * of q58's batch clustering, in the "updating datasets" form: each
    * micro-batch folds the new docs into the existing clustering without
    * ever re-pairing the old corpus against itself.
    *
    * Per micro-batch (all equi-joins — never O(N²), never ∝ corpus²):
    *  1. LSH-index the new docs ([[graft.queries.TextOps.bandKeyTable]])
    *     and probe the accumulated band-key index — candidate pairs that
    *     touch at least one new doc, cost ∝ |new| × bucket hit rate;
    *  2. exact-jaccard verify candidates (only pair-involved docs are
    *     shingled), threshold → new edges;
    *  3. relabel ONLY the components those edges touch
    *     ([[graft.queries.ClusterOps.touchedRelabel]]);
    *  4. upsert the changed membership rows through the partition-pruned
    *     [[graft.merge.MergeTable]] MERGE — per-batch write cost
    *     ∝ affected buckets, not ∝ corpus.
    *
    * State layout under `statePath`: `docs/batch=<id>` and
    * `bandkeys/batch=<id>` (append-only, batch-addressed so a replayed
    * micro-batch OVERWRITES its own partition instead of duplicating it)
    * plus `members/` (a MergeTable). Exactly-once end-to-end: the
    * checkpoint replays unacked batches, batch-addressed appends are
    * self-repairing, and the membership merge is idempotent per key.
    */
  def clusterSink(newDocs: DataFrame, statePath: String, checkpoint: String,
      threshold: Double = graft.queries.ClusterOps.clusterJaccard,
      nBuckets: Int = 16): Unit = {
    val q = newDocs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        clusterBatch(batch.toDF(), id, statePath, threshold, nBuckets)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Current membership maintained by [[clusterSink]]: one
    * (doc_id, cluster_id) row per ingested doc. */
  def clusterMembership(spark: SparkSession, statePath: String): DataFrame =
    graft.merge.MergeTable.read(spark, s"$statePath/members")

  /** One micro-batch of [[clusterSink]] (single writer, like every state
    * mutation here; micro-batches are sequential by construction). */
  private[graft] def clusterBatch(batch: DataFrame, batchId: Long,
      statePath: String, threshold: Double, nBuckets: Int): Unit = {
    import graft.queries.{ClusterOps, TextOps}
    val spark = batch.sparkSession
    val docsDir = s"$statePath/docs"
    val bkDir = s"$statePath/bandkeys"
    val membersDir = s"$statePath/members"
    val deltaDir = s"$statePath/members_delta"
    val fresh = batch.select(col("doc_id"), col("text"))
      .dropDuplicates(Seq("doc_id")).persist()
    val newBK = TextOps.bandKeyTable(fresh).persist()
    try {
      if (fresh.isEmpty) return
      val fs = new org.apache.hadoop.fs.Path(statePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val thisDelta = new org.apache.hadoop.fs.Path(s"$deltaDir/batch=$batchId")
      // Fingerprint of THIS batch's content: the replay fast path below
      // must only reuse a durable delta that was computed from the same
      // rows. Batch ids restart at 0 when a checkpoint is reset against
      // retained state — without the content check, a stale delta from
      // the previous stream incarnation would silently merge in place of
      // the new batch's data.
      val fpRow = fresh.agg(count(lit(1)),
        expr("bit_xor(xxhash64(doc_id, text))")).head()
      val batchFp = fpRow.getLong(0) + ":" +
        (if (fpRow.isNullAt(1)) 0L else fpRow.getLong(1))
      val fpFile = new org.apache.hadoop.fs.Path(thisDelta, "_fingerprint")
      def storedFp: Option[String] =
        if (!fs.exists(fpFile)) None
        else {
          val in = fs.open(fpFile)
          try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
        }
      // Replay fast path: this batch already durably CHOSE its membership
      // delta (crash after the delta write, possibly mid-way through the
      // members merge) — merge the SAME rows verbatim. Recomputing from
      // the now half-merged members table would choose a smaller delta
      // (a doc the crashed attempt already relabeled no longer looks
      // "touched", so its old cluster mates never get relabeled) and the
      // clustering would diverge from batch truth permanently.
      val deltaReady = fs.exists(new org.apache.hadoop.fs.Path(thisDelta, "_SUCCESS")) &&
        storedFp.contains(batchFp)
      if (!deltaReady) {
        // Completed PRIOR batch partitions only: `batch=<this id>` may exist
        // as a crashed partial write (the overwrite below repairs it) and
        // _SUCCESS gates out torn dirs.
        def prior(dir: String): Seq[String] = {
          val p = new org.apache.hadoop.fs.Path(dir)
          if (!fs.exists(p)) Seq.empty
          else fs.listStatus(p).toSeq.map(_.getPath)
            .filter(_.getName.startsWith("batch="))
            .filter(_.getName.stripPrefix("batch=").toLong < batchId)
            .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
            .map(_.toString)
        }
        val bkPrior = prior(bkDir)
        val allBK = if (bkPrior.isEmpty) newBK else newBK.unionByName(
          spark.read.option("basePath", bkDir).parquet(bkPrior: _*)
            .select(col("doc_id"), col("band_idx"), col("band_hash")))
        // candidate pairs touching >= 1 new doc: probe new index rows
        // against the accumulated index
        val cand = newBK
          .select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_x"))
          .join(allBK.select(col("band_idx"), col("band_hash"),
            col("doc_id").as("doc_y")), Seq("band_idx", "band_hash"))
          .filter(col("doc_x") =!= col("doc_y"))
          .select(least(col("doc_x"), col("doc_y")).as("doc_a"),
            greatest(col("doc_x"), col("doc_y")).as("doc_b"))
          .distinct()
        val docsPrior = prior(docsDir)
        val allDocs = if (docsPrior.isEmpty) fresh else fresh.unionByName(
          spark.read.option("basePath", docsDir).parquet(docsPrior: _*)
            .select(col("doc_id"), col("text")))
        // materialize the verified edges once: the relabel consumes them
        // several times (endpoint roots, the CC edge set, the final outer
        // join) and each un-cached consumption would re-run the whole
        // LSH probe + shingle verify pipeline
        val newEdges = TextOps.verifyPairs(allDocs, cand)
          .filter(col("jaccard") >= threshold)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
          .persist()
        val oldMembers =
          if (fs.exists(new org.apache.hadoop.fs.Path(membersDir)))
            graft.merge.MergeTable.read(spark, membersDir)
          else spark.range(0)
            .select(col("id").as("doc_id"), col("id").as("cluster_id"))
        val relabel = ClusterOps.touchedRelabel(oldMembers, newEdges)
        // fresh docs with no edge at all enter as their own singleton row,
        // so the members table stays total over everything ingested
        val freshSingletons = fresh.select(col("doc_id"))
          .join(relabel, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("doc_id").as("cluster_id"))
        // Durably choose the delta BEFORE touching the members table (the
        // write is also the one materialization — the MERGE consumes the
        // delta three times and must not re-execute the relabel pipeline).
        // The batch-addressed dir makes a replayed choice overwrite itself.
        // The fingerprint is written LAST: a crash between the two writes
        // leaves the delta unstamped, so the replay recomputes it (safe —
        // the members table is untouched until the merge below).
        try {
          relabel.unionByName(freshSingletons)
            .write.mode("overwrite").parquet(thisDelta.toString)
        } finally {
          newEdges.unpersist()
          graft.ops.ConnectedComponents.release(relabel)
        }
        val out = fs.create(fpFile, true)
        try out.write(batchFp.getBytes("UTF-8")) finally out.close()
      }
      // shared commit tail (normal path and replay fast path): merge the
      // durable delta, record the batch's corpus + index partitions,
      // drop deltas no replay can need
      graft.merge.MergeTable.merge(
        spark.read.parquet(thisDelta.toString), membersDir,
        Seq("doc_id"), nBuckets)
      fresh.write.mode("overwrite").parquet(s"$docsDir/batch=$batchId")
      newBK.write.mode("overwrite").parquet(s"$bkDir/batch=$batchId")
      gcDeltas(fs, deltaDir, batchId)
    } finally {
      fresh.unpersist()
      newBK.unpersist()
    }
  }

  /** Drop delta dirs of batches before `keepId`: the stream checkpoint
    * replays at most the latest unacknowledged batch, so older deltas
    * can never be needed again. */
  private def gcDeltas(fs: org.apache.hadoop.fs.FileSystem, deltaDir: String,
      keepId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(deltaDir)
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("batch=") &&
          scala.util.Try(name.stripPrefix("batch=").toLong < keepId)
            .getOrElse(false))
        fs.delete(st.getPath, true)
    }
  }

  /** The reference-shaped merge body: read whole season → merge → atomic
    * rename swap (a complete season is readable at every instant; crash
    * recovery restores from `.old`).
    */
  private def legacyWholeSeasonMerge(batch: DataFrame, seasonPath: String,
      keys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val cur = new org.apache.hadoop.fs.Path(seasonPath)
    // Path.toUri percent-encodes; a raw java.net.URI would reject
    // legal paths containing spaces etc.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      cur.toUri, spark.sparkContext.hadoopConfiguration)
    val bak = new org.apache.hadoop.fs.Path(seasonPath + ".old")
    val tmp = new org.apache.hadoop.fs.Path(seasonPath + ".next")
    // Crash recovery (single-writer): a previous run may have died
    // between the two renames below, leaving the season only in .old.
    // Restore it BEFORE reading, and never delete .old until the new
    // season is in place — so some complete copy always exists.
    if (!fs.exists(cur) && fs.exists(bak)) fs.rename(bak, cur)
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale partial write
    val merged =
      if (fs.exists(cur)) {
        val season = spark.read.parquet(seasonPath)
        graft.merge.Merge.mergeDeterministic(season, batch, keys)
      } else batch
    // write-new-then-swap keeps a complete season readable throughout
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(cur)) fs.rename(cur, bak)
    fs.rename(tmp, cur)
    if (fs.exists(bak)) fs.delete(bak, true)
  }

  /** Drain a streaming frame to an in-memory table and return the result —
    * AvailableNow semantics, used by tests and local verification.
    */
  def drainToBatch(streamed: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val q = streamed.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    streamed.sparkSession.table(name)
  }
}
