package graft

import java.nio.file.Files

import graft.merge.Merge
import org.apache.spark.sql.functions._

/** Merge/upsert semantics (reference spark_merge_dfs.py:82-83) + the
  * tgz artifact round-trip (S3/S5).
  */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def season = Seq(
    ("g1", "11:30.0", "1", "old1"),
    ("g1", "10:00.0", "1", "old2"),
    ("g2", "5:00.0", "2", "old3")
  ).toDF("game_id", "time_remaining", "quarter", "payload")

  // overlaps on (g1, 11:30.0, 1); adds a new row and a new column
  private def delta = Seq(
    ("g1", "11:30.0", "1", "new1", "extra1"),
    ("g3", "2:00.0", "4", "new2", "extra2")
  ).toDF("game_id", "time_remaining", "quarter", "payload", "batch_tag")

  test("merge: union-by-name null-fill + one row per key") {
    val m = Merge.merge(season, delta)
    assert(m.columns.toSet == Set("game_id", "time_remaining", "quarter",
      "payload", "batch_tag"))
    assert(m.count() == 4)
    assert(m.groupBy("game_id", "time_remaining", "quarter").count()
      .filter(col("count") > 1).count() == 0)
    // season-only rows got a null batch_tag
    assert(m.filter(col("game_id") === "g2" && col("batch_tag").isNull).count() == 1)
  }

  test("mergeDeterministic: delta wins on key collision; idempotent") {
    val m = Merge.mergeDeterministic(season, delta)
    assert(m.filter(col("game_id") === "g1" && col("time_remaining") === "11:30.0")
      .select("payload").as[String].collect().toSeq == Seq("new1"))
    // re-merging the same delta changes nothing
    val m2 = Merge.mergeDeterministic(m, delta)
    assert(m2.exceptAll(m).count() == 0 && m.exceptAll(m2).count() == 0)
  }

  test("mergeDeterministic tolerates unorderable (map) payload columns") {
    import org.apache.spark.sql.functions.map
    val s = season.withColumn("props", map(lit("k"), col("payload")))
    val d = delta.withColumn("props", map(lit("k"), col("payload")))
    val m = Merge.mergeDeterministic(s, d)
    assert(m.count() == 4) // analysis succeeds; one row per key
  }

  test("tgz publish → readSeasonTgz round-trip") {
    val dir = Files.createTempDirectory("graft-tgz").toString
    val df = Merge.mergeDeterministic(season, delta)
    Merge.publishTgz(df, s"$dir/tmp", s"$dir/shots-2025.tgz", "shots-2025.csv")
    val back = Merge.readSeasonTgz(spark, s"$dir/shots-2025.tgz")
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
    assert(back.count() == df.count())
    // all-string round trip (header=true, no inferSchema), like the reference
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("publishPartitioned writes executor-parallel parquet") {
    val dir = Files.createTempDirectory("graft-part").toString
    Merge.publishPartitioned(Merge.merge(season, delta), s"$dir/out",
      partitionCols = Seq("quarter"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 4)
    assert(back.select("quarter").distinct().count() == 3)
  }

  test("MergeTable: pruned merge equals full merge, untouched dirs untouched") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mt").toString + "/t"
    val base = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 16)
    def listing: Map[String, Set[(String, Long)]] =
      new java.io.File(path).listFiles()
        .filter(_.getName.startsWith(MergeTable.BucketCol + "="))
        .map(d => d.getName ->
          d.listFiles().map(f => (f.getName, f.lastModified())).toSet)
        .toMap
    val before = listing
    val delta = Seq((5L, "NEW5"), (6L, "NEW6"), (2000L, "NEW2000"))
      .toDF("k", "v")
    val affectedDirs = delta
      .select(pmod(xxhash64(col("k")), lit(16L)).cast("int").as("b"))
      .distinct().collect().map(r => s"${MergeTable.BucketCol}=${r.getInt(0)}")
      .toSet
    MergeTable.merge(delta, path, Seq("k"), nBuckets = 16)
    val after = listing
    // partition pruning is observable on disk: unaffected bucket dirs
    // keep their exact files
    before.foreach { case (d, files) =>
      if (!affectedDirs(d)) assert(after(d) === files, s"dir $d rewritten")
      else assert(after(d) !== files, s"dir $d NOT rewritten")
    }
    // merged content equals the unpruned reference merge
    val got = MergeTable.read(spark, path)
    val want = Merge.mergeDeterministic(base, delta, Seq("k"))
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
    // replaying the same delta is a no-op (checkpoint-recovery idempotence)
    MergeTable.merge(delta, path, Seq("k"), nBuckets = 16)
    val replay = MergeTable.read(spark, path)
    assert(replay.exceptAll(want).count() === 0L)
    assert(want.exceptAll(replay).count() === 0L)
  }

  test("MergeTable reads a bucket stranded in .old without mutating; merge repairs it") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtc").toString + "/t"
    val base = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 4)
    // simulate dying between the two per-dir renames: one bucket exists
    // ONLY as .old
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(MergeTable.BucketCol + "="))
    val victim = dirs.head
    val bak = new java.io.File(victim.getParent, victim.getName + ".old")
    assert(victim.renameTo(bak))
    // reader sees the complete table via the backup and does NOT repair
    // (a mutating reader would race a live writer's swap)
    val got = MergeTable.read(spark, path)
    assert(got.exceptAll(base).count() === 0L)
    assert(base.exceptAll(got).count() === 0L)
    assert(bak.exists() && !victim.exists(), "reader must not mutate the table")
    // the single writer repairs on its next merge
    MergeTable.merge(Seq((1L, "NEW1")).toDF("k", "v"), path, Seq("k"), 4)
    assert(!bak.exists(), "merge must recover the stranded backup")
    val after = MergeTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 200 && after(1L) == "NEW1")
  }

  test("MergeTable: reader at every bucket-swap boundary sees old-or-new, never mixed") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtr").toString + "/t"
    val base = (1L to 400L).map(i => (i, s"old$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 8)
    // every key updated, so every bucket is affected and the merge walks
    // all 8 swap boundaries
    val delta = (1L to 400L).map(i => (i, s"new$i")).toDF("k", "v")
    var boundaries = 0
    MergeTable.merge(delta, path, Seq("k"), nBuckets = 8, { _ =>
      boundaries += 1
      // a fresh read between swaps: complete table, one row per key,
      // every value either the old or the new one for its key
      val seen = MergeTable.read(spark, path)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      assert(seen.length == 400, s"reader saw ${seen.length} rows mid-merge")
      assert(seen.map(_._1).distinct.length == 400, "duplicate keys mid-merge")
      seen.foreach { case (k, v) =>
        assert(v == s"old$k" || v == s"new$k", s"mixed row for key $k: $v")
      }
    })
    assert(boundaries == 8)
    val fin = MergeTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 400L).forall(k => fin(k) == s"new$k"))
  }

  test("MergeTable: merge killed between bucket swaps recovers and converges on retry") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtk").toString + "/t"
    val base = (1L to 400L).map(i => (i, s"old$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 8)
    val delta = (1L to 400L).map(i => (i, s"new$i")).toDF("k", "v")
    val want = Merge.mergeDeterministic(base, delta, Seq("k"))
    // kill the writer after the third bucket swap
    val boom = intercept[RuntimeException] {
      MergeTable.merge(delta, path, Seq("k"), nBuckets = 8, { b =>
        if (b == 2) throw new RuntimeException("killed mid-merge")
      })
    }
    assert(boom.getMessage == "killed mid-merge")
    // the half-merged table is complete and consistent: one row per key,
    // old-or-new per key (never missing, never mixed), staging untouched
    // by readers
    val half = MergeTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(half.length == 400)
    assert(half.map(_._1).distinct.length == 400)
    half.foreach { case (k, v) => assert(v == s"old$k" || v == s"new$k") }
    assert(half.exists { case (k, v) => v == s"new$k" }, "no bucket swapped")
    assert(half.exists { case (k, v) => v == s"old$k" }, "kill did not stop merge")
    // replaying the same delta (what a checkpointed stream does after a
    // crash) converges to the fully-merged state
    MergeTable.merge(delta, path, Seq("k"), nBuckets = 8)
    val got = MergeTable.read(spark, path)
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
    // and leaves no crash debris
    val names = new java.io.File(path).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".old")), names.mkString(","))
    assert(!new java.io.File(path + "__staging").exists())
  }

  test("randomized crash drill: merges killed at random swap points " +
      "always read consistently in the crash window and converge on " +
      "replay") {
    // Fuzz companion to the directed crash tests: a SEQUENCE of merges
    // with kills planted at random swap indices, each followed by a
    // crash-window read (every key exactly once, value entirely old or
    // entirely new — never torn, never missing) and a replay; the table
    // must track a plain driver-side delta-wins fold exactly at every
    // step. Deterministic seed; a divergence prints its (round, step).
    import graft.merge.MergeTable
    val rng = new scala.util.Random(2026)
    (1 to 2).foreach { round =>
      val nb = 2 + rng.nextInt(7)
      val path = Files.createTempDirectory("graft-mtfz").toString + "/t"
      var ref = (1L to 100L).map(i => i -> s"v0_$i").toMap
      MergeTable.write(ref.toSeq.toDF("k", "v"), path, Seq("k"), nb)
      (1 to 5).foreach { step =>
        val dRows = (1L to 120L).filter(_ => rng.nextInt(3) == 0)
          .map(k => k -> s"v${step}_$k")
        val delta = dRows.toDF("k", "v")
        if (dRows.nonEmpty) {
          if (rng.nextBoolean()) {
            // kill after a random swap (if the delta reaches that many
            // buckets — otherwise the merge just completes)
            val killAfter = 1 + rng.nextInt(nb)
            var c = 0
            try MergeTable.merge(delta, path, Seq("k"), nb, _ => {
              c += 1
              if (c == killAfter) throw new RuntimeException("fuzz kill")
            }) catch {
              case e: RuntimeException if e.getMessage == "fuzz kill" =>
            }
            // crash-window read: complete and consistent
            val seen = MergeTable.read(spark, path).collect()
              .map(r => r.getLong(0) -> r.getString(1))
            assert(seen.map(_._1).distinct.length == seen.length,
              s"round $round step $step: duplicate keys in crash window")
            val dMap = dRows.toMap
            val expectedKeys = ref.keySet ++ dMap.keySet
            seen.foreach { case (k, v) =>
              assert(ref.get(k).contains(v) || dMap.get(k).contains(v),
                s"round $round step $step: key $k torn value $v")
            }
            // a key can be missing from the crash window ONLY if it is
            // delta-new and its bucket had not swapped yet
            seen.map(_._1).toSet.foreach { k: Long =>
              assert(expectedKeys.contains(k)) }
            (ref.keySet -- seen.map(_._1)).foreach { k =>
              fail(s"round $round step $step: pre-existing key $k vanished")
            }
            // replay = checkpoint recovery
            MergeTable.merge(delta, path, Seq("k"), nb)
          } else MergeTable.merge(delta, path, Seq("k"), nb)
          ref = ref ++ dRows
        }
        val got = MergeTable.read(spark, path).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == ref, s"round $round step $step diverged from the " +
          "delta-wins fold")
        val names = new java.io.File(path).listFiles().map(_.getName)
        assert(!names.exists(_.endsWith(".old")),
          s"round $round step $step left crash debris")
      }
    }
  }

  test("MergeTable: _meta pins bucketing — mismatched nBuckets/keys fail loudly") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtm").toString + "/t"
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 8)
    assert(new java.io.File(path, "_meta").exists(), "_meta written at creation")
    val d = Seq((1L, "NEW1")).toDF("k", "v")
    // a different nBuckets would compute different bucket assignments and
    // silently land keys in wrong dirs — must be a loud error instead
    val e1 = intercept[IllegalArgumentException] {
      MergeTable.merge(d, path, Seq("k"), nBuckets = 16)
    }
    assert(e1.getMessage.contains("nBuckets"))
    val e2 = intercept[IllegalArgumentException] {
      MergeTable.merge(d, path, Seq("v"), nBuckets = 8)
    }
    assert(e2.getMessage.contains("keys"))
    // matching params still merge, and the table stays readable
    MergeTable.merge(d, path, Seq("k"), nBuckets = 8)
    val got = MergeTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 100 && got(1L) == "NEW1")
  }

  test("MergeTable: _meta survives comma-bearing key names and names corrupt files") {
    import graft.merge.MergeTable
    // a column literally named "a,b" must round-trip as ONE key — an
    // unescaped comma-join would re-read it as two keys and fail every
    // later identical-parameter merge
    val path = Files.createTempDirectory("graft-mtc").toString + "/t"
    val base = (1L to 20L).map(i => (i, s"v$i")).toDF("a,b", "v")
    MergeTable.write(base, path, Seq("a,b"), nBuckets = 4)
    MergeTable.merge(Seq((1L, "NEW")).toDF("a,b", "v"), path,
      Seq("a,b"), nBuckets = 4) // same params: must NOT trip checkMeta
    assert(MergeTable.read(spark, path).collect().length == 20)
    // a truncated _meta fails with the file's path in the message, not a
    // bare NoSuchElementException
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_meta"), "nBuck".getBytes("UTF-8"))
    val boom = intercept[IllegalStateException] {
      MergeTable.merge(Seq((2L, "X")).toDF("a,b", "v"), path,
        Seq("a,b"), nBuckets = 4)
    }
    assert(boom.getMessage.contains("_meta"), boom.getMessage)
  }

  test("MergeTable.readRetrying survives a swap completing under a deferred scan") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtrr").toString + "/t"
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 4)
    // strand one bucket in .old so the reader's listing chooses the backup
    val victim = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(MergeTable.BucketCol + "=")).head
    val bak = new java.io.File(victim.getParent, victim.getName + ".old")
    assert(victim.renameTo(bak))
    var attempts = 0
    val rows = MergeTable.readRetrying(spark, path) { df =>
      attempts += 1
      // the concurrent writer completes its swap AFTER read() listed but
      // BEFORE the scan executes: the chosen .old path vanishes
      if (attempts == 1) assert(bak.renameTo(victim))
      df.collect()
    }
    assert(attempts == 2, s"expected one retry, saw $attempts attempts")
    assert(rows.map(r => r.getLong(0) -> r.getString(1)).toMap ==
      (1L to 100L).map(i => i -> s"v$i").toMap)
  }

  test("crash debris is swept and invisible: a stranded .trash dir and a " +
      "torn _meta.tmp never reach readers and vanish on the next write") {
    // removeFromView renames a backup to `.trash-*` then deletes it; a
    // crash between the two leaves the hidden dir. writeMeta stages to
    // `_meta.tmp` then renames; a crash leaves the tmp. Neither may be
    // visible to reads (dot-prefix / name filters) and both must be
    // cleaned by the next writer call.
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mttrash").toString + "/t"
    val rows = (1L to 80L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(rows, path, Seq("k"), nBuckets = 4)
    // simulate the two crash leftovers
    val trash = new java.io.File(path, ".trash-__bucket=2.old-123456")
    assert(trash.mkdir())
    java.nio.file.Files.write(trash.toPath.resolve("part-stale.parquet"),
      "junk".getBytes)
    java.nio.file.Files.write(
      new java.io.File(path, "_meta.tmp").toPath, "nBuckets=".getBytes)
    // reads ignore both (table content exact, no failure)
    val got = MergeTable.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == rows.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq)
    // the next writer call sweeps the hidden trash dir
    MergeTable.merge(Seq((1L, "NEW")).toDF("k", "v"), path, Seq("k"), 4)
    assert(!trash.exists, ".trash leftover must be swept by recover()")
    // _meta.tmp is simply re-staged over by the next stamp; it is never
    // read (readMeta opens `_meta` only) — prove a full rewrite clears it
    MergeTable.write(rows, path, Seq("k"), nBuckets = 4)
    assert(!new java.io.File(path, "_meta.tmp").exists)
    assert(MergeTable.read(spark, path).count() == 80L)
  }

  test("MergeTable read prefers live over a stale .old; merge drops the backup") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mts").toString + "/t"
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 4)
    // crash window: after next->live but before the backup delete — both
    // the live dir and its .old backup exist; the swap DID complete, so
    // the reader must take live (reading both would duplicate keys) and
    // must not mutate; the writer's recover drops the stale backup
    val live = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(MergeTable.BucketCol + "=")).head
    val bak = new java.io.File(live.getParent, live.getName + ".old")
    org.apache.commons.io.FileUtils.copyDirectory(live, bak)
    val got = MergeTable.read(spark, path)
    assert(got.exceptAll(base).count() === 0L)
    assert(base.exceptAll(got).count() === 0L)
    assert(bak.exists(), "reader must not mutate the table")
    MergeTable.merge(Seq((1L, "NEW1")).toDF("k", "v"), path, Seq("k"), 4)
    assert(!bak.exists(), "merge must drop the completed swap's backup")
  }

  test("MergeTable.readBuckets prunes to the requested bucket dirs and " +
      "returns a typed empty frame when none exist") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtrb").toString + "/t"
    val base = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 8)
    val want = MergeTable.bucketIds(
      (1L to 10L).toDF("k"), Seq("k"), 8)
    val got = MergeTable.readBuckets(spark, path, want)
    // the pruned read sees every key that hashes into the chosen
    // buckets — in particular all of 1..10 — and nothing from others
    val keys = got.select("k").collect().map(_.getLong(0)).toSet
    val expected = base.filter(pmod(xxhash64(col("k")), lit(8L)).cast("int")
        .isin(want.toSeq.map(Integer.valueOf): _*))
      .select("k").collect().map(_.getLong(0)).toSet
    assert((1L to 10L).forall(keys.contains))
    assert(keys == expected)
    // scan stays pruned: fewer input files than the full table
    assert(got.inputFiles.length < MergeTable.read(spark, path)
      .inputFiles.length)
    // requesting only absent buckets yields schema, zero rows
    val empty = MergeTable.readBuckets(spark, path, Set(997))
    assert(empty.schema == got.schema && empty.count() == 0L)
    // the validated overload (r15 ADVICE): bucketing cross-checked
    // against _meta. The write path fails loudly on a mismatch; a
    // pruned READ with stale bucketing would not fail at all — it would
    // silently miss matching rows, which is strictly worse.
    assert(MergeTable.readBuckets(spark, path, want, Seq("k"), 8)
      .select("k").collect().map(_.getLong(0)).toSet == expected)
    val staleN = intercept[IllegalArgumentException] {
      MergeTable.readBuckets(spark, path, want, Seq("k"), 16)
    }
    assert(staleN.getMessage.contains("silently miss"))
    val staleK = intercept[IllegalArgumentException] {
      MergeTable.readBuckets(spark, path, want, Seq("other"), 8)
    }
    assert(staleK.getMessage.contains("silently miss"))
  }

  test("single-shuffle winner selection is row-identical to " +
      "mergeDeterministic on randomized conflicted inputs") {
    // r16: MergeTable's staged rewrite moved from mergeDeterministic's
    // keys-exchange-then-bucket-repartition to the single-shuffle
    // rewritePlan form (window partitioned by (__bucket, keys) riding
    // the bucket exchange). The two must pick the SAME winner for every
    // key — delta-wins, then the full-row lexicographic tie-break —
    // under duplicate keys within and across sources, at any bucket
    // count. Deterministic-seed randomized pin, 5 rounds.
    import graft.merge.MergeTable
    val rng = new scala.util.Random(1617)
    (1 to 5).foreach { round =>
      val nKeys = 20 + rng.nextInt(60)
      val nb = 1 + rng.nextInt(8)
      def mk(src: String) = (1 to 2).flatMap { _ =>
        (1L to nKeys.toLong).filter(_ => rng.nextBoolean()).map { k =>
          (k, s"$src${rng.nextInt(3)}", rng.nextInt(100))
        }
      }
      val season = mk("s").toDF("k", "tag", "n")
      val delta = mk("d").toDF("k", "tag", "n")
      val expected = Merge.mergeDeterministic(season, delta, Seq("k"))
        .select("k", "tag", "n").orderBy("k").collect().toSeq
      val bCol = MergeTable.bucketColumn(Seq("k"), nb)
      val got = MergeTable.rewritePlan(
          season.withColumn(MergeTable.BucketCol, bCol),
          delta.withColumn(MergeTable.BucketCol, bCol), Seq("k"))
        .select("k", "tag", "n").orderBy("k").collect().toSeq
      assert(got == expected,
        s"round $round (nb=$nb): single-shuffle winners diverged from " +
          "mergeDeterministic")
    }
  }

  test("MergeTable.merge knownAffected contract: a caller-supplied " +
      "bucket set produces the identical table and return value as the " +
      "self-computed one") {
    // r16: the route derives affected-bucket sets with observe() on a
    // staging write and passes them through `knownAffected` to skip the
    // merge's own distinct-buckets job. This pins the contract both
    // ways: same final table, same returned set — and the sanctioned
    // derivation (bucketColumn over the same delta) is exactly what the
    // self-computed path does.
    import graft.merge.MergeTable
    val pathA = Files.createTempDirectory("graft-mtka").toString + "/t"
    val pathB = Files.createTempDirectory("graft-mtkb").toString + "/t"
    val seed = (1L to 120L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(seed, pathA, Seq("k"), 8)
    MergeTable.write(seed, pathB, Seq("k"), 8)
    val delta = (100L to 140L).map(i => (i, s"NEW$i")).toDF("k", "v")
    val known = delta
      .select(MergeTable.bucketColumn(Seq("k"), 8).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val retSelf = MergeTable.merge(delta, pathA, Seq("k"), 8)
    val retKnown = MergeTable.merge(delta, pathB, Seq("k"), 8, _ => (),
      knownAffected = Some(known))
    assert(retSelf == retKnown, "returned bucket sets must match")
    val a = MergeTable.read(spark, pathA).orderBy("k").collect().toSeq
    val b = MergeTable.read(spark, pathB).orderBy("k").collect().toSeq
    assert(a == b, "knownAffected merge must produce the identical table")
    // empty known set on an existing table: a zero-job no-op
    assert(MergeTable.merge(spark.emptyDataset[(Long, String)].toDF("k", "v"),
      pathB, Seq("k"), 8, _ => (), knownAffected = Some(Nil)) == Nil)
    assert(MergeTable.read(spark, pathB).orderBy("k").collect().toSeq == b)
  }

  test("MergeTable.deleteWhere retires matching rows bucket-pruned, " +
      "keeps NULL-predicate rows, and drops an all-deleted table") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtdw").toString + "/t"
    // tag: "old" (delete), "new" (keep), null (predicate NULL → keep)
    val rows = (1L to 300L).map { i =>
      (i, if (i % 3 == 0) null else if (i % 3 == 1) "old" else "new")
    }
    MergeTable.write(rows.toDF("k", "tag"), path, Seq("k"), nBuckets = 8)
    val before = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(MergeTable.BucketCol + "="))
      .map(f => f.getName -> f.lastModified).toMap
    val n = MergeTable.deleteWhere(spark, path, col("tag") === "old")
    assert(n == rows.count(_._2 == "old"))
    val left = MergeTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(left.length == 200, "null-tag rows must survive a NULL predicate")
    assert(left.forall { case (k, t) => t == "new" || t == null })
    assert(left.map(_._1).toSet == (1L to 300L).filter(_ % 3 != 1).toSet)
    // idempotent + no debris
    assert(MergeTable.deleteWhere(spark, path, col("tag") === "old") == 0L)
    val names = new java.io.File(path).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".old")))
    assert(!new java.io.File(path + "__staging").exists())
    // deleting everything removes the table — absent, not zero-bucket
    assert(MergeTable.deleteWhere(spark, path,
      col("tag").isNull || col("tag") === "new") == 200L)
    assert(!new java.io.File(path).exists,
      "an all-deleted table must read as absent")
    // and deleting from an absent table is a no-op
    assert(MergeTable.deleteWhere(spark, path, lit(true)) == 0L)
  }

  test("MergeTable.deleteWhere rewrites ONLY the buckets holding " +
      "matching rows — untouched dirs keep their exact files") {
    // The pruning claim made for retention at 100 TB, proven on disk the
    // same way the merge test proves its write-side pruning: at a real
    // corruption rate the horizon-crossing tombstones live in a few
    // buckets, and a delete that rewrote every bucket would be O(table)
    // maintenance while returning the same row counts.
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtdwp").toString + "/t"
    // keys 1..1000; delete targets three specific keys → ≤ 3 buckets
    val base = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(base, path, Seq("k"), nBuckets = 16)
    def listing: Map[String, Set[(String, Long)]] =
      new java.io.File(path).listFiles()
        .filter(_.getName.startsWith(MergeTable.BucketCol + "="))
        .map(d => d.getName ->
          d.listFiles().map(f => (f.getName, f.lastModified())).toSet)
        .toMap
    val before = listing
    val victims = Seq(5L, 6L, 777L)
    val affectedDirs = victims.toDF("k")
      .select(pmod(xxhash64(col("k")), lit(16L)).cast("int").as("b"))
      .distinct().collect().map(r => s"${MergeTable.BucketCol}=${r.getInt(0)}")
      .toSet
    assert(MergeTable.deleteWhere(spark, path,
      col("k").isin(victims.map(java.lang.Long.valueOf): _*)) == 3L)
    val after = listing
    before.foreach { case (d, files) =>
      if (!affectedDirs(d)) assert(after(d) === files, s"dir $d rewritten")
      else assert(after(d) !== files, s"dir $d NOT rewritten")
    }
    assert(MergeTable.read(spark, path).count() == 997L)
  }

  test("MergeTable.deleteWhere equals a reference full rewrite across " +
      "randomized tables and predicate shapes") {
    // Deterministic-seed randomized comparison: whatever the predicate
    // matches (none, some keys, a value class, NULL-valued rows, or
    // everything), the surviving rows must equal filter(NOT coalesce(p,
    // false)) over the original data — the three-valued-logic reference.
    import graft.merge.MergeTable
    val rng = new scala.util.Random(421)
    val preds: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("none", col("k") < 0),
      ("one-key", col("k") === 7L),
      ("value-class", col("tag") === "b"),
      ("null-guard", col("tag").isNull || col("k") % 5 === 0),
      ("all", lit(true)))
    preds.foreach { case (label, p) =>
      val path = Files.createTempDirectory(s"graft-mtdwr").toString + "/t"
      val n = 50 + rng.nextInt(200)
      val rows = (1L to n.toLong).map { i =>
        (i, rng.nextInt(4) match {
          case 0 => "a"
          case 1 => "b"
          case 2 => null
          case _ => s"x$i"
        })
      }
      val df = rows.toDF("k", "tag")
      MergeTable.write(df, path, Seq("k"), nBuckets = 1 + rng.nextInt(12))
      val want = df.filter(!coalesce(p, lit(false)))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1) // keys unique; tag can be null (unsortable)
      val wantDeleted = n - want.length
      assert(MergeTable.deleteWhere(spark, path, p) == wantDeleted.toLong,
        s"[$label] deleted count")
      val survived =
        if (new java.io.File(path).exists)
          MergeTable.read(spark, path).collect()
            .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        else Array.empty[(Long, String)]
      assert(survived.toSeq == want.toSeq, s"[$label] surviving rows")
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(path).getParentFile))
    }
  }

  test("concurrent-reader soak: readRetrying observes only complete keyed " +
      "snapshots while a multi-merge writer swaps, stalls and dies") {
    // r16 verdict item 2: readRetrying and the double-listing stability
    // loop were spec-pinned in isolation; this drill races two reader
    // threads against a LIVE writer doing 25 randomized merges with
    // widened swap windows and injected mid-merge kills. Per reader
    // thread, every successful read must be a complete keyed snapshot:
    //  - no duplicate keys (a torn listing mixing a bucket's live and
    //    .old copies would duplicate every key in it);
    //  - the key set is exactly the seeded set (upsert-only drill — a
    //    missing bucket would drop its keys);
    //  - per-key versions never regress across one thread's consecutive
    //    reads (the .old fallback always holds the immediately-previous
    //    version, so intra-thread monotonicity is the contract;
    //    cross-bucket mixes of versions are documented and allowed).
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtsoak").toString + "/t"
    val nKeys = 240L
    val rng = new scala.util.Random(1717)
    val seed = (1L to nKeys).map(i => (i, 0L)).toDF("k", "seq")
    MergeTable.write(seed, path, Seq("k"), nBuckets = 16)
    @volatile var writerDone = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readsOk = new java.util.concurrent.atomic.AtomicInteger(0)
    def readerLoop(tag: Int): Unit = {
      var lastSeen = Map.empty[Long, Long]
      while (!writerDone && failures.isEmpty) {
        try {
          val rows = MergeTable.readRetrying(spark, path, attempts = 8) {
            df => df.collect().map(r => (r.getLong(0), r.getLong(1)))
          }
          if (rows.map(_._1).distinct.length != rows.length)
            failures.add(s"reader $tag: duplicate keys in one snapshot")
          val m = rows.toMap
          if (m.keySet != (1L to nKeys).toSet)
            failures.add(s"reader $tag: incomplete key set " +
              s"(${m.size} of $nKeys keys — torn bucket?)")
          lastSeen.foreach { case (k, s) =>
            if (m.getOrElse(k, Long.MinValue) < s)
              failures.add(s"reader $tag: key $k regressed " +
                s"${m.get(k)} < $s")
          }
          lastSeen = m
          readsOk.incrementAndGet()
        } catch { case t: Throwable =>
          failures.add(s"reader $tag died: ${t.getClass.getSimpleName}: " +
            String.valueOf(t.getMessage).take(200))
        }
      }
    }
    val readers = (1 to 2).map(i => new Thread(() => readerLoop(i)))
    readers.foreach(_.start())
    val expected = scala.collection.mutable.Map((1L to nKeys).map(_ -> 0L): _*)
    (1 to 25).foreach { i =>
      val ks = (1L to nKeys).filter(_ => rng.nextInt(3) == 0)
      if (ks.nonEmpty) {
        val delta = ks.map(k => (k, i.toLong)).toDF("k", "seq")
        val killAfter =
          if (rng.nextInt(3) == 0) Some(1 + rng.nextInt(4)) else None
        var swapped = 0
        try MergeTable.merge(delta, path, Seq("k"), 16, { _ =>
          Thread.sleep(1 + rng.nextInt(3)) // widen the swap window
          swapped += 1
          if (killAfter.contains(swapped))
            throw new RuntimeException("soak kill")
        })
        catch { case e: RuntimeException if e.getMessage == "soak kill" =>
          // writer died between bucket swaps: the table is complete and
          // consistent (contract) — re-merging the same delta converges
          MergeTable.merge(delta, path, Seq("k"), 16)
        }
        ks.foreach(k => expected(k) = i.toLong)
      }
    }
    writerDone = true
    readers.foreach(_.join(60000))
    assert(readers.forall(!_.isAlive), "reader threads must terminate")
    assert(failures.isEmpty,
      s"${failures.size} violations, first: ${failures.peek()}")
    assert(readsOk.get >= 10,
      s"soak must complete real concurrent reads (got ${readsOk.get})")
    val fin = MergeTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin == expected.toMap, "final table must equal the merge fold")
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(path).getParentFile))
  }

  test("concurrent-reader soak vs deleteWhere: generation churn with " +
      "retirements never tears a snapshot") {
    // Companion to the merge soak: deleteWhere's swap loop has its own
    // two-rename dance PLUS the outright bucket-drop path (a bucket
    // whose rows all match is renamed to .old and removed, with no
    // staged replacement) — neither was reader-soaked. Fixture:
    // immortal "keep" rows pin every bucket (so a bucket never
    // legitimately vanishes) while generations of churn rows are merged
    // in and deleted two steps later. Per reader thread:
    //  - no duplicate keys;
    //  - every keep row present in every successful read (a missing
    //    one = torn bucket);
    //  - a churn key observed ABSENT never reappears (generations are
    //    deleted once, never re-added; the .old fallback only ever
    //    holds the immediately-previous state, so per-thread
    //    present -> absent is one-way).
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtdwsoak").toString + "/t"
    val keepRows = (1L to 150L).map(i => (i, "keep"))
    MergeTable.write(keepRows.toDF("k", "tag"), path, Seq("k"), nBuckets = 8)
    // fixture sanity: keep rows must pin all 8 buckets
    assert(keepRows.map(_._1).toDF("k")
      .select(MergeTable.bucketColumn(Seq("k"), 8)).distinct().count() == 8)
    @volatile var writerDone = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readsOk = new java.util.concurrent.atomic.AtomicInteger(0)
    def readerLoop(tag: Int): Unit = {
      var seenPresent = Set.empty[Long] // churn keys ever observed present
      var gone = Set.empty[Long] // churn keys observed absent AFTER present
      while (!writerDone && failures.isEmpty) {
        try {
          val rows = MergeTable.readRetrying(spark, path, attempts = 8) {
            df => df.collect().map(r => (r.getLong(0), r.getString(1)))
          }
          if (rows.map(_._1).distinct.length != rows.length)
            failures.add(s"reader $tag: duplicate keys in one snapshot")
          val ks = rows.map(_._1).toSet
          val missingKeep = keepRows.map(_._1).filterNot(ks)
          if (missingKeep.nonEmpty)
            failures.add(s"reader $tag: keep rows missing " +
              s"${missingKeep.take(5)} — torn bucket")
          val resurrected = gone.intersect(ks)
          if (resurrected.nonEmpty)
            failures.add(s"reader $tag: deleted keys reappeared " +
              resurrected.take(5).toString)
          // a churn key previously seen present and now absent was
          // deleted — it must stay absent (one-way transition); a key
          // never yet seen present tells us nothing
          gone ++= (seenPresent -- ks)
          seenPresent ++= ks.filter(_ >= 1000L)
          readsOk.incrementAndGet()
        } catch { case t: Throwable =>
          failures.add(s"reader $tag died: ${t.getClass.getSimpleName}: " +
            String.valueOf(t.getMessage).take(200))
        }
      }
    }
    val readers = (1 to 2).map(i => new Thread(() => readerLoop(i)))
    readers.foreach(_.start())
    (1 to 16).foreach { i =>
      val gen = (0 until 800).map(j => (1000L * i + j, s"g$i")).toDF("k", "tag")
      MergeTable.merge(gen, path, Seq("k"), 8)
      if (i >= 3) {
        val n = MergeTable.deleteWhere(spark, path, col("tag") === s"g${i - 2}")
        assert(n == 800L, s"generation ${i - 2} must retire whole, got $n")
      }
    }
    writerDone = true
    readers.foreach(_.join(60000))
    assert(readers.forall(!_.isAlive), "reader threads must terminate")
    assert(failures.isEmpty,
      s"${failures.size} violations, first: ${failures.peek()}")
    assert(readsOk.get >= 10,
      s"soak must complete real concurrent reads (got ${readsOk.get})")
    val fin = MergeTable.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = (keepRows ++ (0 until 800).flatMap(j =>
      Seq((15000L + j, "g15"), (16000L + j, "g16")))).sortBy(_._1)
    assert(fin.toSeq == want, "final table must be keep + last two generations")
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(path).getParentFile))
  }

  test("MergeTable.merge with a WRONG knownAffected subset fails loudly " +
      "before any swap — the live table is untouched") {
    // r16 ADVICE (medium): a delta row hashing to a bucket outside the
    // caller's knownAffected set is staged but never swapped in, then
    // discarded with staging — silent data loss unless guarded. The
    // guard must fire BEFORE the first rename, so the table still holds
    // exactly its pre-merge contents afterwards.
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtkg").toString + "/t"
    val seed = (1L to 120L).map(i => (i, s"v$i")).toDF("k", "v")
    MergeTable.write(seed, path, Seq("k"), nBuckets = 8)
    val before = MergeTable.read(spark, path).orderBy("k").collect().toSeq
    val delta = (100L to 160L).map(i => (i, s"NEW$i")).toDF("k", "v")
    val trueAffected = delta
      .select(MergeTable.bucketColumn(Seq("k"), 8).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    assert(trueAffected.size >= 2, "fixture must touch several buckets")
    val wrongSubset = trueAffected.dropRight(1) // one bucket missing
    val e = intercept[IllegalArgumentException] {
      MergeTable.merge(delta, path, Seq("k"), 8, _ => (),
        knownAffected = Some(wrongSubset))
    }
    assert(e.getMessage.contains("absent from the affected set"),
      s"guard must name the failure class, got: ${e.getMessage}")
    assert(MergeTable.read(spark, path).orderBy("k").collect().toSeq
      == before, "failed merge must leave the table byte-for-row intact")
    assert(!new java.io.File(path).listFiles()
      .exists(_.getName.endsWith(".old")), "no swap may have started")
    // the CORRECT set (or any superset) still merges fine afterwards —
    // the aborted attempt left only a staging dir, which merge clears
    assert(MergeTable.merge(delta, path, Seq("k"), 8, _ => (),
      knownAffected = Some(trueAffected)) == trueAffected)
    assert(MergeTable.read(spark, path)
      .filter(col("v").startsWith("NEW")).count() == 61L)
  }

  test("MergeTable.deleteWhere(candidateBuckets) prunes the find phase: " +
      "a covering hint equals the unpruned delete, an under-wide hint " +
      "really skips unlisted buckets") {
    import graft.merge.MergeTable
    val dir = Files.createTempDirectory("graft-mtdwc").toString
    val rows = (1L to 400L).map { i =>
      (i, if (i % 4 == 0) "old" else "new")
    }
    def fresh(name: String): String = {
      val p = s"$dir/$name"
      MergeTable.write(rows.toDF("k", "tag"), p, Seq("k"), nBuckets = 16)
      p
    }
    val pred = col("tag") === "old"
    val matchBuckets = rows.filter(_._2 == "old").map(_._1)
      .toDF("k").select(MergeTable.bucketColumn(Seq("k"), 16).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    // control: unpruned
    val ctl = fresh("ctl")
    val wantDeleted = MergeTable.deleteWhere(spark, ctl, pred)
    val wantLeft = MergeTable.read(spark, ctl).orderBy("k").collect().toSeq
    // exact hint and a superset hint both equal the control
    Seq("exact" -> matchBuckets,
        "superset" -> (matchBuckets ++ Set(0, 1, 2, 3))).foreach {
      case (label, hint) =>
        val p = fresh(label)
        assert(MergeTable.deleteWhere(spark, p, pred, Some(hint))
          == wantDeleted, s"[$label] deleted count")
        assert(MergeTable.read(spark, p).orderBy("k").collect().toSeq
          == wantLeft, s"[$label] surviving rows")
    }
    // an EMPTY hint is a zero-cost no-op
    val e = fresh("empty")
    assert(MergeTable.deleteWhere(spark, e, pred, Some(Set.empty)) == 0L)
    assert(MergeTable.read(spark, e).count() == 400L)
    // an under-wide hint must actually SKIP the unlisted buckets (the
    // documented contract — this is the proof the find is pruned, not
    // just filtered after a full read): rows in the omitted bucket
    // survive, everything in the listed buckets is deleted
    val omitted = matchBuckets.head
    val u = fresh("under")
    val partial =
      MergeTable.deleteWhere(spark, u, pred, Some(matchBuckets - omitted))
    assert(partial < wantDeleted, "the omitted bucket's rows must be kept")
    val leftTags = MergeTable.read(spark, u)
      .withColumn("b", MergeTable.bucketColumn(Seq("k"), 16))
      .collect().map(r => (r.getAs[Int]("b"), r.getAs[String]("tag")))
    assert(leftTags.count { case (b, t) => t == "old" && b == omitted } ==
      wantDeleted - partial, "every surviving 'old' row sits in the omitted bucket")
    assert(!leftTags.exists { case (b, t) => t == "old" && b != omitted },
      "listed buckets must be fully retired")
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir)))
  }

  test("MergeTable.deleteWhere recovers a bucket stranded in .old by a " +
      "crashed writer, and its pruned read takes the .old fallback") {
    import graft.merge.MergeTable
    val path = Files.createTempDirectory("graft-mtdwc").toString + "/t"
    val rows = (1L to 120L).map(i => (i, if (i % 2 == 0) "del" else "keep"))
    MergeTable.write(rows.toDF("k", "tag"), path, Seq("k"), nBuckets = 4)
    // simulate the crash window a writer can leave: one bucket's swap
    // got as far as live -> .old (live dir missing, backup present)
    val live = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(MergeTable.BucketCol + "=")).head
    val bak = new java.io.File(live.getParent, live.getName + ".old")
    assert(live.renameTo(bak))
    val strandedBucket = bak.getName.stripPrefix(MergeTable.BucketCol + "=")
      .stripSuffix(".old").toInt
    // a PRUNED read targeting the stranded bucket must fall back to .old
    // without mutating (same contract as the full read)
    val pruned = MergeTable.readBuckets(spark, path, Set(strandedBucket))
    assert(pruned.count() > 0, "pruned read must see the .old fallback")
    assert(bak.exists() && !live.exists(), "reader must not repair")
    // the next WRITER (deleteWhere) recovers first, then deletes — the
    // stranded bucket's rows participate like every other bucket's
    assert(MergeTable.deleteWhere(spark, path, col("tag") === "del") == 60L)
    val left = MergeTable.read(spark, path).collect()
      .map(r => r.getLong(0)).sorted
    assert(left.toSeq == (1L to 120L).filter(_ % 2 == 1),
      "recovery + delete must converge to exactly the kept rows")
    val names = new java.io.File(path).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".old")), "no crash debris")
  }

  test("MergeTable.suggestBuckets pins the measured 100x matrix " +
      "endpoints (16 / 256 / 1024 / 4096)") {
    // r17 BENCH_100X matrix as code (r17 verdict item 3): nBuckets =
    // tableBytes / 128 MiB, next power of two, clamped [16, 4096].
    import graft.merge.MergeTable.suggestBuckets
    val GiB = 1024L * 1024 * 1024
    // floor: MB-GB meta/quarantine tables get the confirmed 16 —
    // oversizing a small table drowns it in per-dir constants
    assert(suggestBuckets(0L) == 16)
    assert(suggestBuckets(50L * 1024 * 1024) == 16)
    assert(suggestBuckets(2 * GiB) == 16) // exactly 16 × 128 MiB
    // mid octaves: one touched dir = one rewrite task, keep ~128 MiB+
    assert(suggestBuckets(3 * GiB) == 32) // ceil, then next power of two
    assert(suggestBuckets(32 * GiB) == 256)
    assert(suggestBuckets(128 * GiB) == 1024)
    // cap: touched dirs/merge stay ≲ 1k, constants stay noise
    assert(suggestBuckets(512 * GiB) == 4096)
    assert(suggestBuckets(100L * 1000 * 1000 * 1000 * 1000) == 4096) // 100 TB
    // shape invariants over 60 octaves: monotone, power of two, clamped
    val sweep = (0 to 60).map(i => suggestBuckets(1L << i))
    assert(sweep == sweep.sorted, "rule must be monotone in table size")
    sweep.foreach(n =>
      assert(n >= 16 && n <= 4096 && Integer.bitCount(n) == 1,
        s"every suggestion a clamped power of two, got $n"))
    intercept[IllegalArgumentException](suggestBuckets(-1L))
  }
}
