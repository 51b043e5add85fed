package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Local-harness scan parallelism: testdata tables are single
      // parquet files well under the default 128m split size, which
      // serializes the scan on one core. 16m splits let local[32] use
      // its cores; a real cluster keeps the 128m default.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        // Error marker, NOT a near-zero time: a broken query must never
        // read as a fast one (it would *improve* the total).
        errors(name) = (e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage)).replace('\n', ' ').take(200)
        -1.0
      }
    }
    // Load guard (round-8 verdict item 7): a 1-min loadavg far above this
    // run's own footprint means external contention and suspect numbers
    // (r3/r7 produced contaminated artifacts). Measured BEFORE the run so
    // the run's own load doesn't trip it; annotated, not refused — the
    // round must always produce a BENCH artifact.
    def load1(): Double = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim.split(" ")(0).toDouble)
      .getOrElse(-1.0)
    val loadBefore = load1()
    val loadContaminated = loadBefore > 8.0
    // Steady-state timing, per query: one untimed warm run (JVM/JIT,
    // codegen compilation, parquet footer caches, registry cache builds)
    // immediately followed by two timed iterations, min reported. The
    // warm and timed runs are ADJACENT on purpose: a warm-sweep-then-
    // timed-sweep order times the head queries under the accumulated
    // cache/GC pressure of the whole tail sweep — measured 2-5x on
    // q01-q07 vs their isolated steady state (r8 bench head audit).
    val results = names.map { n =>
      runOnce(n)
      errors.remove(n)
      val a = runOnce(n)
      val b = if (a < 0) a else { val x = runOnce(n); if (x < 0) x else math.min(a, x) }
      n -> b
    }
    // Contention self-identification: full loadavg at measurement END
    // (comparable with earlier rounds' artifacts).
    val loadavg = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim.split(" ").take(3)
        .mkString(" ")).getOrElse("unknown")
    def js(s: String): String = JsonEscape(s)
    val qs = results.map { case (k, v) => js(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => js(k) + ":" + js(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""n_errors":${errors.size},"errors":$errJson,""" +
      s""""loadavg":${js(loadavg)},"load_before":$loadBefore,""" +
      s""""load_contaminated":$loadContaminated,"iterations":2,"sf":"$sfDir"}"""
    println(line)
    // Durability line: the full per-query JSON above can exceed a bounded
    // log tail (BENCH_r04 lost its total that way). Repeat the headline
    // numbers compactly LAST so any tail window catches them.
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec",""" +
      s""""n_queries":${names.size},"n_errors":${errors.size},""" +
      s""""loadavg":${js(loadavg)},"load_contaminated":$loadContaminated,""" +
      s""""sf":"$sfDir"}""")
    // Machine-readable artifact: stdout tails get truncated and parsers
    // drift (BENCH_r05 `parsed: null`); the full JSON line also lands in
    // a file so the round's numbers never depend on tail regexes.
    scala.util.Try(java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SUMMARY.json"),
      (line + "\n").getBytes("UTF-8")))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
