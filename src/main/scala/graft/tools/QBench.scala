package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query bench harness for iterating on one query's plan without
  * paying the full 76-query sweep: `runMain graft.tools.QBench q21 q26`
  * times each named query with the same session conf, warm-run, and
  * min-of-2 discipline as [[graft.Bench]], printing per-iteration times
  * so a warm-vs-steady gap (cache build cost) is visible.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    val names = args.toSeq.flatMap { a =>
      val hits = all.keys.filter(_.startsWith(a)).toSeq.sorted
      if (hits.isEmpty) { println(s"no query matches '$a'"); Nil } else hits
    }
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        all(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s warm=${times.head}%.3f t1=${times(1)}%.3f " +
        f"t2=${times(2)}%.3f min=${times.tail.min}%.3f")
    }
    spark.stop()
  }
}
