// Dump `.explain("formatted")` for declared queries to <out>/<name>_<tag>.txt.
// Run: /opt/spark/bin/spark-shell --jars <repo jar> \
//        --conf spark.sql.shuffle.partitions=32 \
//        --conf spark.sql.session.timeZone=UTC \
//        --conf spark.sql.files.maxPartitionBytes=16m \
//        --conf spark.ui.enabled=false \
//        -I tools/dump_query_plans.scala
// Env: PLAN_OUT (out dir), PLAN_TAG (before|after), PLAN_SF (testdata dir),
//      PLAN_QUERIES (comma-separated names; empty/no var = all declared).
// Used for the per-round plans/rNN before/after evidence: `before` runs
// from a worktree at the round-start commit, `after` at HEAD, both with
// the bench session conf so the diffs are attributable to code alone.
{
  val outDir = sys.env.getOrElse("PLAN_OUT", "plans/r19")
  val tag = sys.env.getOrElse("PLAN_TAG", "after")
  val sf = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.001")
  val qs = sys.env.get("PLAN_QUERIES").filter(_.nonEmpty)
    .map(_.split(",").toSeq)
    .getOrElse(graft.SparkEntry.queries.keys.toSeq).sorted
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
  qs.foreach { n =>
    try {
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pw = new java.io.PrintWriter(s"$outDir/${n}_$tag.txt")
      pw.println(s"== $n @ $sf ($tag) ==")
      pw.println(plan)
      pw.close()
      println(s"PLANDUMP ok $n")
    } catch { case e: Throwable =>
      println(s"PLANDUMP FAIL $n: ${e.getMessage}")
    }
  }
  System.out.flush()
}
