import java.io.PrintWriter
val sf = "/root/testdata/sf0.001"
val picks = Seq(
  ("q03_revenue_by_nation", "Star join: fact scanned once, every dimension broadcast; aggregate has a map-side partial."),
  ("q12_minhash_pairs", "LSH band join: persisted narrow band keys, equi-join on (band_idx, band_hash) - no O(N^2) pairs. Since round 9 the VERIFIED pair set is also registry-cached per input dir (q12pairs:<dir>, fingerprinted on documents.parquet), so this cold-build plan runs once per corpus; q12's warm plan - and the whole upstream of q38's edit-distance check, q58's clustering, and q77's family gate (whose fast side reuses q48pairs:<dir> the same way) - is a single InMemoryTableScan over the cached pairs."),
  ("q26_asof_join", "As-of via union + one per-key sort + LOCF window: no multiplicative join intermediate."),
  ("q42_interval_join", "Banded interval join: tiny error side broadcast into a (user, bucket) equi-join, exact range filter after."),
  ("q44_euclidean_topk", "Probe search: 10-row probe set broadcast (BNL is intentional), collection scanned once, per-probe top-k window."),
  ("q46_curation_pipeline", "Composed curation: one scan -> narrow quality/fingerprint/sample stages -> single dedup shuffle -> final aggregate."),
  ("q56_quality_deciles_scale", "Scale-safe deciles: per-value counts + two-level prefix sums, windows all PARTITIONED (no global Window.orderBy anywhere)."),
  ("q58_dup_clusters", "Pairs -> connected components -> membership: band equi-join edges feed the labeling (small graphs solve on the driver - the plan shows a LocalRelation join; at corpus scale the O(log n) star loop takes over), then one cluster-partitioned window."),
  ("q69_source_cap", "Per-source cap via the bounded TopK Aggregator: map-side partial ObjectHashAggregate with k-row buffers - no per-source global window, skew-safe."),
  ("q67_regional_supply", "TPC-H Q5 shape: at this tiny SF Catalyst elects broadcast for every dimension AND the filtered fact sides (all under the 10m threshold); at scale the lineitem/orders/customer joins become the only wide shuffles. Date + region filters are pushed to the scans."),
  ("q31_tfidf_keywords", "TF-IDF on two reused exchanges: one explicit hash exchange on tok feeds BOTH the (tok, doc) term-frequency aggregate (no second exchange - partitioning already clusters the keys) and the token-partitioned df count window; then the per-doc top-3 window, with WindowGroupLimit shipping at most 3 rows per doc per partition into the doc exchange."),
  ("q81_shuffle_shard", "Shuffle-and-shard: seeded md5 rank, shard from the first hex digit, position via a shard-PARTITIONED row_number window - one hash exchange on shard, no global sort or single-reducer window in the computation (the trailing Sort is the presentation ORDER BY every oracle-compared query carries)."),
  ("q72_zorder_scan", "2-D box over the Z-ordered lineitem copy: both box predicates are pushed to the parquet scan (PushedFilters on l_shipdate AND l_partkey), where the Morton-clustered file layout turns them into file/row-group skips instead of a full scan."),
  ("q32_sketch_profile", "Sketch profile (r13 shape): each exact countDistinct runs as its OWN single-distinct aggregate - a plain two-phase dedup (partial group by (flag, col), then count) over a scan pruned to that one column, with NO Expand anywhere (two in one Aggregate would trigger the multi-distinct rewrite: an Expand x3 into a ~|rows|-group partial whose spill is nondeterministic at scale - 20-108 s spread at 100x on the fused form vs 24.9-43.2 s best-of-3 split). The typed-imperative sketches (HLL, percentile_approx) stay in their own aggregate (sketch buffers per partial group spill through the ObjectHashAggregate fallback when fused: 57 s fused vs ~2 s split at sf0.1). Exact percentile twins come from the per-value-count + two-level prefix-sum helper (cumulative within 1024-wide blocks, then ONE linear window over the per-block totals partitioned by (group, kind) - r12 replaced the earlier O(blocks^2) theta-join); every per-group result is a 3-row broadcast join back onto the main aggregate."),
  ("q88_bloom_decontaminate", "Bloom-prescreened decontamination: the benchmark shingle set aggregates into a fixed-size bloom filter (Spark's own BloomFilterAggregate, distributed build), the corpus stream is filtered MAP-SIDE by might_contain BEFORE the exact join - the filter sits inside the scan-side WholeStageCodegen span, so only true matches plus the ~1% FP residue ever shuffle; the exact shingle join then removes FPs, making the result identical to q41's exact-broadcast plan at any scale the broadcast can no longer reach."),
  ("q36_winnowing_fp", "Fused winnowing (r17): ONE codegen expression (winnow_fingerprints) does rolling hash + monotonic-deque window-min + distinct per document inside the scan-side WholeStageCodegen span - no shuffle before the presentation sort, no rebalance (the repartition's round-robin shuffle of text cost 3.6x the fused compute's cpu), no boxed per-window slices. 30.6 -> ~1.4 cpu-seconds at sf0.1."),
  ("q07_play_parse", "Fused play parse (r17): the whole ten-field parse is ONE play_parsed struct evaluation per row - the composed per-column form re-split the play per derived column because the F9 score branches sit inside CaseWhen arms codegen's subexpression elimination does not share. The struct subtree is unconditional, so after project collapse the nine GetStructField consumers share a single evaluation (56 -> 14 cpu-seconds at 10x). Parse runs ABOVE the sort so the range-exchange sampling pass pays only the cheap synthesis projection."),
  ("q68_hourly_resample", "Forward fill without the grid join (r18): LOCF computes on PER-HOUR rows - two window frames (running last-non-null + lead) sharing one user-partitioned exchange - then each observation explodes MAP-SIDE across the hours it covers ([hr, next_hr)), which is row-identical to generating the span grid and left-joining it. The grid (span-hours x users - 11x the per-hour rows at 10x) crosses the wire exactly once, in the presentation range sort; the removed grid-join and grid-window exchanges were ~9.4 s of the query's 16.6 s at 10x (now 4.5 s). Plan-gated: no Join, one WindowExec, explode above the window."))
val out = new PrintWriter("/tmp/PLANS.md")
out.println("# PLANS - formatted physical plans for flagship queries")
out.println()
out.println("Generated with `.explain(\"formatted\")` at sf0.001. What to look for in")
out.println("each: scans prune columns (`ReadSchema`) and push filters")
out.println("(`PushedFilters`), small sides broadcast, and `WholeStageCodegen` spans")
out.println("cover the narrow pipelines. Regenerate: tools/gen_plans.scala.")
def emit(name: String, why: String, df: org.apache.spark.sql.DataFrame): Unit = {
  val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  out.println()
  out.println(s"## $name")
  out.println()
  out.println(why)
  out.println()
  out.println("```")
  // keep the operator tree; drop the verbose per-node detail section
  out.println(plan.split("\n\n")(0))
  out.println("```")
}
picks.foreach { case (name, why) =>
  emit(name, why, graft.SparkEntry.queries(name)(spark, sf))
}
// q91/q92/q93's declared frames are collected state snapshots
// (LocalTableScan - vacuous to render), so the quarantine-route entries
// show the PER-BATCH plans the drains actually execute, built from the
// same production plan builders PlanShapeSpec gates.
val decoded = graft.multimodal.Multimodal.decodeMetaTotal(
  graft.multimodal.Multimodal.documentBlobs(spark, sf)).toDF()
emit("q91-q93 route: per-batch key normalization",
  "The quarantine route's first stage (Multimodal.normalizedDecisions): one routed decision per media_id, error-row-wins. ONE exchange hashed on media_id with a PARTIAL max_by below it - the shuffle moves one combined row per (task, key), never the raw batch. SortAggregate is the correct (and only attainable) physical form: max_by over a wide row needs a variable-length buffer, which hash aggregation cannot hold; no Expand, no Window (both plan-gated). The decode (mapPartitions) sits below, map-only - blob bytes never shuffle.",
  graft.multimodal.Multimodal.normalizedDecisions(decoded))
val bCol = graft.merge.MergeTable.bucketColumn(Seq("media_id"), 16)
val mtBase = decoded.filter(org.apache.spark.sql.functions.col("error").isNull)
  .drop("error").withColumn(graft.merge.MergeTable.BucketCol, bCol)
val mtDelta = decoded.filter(org.apache.spark.sql.functions.col("error").isNull)
  .drop("error").withColumn(graft.merge.MergeTable.BucketCol, bCol)
emit("q87/q91-q93 MergeTable: single-shuffle staged rewrite",
  "The bucketed MERGE's staged rewrite (MergeTable.rewritePlan, r16): the base-union-delta frame is hash-partitioned on __bucket ONCE, and the delta-wins winner window partitions by (__bucket, keys) - a clustering the bucket hashing already satisfies, so there is NO second exchange (pre-r16 this shuffled twice: the window's keys-exchange plus the bucket repartition). The same shuffle lands each bucket in one task for the one-file-per-bucket-dir staged layout. Plan-gated: exactly one exchange, keyed on __bucket, window above it.",
  graft.merge.MergeTable.rewritePlan(mtBase, mtDelta, Seq("media_id")))
out.close()
println("WROTE /tmp/PLANS.md")
