package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators over the `documents` table —
  * the LLM-training-pipeline surface (SURVEY.md §2 F11, D3; north star).
  *
  * Everything is native expressions (no UDFs): tokenization, stopword
  * ratios, language-ID, fingerprinting, MinHash and SimHash all run inside
  * whole-stage codegen and scale linearly with a single shuffle where a
  * groupBy/join requires one. The MinHash band join is the standard
  * LSH shape: candidates = docs sharing a band bucket, so the join is an
  * equi-join on (band_idx, band_hash) — shuffle-partitioned by bucket, no
  * O(N²) comparison.
  */
object TextOps {
  private def tokens: Column = split(col("text"), " ")

  // ---------------------------------------------------------------- stats
  /** Per-document stats: chars, whitespace tokens, distinct types,
    * stopword ratio, punctuation ratio, BPE-ish subword token count.
    * All seven counters come from the fused one-pass codegen
    * [[graft.functions.expressions.TextStatsExpr]] (spec-pinned equal to
    * the composed regexp_extract_all / regexp_replace / split+distinct
    * column forms, which materialized every regex match and the stripped
    * string just to count them); the ratios stay as Column divisions so
    * their null/NaN semantics are untouched.
    */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val stopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is")
    Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.expressions.TextStatsExpr
        .textStats("text", stopwords).as("s"))
      .select(
        col("doc_id"),
        col("s.n_chars").as("n_chars_m"),
        col("s.n_tokens").as("n_tokens"),
        col("s.n_types").as("n_types"),
        (col("s.n_stop").cast("double") /
          col("s.n_split").cast("double")).as("stop_ratio"),
        (col("s.n_punct").cast("double") /
          col("s.n_chars").cast("double")).as("punct_ratio"),
        col("s.n_bpe").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  val textStatsSql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_m,
      |  len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_types,
      |  CAST(len(list_filter(string_split(text, ' '),
      |       t -> t IN ('the','a','an','of','and','to','in','is'))) AS DOUBLE)
      |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
      |  CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
      |  len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS n_bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- language id
  /** Marker-word language scoring with deterministic argmax (n-gram
    * heuristic family; marker sets are illustrative, the operator shape —
    * score-per-language then argmax — is the point).
    */
  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val markers = Seq(
      "en" -> Seq("the", "and", "is", "of", "to"),
      "es" -> Seq("el", "la", "de", "que", "y"),
      "fr" -> Seq("le", "les", "et", "une", "dans"),
      "de" -> Seq("der", "die", "und", "das", "ist"))
    def score(ws: Seq[String]): Column =
      size(filter(tokens, t => t.isin(ws: _*)))
    val scored = markers.foldLeft(Tables.documents(spark, dir)) {
      case (df, (l, ws)) => df.withColumn(s"score_$l", score(ws))
    }
    val best = greatest(markers.map { case (l, _) => col(s"score_$l") }: _*)
    val pred = markers.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(col(s"score_$l") === best && best > 0, l).otherwise(acc)
    }
    scored.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  val languageIdSql: String = {
    val markers = Seq(
      "en" -> Seq("the", "and", "is", "of", "to"),
      "es" -> Seq("el", "la", "de", "que", "y"),
      "fr" -> Seq("le", "les", "et", "une", "dans"),
      "de" -> Seq("der", "die", "und", "das", "ist"))
    val scores = markers.map { case (l, ws) =>
      s"len(list_filter(string_split(text, ' '), t -> t IN (${ws.map(w => s"'$w'").mkString(",")}))) AS score_$l"
    }.mkString(",\n    ")
    val best = s"greatest(${markers.map(m => s"score_${m._1}").mkString(",")})"
    val pred = markers.foldRight("'und'") { case ((l, _), acc) =>
      s"CASE WHEN score_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM documents
       |), withbest AS (
       |  SELECT *, $best AS best FROM scored
       |)
       |SELECT doc_id, lang, $pred AS pred_lang
       |FROM withbest
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------- fingerprint
  /** Whitespace-normalized md5 content fingerprint. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .orderBy(col("doc_id"))

  val fingerprintSql: String =
    """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- exact dedup
  /** Exact dedup, deterministic formulation: one surviving row per key
    * (min doc_id) + survivor count — groupBy-based, single shuffle.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_rows"))
      .orderBy(col("lang"), col("source"))

  val exactDedupSql: String =
    """SELECT lang, source, min(doc_id) AS keep_doc_id, count(*) AS n_rows
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // -------------------------------------------------------------- minhash
  /** MinHash LSH near-duplicate candidates, fully deterministic (md5-based
    * hash family, so the DuckDB oracle reproduces signatures exactly):
    * 3-token shingles → 16 minhashes → 8 bands of 2 → band-bucket
    * equi-join → candidate pairs with exact shingle-set Jaccard attached.
    */
  val minhashN = 16
  val minhashBands = 8 // of 2 rows each

  /** Token 3-gram shingles per doc (docs with <3 tokens can't shingle).
    * Shingling runs the fused codegen
    * [[graft.functions.expressions.WordNgrams]] — one byte pass emitting
    * substring views, replacing the earlier split + transform/slice/
    * array_join composition (which allocated a boxed slice and a joined
    * string per position; spec-pinned equivalent). The emptiness filter
    * is the composed form's size(t) >= 3 gate: shingle count = tokens-2.
    */
  private def shingleTableOf(docs: DataFrame): DataFrame = {
    import graft.functions.expressions.WordNgrams.wordNgrams
    docs
      .select(col("doc_id"), wordNgrams("text", 3).as("shingles"))
      .filter(size(col("shingles")) >= 1)
  }

  private def shingleTable(spark: SparkSession, dir: String): DataFrame =
    shingleTableOf(Tables.documents(spark, dir))

  // ---- shared minhash scaffolding (used by q12 / q45 / q48: one place
  // to change the signature construction, banding, agreement estimate,
  // and exact-jaccard verify for every hash family) ----

  /** (doc_id, sig_0..sig_N-1) from a per-(component, shingle) hash. */
  private def signatureTable(docs: DataFrame,
      sigOf: (Int, Column) => Column): DataFrame = {
    val sigs = (0 until minhashN).map { j =>
      array_min(transform(col("shingles"), s => sigOf(j, s))).as(s"sig_$j")
    }
    docs.select(col("doc_id") +: sigs: _*)
  }

  private def md5Sig(j: Int, s: Column): Column = md5(concat(lit(s"$j:"), s))

  /** Narrow (doc_id, band_idx, band_hash) table from a signature table. */
  private def bandKeysOf(withSig: DataFrame,
      bandHash: (Column, Column) => Column): DataFrame = {
    val bands = (0 until minhashBands).map { b =>
      struct(lit(b).as("band_idx"),
        bandHash(col(s"sig_${2 * b}"), col(s"sig_${2 * b + 1}")).as("band_hash"))
    }
    withSig.select(col("doc_id"), explode(array(bands: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"),
        col("band.band_hash").as("band_hash"))
  }

  /** Distinct candidate (doc_a, doc_b) pairs from a band-key self-join. */
  private def bandPairs(bandKeys: DataFrame): DataFrame =
    bandKeys.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
      .join(bandKeys.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b")),
        Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

  /** Attach both sides' signature columns (a_j / b_j) to candidate pairs. */
  private def pairSigs(withSig: DataFrame, pairs: DataFrame): DataFrame = {
    val sa = withSig.select(col("doc_id").as("doc_a") +:
      (0 until minhashN).map(j => col(s"sig_$j").as(s"a_$j")): _*)
    val sb = withSig.select(col("doc_id").as("doc_b") +:
      (0 until minhashN).map(j => col(s"sig_$j").as(s"b_$j")): _*)
    pairs.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
  }

  /** Fraction of agreeing components — the unbiased Jaccard estimator
    * (evaluate over a [[pairSigs]] frame). */
  private def sigAgreeFraction: Column =
    (0 until minhashN).map { j =>
      when(col(s"a_$j") === col(s"b_$j"), 1).otherwise(0)
    }.reduce(_ + _).cast("double") / minhashN.toDouble

  /** Exact shingle-set Jaccard for candidate pairs: two joins against the
    * shingle table (candidate count << corpus size by LSH design). */
  private def exactJaccard(docs: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(array_distinct(col("sh_a")), array_distinct(col("sh_b")))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))

  /** Unsorted (doc_a, doc_b, jaccard) candidate pairs — the composable
    * form: q58's duplicate clustering consumes this without paying q12's
    * presentation sort. */
  def neardupPairs(spark: SparkSession, dir: String): DataFrame =
    // The VERIFIED pair set is the frame every downstream consumer shares
    // (q12's sorted presentation, q38's edit-distance check, q58's
    // clustering, q77's family gate) — cache it per input dir so the
    // verify stage (candidate persist + semi-join shingle + exact
    // jaccard) runs once per corpus, not once per consumer. The
    // fingerprint on documents.parquet invalidates on rewrite; cachedLazy
    // keeps a registry hit from even constructing the pipeline below.
    graft.ops.PersistRegistry.cachedLazy(spark, "q12pairs:" + dir,
        sourcePath = s"$dir/documents.parquet") {
      val docs = shingleTable(spark, dir)
      // Persist the narrow (doc_id, band_idx, band_hash) table: both sides
      // of the self-join read the materialized band keys instead of
      // recomputing the 16-minhash signature pipeline twice (ProjectCollapse
      // would otherwise inline the md5 transforms into every band row on
      // both join sides — ~5x slower here, arbitrarily worse at scale; a
      // shuffle barrier alone doesn't survive Spark electing a broadcast
      // join, which skips exchange reuse). Storage is bounded by the
      // PersistRegistry LRU: one entry per distinct input dir, evicted
      // least-recently-used past the cap.
      val bandKeys = graft.ops.PersistRegistry.cached("q12:" + dir,
        bandKeysOf(signatureTable(docs, md5Sig),
          (a, b) => md5(concat_ws("|", a, b))),
        sourcePath = s"$dir/documents.parquet")
      // verify-stage restriction: exact jaccard only shingles PAIR-INVOLVED
      // docs (semi-join through the candidate ids), not the whole corpus —
      // candidates << corpus by LSH design, so the verify cost scales with
      // the duplicate rate, never the collection size. On warm band-key
      // cache hits this removes the only remaining full-corpus re-shingle.
      verifyPairs(Tables.documents(spark, dir), bandPairs(bandKeys))
    }

  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    neardupPairs(spark, dir).orderBy(col("doc_a"), col("doc_b"))

  /** DataFrame-input twin of [[neardupPairs]] for composition (incremental
    * clustering, subset re-pairing). No registry caching — callers that
    * reuse the band keys persist them themselves. */
  def neardupPairsOf(docs: DataFrame): DataFrame = {
    val sh = shingleTableOf(docs)
    val bandKeys = bandKeysOf(signatureTable(sh, md5Sig),
      (a, b) => md5(concat_ws("|", a, b)))
    // same verify-stage restriction as [[neardupPairs]]: shingle only
    // pair-involved docs for the exact check
    verifyPairs(docs, bandPairs(bandKeys))
  }

  /** Narrow (doc_id, band_idx, band_hash) LSH index rows for an arbitrary
    * documents frame — the probe-index form: index a batch of new docs
    * once, probe it against an accumulated index with a plain equi-join.
    * Same md5 signature family as [[neardupPairs]], so indexes built
    * across batches are mutually joinable. */
  private[graft] def bandKeyTable(docs: DataFrame): DataFrame =
    bandKeysOf(signatureTable(shingleTableOf(docs), md5Sig),
      (a, b) => md5(concat_ws("|", a, b)))

  /** Exact-jaccard verification of candidate (doc_a, doc_b) pairs against
    * an arbitrary corpus frame. Only pair-involved docs are shingled
    * (semi-join restriction), so cost is ∝ candidates, never ∝ corpus. */
  private[graft] def verifyPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    // The candidate frame feeds three consumers (the id restriction and
    // both sides of the score join); persist it once or the entire
    // upstream banding/estimate DAG re-evaluates per consumer — measured
    // 4-6x on q48/q77 when left lazy. Unique tag: candidates are
    // ephemeral per evaluation, there is no stable cross-call key.
    val p = graft.ops.PersistRegistry.cachedUnique("verifyPairs", pairs)
    val ids = p.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    exactJaccard(shingleTableOf(docs.join(ids, Seq("doc_id"), "left_semi")), p)
  }

  /** The full DuckDB CTE chain ending in a `pairs(doc_a, doc_b, jaccard)`
    * relation — shared by q12's oracle and q58's (which builds a recursive
    * closure on top), so the two can never desynchronize. */
  private[queries] val pairsCte: String = {
    val sigs = (0 until minhashN).map { j =>
      s"list_aggregate(list_transform(shingles, s -> md5('$j:' || s)), 'min') AS sig_$j"
    }.mkString(",\n    ")
    val bands = (0 until minhashBands).map { b =>
      s"({'band_idx': $b, 'band_hash': md5(sig_${2 * b} || '|' || sig_${2 * b + 1})})"
    }.mkString(",\n    ")
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3
       |), sh AS (
       |  SELECT doc_id,
       |    [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] AS shingles
       |  FROM toks
       |), sigs AS (
       |  SELECT doc_id, shingles,
       |    $sigs
       |  FROM sh
       |), banded AS (
       |  SELECT doc_id, shingles, unnest([
       |    $bands
       |  ]) AS band
       |  FROM sigs
       |), flat AS (
       |  SELECT doc_id, shingles, band.band_idx AS band_idx,
       |         band.band_hash AS band_hash
       |  FROM banded
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(list_distinct(a.shingles), list_distinct(b.shingles))) AS DOUBLE) /
       |      CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) AS jaccard
       |  FROM flat a JOIN flat b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |    AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  val minhashPairsSql: String =
    s"""WITH $pairsCte
       |SELECT doc_a, doc_b, jaccard FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash-estimated Jaccard for the band-join candidates: the fraction
    * of agreeing minhash components is an unbiased Jaccard estimate, and
    * it prices at 16 equality checks per pair instead of an exact
    * shingle-set intersection. This is the verify-stage knob for 1M+ doc
    * corpora (BUILD_NOTES): estimate first, pay the exact set math only
    * for pairs whose estimate clears threshold. Same deterministic md5
    * hash family as q12, so the oracle reproduces signatures exactly.
    */
  def minhashEstimatedJaccard(spark: SparkSession, dir: String): DataFrame = {
    // persisted for the same ProjectCollapse/broadcast reason as
    // minhashPairs: three consumers (two band-join sides + the per-pair
    // signature lookup) must not each recompute the signature pipeline
    val withSig = graft.ops.PersistRegistry.cached("q45:" + dir,
      signatureTable(shingleTable(spark, dir), md5Sig),
      sourcePath = s"$dir/documents.parquet")
    val pairs = bandPairs(bandKeysOf(withSig, (a, b) => md5(concat_ws("|", a, b))))
    pairSigs(withSig, pairs)
      .select(col("doc_a"), col("doc_b"), sigAgreeFraction.as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val minhashEstimatedJaccardSql: String = {
    val sigs = (0 until minhashN).map { j =>
      s"list_aggregate(list_transform(shingles, s -> md5('$j:' || s)), 'min') AS sig_$j"
    }.mkString(",\n    ")
    val bands = (0 until minhashBands).map { b =>
      s"({'band_idx': $b, 'band_hash': md5(sig_${2 * b} || '|' || sig_${2 * b + 1})})"
    }.mkString(",\n    ")
    val agree = (0 until minhashN).map { j =>
      s"(CASE WHEN sa.sig_$j = sb.sig_$j THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3
       |), sh AS (
       |  SELECT doc_id,
       |    [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] AS shingles
       |  FROM toks
       |), sigs AS (
       |  SELECT doc_id, shingles,
       |    $sigs
       |  FROM sh
       |), banded AS (
       |  SELECT doc_id, unnest([
       |    $bands
       |  ]) AS band
       |  FROM sigs
       |), flat AS (
       |  SELECT doc_id, band.band_idx AS band_idx, band.band_hash AS band_hash
       |  FROM banded
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM flat a JOIN flat b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |    AND a.doc_id < b.doc_id
       |)
       |SELECT pairs.doc_a, pairs.doc_b,
       |  CAST(($agree) AS DOUBLE) / $minhashN.0 AS est_jaccard
       |FROM pairs
       |JOIN sigs sa ON pairs.doc_a = sa.doc_id
       |JOIN sigs sb ON pairs.doc_b = sb.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Production-scale MinHash near-dup pairs — the fast path. Same
    * pipeline shape as q12 but engineered for corpus scale, where three
    * things dominate measured cost at 1M docs (BUILD_NOTES):
    *
    *  - xxhash64 long signatures instead of md5 hex strings: the hash is
    *    cheaper, and a 16-long-column table builds its DataFrame cache
    *    7.5× faster than 16 high-cardinality string columns (132 s → 17 s
    *    at 1M docs — columnar cache compression of wide string sets is
    *    the hidden cost, not the hashing);
    *  - capped band buckets (ScaleOps.cappedBandJoin): one ubiquitous
    *    signature can't go quadratic;
    *  - estimate-first verify (q45's estimator): exact shingle-set
    *    jaccard only for pairs whose signature agreement clears the
    *    threshold — 2.6× the verify throughput at equal recall.
    *
    * Emits exact-verified pairs (jaccard >= 0.5). No DuckDB twin —
    * xxhash64 has no portable oracle (rows-only check); agreement with
    * the md5 family's results is spec-checked instead.
    */
  def minhashPairsFast(spark: SparkSession, dir: String): DataFrame =
    fastVerifiedPairs(spark, dir).orderBy(col("doc_a"), col("doc_b"))

  /** The fast family's verified (jaccard >= 0.5) pair set, cached per
    * input dir like [[neardupPairs]]' md5-family set — q48's presentation
    * sort and q77's family gate both consume this one materialization.
    */
  private def fastVerifiedPairs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.PersistRegistry.cachedLazy(spark, "q48pairs:" + dir,
        sourcePath = s"$dir/documents.parquet") {
      val docs = shingleTable(spark, dir)
      val withSig = graft.ops.PersistRegistry.cached("q48:" + dir,
        signatureTable(docs, (j, s) => xxhash64(lit(j), s)),
        sourcePath = s"$dir/documents.parquet")
      val bandKeys = bandKeysOf(withSig, (a, b) => xxhash64(a, b))
      val pairs = graft.ops.ScaleOps.cappedBandJoin(
        bandKeys, "doc_id", Seq("band_idx", "band_hash"), maxBucketSize = 1000)
        .withColumnRenamed("a", "doc_a").withColumnRenamed("b", "doc_b")
      val survivors = pairSigs(withSig, pairs)
        .filter(sigAgreeFraction >= 0.35)
        .select(col("doc_a"), col("doc_b"))
      // estimate-first already thinned the candidates; the exact check then
      // shingles only survivor-involved docs (cost ∝ survivors, not corpus)
      verifyPairs(Tables.documents(spark, dir), survivors)
        .filter(col("jaccard") >= 0.5)
    }

  /** q77: the fast (xxhash64) MinHash family's agreement with the md5
    * family as an oracle-checked contract. q48 itself stays rows-only
    * (xxhash64 has no DuckDB twin), but both families verify EXACT
    * shingle-set jaccard, so their >= 0.5 outputs are subsets of the
    * same true pair set and may differ only by candidate-generation
    * recall. The gate emits the md5 family's pair count (oracle states
    * it exactly via the q12 CTE) and an overlap boolean the oracle
    * states as TRUE: common pairs must cover >= 90% of the larger
    * family (measured: the sets are identical at every test SF; the
    * margin absorbs banding-recall drift at scale). A fast-path
    * regression — wrong hash wiring, broken banding, a bad cap — now
    * fails CORRECTNESS instead of only a spec.
    */
  def minhashFamilyGate(spark: SparkSession, dir: String): DataFrame = {
    // Both families come straight from their cached verified pair sets
    // (the same materializations q12/q38/q58 and q48 consume) — the gate
    // itself is three tiny aggregates over already-verified pairs, not a
    // second end-to-end run of each pipeline.
    val md5P = neardupPairs(spark, dir).filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val fastP = fastVerifiedPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    md5P.agg(count(lit(1)).as("n_pairs_md5"))
      .crossJoin(broadcast(fastP.agg(count(lit(1)).as("nf"))))
      .crossJoin(broadcast(md5P.intersect(fastP).agg(count(lit(1)).as("nc"))))
      .select(col("n_pairs_md5"),
        (col("nc") >= greatest(col("n_pairs_md5"), col("nf")) * 0.9)
          .as("families_agree_90pct"))
  }

  val minhashFamilyGateSql: String =
    s"""WITH $pairsCte
       |SELECT count(*) FILTER (jaccard >= 0.5) AS n_pairs_md5,
       |  TRUE AS families_agree_90pct
       |FROM pairs""".stripMargin

  // -------------------------------------------------------------- simhash
  /** 32-bit SimHash over whitespace tokens. Portable bit extraction: bit i
    * of a token's hash = bit (3 - i%4) of hex digit i/4 of md5(token), so
    * both engines derive identical bits from identical md5 hex strings.
    * Majority rule: bit set iff 2*ones >= n_tokens (ties set).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens).as("tok"))
      .withColumn("h8", substring(md5(col("tok")), 1, 8))
    val bitSums = (0 until 32).map { i =>
      sum(expr(s"((instr('0123456789abcdef', substring(h8, ${i / 4 + 1}, 1)) - 1) >> ${3 - i % 4}) & 1"))
        .as(s"ones_$i")
    }
    val aggCols = count(lit(1)).as("n_tok") +: bitSums
    val agg = docs.groupBy(col("doc_id"))
      .agg(aggCols.head, aggCols.tail: _*)
    val sim = (0 until 32).map { i =>
      when(col(s"ones_$i") * 2 >= col("n_tok"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash")).orderBy(col("doc_id"))
  }

  val simhashSql: String = {
    val bitSums = (0 until 32).map { i =>
      s"SUM(((instr('0123456789abcdef', substring(h8, ${i / 4 + 1}, 1)) - 1) >> ${3 - i % 4}) & 1) AS ones_$i"
    }.mkString(",\n    ")
    val sim = (0 until 32).map { i =>
      s"(CASE WHEN ones_$i * 2 >= n_tok THEN (CAST(1 AS BIGINT) << $i) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, substring(md5(t.tok), 1, 8) AS h8
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM documents) t
       |), agg AS (
       |  SELECT doc_id, COUNT(*) AS n_tok,
       |    $bitSums
       |  FROM toks GROUP BY doc_id
       |)
       |SELECT doc_id, $sim AS simhash
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------- winnowing
  /** Winnowing document fingerprints (the MOSS scheme): all k-gram
    * rolling hashes, then the minimum of each w-hash window, deduplicated
    * — a position-robust fingerprint set for near-dup detection.
    * Spark side runs the fused O(n) codegen'd
    * [[graft.functions.expressions.WinnowFingerprints]] (rolling hash +
    * monotonic-deque window min + distinct in one primitive pass — the
    * composed transform/slice/array_min form burned ~30 cpu-seconds at
    * sf0.1 on boxed per-window slices); the oracle recomputes every
    * k-gram naively (mod-congruent values), so the hash-compare also
    * proves the rolling recurrence AND the deque window-min correct.
    */
  val winnowK = 8
  val winnowW = 4

  def winnowingFingerprints(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.WinnowFingerprints.winnowFingerprints
    // No rebalance: the fused fingerprint pass is ~4 cpu-s over the sf0.1
    // corpus (scan-class), and the repartition's round-robin shuffle of
    // the text bytes COSTS 3.6x the compute's cpu (measured 4.1 -> 14.8
    // cpu-s, equal wall) — the rebalance paid for itself only against the
    // pre-fusion boxed window-min. At cluster scale the scan is wide and
    // the question vanishes.
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= winnowK + winnowW - 1)
      .select(col("doc_id"),
        explode(winnowFingerprints("text", winnowK, winnowW)).as("fp"))
      .orderBy(col("doc_id"), col("fp"))
  }

  val winnowingFingerprintsSql: String = {
    val terms = (0 until winnowK).map { j =>
      val pow = BigInt(131).pow(winnowK - 1 - j)
      // CAST: DuckDB int literals/ascii() are INT32 and the products overflow
      s"CAST(ascii(text[i+$j:i+$j]) AS BIGINT) * CAST($pow AS BIGINT)"
    }.mkString(" + ")
    s"""WITH h AS (
       |  SELECT doc_id,
       |    [($terms) % 1000000007 for i in range(1, length(text) - ${winnowK - 2})] AS hs
       |  FROM documents WHERE length(text) >= ${winnowK + winnowW - 1}
       |), wins AS (
       |  SELECT doc_id,
       |    list_distinct([list_min(hs[i:i+${winnowW - 1}])
       |                   for i in range(1, len(hs) - ${winnowW - 2})]) AS fps
       |  FROM h
       |)
       |SELECT doc_id, unnest(fps) AS fp
       |FROM wins ORDER BY doc_id, fp""".stripMargin
  }

  // ---------------------------------------------------------- keywords
  /** TF-IDF keyword extraction, top-3 per document. Deterministic
    * scoring without logs: score = tf * N / df (integer numerator is
    * exact; one double division both engines share), ties broken on the
    * token.
    *
    * Two wide exchanges for the whole inverted-index build — down from
    * four in the round-5 plan (30%+ measured, round-6 task):
    *  1. ONE hash exchange on `tok`, explicitly requested and then
    *     REUSED by both consumers: the (tok, doc) term-frequency
    *     aggregate (partitioning on `tok` already clusters its keys, so
    *     Catalyst inserts no second exchange) and the token-partitioned
    *     count window that attaches document frequency — which replaces
    *     the old separate df-aggregate + equi-join and their two
    *     exchanges outright.
    *  2. The per-doc top-3 row_number window (partitioned by doc, never
    *     global).
    * No rebalance before the explode: the tok exchange itself provides
    * full cluster width for every heavy stage, and what runs at scan
    * width (tokenize + shuffle write) is O(bytes scanned) work — the
    * same class as the scan, at any scale.
    */
  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(tokens).as("tok"))
    val tf = toks.repartition(col("tok"))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // df = how many docs carry the token = rows per tok in tf (one row
    // per (doc, tok) by construction); same partitioning, no exchange
    val wTok = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
    val scored = tf.withColumn("df", count(lit(1)).over(wTok))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("tok").as("keyword"), col("rank"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val tfidfKeywordsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
      |), dfreq AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
      |), scored AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
      |    CAST(tf.tf * (SELECT COUNT(*) FROM documents) AS DOUBLE)
      |      / CAST(dfreq.df AS DOUBLE) AS score
      |  FROM tf JOIN dfreq ON tf.tok = dfreq.tok
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |                               ORDER BY score DESC, tok) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, tok AS keyword, rank, score
      |FROM ranked WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  // ------------------------------------------------------- heavy hitters
  /** Corpus-wide top-25 token bigrams — the vocabulary/heavy-hitter scan a
    * tokenizer build or contamination audit starts from. ORDER BY + LIMIT
    * plans as TakeOrderedAndProject: each task keeps its local top-25 and
    * the driver merges per-task heaps, so no global sort and no single
    * wide reducer exists at any scale. Ties broken on the bigram text.
    */
  val topBigramsK = 25

  def topBigrams(spark: SparkSession, dir: String): DataFrame =
    // Fused one-pass shingler; explode drops the <2-token docs that the
    // composed form's size(t) >= 2 filter removed. No rebalance: emission
    // + the map-side partial count are scan-class after the fusion, and
    // the repartition costs 10x the compute's cpu for no wall gain
    // (measured 0.40 s/1.3 cpu plain vs 0.81 s/13.8 cpu rebalanced).
    Tables.documents(spark, dir)
      .select(explode(graft.functions.expressions.WordNgrams
        .wordNgrams("text", 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(topBigramsK)

  val topBigramsSql: String =
    s"""WITH tk AS (
       |  SELECT string_split(text, ' ') AS t
       |  FROM documents WHERE len(string_split(text, ' ')) >= 2
       |), bg AS (
       |  SELECT unnest([array_to_string(t[i:i+1], ' ')
       |                 for i in range(1, len(t))]) AS bigram
       |  FROM tk
       |)
       |SELECT bigram, COUNT(*) AS n
       |FROM bg GROUP BY bigram
       |ORDER BY n DESC, bigram
       |LIMIT $topBigramsK""".stripMargin

  // ---------------------------------------------------------- repetition
  /** Intra-document repetition (Gopher-style quality rule): the fraction
    * of duplicate n-gram occurrences within each document. Map-only —
    * shingle, count, count-distinct per row, no shuffle; the flag
    * threshold is the corpus-curation gate. One shared double division
    * keeps both engines bit-identical. n=2 with a 5% gate flags ~20% of
    * the synthetic fixtures (longer n-grams never repeat in them — a
    * real corpus would run the {2,3,4}-gram family).
    */
  val repN = 2
  val repThreshold = 0.05

  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.expressions.WordNgrams
        .wordNgrams("text", repN).as("gs"))
      .filter(size(col("gs")) >= 1) // the composed form's size(t) >= n gate
      .select(col("doc_id"), size(col("gs")).as("n_grams"),
        size(array_distinct(col("gs"))).as("n_distinct"))
      .withColumn("dup_ratio",
        (col("n_grams") - col("n_distinct")).cast("double") /
          col("n_grams").cast("double"))
      .withColumn("flag_repetitive", col("dup_ratio") > repThreshold)
      .orderBy(col("doc_id"))

  val repetitionStatsSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents WHERE len(string_split(text, ' ')) >= $repN
       |), gs AS (
       |  SELECT doc_id,
       |    [array_to_string(t[i:i+${repN - 1}], ' ')
       |     for i in range(1, len(t) - ${repN - 2})] AS gs
       |  FROM tk
       |), counted AS (
       |  SELECT doc_id, len(gs) AS n_grams, len(list_distinct(gs)) AS n_distinct
       |  FROM gs
       |)
       |-- CAST to INT: Spark's size() is 32-bit, DuckDB len() is BIGINT
       |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
       |  CAST(n_distinct AS INT) AS n_distinct,
       |  CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_ratio,
       |  (CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE)) > $repThreshold
       |    AS flag_repetitive
       |FROM counted ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_winnowing_fp" -> (winnowingFingerprints _),
    "q31_tfidf_keywords" -> (tfidfKeywords _),
    "q08_text_stats" -> (textStats _),
    "q09_language_id" -> (languageId _),
    "q10_fingerprint" -> (fingerprint _),
    "q11_exact_dedup" -> (exactDedup _),
    "q12_minhash_pairs" -> (minhashPairs _),
    "q13_simhash" -> (simhash _),
    "q45_minhash_est" -> (minhashEstimatedJaccard _),
    "q48_minhash_fast" -> (minhashPairsFast _),
    "q77_minhash_family_gate" -> (minhashFamilyGate _),
    "q60_top_bigrams" -> (topBigrams _),
    "q62_repetition" -> (repetitionStats _))

  val oracle: Map[String, String] = Map(
    "q36_winnowing_fp" -> winnowingFingerprintsSql,
    "q31_tfidf_keywords" -> tfidfKeywordsSql,
    "q08_text_stats" -> textStatsSql,
    "q09_language_id" -> languageIdSql,
    "q10_fingerprint" -> fingerprintSql,
    "q11_exact_dedup" -> exactDedupSql,
    "q12_minhash_pairs" -> minhashPairsSql,
    "q13_simhash" -> simhashSql,
    "q45_minhash_est" -> minhashEstimatedJaccardSql,
    "q77_minhash_family_gate" -> minhashFamilyGateSql,
    "q60_top_bigrams" -> topBigramsSql,
    "q62_repetition" -> repetitionStatsSql)
}
