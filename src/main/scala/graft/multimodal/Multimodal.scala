package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (north star): image/audio/video as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side plumbing is real — binary columns, schema, partition
  * batching via `mapPartitions` (the JVM analogue of `mapInPandas`: one
  * iterator per partition, amortized per-batch setup, no per-row driver
  * involvement) — and so are the IMAGE and AUDIO decodes: [[ImageCodec]]
  * encodes, header-decodes, and resizes PNG/JPEG through the JDK's
  * built-in `javax.imageio`; [[AudioCodec]] encodes and header-decodes
  * PCM WAV through the JDK's built-in `javax.sound.sampled` (no external
  * jar for either). Only VIDEO remains stubbed ([[FakeDecoder]]): no
  * video codec ships with the JDK or this container, so its metadata is
  * derived deterministically from the bytes — clearly marked, swap in
  * ffmpeg bindings in a deployment.
  *
  * Scale notes: decode cost dominates at 100 TB, so the operator must
  * (a) run per-partition with zero driver round-trips — it does, via
  * mapPartitions; (b) avoid shuffles — it is map-only; (c) let the
  * scan prune to the binary column + id only — schema keeps media in a
  * single binary field per row; (d) never touch local disk — ImageIO's
  * temp-file stream cache is disabled, all streams are in-memory.
  */
object Multimodal {
  /** Typed metadata extracted from a media blob. */
  case class MediaMeta(n_bytes: Long, format: String, width: Int,
      height: Int, n_frames: Int)

  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])

  case class DecodedRow(media_id: Long, media_type: String, n_bytes: Long,
      format: String, width: Int, height: Int, n_frames: Int)

  /** REAL image codec over the JDK's `javax.imageio` — PNG and JPEG
    * encode/decode with zero external dependencies.
    *
    * [[decodeMeta]] is a header-only read (`ImageReader.getWidth/Height`
    * on the stream — no pixel decode), the form that scales: metadata
    * extraction over 100 TB of images should not pay full decompression.
    * [[resize]] is the full path: pixel decode → `Graphics2D` bilinear
    * scale → re-encode in the source format.
    */
  object ImageCodec {
    import java.awt.RenderingHints
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    // executor-side: keep ImageInputStreams in memory, never a temp file
    ImageIO.setUseCache(false)

    /** Encode a deterministic test-pattern image (pixel = f(x, y, seed))
      * as `format` ("png" | "jpeg"). PNG is lossless, so an encode →
      * decode round trip is pixel-exact — the fixture generator for
      * specs and the planted corpus in [[documentBlobs]].
      */
    def encode(width: Int, height: Int, seed: Long, format: String): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y, ((x * 31 + y * 17 + seed) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      require(ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
      bos.toByteArray
    }

    /** Header-only metadata: format name + dimensions from the image
      * header via ImageReader — no pixel decompression. */
    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable image payload")
        val r = readers.next()
        try {
          r.setInput(iis)
          MediaMeta(bytes.length.toLong, r.getFormatName.toLowerCase,
            r.getWidth(0), r.getHeight(0), n_frames = 1)
        } finally r.dispose()
      } finally iis.close()
    }

    /** Real resize: full decode, bilinear `Graphics2D` scale so
      * max(w, h) <= maxSide (never upscales), re-encode in the source
      * format. Scale arithmetic is IEEE double multiply + truncation —
      * replayable exactly by the SQL oracle.
      */
    def resize(bytes: Array[Byte], maxSide: Int): Array[Byte] = {
      val format = decodeMeta(bytes).format
      val src = ImageIO.read(new ByteArrayInputStream(bytes))
      val scale = math.min(1.0, maxSide.toDouble / math.max(src.getWidth, src.getHeight))
      val rw = math.max(1, (src.getWidth * scale).toInt)
      val rh = math.max(1, (src.getHeight * scale).toInt)
      val dst = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, rw, rh, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      require(ImageIO.write(dst, format, bos), s"no ImageIO writer for $format")
      bos.toByteArray
    }
  }

  /** REAL audio codec over the JDK's `javax.sound.sampled` — WAV (PCM)
    * encode/decode with zero external dependencies, mirroring
    * [[ImageCodec]]'s role for images.
    *
    * [[decodeMeta]] parses only the RIFF/fmt header
    * (`AudioSystem.getAudioFileFormat` — no sample data is read), the
    * form that scales to metadata extraction over 100 TB of audio.
    * Audio reuses the generic [[MediaMeta]] slots: `width` = sample rate
    * (Hz), `height` = channel count, `n_frames` = PCM frame count — one
    * denormalized meta row shape across media types, same trade a
    * production media warehouse makes.
    */
  object AudioCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Deterministic 16-bit PCM mono WAV fixture (sample = f(i, seed)) —
      * the audio analogue of [[ImageCodec.encode]]'s test pattern. WAV is
      * lossless, so planted (rate, frames) survive an encode → decode
      * round trip exactly.
      */
    def encode(nSamples: Int, sampleRateHz: Int, seed: Long): Array[Byte] = {
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val s = (((i * 2654435761L + seed) & 0xffffL) - 32768L).toShort
        pcm(2 * i) = (s & 0xff).toByte // little-endian per the format below
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRateHz.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Header-only metadata: container type + PCM parameters from the
      * RIFF header — no sample decode. */
    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val f = aff.getFormat
      MediaMeta(bytes.length.toLong, aff.getType.getExtension.toLowerCase,
        width = f.getSampleRate.toInt, height = f.getChannels,
        n_frames = aff.getFrameLength)
    }
  }

  /** STUB decoder for video ONLY — deterministic pseudo-metadata from raw
    * bytes. Images decode through the real [[ImageCodec]], audio through
    * the real [[AudioCodec]]; video is the one type with genuinely no
    * codec in the JDK or this container — swap in ffmpeg bindings in a
    * deployment, everything else stays as-is.
    */
  object FakeDecoder {
    def decode(mediaType: String, bytes: Array[Byte]): MediaMeta = {
      require(mediaType == "video",
        "images/audio decode through ImageCodec/AudioCodec")
      val n = bytes.length.toLong
      MediaMeta(
        n_bytes = n,
        format = "mp4",
        width = (64 + (n % 577)).toInt,
        height = (64 + ((n * 31 + (if (bytes.nonEmpty) bytes(0) & 0xff else 0)) % 513)).toInt,
        n_frames = (n % 24 + 1).toInt)
    }

    /** STUB resize: metadata-only transform (a real impl would re-encode). */
    def resize(m: MediaMeta, maxSide: Int): MediaMeta = {
      val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
      m.copy(width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }

    /** STUB frame sampling: every k-th frame index. */
    def sampleFrames(m: MediaMeta, every: Int): Seq[Int] =
      0 until m.n_frames by math.max(1, every)
  }

  /** Batch decode over partitions — the mapInPandas-shaped operator.
    * Images go through the real [[ImageCodec]] header read, audio through
    * the real [[AudioCodec]] header read; only video falls back to the
    * declared [[FakeDecoder]] stub.
    */
  def decodeMeta(rows: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition (per-batch) decoder setup happens ONCE here
      it.map { r =>
        val m = r.media_type match {
          case "image" => ImageCodec.decodeMeta(r.content)
          case "audio" => AudioCodec.decodeMeta(r.content)
          case _ => FakeDecoder.decode(r.media_type, r.content)
        }
        DecodedRow(r.media_id, r.media_type, m.n_bytes, m.format, m.width,
          m.height, m.n_frames)
      }
    }
  }

  /** Planted image dimensions for [[documentBlobs]] — derived from the
    * document text so the SQL oracle can predict what a REAL decode of
    * the planted image must return. Kept small (w <= 331, h <= 311) so
    * encoding stays cheap, with a spread crossing 256 so the resize path
    * exercises genuine downscales.
    */
  def plantedWidth(len: Int): Int = 32 + len % 300
  def plantedHeight(len: Int, first: Int): Int = 32 + (len * 31 + first) % 280

  /** Planted audio parameters for [[documentBlobs]] — same oracle-
    * predictability contract as [[plantedWidth]]/[[plantedHeight]]:
    * telephone-to-wideband sample rates, payloads kept to a few hundred
    * PCM frames so encoding stays cheap.
    */
  def plantedRate(len: Int): Int = 8000 + len % 577
  def plantedSamples(len: Int, first: Int): Int = 40 + (len * 31 + first) % 400

  /** Media-corpus fixture over the documents table. Image rows carry a
    * REAL encoded PNG/JPEG (dimensions planted from the text via
    * [[plantedWidth]]/[[plantedHeight]], format by text-length parity, a
    * per-doc pixel pattern); audio rows carry a REAL PCM WAV (rate and
    * frame count planted via [[plantedRate]]/[[plantedSamples]]); video
    * rows carry the utf-8 text bytes for the stub decoder. Generation is
    * distributed (mapPartitions) and deterministic, so the oracle can
    * state the expected decode output without ever decoding.
    */
  def documentBlobs(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val generated = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      // image encoding is CPU-bound and the documents table is a small
      // parquet file (few input splits) — spread generation across every
      // core before the heavy map; the shuffle moves only (id, text)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        val types = Array("image", "audio", "video")
        it.map { case (id, text) =>
          val mt = types((id % 3).toInt)
          val len = text.length
          val first = if (text.nonEmpty) text.charAt(0).toInt else 0
          val content = mt match {
            case "image" =>
              val fmt = if (len % 2 == 0) "png" else "jpeg"
              ImageCodec.encode(plantedWidth(len), plantedHeight(len, first), id, fmt)
            case "audio" =>
              AudioCodec.encode(plantedSamples(len, first), plantedRate(len), id)
            case _ => text.getBytes("UTF-8")
          }
          MediaRow(id, mt, content)
        }
      }
    // the blob corpus is INPUT data to q21/q47 (in production it would sit
    // in parquet); persist so consumers measure decode work, not fixture
    // regeneration — LRU-bounded, fingerprinted against the source table
    graft.ops.PersistRegistry.cached("blobs:" + dir, generated.toDF(),
        sourcePath = s"$dir/documents.parquet")
      .as[MediaRow]
  }
}
