package graft.sources

import java.io.{BufferedReader, BufferedWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Kafka-shaped DataSource V2 source over a local segmented log.
  *
  * **Why this exists.** The reference ingests from a real Kafka topic
  * (`scripts/spark_processing.py:53-59`), but this build environment ships
  * no Kafka jars (no broker, no `spark-sql-kafka` connector, offline
  * resolver — see BUILD_NOTES "Kafka verification boundary"). Everything
  * downstream of the source was already proven through a file-source twin;
  * what remained compile-only was the *source contract itself*: option
  * wiring, the envelope schema, offset semantics, admission control
  * (`maxOffsetsPerTrigger`), offset-range splitting (`minPartitions`), and
  * checkpoint-resume. This source implements that exact contract against a
  * directory-backed log so every one of those behaviors executes under
  * test through the REAL `Ingest` entry points (`Ingest.kafkaBatchSource` /
  * `kafkaStreamSource` with `format = KafkaLog.Format`):
  *
  *  - same option names: `kafka.bootstrap.servers` (here: the log root
  *    directory), `subscribe`, `startingOffsets`, `minPartitions`,
  *    `maxOffsetsPerTrigger`;
  *  - same fixed 7-column envelope schema as Spark's Kafka scan;
  *  - same offset JSON shape (`{"topic":{"0":5,"1":7}}`) persisted by the
  *    streaming engine into the checkpoint's `offsets/` log, so
  *    kill-and-restart resume exercises genuine `deserializeOffset`;
  *  - `Trigger.AvailableNow` via [[SupportsTriggerAvailableNow]] (end
  *    offsets snapshotted once, drained in bounded admission-controlled
  *    micro-batches);
  *  - proportional `maxRows` admission control like the Kafka scan's
  *    `maxOffsetsPerTrigger`, and `minPartitions`-style offset-range
  *    splitting so one topic-partition can feed many cores.
  *
  * **On-disk layout** (a deliberately Kafka-like segmented log):
  * `<root>/<topic>/p<partition>/<base-offset>.seg`, each segment a text
  * file of `base64(key)\tbase64(value)\t<tsMillis>` lines (key `-` for
  * null). Segment file names carry the base offset, offsets within a
  * segment are line positions — exactly Kafka's log/segment naming model.
  * Segments are append-only and immutable once written; `produce` rolls a
  * new segment per call.
  *
  * This is a test/verification source: the log lives on one filesystem.
  * The DSv2 surface (offset ranges, admission control, reader factory) is
  * the same one a production connector implements, which is the point —
  * swapping in the real Kafka connector changes the `format` string and
  * nothing else in the pipeline.
  */
object KafkaLog {
  /** Short format name registered via META-INF/services. */
  val Format = "kafka-log"

  /** Spark's Kafka source envelope schema, verbatim. */
  val schema: StructType = new StructType()
    .add("key", BinaryType)
    .add("value", BinaryType)
    .add("topic", StringType)
    .add("partition", IntegerType)
    .add("offset", LongType)
    .add("timestamp", TimestampType)
    .add("timestampType", IntegerType)

  /** One producer record: nullable key, value, event timestamp (millis). */
  final case class Record(key: String, value: String, tsMillis: Long)

  /** Create a topic with `partitions` empty partition dirs (idempotent) —
    * the log's analogue of the reference DAG's topic-create
    * (`dags/kafka_stream_dag.py:41-45`). */
  def createTopic(root: String, topic: String, partitions: Int): Unit = {
    require(partitions > 0, s"partitions must be > 0, got $partitions")
    (0 until partitions).foreach { p =>
      Files.createDirectories(Paths.get(root, topic, s"p$p"))
    }
  }

  /** Append `records` to `partition` as one new immutable segment whose
    * file name is the partition's current end offset (Kafka's segment
    * naming). Returns the new end offset. */
  def produce(root: String, topic: String, partition: Int,
      records: Seq[Record]): Long = synchronized {
    val pdir = Paths.get(root, topic, s"p$partition")
    Files.createDirectories(pdir)
    val base = endOffset(pdir)
    if (records.nonEmpty) {
      val b64 = Base64.getEncoder
      val tmp = pdir.resolve(f"$base%020d.seg.tmp")
      val w = Files.newBufferedWriter(tmp, UTF_8,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      try records.foreach { r =>
        val k = if (r.key == null) "-" else b64.encodeToString(r.key.getBytes(UTF_8))
        val v = b64.encodeToString(r.value.getBytes(UTF_8))
        w.write(s"$k\t$v\t${r.tsMillis}\n")
      } finally w.close()
      // write-then-rename so a concurrent reader never sees a partial segment
      Files.move(tmp, pdir.resolve(f"$base%020d.seg"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    base + records.size
  }

  /** Per-partition end offsets for a topic (partitions discovered from
    * `p*` dirs; a topic with no dirs is an error, mirroring a subscribe
    * to a nonexistent topic). */
  def endOffsets(root: String, topic: String): Map[Int, Long] = {
    val tdir = Paths.get(root, topic)
    require(Files.isDirectory(tdir),
      s"kafka-log topic not found: $tdir (create it with KafkaLog.createTopic)")
    val parts = Files.list(tdir).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("p"))
      .map(p => p.getFileName.toString.drop(1).toInt -> p).toMap
    require(parts.nonEmpty, s"kafka-log topic has no partitions: $tdir")
    parts.map { case (p, dir) => p -> endOffset(dir) }
  }

  /** End offset of one partition dir: last segment's base + its line
    * count (bases are cumulative by construction, so only the last
    * segment is ever counted). */
  private def endOffset(pdir: Path): Long = {
    val segs = listSegments(pdir)
    if (segs.isEmpty) 0L
    else {
      val (base, path) = segs.last
      base + countLines(path)
    }
  }

  /** Segments of a partition dir as (baseOffset, path), offset-sorted. */
  private[sources] def listSegments(pdir: Path): Seq[(Long, Path)] =
    if (!Files.isDirectory(pdir)) Seq.empty
    else Files.list(pdir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".seg"))
      .map(p => p.getFileName.toString.stripSuffix(".seg").toLong -> p)
      .toSeq.sortBy(_._1)

  private def countLines(p: Path): Long = {
    val r = Files.newBufferedReader(p, UTF_8)
    try Iterator.continually(r.readLine()).takeWhile(_ != null).size.toLong
    finally r.close()
  }

  /** Offset-range splitting for `minPartitions`: while fewer ranges than
    * requested, halve the largest splittable range — the same idea as the
    * Kafka scan's `minPartitions` (one topic-partition's offsets served
    * by several input partitions). Deterministic: ties broken by
    * (partition, start). */
  private[graft] def splitRanges(ranges: Seq[LogRange], minParts: Int): Seq[LogRange] = {
    var rs = ranges.toVector
    while (rs.size < minParts && rs.exists(r => r.end - r.start >= 2)) {
      val i = rs.zipWithIndex.maxBy { case (r, idx) =>
        (r.end - r.start, -r.partition.toLong, -r.start, -idx.toLong)
      }._2
      val r = rs(i)
      val mid = r.start + (r.end - r.start) / 2
      rs = rs.patch(i, Seq(r.copy(end = mid), r.copy(start = mid)), 1)
    }
    rs.sortBy(r => (r.partition, r.start))
  }
}

/** Parsed source options (same names as the real Kafka scan). */
private[sources] final case class LogConf(root: String, topic: String,
    startEarliest: Boolean, minPartitions: Int, maxOffsetsPerTrigger: Option[Long])

private[sources] object LogConf {
  def apply(options: CaseInsensitiveStringMap): LogConf = {
    val root = options.get("kafka.bootstrap.servers")
    val topic = options.get("subscribe")
    require(root != null && root.nonEmpty,
      "kafka-log requires kafka.bootstrap.servers (the log root directory)")
    require(topic != null && topic.nonEmpty, "kafka-log requires subscribe (the topic)")
    val starting = Option(options.get("startingOffsets")).getOrElse("earliest")
    require(starting == "earliest" || starting == "latest",
      s"startingOffsets must be earliest|latest, got $starting")
    LogConf(root, topic, starting == "earliest",
      Option(options.get("minPartitions")).map(_.toInt).getOrElse(0),
      Option(options.get("maxOffsetsPerTrigger")).map(_.toLong).filter(_ > 0L))
  }
}

/** `{"topic":{"0":5,"1":7}}` — the same JSON shape the real Kafka source
  * persists into the checkpoint offset log, partitions sorted for
  * deterministic round-trips. */
final case class KafkaLogOffset(topic: String, parts: Map[Int, Long]) extends Offset {
  override def json(): String =
    parts.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString(s"""{"${topic}":{""", ",", "}}")
}

object KafkaLogOffset {
  private val Pair = """"(\d+)"\s*:\s*(\d+)""".r
  /** Parse the partition→offset pairs back out (values are always plain
    * digits, so the topic key — even a numeric topic name, whose value is
    * an object — can never match). */
  def fromJson(topic: String, json: String): KafkaLogOffset =
    KafkaLogOffset(topic,
      Pair.findAllMatchIn(json).map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

/** One contiguous offset range of one topic-partition. */
private[graft] final case class LogRange(root: String, topic: String,
    partition: Int, start: Long, end: Long) extends InputPartition

class KafkaLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = KafkaLog.Format
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KafkaLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KafkaLogTable(LogConf(new CaseInsensitiveStringMap(properties)))
}

private[sources] class KafkaLogTable(conf: LogConf) extends Table with SupportsRead {
  override def name(): String = s"${KafkaLog.Format}:${conf.topic}"
  override def schema(): StructType = KafkaLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaLogScan(conf)
    }
}

private[sources] class KafkaLogScan(conf: LogConf) extends Scan {
  override def readSchema(): StructType = KafkaLog.schema
  override def description(): String = s"${KafkaLog.Format} topic=${conf.topic}"

  /** Batch flavor (`spark.read`) — the reference's own access pattern
    * (`spark_processing.py:53-59` reads the topic as a bounded batch). */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val ends = KafkaLog.endOffsets(conf.root, conf.topic)
      val ranges = ends.toSeq.sortBy(_._1).map { case (p, end) =>
        LogRange(conf.root, conf.topic, p, 0L, if (conf.startEarliest) end else end)
      }
      // batch latest = empty scan (nothing after the end); keep earliest
      val base = if (conf.startEarliest) ranges else ranges.map(r => r.copy(start = r.end))
      KafkaLog.splitRanges(base.filter(r => r.end > r.start),
        conf.minPartitions).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new KafkaLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaLogMicroBatchStream(conf)
}

/** Micro-batch stream with Kafka-scan semantics: admission-controlled
  * `latestOffset`, AvailableNow end-offset snapshot, JSON offsets in the
  * checkpoint, per-range readers. */
private[sources] class KafkaLogMicroBatchStream(conf: LogConf)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** Set once by prepareForTriggerAvailableNow: the drain target. All
    * later latestOffset calls are capped here so the query stops at the
    * snapshot even if produces land mid-drain (Kafka AvailableNow
    * contract). */
  @volatile private var availableNowEnd: Option[Map[Int, Long]] = None

  private def liveEnds(): Map[Int, Long] = KafkaLog.endOffsets(conf.root, conf.topic)
  private def targetEnds(): Map[Int, Long] = availableNowEnd.getOrElse(liveEnds())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(liveEnds())

  override def initialOffset(): Offset = {
    val ends = targetEnds()
    KafkaLogOffset(conf.topic,
      if (conf.startEarliest) ends.map { case (p, _) => p -> 0L } else ends)
  }

  override def getDefaultReadLimit: ReadLimit =
    conf.maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Proportional admission control, like the Kafka scan's
    * `maxOffsetsPerTrigger`: a maxRows budget is split across partitions
    * proportional to lag; a nonzero total lag always admits at least one
    * record so the drain can never stall. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = asMap(start)
    val ends = targetEnds()
    val capped = limit match {
      case r: ReadMaxRows =>
        val lags = ends.map { case (p, e) => p -> math.max(0L, e - startMap.getOrElse(p, 0L)) }
        val total = lags.values.sum
        if (total <= r.maxRows) ends
        else {
          val admitted = lags.map { case (p, lag) =>
            p -> (r.maxRows * lag / total)
          }
          val fixed = if (admitted.values.sum == 0L) {
            // budget smaller than partition count: admit 1 from the
            // first lagging partition (sorted, deterministic)
            val p = lags.toSeq.sortBy(_._1).find(_._2 > 0L).get._1
            admitted.updated(p, 1L)
          } else admitted
          fixed.map { case (p, n) => p -> (startMap.getOrElse(p, 0L) + n) }
        }
      case _: ReadAllAvailable => ends
      case _ => ends
    }
    KafkaLogOffset(conf.topic, capped)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset = KafkaLogOffset(conf.topic, targetEnds())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = asMap(start); val e = asMap(end)
    val ranges = e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s.getOrElse(p, 0L)
      require(startOff <= endOff,
        s"kafka-log offset went backwards on partition $p: $startOff > $endOff " +
          "(segments deleted outside the source?)")
      if (endOff > startOff) Some(LogRange(conf.root, conf.topic, p, startOff, endOff))
      else None
    }
    KafkaLog.splitRanges(ranges, conf.minPartitions).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new KafkaLogReaderFactory

  override def deserializeOffset(json: String): Offset =
    KafkaLogOffset.fromJson(conf.topic, json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def asMap(o: Offset): Map[Int, Long] = o match {
    case k: KafkaLogOffset => k.parts
    case other => KafkaLogOffset.fromJson(conf.topic, other.json()).parts
  }
}

private[sources] class KafkaLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KafkaLogPartitionReader(partition.asInstanceOf[LogRange])
}

/** Streams one offset range off the segment files: walks segments in base
  * order, skips lines below `start`, stops at `end`. Runs on executors;
  * opens one segment at a time. */
private[sources] class KafkaLogPartitionReader(range: LogRange)
    extends PartitionReader[InternalRow] {
  private val segs = KafkaLog.listSegments(
    Paths.get(range.root, range.topic, s"p${range.partition}")).iterator
  private val b64 = Base64.getDecoder
  private val topicUtf8 = UTF8String.fromString(range.topic)
  private var reader: BufferedReader = _
  private var offset: Long = -1L
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line: String = null
    while (line == null) {
      if (reader == null) {
        if (!segs.hasNext) return false
        val (base, path) = segs.next()
        // segment bases are cumulative; a segment wholly before the range
        // still advances the offset cursor via its base
        reader = Files.newBufferedReader(path, UTF_8)
        offset = base
      }
      line = reader.readLine()
      if (line == null) { reader.close(); reader = null }
      else if (offset >= range.end) { reader.close(); reader = null; return false }
      else if (offset < range.start) { offset += 1; line = null }
    }
    val f = line.split('\t')
    val key = if (f(0) == "-") null else b64.decode(f(0))
    row = new GenericInternalRow(Array[Any](
      key, b64.decode(f(1)), topicUtf8, range.partition, offset,
      f(2).toLong * 1000L, 0))
    offset += 1
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
