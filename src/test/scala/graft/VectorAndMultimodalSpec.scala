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

  test("multimodal decode: deterministic metadata, batch plumbing") {
    val rows = Seq(
      Multimodal.MediaRow(1, "image", "abcd".getBytes),
      Multimodal.MediaRow(2, "video", "abcde".getBytes)).toDS()
    val out = Multimodal.decodeMeta(rows).collect().map(r => r.media_id -> r).toMap
    assert(out(1).n_bytes == 4 && out(1).format == "png" && out(1).n_frames == 1)
    assert(out(2).format == "mp4" && out(2).n_frames == 6)
    assert(out(1).width == 64 + 4 % 577)
  }

  test("multimodal stubs: resize and frame sampling") {
    val m = Multimodal.MediaMeta(1000, "png", 640, 480, 24)
    val r = Multimodal.FakeDecoder.resize(m, 320)
    assert(r.width == 320 && r.height == 240)
    assert(Multimodal.FakeDecoder.sampleFrames(m, 6) == Seq(0, 6, 12, 18))
  }
}
