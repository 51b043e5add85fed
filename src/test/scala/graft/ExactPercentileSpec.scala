package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins `Profiling.exactPercentiles` (the scale-safe per-value-count
  * formulation behind q32/q35) to Spark's own `percentile` aggregate,
  * BIT-FOR-BIT on the output doubles: the helper replaced the built-in,
  * so any divergence — selection off by one, interpolation in a
  * different IEEE order, a tie or block-boundary slip — must fail here,
  * not surface as an oracle hash flake later.
  *
  * The generator is boundary-adversarial on the decomposition's axes:
  * heavy ties (few distinct values), values straddling the 1024-wide
  * prefix-sum block boundary, single-element groups (p·(n−1) = 0 for
  * every p), and exact-integer ranks (frac = 0 path). Raw ScalaCheck
  * with fixed seeds, same idiom as PropertySpec.
  */
class ExactPercentileSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val ps = Seq("p0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5,
    "p66" -> 2.0 / 3.0, "p75" -> 0.75, "p100" -> 1.0)

  private def assertMatches(rows: Seq[(String, Double)]): Unit = {
    val df = rows.toDF("g", "v")
    val exact = graft.queries.Profiling
      .exactPercentiles(df, "g", "v", ps)
      .collect().map(r => r.getString(0) ->
        ps.map { case (nm, _) => r.getAs[Double](nm) }).toMap
    val builtin = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(ps.head._2)).as(ps.head._1),
        ps.tail.map { case (nm, p) =>
          percentile(col("v"), lit(p)).as(nm) }: _*)
      .collect().map(r => r.getString(0) ->
        ps.map { case (nm, _) => r.getAs[Double](nm) }).toMap
    assert(exact.keySet == builtin.keySet, s"group sets differ on $rows")
    exact.keySet.foreach { k =>
      exact(k).zip(builtin(k)).zip(ps).foreach { case ((a, b), (nm, _)) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b),
          s"group $k $nm: exact=$a builtin=$b rows=$rows")
      }
    }
  }

  // values cluster around the 1024 block boundary and repeat heavily
  private val valueGen: Gen[Double] = Gen.frequency(
    5 -> Gen.chooseNum(1015.0, 1033.0).map(v => math.rint(v * 4) / 4),
    3 -> Gen.oneOf(0.0, 1.0, 1023.75, 1024.0, 1024.25, 4096.0),
    2 -> Gen.chooseNum(0.0, 5000.0).map(v => math.rint(v * 100) / 100))

  private val rowsGen: Gen[List[(String, Double)]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), valueGen)))

  test("exactPercentiles == built-in percentile on adversarial groups") {
    (1L to 40L).foreach(seed => assertMatches(sample(rowsGen, seed)))
  }

  test("single-row group and all-ties group") {
    assertMatches(Seq("a" -> 7.25))
    assertMatches(Seq.fill(10)("b" -> 1024.0))
  }

  test("multi-measure form: measures stay isolated per kind") {
    (100L to 110L).foreach { seed =>
      val rows = sample(rowsGen, seed).zipWithIndex.map { case ((g, v), i) =>
        (g, v, v * 3 + i % 7) // second measure deliberately different
      }
      val df = rows.toDF("g", "v", "w")
      val multi = graft.queries.Profiling.exactPercentilesMulti(df, "g",
        Seq("v" -> Seq("v50" -> 0.5, "v75" -> 0.75),
          "w" -> Seq("w25" -> 0.25, "w50" -> 0.5)))
        .collect().map(r => r.getString(0) -> Seq(
          r.getAs[Double]("v50"), r.getAs[Double]("v75"),
          r.getAs[Double]("w25"), r.getAs[Double]("w50"))).toMap
      val builtin = df.groupBy(col("g"))
        .agg(percentile(col("v"), lit(0.5)).as("v50"),
          percentile(col("v"), lit(0.75)).as("v75"),
          percentile(col("w"), lit(0.25)).as("w25"),
          percentile(col("w"), lit(0.5)).as("w50"))
        .collect().map(r => r.getString(0) -> Seq(
          r.getAs[Double]("v50"), r.getAs[Double]("v75"),
          r.getAs[Double]("w25"), r.getAs[Double]("w50"))).toMap
      assert(multi == builtin, s"seed $seed: $multi vs $builtin")
    }
  }

  test("negative values cross block zero with floor semantics") {
    assertMatches(Seq("a" -> -3000.5, "a" -> -1024.0, "a" -> -0.25,
      "a" -> 0.0, "a" -> 0.25, "a" -> 1024.0))
  }

  test("property: NULLs interleaved with boundary-adversarial values " +
      "(built-in parity, 20 seeds)") {
    // the zero-count carrier rows must not perturb ranks when a group
    // mixes NULLs with ties and block-boundary values
    val nullableRows: Gen[List[(String, java.lang.Double)]] =
      Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.oneOf("a", "b", "c"), Gen.frequency(
          2 -> Gen.const(null: java.lang.Double),
          8 -> valueGen.map(java.lang.Double.valueOf)))))
    (200L to 219L).foreach { seed =>
      val rows = sample(nullableRows, seed)
      val df = rows.toDF("g", "v")
      def grab(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getString(0) ->
          ps.map { case (nm, _) =>
            Option(r.getAs[java.lang.Double](nm))
              .map(java.lang.Double.doubleToLongBits(_)) }).toMap
      val exact = grab(graft.queries.Profiling
        .exactPercentiles(df, "g", "v", ps))
      val builtin = grab(df.groupBy(col("g"))
        .agg(percentile(col("v"), lit(ps.head._2)).as(ps.head._1),
          ps.tail.map { case (nm, p) =>
            percentile(col("v"), lit(p)).as(nm) }: _*))
      assert(exact == builtin, s"seed $seed rows=$rows")
    }
  }

  test("NULL group KEY keeps its group (built-in parity)") {
    // groupBy retains a NULL-keyed group; the helper's internal join on
    // the group key must be null-safe or the null group silently
    // vanishes where the built-in emits it
    val rows: Seq[(String, java.lang.Double)] = Seq(
      (null, 1.0), (null, 1024.25), (null, 3.0), (null, null),
      ("a", 2.0), ("a", 7.5))
    val df = rows.toDF("g", "v")
    def grab(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => Option(r.getString(0)) ->
        ps.map { case (nm, _) =>
          Option(r.getAs[java.lang.Double](nm))
            .map(java.lang.Double.doubleToLongBits(_)) }).toMap
    val exact = grab(graft.queries.Profiling.exactPercentiles(df, "g", "v", ps))
    val builtin = grab(df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(ps.head._2)).as(ps.head._1),
        ps.tail.map { case (nm, p) =>
          percentile(col("v"), lit(p)).as(nm) }: _*))
    assert(exact.keySet == Set(None, Some("a")),
      s"null group lost: ${exact.keySet}")
    assert(exact == builtin, s"$exact vs $builtin")
  }

  test("NaN sorts greatest; infinities saturate their sentinel blocks " +
      "(built-in parity)") {
    assertMatches(Seq("a" -> Double.NaN))
    assertMatches(Seq("a" -> 1.0, "a" -> Double.NaN, "a" -> 2.0))
    assertMatches(Seq("a" -> Double.NaN, "a" -> Double.NaN, "a" -> 5.0,
      "b" -> 3.0))
    // +-huge doubles saturate the long block cast at MinValue/MaxValue,
    // sharing the NULL-carrier / NaN sentinel blocks - ordering within
    // a shared block is still by value, so ranks stay exact
    assertMatches(Seq("a" -> Double.NegativeInfinity, "a" -> -1e300,
      "a" -> 0.0, "a" -> 1e300, "a" -> Double.PositiveInfinity,
      "a" -> Double.NaN))
  }

  test("-0.0 normalizes to 0.0 (documented, deliberate divergence " +
      "from the built-in)") {
    // Spark's float-key grouping collapses -0.0 with 0.0; the helper
    // makes that explicit (`vd + 0.0`), so p0 of {-0.0, 1.0} is +0.0
    // here while the built-in's counts map keeps -0.0 distinct and
    // returns -0.0. Pin BOTH sides so the accepted difference stays
    // visible instead of re-surfacing as a parity surprise.
    val df = Seq("a" -> -0.0, "a" -> 1.0).toDF("g", "v")
    val exact = graft.queries.Profiling
      .exactPercentiles(df, "g", "v", Seq("p0" -> 0.0))
      .collect().head.getAs[Double]("p0")
    assert(java.lang.Double.doubleToLongBits(exact) ==
      java.lang.Double.doubleToLongBits(0.0),
      s"exact p0 should normalize -0.0 to +0.0, got $exact " +
        s"(bits ${java.lang.Double.doubleToLongBits(exact)})")
    val builtin = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.0)).as("p0"))
      .collect().head.getAs[Double]("p0")
    assert(java.lang.Double.doubleToLongBits(builtin) ==
      java.lang.Double.doubleToLongBits(-0.0),
      "built-in percentile no longer keeps -0.0 distinct — revisit " +
        "the documented divergence (it may have closed)")
  }

  test("continuous wide-range measure trips the loud block-count " +
      "guard instead of bloating the broadcast") {
    // one group, every value in its own 1024-wide block: blocks/group
    // = rows > pctMaxBlocksPerGroup. The guard must throw with the
    // percentile_approx redirect DURING computation — never silently
    // build a 70k-row broadcast frame for a domain the doc excludes.
    val n = graft.queries.Profiling.pctMaxBlocksPerGroup + 16
    val wide = spark.range(n)
      .select(lit("g").as("g"), (col("id") * 1024.0).as("v"))
    val ex = intercept[Exception] {
      graft.queries.Profiling
        .exactPercentiles(wide, "g", "v", Seq("p50" -> 0.5))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        String.valueOf(e.getMessage) +: messages(e.getCause))
    assert(messages(ex).exists(_.contains("percentile_approx")),
      "guard failure lost its percentile_approx redirect: " +
        messages(ex).mkString(" | "))
  }

  test("NULLs ignored; all-NULL group still emits its row, with NULL " +
      "percentiles (built-in parity)") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("a", 1.0), ("a", null), ("a", 3.0), ("a", 1024.25),
      ("b", null), ("b", null), // every value NULL — must NOT vanish
      ("c", 7.5))
    val df = rows.toDF("g", "v")
    def grab(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ps.map { case (nm, _) =>
          Option(r.getAs[java.lang.Double](nm))
            .map(x => java.lang.Double.doubleToLongBits(x)) }).toMap
    val exact = grab(graft.queries.Profiling.exactPercentiles(df, "g", "v", ps))
    val builtin = grab(df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(ps.head._2)).as(ps.head._1),
        ps.tail.map { case (nm, p) =>
          percentile(col("v"), lit(p)).as(nm) }: _*))
    assert(exact.keySet == Set("a", "b", "c"),
      s"group set wrong: ${exact.keySet}")
    assert(exact == builtin, s"$exact vs $builtin")
  }
}
