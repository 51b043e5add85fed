package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Column builders over Spark's OWN bloom-filter expressions — the
  * codegen'd internals behind runtime row-level filtering
  * (`InjectRuntimeFilter`), which Spark does not expose as public
  * `functions._` entries. Both sides hash with the same seeded
  * `XxHash64`, so a filter built by [[bloomAgg]] is probed correctly by
  * [[mightContain]].
  *
  * The scale role (see `PipelineOps.bloomDecontaminate`): a bloom built
  * over N keys is a few bits per key REGARDLESS of key width, so a join
  * side too large to broadcast as exact rows still fits as a filter;
  * probing is a map-side expression with no shuffle, no false
  * negatives, and a bounded false-positive rate that a downstream exact
  * join removes. This mirrors what Spark's own runtime filter injects
  * between a dimension filter and a fact scan, made explicit and
  * composable.
  */
object BloomFilters {
  /** Aggregate a column into a serialized bloom filter (binary).
    * `expectedItems`/`numBits` size the filter exactly like
    * `bloom_filter_agg`'s arguments; ~10 bits/item ≈ 1% FP rate.
    * Distributed build: partial filters merge associatively, the driver
    * receives only the final `numBits`-sized array.
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a serialized filter: true if `c` MIGHT be in it (no false
    * negatives). The filter bytes ride the plan as a literal — the same
    * materialized-scalar shape Spark's runtime filter produces from its
    * creation-side subquery; at cluster scale the task binary carries
    * the filter once per executor fetch, not per row.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(c)))))
}
