package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed bounded top-k as a typed Aggregator — the scale-correct
  * reduction for nearest-neighbour search.
  *
  * The window formulation (`row_number().over(Window.partitionBy(probe)
  * .orderBy(score))` then `rank <= k`) is correct but shuffles EVERY
  * scored candidate row to one reducer per probe: with 10 probes the
  * reduction runs on 10 tasks no matter how many executors exist, and at
  * 100 TB each task sorts N rows to keep 5. This Aggregator instead does
  * map-side partial aggregation (ObjectHashAggregate): every input
  * partition reduces locally to a ≤k-element buffer per probe, the
  * shuffle moves only those k-row buffers (k × partitions rows per probe,
  * not N), and the final merge is a k-way list merge. Reduction cost is
  * O(N log k) map-side work + O(k · partitions) network — the same plan a
  * hand-written mapPartitions heap would give, expressed as an aggregate
  * so it composes with groupBy and stays AQE-visible.
  *
  * Ordering is ASCENDING (score, id): the caller negates a
  * descending-score metric (cosine) and uses the id as the deterministic
  * tie-break — exactly the (score DESC|ASC, cand_id) total order the
  * window form used, so results are bit-identical. Determinism holds
  * under any partitioning/merge order because the k smallest elements of
  * a strict total order are arrival-order-independent.
  */
object TopK {
  /** One scored candidate. `score` must totally order with `id` as the
    * tie-break; integer scores (e.g. quantized squared distances) convert
    * exactly to Double up to 2^53 — far above the quantized-embedding
    * magnitudes used here (document the bound at the call site if a new
    * metric approaches it).
    */
  case class Scored(score: Double, id: Long)

  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private val ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (s.score, s.id))
    def zero: Seq[Scored] = Vector.empty
    def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = insert(buf, a)
    def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      b2.foldLeft(b1)(insert)
    def finish(r: Seq[Scored]): Seq[Scored] = r // kept sorted ascending
    private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] =
      if (buf.size < k) (buf :+ a).sorted(ord)
      else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
      else buf
    def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Untyped column form: `topK(5)(scoreCol, idCol)` inside a
    * `groupBy(...).agg(...)`; returns array<struct<score,id>> sorted
    * ascending — explode with [[explodeRanked]].
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k))
    (score, id) => fn(score, id)
  }

  /** (rank, score, id) columns from a [[topK]] result column: rank is the
    * 1-based ascending position — identical to the row_number the window
    * form produced.
    */
  def explodeRanked(df: org.apache.spark.sql.DataFrame, tkCol: String,
      keep: Seq[String]): org.apache.spark.sql.DataFrame =
    df.select(keep.map(col) :+ posexplode(col(tkCol)).as(Seq("pos", "s")): _*)
      .select(keep.map(col) :+ (col("pos") + 1).as("rank") :+
        col("s.score").as("score") :+ col("s.id").as("id"): _*)
}
