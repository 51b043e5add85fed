package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for oracle-checkable aggregates.
  *
  * Summing IEEE doubles is order-dependent, and Spark's shuffle order is
  * nondeterministic — a double `sum()` can differ from DuckDB's in the last
  * ulp and fail a hash compare. The testdata's monetary columns carry at most
  * two decimal digits, so casting to decimal BEFORE aggregating makes every
  * sum exact and order-independent; the final cast back to double is then a
  * single deterministic rounding shared by both engines. Decimal aggregation
  * is still map-side-combinable and spill-safe, so this costs nothing at
  * scale.
  */
object Exact {
  /** Exact representation of a <=2-decimal-digit monetary double. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent sum of a 2-decimal column, returned as double. */
  def sumD(c: Column): Column = sum(dec2(c)).cast("double")

  /** SQL fragment mirroring [[sumD]] for the DuckDB oracle. */
  def sumDSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
}
