package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric aggregation.
  *
  * Summing IEEE doubles is order-dependent, and both Spark (shuffle merge
  * order) and DuckDB (parallel aggregation) are free to reorder partial
  * aggregates — so `SUM(double)` is not reproducible bit-for-bit, and
  * rounding the result is a coin flip near the rounding boundary.
  *
  * Fix: cast each input value to DECIMAL(18,6) *before* aggregating.
  * Decimal addition is exact and associative, so the sum is identical in
  * any order and in any engine; casting the exact decimal result back to
  * DOUBLE is a single deterministic rounding. Per-row double arithmetic
  * (e.g. `price * (1 - discount)`) stays in double — IEEE ops on the same
  * inputs give bit-identical results everywhere — only the *aggregation*
  * crosses to decimal.
  *
  * Each Column helper has a `Sql` twin that renders the same computation
  * as DuckDB SQL, so SparkEntry.oracleSql is generated from one source of
  * truth.
  */
object Stable {
  private val Dec = DecimalType(18, 6)
  // Caveat (found via q49): the double->DECIMAL cast itself can round
  // differently across engines when a value sits at a .xxxxxx5
  // boundary. Harmless for inputs with <= 2 real decimal places (all
  // TPC-H measures), but for ARBITRARY doubles (computed scores),
  // quantize with floor(x*1e6) into integer arithmetic instead —
  // see TextOps.cleanCorpus.

  /** Exact sum: decimal-stabilized, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"

  /** Exact mean: exact decimal sum divided by count, in double. */
  def dmean(c: Column): Column = (dsum(c) / count(c)).cast("double")
  def dmeanSql(e: String): String =
    s"(${dsumSql(e)} / COUNT($e))"

  /** Sample variance / stddev from exact sums:
    * var = (sumsq - sum^2/n) / (n-1), all terms deterministic doubles.
    */
  def dvar(c: Column): Column = {
    val n = count(c).cast("double")
    val s = dsum(c)
    val s2 = dsum(c * c)
    ((s2 - (s * s) / n) / (n - lit(1.0))).cast("double")
  }
  def dvarSql(e: String): String = {
    val n = s"CAST(COUNT($e) AS DOUBLE)"
    val s = dsumSql(e)
    val s2 = dsumSql(s"($e) * ($e)")
    s"(($s2 - ($s * $s) / $n) / ($n - 1.0))"
  }
}
