package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic dense-vector math over ArrayType columns.
  *
  * Everything folds strictly left-to-right so Spark (`zip_with` +
  * `aggregate`) and DuckDB (`list_reduce` over an index range) produce
  * bit-identical IEEE doubles — no tolerance needed in the oracle.
  *
  * Hot-path note (100 TB): these compose built-in higher-order
  * functions, which evaluate per-element through codegen'd lambda
  * machinery. graft.expressions.VecDot is the tight-loop Catalyst
  * expression used by the benchmark-critical paths; it reproduces the
  * exact same left-to-right fold, so swapping it in cannot change
  * results.
  */
object VectorFns {

  /** float[] → double[] (element-wise exact widening). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))
  def toDoubleSql(e: String): String =
    s"list_transform($e, x -> CAST(x AS DOUBLE))"

  /** Left-to-right dot product of two double arrays. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
  def dotFoldSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> ($a)[i] * ($b)[i])), " +
      s"(acc, x) -> acc + x)"

  /** Euclidean norm via the same fold. */
  def norm(v: Column): Column = sqrt(dotFold(v, v))
  def normSql(e: String): String = s"sqrt(${dotFoldSql(e, e)})"
}
