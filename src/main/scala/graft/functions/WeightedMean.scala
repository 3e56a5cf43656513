package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (the user-facing UDAF surface): quantity-weighted
  * mean, e.g. the effective discount rate weighted by line quantity.
  *
  * Exactness: the buffer holds floor-quantized integer sums (x*w and w
  * at 1e-6 resolution), so merging is associative/exact in any shuffle
  * order and the DuckDB twin can reproduce the value bit-for-bit —
  * the same reason Stable uses decimals. A double-summing buffer would
  * be order-dependent and unverifiable.
  *
  * Cost note: Aggregator plans as ObjectHashAggregate (no whole-stage
  * codegen). For hot paths prefer the expression form
  * (Stable.dsum ratio) — this exists to exercise/document the typed
  * UDAF API the way a library user would extend the engine.
  */
class WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {
  private val Q = 1000000.0

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (x, w) = in
    (b._1 + math.floor(x * w * Q).toLong, b._2 + math.floor(w * Q).toLong)
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) 0.0 else b._1.toDouble / b._2.toDouble

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedMean {
  /** SQL twin of the same quantized arithmetic. */
  def sql(x: String, w: String): String =
    s"(CASE WHEN SUM(CAST(floor(($w) * 1000000.0) AS BIGINT)) = 0 THEN 0.0 ELSE " +
      s"CAST(SUM(CAST(floor(($x) * ($w) * 1000000.0) AS BIGINT)) AS DOUBLE)" +
      s" / CAST(SUM(CAST(floor(($w) * 1000000.0) AS BIGINT)) AS DOUBLE) END)"
}
