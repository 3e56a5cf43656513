package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operator: a Spark DataFrame builder plus (when
  * SQL-expressible) a DuckDB oracle twin over the same parquet tables.
  * Column names and row order must agree between the two — every query
  * ends in an explicit total ORDER BY and aliases every computed column
  * identically on both sides.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** All operator groups, in presentation order. */
  def all: Seq[Q] =
    graft.ops.CoreOps.queries ++
      graft.ops.JoinOps.queries ++
      graft.ops.TpchOps.queries ++
      graft.ops.TpchOps2.queries ++
      graft.ops.SurfaceOps.queries ++
      graft.ops.AdvancedOps.queries ++
      graft.ops.IncrementalOps.queries ++
      graft.ops.EventOps.queries ++
      graft.ops.TextOps.queries ++
      graft.ops.DedupOps.queries ++
      graft.ops.PipelineOps.queries ++
      graft.ops.SimilarityOps.queries ++
      graft.ops.MultimodalOps.queries ++
      graft.streaming.StreamingOps.queries
}
