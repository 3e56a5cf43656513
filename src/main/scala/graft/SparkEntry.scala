package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are derived from [[Registry]]: one entry per
  * implemented operator from SURVEY.md §2 (plus joins, events, text,
  * dedup, similarity, multimodal extensions). Every oracle-checked query
  * is deterministic: total ORDER BY, decimal-stabilized double aggs
  * (graft.functions.Stable), no bare first().
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * scan→filter→groupBy→mean→sort over lineitem (SURVEY §7.2).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.CoreOps.scanAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
