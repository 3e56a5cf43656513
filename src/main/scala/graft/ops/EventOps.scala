package graft.ops

import graft.{Q, Tables}
import graft.functions.Stable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (batch now; the same
  * transforms run under Structured Streaming in graft.streaming).
  *
  * Absent from the reference (SURVEY §2.2 "Streaming: absent") — these
  * are north-star operators. Windows are epoch-aligned so batch Spark,
  * streaming Spark and the DuckDB oracle all agree on bucket edges.
  */
object EventOps {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** Shared batch/streaming transform: tumbling 1h window per type.
    * Used by q26 (batch) and graft.streaming.StreamingOps (readStream).
    */
  def windowedAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
              col("event_type"), col("n"), col("sum_value"))

  def eventsWindow(s: SparkSession, d: String): DataFrame =
    windowedAgg(ev(s, d)).orderBy("wstart", "event_type")

  private val eventsWindowSql =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
       | event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** Session windows: 10-minute inactivity gap per user. Spark's
    * session_window merges an event into the current session when the
    * gap is <= the gap duration (boundary-inclusive — verified in
    * StreamingSpec), so a new session starts only when the gap is
    * STRICTLY greater — the SQL twin reproduces that with lag +
    * running sum (gaps-and-islands).
    */
  def eventsSession(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
              date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
                .as("session_start"),
              col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  private val eventsSessionSql =
    s"""WITH marked AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
       |           > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
       |  FROM events),
       |sessions AS (
       |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked)
       |SELECT user_id,
       | strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       | COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM sessions GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** JSON prop extraction + aggregation (props is a JSON string). */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  private val jsonExtractSql =
    """SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      | MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- composition: session windows × custom TopKPerKey operator —
  //      each user's single highest-value session. The custom physical
  //      operator consumes the session aggregate directly (bounded
  //      heap per user), where the window formulation would re-sort
  //      every session row. ----
  def topSessionPerUser(s: SparkSession, d: String): DataFrame = {
    val sessions = ev(s, d)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
              date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
                .as("session_start"),
              col("n_events"), col("sum_value"))
    graft.plans.TopKPerKey.topKPerKey(
      sessions,
      keys = Seq(col("user_id")),
      order = Seq(col("sum_value").desc, col("session_start").asc),
      k = 1)
      .orderBy("user_id")
  }

  private val topSessionPerUserSql =
    s"""WITH marked AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
       |           > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
       |  FROM events),
       |sessions AS (
       |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked),
       |agged AS (
       |  SELECT user_id,
       |    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       |    COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
       |  FROM sessions GROUP BY user_id, sid),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id
       |    ORDER BY sum_value DESC, session_start ASC) AS rn
       |  FROM agged)
       |SELECT user_id, session_start, n_events, sum_value
       |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q59_top_session", topSessionPerUser, Some(topSessionPerUserSql),
      "session windows composed with the custom TopKPerKey operator"),
    Q("q26_events_window", eventsWindow, Some(eventsWindowSql),
      "tumbling 1h window agg"),
    Q("q27_events_session", eventsSession, Some(eventsSessionSql),
      "session windows (10 min gap)"),
    Q("q28_json_extract", jsonExtract, Some(jsonExtractSql),
      "JSON prop extraction + agg"))
}
