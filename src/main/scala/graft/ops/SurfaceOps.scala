package graft.ops

import graft.{Q, Tables}
import graft.functions.HashFns._
import graft.functions.Stable._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-surface batteries: function families a user switching engines
  * expects to keep — full window-function set, GROUPING SETS, date and
  * string function batteries — plus data-layout/sampling operators that
  * only matter at scale (Z-order clustering, deterministic stratified
  * sampling, sliding event windows).
  *
  * The reference exercises none of these (SURVEY §2.2 lists windows,
  * set ops, date/string scalar functions as absent); they are
  * north-star surface. Cross-engine rules are the house ones: total
  * ORDER BY, BIGINT for rank/count outputs, floor(x*1e6) quantization
  * for computed doubles, date_format/strftime string rendering.
  */
object SurfaceOps {

  // ---- q88: window-function battery. One pass over a bounded slice
  //      of lineitem evaluates the full window family: offsets
  //      (lag/lead), frame-bounded first/last_value, ranking
  //      (dense_rank/percent_rank/ntile). Two logical windows share the
  //      (l_orderkey) partitioning, so Spark plans ONE exchange + two
  //      sorts — at scale the shuffle dominates and is paid once. ----
  def windowBattery(s: SparkSession, d: String): DataFrame = {
    val byLine = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber").asc)
    val fullFrame = byLine
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byQty = Window.partitionBy("l_orderkey")
      .orderBy(col("l_quantity").desc, col("l_linenumber").asc)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              lag(col("l_quantity"), 1).over(byLine).as("prev_qty"),
              lead(col("l_quantity"), 1).over(byLine).as("next_qty"),
              first(col("l_extendedprice")).over(fullFrame).as("first_price"),
              last(col("l_extendedprice")).over(fullFrame).as("last_price"),
              dense_rank().over(byQty).cast("long").as("qty_drnk"),
              percent_rank().over(byQty).as("qty_prank"),
              ntile(3).over(byLine).cast("long").as("tile"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val windowBatterySql =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      | lag(l_quantity, 1) OVER bl AS prev_qty,
      | lead(l_quantity, 1) OVER bl AS next_qty,
      | first_value(l_extendedprice) OVER bf AS first_price,
      | last_value(l_extendedprice) OVER bf AS last_price,
      | CAST(dense_rank() OVER bq AS BIGINT) AS qty_drnk,
      | percent_rank() OVER bq AS qty_prank,
      | CAST(ntile(3) OVER bl AS BIGINT) AS tile
      |FROM lineitem WHERE l_orderkey < 300
      |WINDOW
      | bl AS (PARTITION BY l_orderkey ORDER BY l_linenumber ASC),
      | bf AS (PARTITION BY l_orderkey ORDER BY l_linenumber ASC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      | bq AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber ASC)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- q89: GROUPING SETS with grouping-id disambiguation — the
  //      general form of q25's rollup / q43's cube. ONE shared SQL text
  //      runs through spark.sql AND DuckDB (q80 trick): the surface
  //      users actually type, planned by Spark into a single Expand +
  //      hash aggregate. ----
  private def groupingSetsText(table: String): String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
       | COALESCE(l_linestatus, 'ALL') AS lstat,
       | CAST(GROUPING(l_returnflag) AS BIGINT) * 2
       |   + CAST(GROUPING(l_linestatus) AS BIGINT) AS gid,
       | COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
       |FROM $table
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
       |                        (l_returnflag), ())
       |ORDER BY gid, rflag, lstat""".stripMargin

  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(groupingSetsText("lineitem_gs"))
  }

  // ---- q90: date/time battery over orders — truncation, extraction,
  //      end-of-month, interval shift. Group-by month keeps the output
  //      bounded at any scale; all date outputs render as strings so
  //      both engines hash identical bytes. ----
  def dateBattery(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
                 .as("mon"),
               quarter(col("o_orderdate")).cast("long").as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("sum_price"),
           date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_order"),
           date_format(last_day(min(col("o_orderdate"))), "yyyy-MM-dd").as("eom"),
           date_format(min(col("o_orderdate")) + expr("INTERVAL 1 MONTH"),
                       "yyyy-MM-dd").as("next_month"))
      .orderBy("mon")

  private val dateBatterySql =
    s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon,
       | CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
       | COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS sum_price,
       | strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
       | strftime(last_day(CAST(MIN(o_orderdate) AS DATE)), '%Y-%m-%d') AS eom,
       | strftime(MIN(o_orderdate) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month
       |FROM orders GROUP BY 1, 2 ORDER BY mon""".stripMargin

  // ---- q91: string-function battery over customer names: case,
  //      substring, pad, reverse, replace, split, edit distance,
  //      search, translate. Pure per-row codegen'd expressions. ----
  def stringBattery(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey"),
              upper(col("c_name")).as("up"),
              substring(col("c_name"), 1, 10).as("sub10"),
              lpad(col("c_custkey").cast("string"), 8, "0").as("pad8"),
              reverse(col("c_name")).as("rev"),
              regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
              element_at(split(col("c_name"), "#"), 2).as("num_part"),
              levenshtein(col("c_name"), lit("Customer#000000000")).cast("long")
                .as("lev"),
              instr(col("c_name"), "#").cast("long").as("hash_pos"),
              translate(col("c_name"), "Cu0", "Kv9").as("trans"))
      .orderBy("c_custkey")

  private val stringBatterySql =
    """SELECT c_custkey, upper(c_name) AS up,
      | substr(c_name, 1, 10) AS sub10,
      | lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad8,
      | reverse(c_name) AS rev,
      | regexp_replace(c_name, 'Customer', 'Cust', 'g') AS short_name,
      | string_split(c_name, '#')[2] AS num_part,
      | CAST(levenshtein(c_name, 'Customer#000000000') AS BIGINT) AS lev,
      | CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
      | translate(c_name, 'Cu0', 'Kv9') AS trans
      |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin

  // ---- q92: Z-order (Morton) clustering demo — the data-layout
  //      primitive behind multi-column file skipping. Interleaving the
  //      bits of (partkey, suppkey) and bucketing the curve gives every
  //      bucket a tight bounding box in BOTH dimensions (the per-bucket
  //      min/max output IS the demonstration): a z-sorted 100 TB table
  //      prunes on two columns at once where a lexicographic sort
  //      prunes on one. Pure integer bit arithmetic, identical in both
  //      engines. ----
  private val ZBits = 8
  private def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1)).cast("long")
    }.reduce(_ + _)
  private def zValueSql(xE: String, yE: String): String =
    (0 until ZBits)
      .map(i => s"((($xE >> $i) & 1) << ${2 * i}) + ((($yE >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")

  def zorderCluster(s: SparkSession, d: String): DataFrame = {
    val x = col("l_partkey") % 256
    val y = col("l_suppkey") % 256
    Tables.lineitem(s, d)
      .select(x.as("x"), y.as("y"))
      .withColumn("z", zValue(col("x"), col("y")))
      // top 6 bits of the 16-bit curve → 64 "files"
      .withColumn("bucket", shiftright(col("z"), 10).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
           min(col("x")).as("x_min"), max(col("x")).as("x_max"),
           min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy("bucket")
  }

  private val zorderClusterSql = {
    val z = zValueSql("(l_partkey % 256)", "(l_suppkey % 256)")
    s"""WITH zed AS (SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y,
       |  $z AS z FROM lineitem)
       |SELECT CAST(z >> 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
       | MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
       |FROM zed GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  // ---- q93: deterministic stratified sampling — ~10% per stratum by
  //      md5-hash bucket, never rand() (the q68 rule: membership is a
  //      pure function of the key, stable under resume/re-partition/
  //      scale-out). The id_checksum proves both engines selected the
  //      IDENTICAL sample, not just equal counts. ----
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(hash64(concat(lit("samp:"), col("c_custkey").cast("string"))),
                      lit(100))
    Tables.customer(s, d)
      .filter(bucket < 10)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_sample"),
           dsum(col("c_acctbal")).as("sum_bal"),
           sum(col("c_custkey")).as("id_checksum"))
      .orderBy("c_mktsegment")
  }

  private val stratifiedSampleSql = {
    val bucket = s"((${hash64Sql("'samp:' || CAST(c_custkey AS VARCHAR)")} % 100) + 100) % 100"
    s"""SELECT c_mktsegment, COUNT(*) AS n_sample,
       | ${dsumSql("c_acctbal")} AS sum_bal,
       | CAST(SUM(c_custkey) AS BIGINT) AS id_checksum
       |FROM customer WHERE $bucket < 10
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  }

  // ---- q94: sliding (hopping) event windows — 10-minute windows every
  //      5 minutes, so each event lands in exactly two windows. Spark's
  //      window() expands map-side (no self-join); the twin derives the
  //      same two epoch-aligned starts per event arithmetically. Same
  //      shape streams under readStream + watermark (q41's tumbling
  //      variant). ----
  def slidingWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
              col("event_type"), col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")

  private val slidingWindowsSql =
    s"""WITH b AS (SELECT *,
       |  make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS w0
       |  FROM events),
       |expanded AS (
       |  SELECT event_type, value, w0 AS ws FROM b
       |  UNION ALL
       |  SELECT event_type, value, w0 - INTERVAL 5 MINUTE AS ws FROM b),
       |in_win AS (SELECT * FROM expanded)
       |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
       | COUNT(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM in_win GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q88_window_battery", windowBattery, Some(windowBatterySql),
      "full window-function family: lag/lead, frames, ranks, ntile"),
    Q("q89_grouping_sets", groupingSets, Some(groupingSetsText("lineitem")),
      "GROUPING SETS + grouping-id (shared SQL text, q80 trick)"),
    Q("q90_date_battery", dateBattery, Some(dateBatterySql),
      "date functions: trunc, extract, last_day, interval shift"),
    Q("q91_string_battery", stringBattery, Some(stringBatterySql),
      "string functions: case/substr/pad/split/levenshtein/translate"),
    Q("q92_zorder", zorderCluster, Some(zorderClusterSql),
      "Z-order curve bucketing: 2-D min/max tightness per bucket"),
    Q("q93_stratified_sample", stratifiedSample, Some(stratifiedSampleSql),
      "deterministic hash-stratified ~10% sample with id checksum"),
    Q("q94_sliding_windows", slidingWindows, Some(slidingWindowsSql),
      "hopping 10min/5min windows (each event in two windows)"))
}
