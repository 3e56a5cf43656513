package graft.ops

import graft.{Q, Tables}
import graft.functions.Stable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-flavored analytics beyond Q1/Q3/Q5/Q6/Q10 (JoinOps/CoreOps),
  * adapted to the testdata star schema (TESTDATA.md: no partsupp, no
  * l_commitdate/l_receiptdate/l_shipmode — predicates use the columns
  * that exist). The reference has no joins at all (SURVEY §2.2); this
  * battery exists to exercise the join/agg machinery the way a 100 TB
  * SQL workload would:
  *  - the fact table shuffles at most once per query (single equi-key);
  *  - every dimension is broadcast;
  *  - date/brand/size predicates sit on the scan (PushedFilters), so
  *    partition/row-group pruning does the heavy lifting at scale.
  */
object TpchOps {

  // ---- TPC-H Q7 (volume shipping): cross-nation trade by ship year.
  //      Two broadcast copies of nation alias the supplier and customer
  //      sides; the spec's two-nation OR-pair generalizes to the 5x5
  //      trade matrix minus the diagonal (the pair filter would be
  //      empty at sf0.001). lineitem⋈orders is the one big shuffle. ----
  def tpchQ7(s: SparkSession, d: String): DataFrame = {
    val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(col("n1_key") < 5 && col("n2_key") < 5 &&
              col("n1_key") =!= col("n2_key"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(volume).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val tpchQ7Sql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       | CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       | ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
       | COUNT(*) AS n_items
       |FROM lineitem
       | JOIN orders ON l_orderkey = o_orderkey
       | JOIN supplier ON l_suppkey = s_suppkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN nation n1 ON s_nationkey = n1.n_nationkey
       | JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND n1.n_nationkey < 5 AND n2.n_nationkey < 5
       |  AND n1.n_nationkey <> n2.n_nationkey
       |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---- TPC-H Q14 (promo revenue share): conditional aggregation into
  //      a ratio. The two decimal sums are exact; the final division is
  //      one deterministic double op, then floor(x·1e6) quantization
  //      (Stable caveat: arbitrary computed doubles, not 2-dp money). ----
  def tpchQ14(s: SparkSession, d: String): DataFrame = {
    val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val promo = when(col("p_type") === "PROMO", volume).otherwise(lit(0.0))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(floor(lit(100.0) * dsum(promo) / dsum(volume) * 1e6).cast("long")
             .as("promo_share_q6"),
           count(lit(1)).as("n_items"))
  }

  private val tpchQ14Sql =
    s"""SELECT CAST(floor(100.0 * ${dsumSql(
         "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       |   / ${dsumSql("l_extendedprice * (1 - l_discount)")} * 1e6) AS BIGINT)
       |   AS promo_share_q6,
       | COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin

  // ---- TPC-H Q18 (large-volume customers): HAVING on a grouped fact,
  //      then joins back to orders/customer. The heavy groupBy runs on
  //      (l_orderkey) BEFORE any join — at 100 TB the filter discards
  //      ~all groups, so the join input is tiny; joining first would
  //      shuffle the whole fact table twice. ----
  def tpchQ18(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 120)
    Tables.orders(s, d)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
              col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  private val tpchQ18Sql =
    s"""SELECT c_name, c_custkey, o_orderkey,
       | strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice, sum_qty
       |FROM orders
       | JOIN (SELECT l_orderkey, ${dsumSql("l_quantity")} AS sum_qty
       |       FROM lineitem GROUP BY l_orderkey
       |       HAVING ${dsumSql("l_quantity")} > 120) big
       |   ON o_orderkey = big.l_orderkey
       | JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin

  // ---- TPC-H Q19 (discounted revenue): disjunction of three
  //      brand/size/quantity brackets. One broadcast join; the OR of
  //      ANDed range predicates stays a single scan-level filter —
  //      Catalyst pushes the common l_quantity bounds and the join
  //      condition handles the rest. ----
  private def q19Bracket(brand: String, szLo: Int, szHi: Int,
                         qLo: Int, qHi: Int) =
    col("p_brand") === brand &&
      col("p_size").between(szLo, szHi) &&
      col("l_quantity").between(qLo, qHi)

  def tpchQ19(s: SparkSession, d: String): DataFrame = {
    val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(q19Bracket("Brand#1", 1, 15, 1, 20) ||
              q19Bracket("Brand#2", 10, 30, 10, 30) ||
              q19Bracket("Brand#3", 20, 50, 20, 45))
      .agg(dsum(volume).as("revenue"), count(lit(1)).as("n_items"))
  }

  private val tpchQ19Sql =
    s"""SELECT ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
       | COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |        AND l_quantity BETWEEN 1 AND 20)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       |        AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       |        AND l_quantity BETWEEN 20 AND 45)""".stripMargin

  // ---- TPC-H Q2-flavored (no partsupp in the schema): cheapest
  //      supplier per part, unit cost derived from lineitem. The argmin
  //      is a per-part window top-1 — planned through TopKPerKey by the
  //      rank-pushdown rule — over an aggregated (part, supplier) cost
  //      table, so the window input is |parts|×|suppliers| not |fact|. ----
  def tpchQ2Min(s: SparkSession, d: String): DataFrame = {
    val unitCost = dsum(col("l_extendedprice")) / dsum(col("l_quantity"))
    val costs = Tables.lineitem(s, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(floor(unitCost * 1e6).cast("long").as("cost_q6"))
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("cost_q6").asc, col("l_suppkey").asc)
    costs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_key"), col("s_name"), col("cost_q6"))
      .orderBy("p_key")
      .limit(50)
  }

  private val tpchQ2MinSql =
    s"""WITH costs AS (
       |  SELECT l_partkey, l_suppkey,
       |    CAST(floor(${dsumSql("l_extendedprice")} / ${dsumSql("l_quantity")}
       |      * 1e6) AS BIGINT) AS cost_q6
       |  FROM lineitem GROUP BY l_partkey, l_suppkey),
       |ranked AS (
       |  SELECT l_partkey, l_suppkey, cost_q6, row_number() OVER
       |    (PARTITION BY l_partkey ORDER BY cost_q6 ASC, l_suppkey ASC) AS rn
       |  FROM costs)
       |SELECT l_partkey AS p_key, s_name, cost_q6
       |FROM ranked JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rn = 1 ORDER BY p_key LIMIT 50""".stripMargin

  // ---- TPC-H Q4-flavored (order priority checking): EXISTS with
  //      interval arithmetic — orders with any line shipped more than
  //      60 days after the order date. Semi join = equi key + date
  //      residual; only orderkeys cross the shuffle. ----
  def tpchQ4(s: SparkSession, d: String): DataFrame = {
    val late = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(late,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  private val tpchQ4Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q82_tpch_q7", tpchQ7, Some(tpchQ7Sql),
      "TPC-H Q7: bidirectional nation trade volume by ship year"),
    Q("q83_tpch_q14", tpchQ14, Some(tpchQ14Sql),
      "TPC-H Q14: promo revenue share (conditional agg ratio, quantized)"),
    Q("q84_tpch_q18", tpchQ18, Some(tpchQ18Sql),
      "TPC-H Q18: large-volume customers (group-HAVING before join)"),
    Q("q85_tpch_q19", tpchQ19, Some(tpchQ19Sql),
      "TPC-H Q19: OR-of-brackets brand/size/quantity revenue"),
    Q("q86_tpch_q2min", tpchQ2Min, Some(tpchQ2MinSql),
      "TPC-H Q2-flavored: cheapest supplier per part (windowed argmin)"),
    Q("q87_tpch_q4", tpchQ4, Some(tpchQ4Sql),
      "TPC-H Q4-flavored: EXISTS + interval arithmetic priority counts"))
}
