package graft.ops

import graft.{Q, Tables}
import graft.functions.Stable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators: CDC upsert (MERGE emulation) and
  * delta aggregation. Both exist because at 100 TB you cannot afford to
  * recompute the world per batch — you apply a (small) change set to a
  * (huge) snapshot, or merge a (small) delta aggregate into a stored
  * one. The oracle for each is the from-scratch recompute, proving the
  * incremental path is exactly equivalent.
  */
object IncrementalOps {

  // ---- q113: CDC upsert — apply a deterministic change set (updates,
  //      deletes, inserts derived from the order key) onto the orders
  //      snapshot, copy-on-write style. The plan is the canonical MERGE
  //      shape: one equi-join of snapshot x changes on the key (changes
  //      broadcast when small, shuffle otherwise) + a union of inserts;
  //      the snapshot never shuffles twice. Money stays quantized cents
  //      so both engines agree bit-for-bit. ----
  def upsert(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
              floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    // change set: key%10==0 -> update (price +10%), %10==1 -> delete;
    // inserts are fresh keys offset by 10^9 for every key%100==0
    val updates = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .select(col("o_orderkey").as("k"),
              // integer DIV, matching DuckDB's // floor division on
              // non-negative cents (Column./ would be double division)
              expr("price_c + (price_c DIV 10)").cast("long").as("new_price_c"))
    val deletes = orders.filter(pmod(col("o_orderkey"), lit(10)) === 1)
      .select(col("o_orderkey").as("k"))
    val inserts = orders.filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .select((col("o_orderkey") + lit(1000000000L)).as("o_orderkey"),
              lit("N").as("o_orderstatus"),
              lit(9999L).as("price_c"))
    val merged = orders
      .join(broadcast(deletes), col("o_orderkey") === deletes("k"), "left_anti")
      .join(broadcast(updates), col("o_orderkey") === updates("k"), "left")
      .select(col("o_orderkey"), col("o_orderstatus"),
              coalesce(col("new_price_c"), col("price_c")).as("price_c"))
      .unionByName(inserts)
    merged.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
           sum(col("price_c")).as("sum_price_c"),
           sum(col("o_orderkey")).as("key_checksum"))
      .orderBy("o_orderstatus")
  }

  private val upsertSql =
    """WITH o AS (SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c FROM orders),
      |merged AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 10 = 0
      |         THEN price_c + price_c // 10 ELSE price_c END AS price_c
      |  FROM o WHERE o_orderkey % 10 <> 1
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000, 'N', 9999 FROM o
      |  WHERE o_orderkey % 100 = 0)
      |SELECT o_orderstatus, COUNT(*) AS n,
      | CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
      | CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
      |FROM merged GROUP BY 1 ORDER BY o_orderstatus""".stripMargin

  // ---- q114: incremental aggregate maintenance — the "stored" partial
  //      aggregate over the old partition plus the delta partition's
  //      partial aggregate, merged by key, must equal the from-scratch
  //      recompute (which IS the oracle). This only holds because
  //      [[Stable]] sums are decimal-exact and associative — IEEE
  //      double partials would drift from the recompute. The merge is a
  //      union of two tiny aggregates + re-aggregate: the 100 TB shape
  //      for rolling daily -> monthly rollups. ----
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1999-01-01").cast("timestamp")
    val Dec = org.apache.spark.sql.types.DecimalType(18, 6)
    // partials stay DECIMAL end-to-end: casting each partial to double
    // and re-summing could drift an ulp from the oracle's single
    // decimal-sum-then-cast — exactness must survive the merge
    def partial(df: DataFrame): DataFrame = df
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast(Dec)).as("qty_dec"),
           sum(col("l_extendedprice").cast(Dec)).as("price_dec"))
    val li = Tables.lineitem(s, d)
    val old = partial(li.filter(col("l_shipdate") < cut))
    val delta = partial(li.filter(col("l_shipdate") >= cut))
    old.unionByName(delta)
      .groupBy("l_returnflag")
      .agg(sum(col("n")).as("n"),
           sum(col("qty_dec")).cast("double").as("sum_qty"),
           sum(col("price_dec")).cast("double").as("sum_price"))
      .orderBy("l_returnflag")
  }

  private val incrementalAggSql =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       | ${dsumSql("l_quantity")} AS sum_qty,
       | ${dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // ---- q122: TPC-H refresh-stream analogue (RF1 inserts / RF2
  //      deletes, VERDICT r3 #6) — the sustained-writes story. B
  //      deterministic refresh batches are applied SEQUENTIALLY to the
  //      orders snapshot: batch b anti-joins away original keys with
  //      key % 97 == b and unions in fresh rows (key + b*10^10) derived
  //      from originals with key % 101 == b. Each commit is
  //      localCheckpoint(true) — the copy-on-write commit analogue; it
  //      truncates lineage so batch N's plan does not embed batches
  //      1..N-1 (same rule as dedupClusters). Delete keys only ever
  //      target the original key space (inserted keys live above 10^10),
  //      so the final state has a CLOSED FORM the oracle recomputes from
  //      scratch: originals surviving all B deletes + all B insert sets.
  //      Equality proves the incremental maintenance loop lands exactly
  //      on the recompute — TPC-H's ACID/refresh consistency condition.
  //      At 100 TB each batch is one broadcast anti-join + union over
  //      the snapshot, no shuffle of the big side; the checkpoint is the
  //      table-format commit a lakehouse would do. ----
  val RefreshBatches = 5
  private val InsertKeyOffset = 10000000000L

  def refreshStream(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
              floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    var snap = base
    for (b <- 1 to RefreshBatches) {
      val deletes = base
        .filter(pmod(col("o_orderkey"), lit(97)) === b)
        .select(col("o_orderkey").as("k"))
      val inserts = base
        .filter(pmod(col("o_orderkey"), lit(101)) === b)
        .select((col("o_orderkey") + lit(b * InsertKeyOffset)).as("o_orderkey"),
                lit("N").as("o_orderstatus"),
                (col("price_c") + lit(b.toLong)).as("price_c"))
      snap = snap
        .join(broadcast(deletes), snap("o_orderkey") === deletes("k"), "left_anti")
        .unionByName(inserts)
        .localCheckpoint(true)
    }
    snap.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
           sum(col("price_c")).as("sum_price_c"),
           sum(col("o_orderkey")).as("key_checksum"))
      .orderBy("o_orderstatus")
  }

  private val refreshStreamSql =
    s"""WITH o AS (SELECT o_orderkey, o_orderstatus,
       |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c FROM orders),
       |fin AS (
       |  SELECT o_orderkey, o_orderstatus, price_c FROM o
       |  WHERE o_orderkey % 97 NOT BETWEEN 1 AND $RefreshBatches
       |  UNION ALL
       |  SELECT o_orderkey + (o_orderkey % 101) * $InsertKeyOffset, 'N',
       |         price_c + (o_orderkey % 101)
       |  FROM o WHERE o_orderkey % 101 BETWEEN 1 AND $RefreshBatches)
       |SELECT o_orderstatus, COUNT(*) AS n,
       | CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
       | CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
       |FROM fin GROUP BY 1 ORDER BY o_orderstatus""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q113_upsert", upsert, Some(upsertSql),
      "CDC upsert (MERGE emulation): anti-join deletes, coalesce updates, union inserts"),
    Q("q114_incremental_agg", incrementalAgg, Some(incrementalAggSql),
      "incremental aggregate maintenance: old partial + delta == full recompute"),
    Q("q122_refresh_stream", refreshStream, Some(refreshStreamSql),
      "TPC-H RF1/RF2 refresh loop: B sequential merge commits == closed-form recompute"))
}
