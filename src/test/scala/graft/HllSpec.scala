package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q162 HLL properties:
  *  1. registers match an independent driver-side recomputation (md5
  *     hash, register pick, trailing-zero rank, min-contribution
  *     encoding) exactly — via the emitted checksum and S sum;
  *  2. the merge law that makes the sketch usable at 100 TB: registers
  *     built on two disjoint shards and merged with MIN equal the
  *     registers built in one pass (and re-merging is idempotent);
  *  3. the estimate honors the 30% envelope against the exact distinct
  *     count (emitted as a column, asserted here).
  */
class HllSpec extends AnyFunSuite with SparkTestBase {

  private val M = 64L
  private val Cap = 40

  private def hash60(s: String): Long = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    val hex = mdig.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def contribution(w: Long): Long = {
    val t = w & -w
    val tz = if (t == 0) Cap - 1 else java.lang.Long.numberOfTrailingZeros(t)
    1L << math.max(Cap - 1 - math.min(tz, Cap - 1), 0)
  }

  test("q162 registers match a driver-side recomputation exactly") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val regs = rows.groupBy(_._1).map { case (g, vs) =>
      val byReg = vs.map(_._2).distinct.map { k =>
        val h = hash60(s"hll_$k")
        (h % M, contribution(h / M))
      }.groupBy(_._1).map { case (r, cs) => (r, cs.map(_._2).min) }
      (g, byReg)
    }
    val got = ops.AdvancedOps.hllSketch(spark, sf).collect()
    assert(got.length == regs.size)
    got.foreach { r =>
      val g = r.getString(0)
      val exp = regs(g)
      assert(r.getLong(1) == exp.size.toLong, s"$g n_regs")
      val sSum = exp.values.sum + (M - exp.size) * (1L << Cap)
      assert(r.getLong(2) == sSum, s"$g s_sum")
      val ck = exp.map { case (reg, c) => reg * (1L << (Cap + 1)) + c }.sum
      assert(r.getLong(3) == ck, s"$g reg_checksum")
      assert(r.getBoolean(6), s"$g estimate ${r.getLong(4)} outside 30% of ${r.getLong(5)}")
    }
  }

  test("registers built on shards and MIN-merged equal the one-pass build") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("grp"), col("l_orderkey").as("k"))
    def regsOf(df: org.apache.spark.sql.DataFrame) = {
      val caseArms = (0 until Cap - 1)
        .map(k => s"WHEN ${1L << k} THEN ${1L << (Cap - 1 - k)}").mkString(" ")
      df.withColumn("h",
          graft.functions.HashFns.hash64(concat(lit("hll_"), col("k").cast("string"))))
        .withColumn("reg", expr(s"h % $M"))
        .withColumn("cv", expr(s"CASE ((h div $M) & -(h div $M)) $caseArms ELSE 1 END"))
        .groupBy("grp", "reg").agg(min(col("cv")).as("c"))
    }
    val full = regsOf(li).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val a = regsOf(li.filter(col("k") % 2 === 0))
    val b = regsOf(li.filter(col("k") % 2 =!= 0))
    val merged = a.unionByName(b).groupBy("grp", "reg").agg(min(col("c")).as("c"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged == full, "shard-merged registers differ from one-pass registers")
    // idempotence: merging the full registers with themselves is a no-op
    val self = regsOf(li).unionByName(regsOf(li))
      .groupBy("grp", "reg").agg(min(col("c")).as("c"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(self == full)
  }
}
