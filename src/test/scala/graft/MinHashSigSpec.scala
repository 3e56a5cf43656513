package graft

import graft.expressions.MinHashSig.minhashSig
import graft.functions.HashFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused MinHash kernel must be indistinguishable from the
  * HOF formulation it replaces — same constants, same arithmetic, same
  * null/empty behavior — in BOTH interpreted and codegen evaluation.
  */
class MinHashSigSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("fused kernel == HOF formulation on random hash arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(60) // includes empty arrays
      (i.toLong, (0 until n).map(_ => math.abs(rnd.nextLong()) % (1L << 60)))
    }
    val df = rows.toDF("id", "hashes")
    val both = df.select(
      col("id"),
      minhashSig(col("hashes")).as("fused"),
      HashFns.minhashSigFromHashes(col("hashes")).as("hof"))
    val mismatches = both.filter(!(col("fused") <=> col("hof")))
    val diff = mismatches.count()
    if (diff != 0) {
      val r = mismatches.head()
      fail(s"$diff mismatches; first: id=${r.getLong(0)} " +
        s"fused=${r.getSeq[Any](1)} hof=${r.getSeq[Any](2)}")
    }
  }

  test("null input propagates; empty array yields all-null signature") {
    val df = Seq((1L, Some(Seq(42L, 7L))), (2L, None), (3L, Some(Seq.empty[Long])))
      .toDF("id", "hashes")
    val out = df.select(col("id"), minhashSig(col("hashes")).as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1)))
      .toMap
    assert(out(2L) == null)
    assert(out(3L).asInstanceOf[Seq[Any]].forall(_ == null))
    assert(out(1L).asInstanceOf[Seq[Any]].length == HashFns.MinhashK)
  }

  test("registered as a SQL function via GraftExtensions") {
    val got = spark.sql(
      "SELECT minhash_sig(array(CAST(12345 AS BIGINT), CAST(67890 AS BIGINT)))")
      .head().getSeq[Long](0)
    val expected = Seq(Seq(12345L, 67890L)).toDF("h")
      .select(HashFns.minhashSigFromHashes(col("h"))).head().getSeq[Long](0)
    assert(got == expected)
  }

  test("whole-stage codegen path agrees with interpreted eval") {
    val df = Seq((1L, Seq(5L, 999999999L, 123L))).toDF("id", "hashes")
    val viaCodegen = df.select(minhashSig(col("hashes"))).head().getSeq[Long](0)
    // force interpreted evaluation
    val saved = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val savedFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(minhashSig(col("hashes"))).head().getSeq[Long](0)
      assert(viaCodegen == interpreted)
    } finally {
      saved.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
      if (saved.isEmpty) spark.conf.unset("spark.sql.codegen.wholeStage")
      savedFactory.foreach(spark.conf.set("spark.sql.codegen.factoryMode", _))
      if (savedFactory.isEmpty) spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
