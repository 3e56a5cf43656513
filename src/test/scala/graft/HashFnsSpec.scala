package graft

import graft.functions.HashFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HashFnsSpec extends AnyFunSuite with SparkTestBase {

  private def scalaHash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("hash64 column == reference md5-prefix implementation") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "the quick brown fox", "ünïcode")
    val got = inputs.toDF("s")
      .select(HashFns.hash64(col("s"))).collect().map(_.getLong(0))
    assert(got.sameElements(inputs.map(scalaHash64)))
  }

  test("shingles: distinct word 3-grams; short docs are empty, not reversed") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x y z x y z").toDF("text")
    val r = df.select(HashFns.shingles(HashFns.tokens(col("text")), 3)).collect()
    assert(r(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty) // guard against sequence(1,0) descent
    assert(r(2).getSeq[String](0).sorted == Seq("x y z", "y z x", "z x y").sorted)
  }

  test("minhash signature: K values inside [0, P)") {
    import spark.implicits._
    val df = Seq("one two three four five six seven").toDF("text")
    val sig = df.select(HashFns.minhashSig(
      HashFns.shingles(HashFns.tokens(col("text")), 3)))
      .head().getSeq[Long](0)
    assert(sig.length == HashFns.MinhashK)
    assert(sig.forall(v => v >= 0 && v < HashFns.MinhashP))
  }

  test("minhash: identical docs share full signature; est jaccard tracks overlap") {
    import spark.implicits._
    val d1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val d2 = d1 // identical
    val d3 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 zz" // near-dup
    val sigs = Seq(d1, d2, d3).toDF("text")
      .select(HashFns.minhashSig(HashFns.shingles(HashFns.tokens(col("text")), 3)))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    val matches = sigs(0).zip(sigs(2)).count { case (a, b) => a == b }
    assert(matches >= HashFns.MinhashK / 2, s"only $matches matches")
  }

  test("simhash chunk pigeonhole: hd<=3 pairs always share a chunk") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val a = rnd.nextLong() & 0xFFFFFFFFL
      // flip up to 3 random bits
      val b = (0 until rnd.nextInt(4)).foldLeft(a)((acc, _) =>
        acc ^ (1L << rnd.nextInt(32)))
      val hd = java.lang.Long.bitCount(a ^ b)
      if (hd <= 3) {
        val shares = (0 until 4).exists(c => ((a >> (c * 8)) & 255) == ((b >> (c * 8)) & 255))
        assert(shares, s"hd=$hd but no shared chunk: $a $b")
      }
    }
  }

  test("polyFingerprint: stable values, order-sensitive") {
    import spark.implicits._
    val r = Seq("abc", "cba", "abc").toDF("s")
      .select(HashFns.polyFingerprint(col("s"))).collect().map(_.getLong(0))
    assert(r(0) == r(2) && r(0) != r(1))
    // reference value: fold of 'a','b','c' = ((97*31+98)*31+99) % 1e9+7
    assert(r(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }
}
