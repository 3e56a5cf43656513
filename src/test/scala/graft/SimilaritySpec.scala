package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: both approximate variants must (a) score candidates
  * identically to the exact path and (b) retrieve a sane fraction of
  * the true neighbors — approximate in WHICH rows come back, never in
  * the numbers attached to them.
  */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  lazy val brute = asMap(ops.SimilarityOps.simTopK(spark, sf))

  test("IVF ANN: consistent scores + recall floor vs brute force") {
    val ivf = asMap(ops.SimilarityOps.simAnnIvf(spark, sf))
    assert(ivf.nonEmpty)
    ivf.foreach { case (k, v) =>
      brute.get(k).foreach(bv => assert(bv == v, s"score mismatch for $k"))
    }
    val recall = brute.keySet.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.1, s"IVF recall@10 collapsed: $recall")
  }

  test("LSH ANN: consistent scores vs brute force") {
    val lsh = asMap(ops.SimilarityOps.simAnnLsh(spark, sf))
    lsh.foreach { case (k, v) =>
      brute.get(k).foreach(bv => assert(bv == v, s"score mismatch for $k"))
    }
  }
}
