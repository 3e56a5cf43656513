package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashFns._

/** Fence for the hot-bucket bound (HashFns.BandBucketCap): no (band,
  * key) bucket may contribute O(m²) candidate pairs to any banded
  * pair join. Three layers: the cap primitive itself, the per-bucket
  * pair-contribution bound + rep-connectivity invariant, and the
  * end-to-end linearity of the q221 skew lane's candidate volume in
  * the injected cluster size (vs the provably quadratic uncapped
  * counterfactual computed alongside it).
  */
class BandBucketCapSpec extends AnyFunSuite with SparkTestBase {

  test("capBanded keeps exactly the cap lowest doc_ids per bucket") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => (i, 0, 42L)) ++
      (200L until 205L).map(i => (i, 1, 7L))
    val banded = rows.toDF("doc_id", "band", "key")
    val out = capBanded(banded)
      .groupBy("band", "key")
      .agg(count(lit(1)).as("n"), max("doc_id").as("mx"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // hot bucket truncated to the cap LOWEST ids (deterministic spill)
    assert(out(0) === ((BandBucketCap.toLong, BandBucketCap.toLong - 1)))
    // small bucket untouched
    assert(out(1) === ((5L, 204L)))
  }

  test("per-bucket pair contribution is <= cap*m and keeps rep connectivity") {
    import spark.implicits._
    val m = 100L
    val banded = (0L until m).map(i => (i, 0, 42L)).toDF("doc_id", "band", "key")
    val pairs = capBanded(banded).as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val n = pairs.count()
    // exact: sum_{i=1..cap} (m - i) — linear in m, nowhere near C(m,2)
    val expected = (1 to BandBucketCap).map(i => m - i).sum
    assert(n === expected)
    assert(n <= BandBucketCap * m)
    assert(n < m * (m - 1) / 2)
    // every member is connected to the bucket's min id — clustering
    // consumers (q58/q146) keep the cluster intact
    val viaRep = pairs.filter(col("a") === 0L).select("b")
      .collect().map(_.getLong(0)).toSet
    assert(viaRep === (1L until m).toSet)
  }

  test("q221 candidate volume is linear in cluster size; uncapped counterfactual is quadratic") {
    def run(k: Long): (Long, Long, Long, Long) = {
      val r = graft.ops.DedupOps.dedupSkewAt(spark, sf, k).head()
      (r.getAs[Long]("max_bucket"), r.getAs[Long]("uncapped_pairs"),
        r.getAs[Long]("n_cand"), r.getAs[Long]("n_dup_flagged"))
    }
    val (mb1, uq1, c1, f1) = run(400L)
    val (mb2, uq2, c2, f2) = run(800L)
    // the injected cluster really is a hot bucket (the trailing token
    // occasionally shifts one permutation's min, so a small fraction
    // of members land in sibling buckets — themselves hot)
    assert(mb1 >= 300L && mb2 >= 600L, s"no hot bucket: $mb1 / $mb2")
    // the injected docs still get flagged as duplicates — the cap
    // bounds the work without losing the cluster
    assert(f1 >= 360L && f2 >= 720L, s"cluster lost: $f1 / $f2")
    // candidates ~2x at 2x cluster size (linear), counterfactual ~4x
    val candRatio = c2.toDouble / c1
    val quadRatio = uq2.toDouble / uq1
    assert(candRatio < 2.5, s"candidate growth not linear: $c1 -> $c2")
    assert(quadRatio > 3.5, s"counterfactual unexpectedly tame: $uq1 -> $uq2")
    // and the cap bites: actual candidates are a small fraction of the
    // uncapped quadratic volume
    assert(c2 * 10 < uq2, s"cap not effective: cand=$c2 uncapped=$uq2")
  }
}
