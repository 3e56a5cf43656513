package graft

import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup (q137): the delta-vs-corpus verdicts must agree
  * with a driver-side brute force over the SAME candidate rule (banded
  * MinHash, delta×corpus only), and the incremental contract must
  * hold: every delta doc verdicted exactly once, duplicates always
  * point INTO the corpus (never at another delta doc), and sub-shingle
  * docs are trivially kept.
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkTestBase {

  test("verdicts match a driver-side banded-minhash recomputation") {
    val rows = ops.DedupOps.dedupIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
                 if (r.isNullAt(2)) None else Some(r.getLong(2)),
                 if (r.isNullAt(3)) None else Some(r.getDouble(3))))

    // recompute shingle sets + signatures through the engine's own
    // column machinery (the kernels are differential-proven in
    // MinHashSigSpec/Hash64Spec; this spec tests the INCREMENTAL logic)
    import org.apache.spark.sql.functions._
    import graft.functions.HashFns._
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), hashedShingles(shingles(col("toks"), 3)).as("sh"))
      .withColumn("sig", graft.expressions.MinHashSig.minhashSig(col("sh")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet, r.getSeq[Long](2).toVector))

    val corpus = base.filter(t => t._1 % 5 != 4)
    val delta = base.filter(t => t._1 % 5 == 4)
    def bands(sig: Vector[Long]): Seq[(Int, Long)] =
      (0 until MinhashBands).map { b =>
        b -> (0 until MinhashRows).foldLeft(7L)((acc, r) =>
          acc * 31 + sig(b * MinhashRows + r))
      }
    val corpusIdx = corpus.flatMap(c => bands(c._3).map(bk => bk -> c._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val byId = base.map(t => t._1 -> t).toMap
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 5 == 4).sorted
      .map { id =>
        val verdict = byId.get(id).flatMap { case (_, shA, sigA) =>
          val cands = bands(sigA).flatMap(corpusIdx.get).flatten.distinct
          val scored = cands.flatMap { cid =>
            val (_, shB, sigB) = byId(cid)
            val estJ = sigA.zip(sigB).count(p => p._1 == p._2).toDouble / MinhashK
            if (estJ < 0.5) None
            else {
              val inter = (shA & shB).size.toDouble
              val jac = inter / (shA.size + shB.size - inter)
              // HALF_UP to match Spark/DuckDB round(x, 6) semantics
              Some((cid, BigDecimal(jac)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
            }
          }
          if (scored.isEmpty) None
          else Some(scored.minBy { case (cid, j) => (-j, cid) })
        }
        (id, verdict.isEmpty, verdict.map(_._1), verdict.map(_._2))
      }
    assert(rows.toSeq == expected.toSeq)
  }

  test("incremental contract: one verdict per delta doc, dups point into the corpus") {
    val rows = ops.DedupOps.dedupIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
                 if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val deltaIds = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 5 == 4).toSet
    assert(rows.map(_._1).toSet == deltaIds, "every delta doc verdicted once")
    assert(rows.length == deltaIds.size)
    rows.foreach { case (id, kept, dupOf) =>
      assert(kept == dupOf.isEmpty)
      dupOf.foreach { c =>
        assert(c % 5 != 4, s"delta doc $id points at delta doc $c — corpus only")
      }
    }
    // the fixture corpus must exercise both verdicts
    assert(rows.exists(_._2) && rows.exists(!_._2), "degenerate delta")
  }
}
