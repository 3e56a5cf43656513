package graft

import org.scalatest.funsuite.AnyFunSuite

/** q143/q144 property specs — the invariants the oracle's aggregate
  * hashes cannot see directly.
  */
class LeakageSplitSpec extends AnyFunSuite with SparkTestBase {

  test("q143: no text content ever spans train and val (the leak property)") {
    val assign = ops.TextOps.leakageSplitAssign(spark, sf)
      .select("h", "split").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(assign.nonEmpty)
    val splitsPerHash = assign.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    val leaked = splitsPerHash.filter(_._2.size > 1)
    assert(leaked.isEmpty, s"content hashes in BOTH splits: ${leaked.keys.take(5)}")
  }

  test("q143: split is a ~90/10 cluster partition and covers every doc") {
    val assign = ops.TextOps.leakageSplitAssign(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(assign.length == total, "assignment must cover every document")
    val clusterSplit = assign
      .map(r => (r.getAs[String]("h"), r.getAs[String]("split"))).distinct
    val trainShare = clusterSplit.count(_._2 == "train").toDouble / clusterSplit.length
    assert(trainShare > 0.8 && trainShare < 0.98,
      s"train cluster share $trainShare out of the hash-bucket envelope")
  }

  test("q147: after quarantine no near-dup pair spans train and surviving val") {
    val (pairsLazy, sh) = ops.DedupOps.dedupMinhashLazy(spark, sf)
    val pairs = pairsLazy.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    sh.unpersist(false)
    val split = ops.TextOps.leakageSplitAssign(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val quarantined = pairs.collect {
      case (a, b) if split(a) != split(b) => if (split(a) == "val") a else b
    }.toSet
    val survives = pairs.filter { case (a, b) =>
      val sa = if (split(a) == "val" && quarantined(a)) "gone" else split(a)
      val sb = if (split(b) == "val" && quarantined(b)) "gone" else split(b)
      Set(sa, sb) == Set("train", "val")
    }
    assert(survives.isEmpty, s"cross-split pairs survive quarantine: ${survives.take(5).toSeq}")
    // and the registry query's counts agree with this recomputation
    val reported = ops.DedupOps.splitQuarantine(spark, sf).collect()
      .map(r => r.getAs[Long]("n_quarantined")).sum
    assert(reported == quarantined.size,
      s"registry reports $reported quarantined, recomputation finds ${quarantined.size}")
  }

  test("q150: rotation churns whole clusters within the expected envelope, no-leak per epoch") {
    val rows = ops.TextOps.splitRotationAssign(spark, sf)
      .select("h", "split0", "split1").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // clusters move whole: each content hash has ONE (split0, split1)
    val perHash = rows.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).distinct)
    assert(perHash.forall(_._2.size == 1), "a cluster straddles splits within an epoch")
    // independent 90/10 draws -> expected cluster churn 2*.9*.1 = 18%
    val clusters = perHash.values.map(_.head).toSeq
    val churn = clusters.count(t => t._1 != t._2).toDouble / clusters.size
    assert(churn > 0.05 && churn < 0.35,
      s"cluster churn $churn outside the 18% +/- envelope")
  }

  test("q148: ingest gate rejects exactly the delta docs with a corpus-val near-dup") {
    import org.apache.spark.sql.functions.col
    val (pairsLazy, sh) = ops.DedupOps.dedupMinhashLazy(spark, sf)
    val pairs = pairsLazy.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    sh.unpersist(false)
    def isDelta(id: Long) = id % 5 == 4
    val corpusSplit = ops.TextOps.leakageSplitAssignDf(
        Tables.documents(spark, sf).filter(col("doc_id") % 5 =!= 4))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectedRejected = pairs.flatMap { case (a, b) =>
      if (isDelta(a) && !isDelta(b) && corpusSplit(b) == "val") Some(a)
      else if (isDelta(b) && !isDelta(a) && corpusSplit(a) == "val") Some(b)
      else None
    }.toSet
    val rows = ops.DedupOps.incrementalContamination(spark, sf).collect()
    val reportedRejected = rows.map(_.getAs[Long]("n_rejected")).sum
    val reportedChecksum = rows.map(_.getAs[Long]("rejected_checksum")).sum
    assert(reportedRejected == expectedRejected.size,
      s"gate rejected $reportedRejected, recomputation expects ${expectedRejected.size}")
    assert(reportedChecksum == expectedRejected.sum,
      s"rejected-id checksum mismatch: $reportedChecksum vs ${expectedRejected.sum}")
    // the gate actually fires on this corpus (a never-firing check is untested)
    assert(expectedRejected.nonEmpty, "expected at least one rejection at sf0.001")
  }

  test("q146: downweighting conserves one effective copy per unique content") {
    val rows = ops.TextOps.dedupWeights(spark, sf).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val effective = rows.map(_.getAs[Long]("effective_e6")).sum
    // global unique clusters (per-source n_unique double-counts content
    // shared across sources)
    val nClusters = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text"))).distinct().count()
    // per cluster, csize * floor(1e6/csize) is within (1e6 - csize, 1e6]
    assert(effective <= nClusters * 1000000L,
      s"effective $effective exceeds one copy per cluster ($nClusters)")
    assert(effective > nClusters * 1000000L - nDocs,
      s"effective $effective lost more than floor truncation allows")
  }

  test("q144: stages within a source are contiguous, balanced length bands") {
    val rows = ops.TextOps.curriculumStages(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (source, stages) =>
      val byStage = stages.sortBy(_._2)
      assert(byStage.map(_._2) sameElements (1L to byStage.length),
        s"$source: stages not 1..k")
      // ntile balance: stage sizes differ by at most 1
      val sizes = byStage.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$source: unbalanced stages $sizes")
      // the length bands are non-decreasing across stage boundaries
      byStage.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 <= b._4,
            s"$source: stage ${a._2} max_tok ${a._5} > stage ${b._2} min_tok ${b._4}")
        case _ =>
      }
    }
  }
}
