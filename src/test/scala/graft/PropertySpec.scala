package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded random inputs, SURVEY §5.3): algebraic
  * laws every engine must satisfy, checked over generated frames.
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  private def randomDf(seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val n = 50 + rnd.nextInt(200)
    (0 until n).map(i =>
      (i.toLong, s"cat_${rnd.nextInt(7)}", rnd.nextDouble() * 1000))
      .toDF("id", "category", "value")
  }

  test("sort is a permutation of its input") {
    for (seed <- 1 to 5) {
      val df = randomDf(seed)
      val in = df.collect().map(_.toSeq).sortBy(_.toString)
      val out = df.orderBy("value", "id").collect().map(_.toSeq).sortBy(_.toString)
      assert(in.sameElements(out))
    }
  }

  test("filter(p) ∪ filter(!p) partitions the input") {
    for (seed <- 1 to 5) {
      val df = randomDf(seed)
      val p = col("value") > 500
      val n = df.count()
      assert(df.filter(p).count() + df.filter(!p).count() == n)
      assert(df.filter(p).intersect(df.filter(!p)).count() == 0)
    }
  }

  test("groupBy count sums to total; mean bounded by min/max") {
    for (seed <- 1 to 5) {
      val df = randomDf(seed)
      val g = df.groupBy("category")
        .agg(count(lit(1)).as("n"), avg("value").as("m"),
             min("value").as("lo"), max("value").as("hi")).collect()
      assert(g.map(_.getLong(1)).sum == df.count())
      g.foreach(r => assert(r.getDouble(2) >= r.getDouble(3)
        && r.getDouble(2) <= r.getDouble(4)))
    }
  }

  test("limit(n).count <= n and is monotone") {
    val df = randomDf(42)
    assert(df.limit(10).count() <= 10)
    assert(df.limit(10000).count() == df.count())
  }

  test("topk == full sort prefix") {
    for (seed <- 1 to 3) {
      val df = randomDf(seed)
      val topk = df.orderBy(col("value").desc, col("id")).limit(7)
        .collect().map(_.getLong(0))
      val full = df.orderBy(col("value").desc, col("id"))
        .collect().take(7).map(_.getLong(0))
      assert(topk.sameElements(full))
    }
  }

  test("TopKPerKey == window row_number formulation on random data") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- 1 to 5) {
      val df = randomDf(seed)
      val k = 1 + seed % 4
      val viaOp = plans.TopKPerKey.topKPerKey(df,
          Seq(col("category")), Seq(col("value").desc, col("id").asc), k)
        .collect().map(_.toSeq).sortBy(_.toString)
      val w = Window.partitionBy("category").orderBy(col("value").desc, col("id").asc)
      val viaWin = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(viaOp.sameElements(viaWin), s"seed=$seed k=$k")
    }
  }

  test("TopKRankPushdown rule is result-preserving (rule on == rule off)") {
    import org.apache.spark.sql.expressions.Window
    def query(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("category").orderBy(col("value").asc, col("id").asc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }
    val df = randomDf(11)
    val withRule = query(df)
    assert(withRule.queryExecution.optimizedPlan
      .collect { case t: plans.TopKPerKey => t }.nonEmpty, "rule should fire")
    val on = withRule.collect().map(_.toSeq).sortBy(_.toString)
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.optimizer.excludedRules")
    conf.set("spark.sql.optimizer.excludedRules", "graft.plans.TopKRankPushdown")
    try {
      val withoutRule = query(df)
      assert(withoutRule.queryExecution.optimizedPlan
        .collect { case t: plans.TopKPerKey => t }.isEmpty, "rule should be excluded")
      val off = withoutRule.collect().map(_.toSeq).sortBy(_.toString)
      assert(on.sameElements(off))
    } finally saved match {
      case Some(v) => conf.set("spark.sql.optimizer.excludedRules", v)
      case None => conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("dedupClusters == union-find ground truth on the same pairs") {
    val pairs = ops.DedupOps.dedupMinhash(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent union-find over the identical edge set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val expected = parent.keys.map(n => n -> find(n)).filter { case (n, r) => n != r }
      .toSeq.sorted
    val got = ops.DedupOps.dedupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == expected)
  }

  test("seqPack: bins contiguous in doc order, totals preserved, budget law") {
    val bins = ops.TextOps.seqPack(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per source: bins start at 0; every bin except possibly the last
    // holds >= budget boundary logic: a doc STARTS in bin floor(prefix/B),
    // so consecutive bins cover a contiguous doc range and bin ids rise
    bins.groupBy(_._1).foreach { case (src, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids.head == 0, s"$src first bin != 0")
      assert(ids.distinct.length == ids.length, s"$src duplicate bins")
      // total docs across bins == docs of that source with >= 0 tokens
      val totalDocs = bs.map(_._3).sum
      val srcDocs = Tables.documents(spark, sf)
        .filter(col("source") === src).count()
      assert(totalDocs == srcDocs, s"$src doc count drift")
    }
  }

  test("globalShuffle: microbatches full except the last per shard") {
    val rows = ops.TextOps.globalShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (shard, mbs) =>
      val sorted = mbs.sortBy(_._2)
      assert(sorted.head._2 == 0, s"shard $shard first microbatch != 0")
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong), s"shard $shard gap")
      // all but the last microbatch hold exactly the batch size
      sorted.dropRight(1).foreach { case (_, mb, n) =>
        assert(n == 16L, s"shard $shard mb $mb has $n docs")
      }
      assert(sorted.last._3 <= 16L)
    }
    // shard count: every document lands in exactly one shard/microbatch
    assert(rows.map(_._3).sum ==
      Tables.documents(spark, sf).count())
  }

  test("bpePairs: pair enumeration shuffles only for the count") {
    val plan = ops.TextOps.bpePairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // one exchange for the groupBy, one for the global top-k sort
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2, plan)
  }

  test("boilerplate: un-dropped docs rebuild to exactly the original text") {
    val res = ops.TextOps.boilerplate(spark, sf)
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"),
              functions.HashFns.hash64(col("text")).as("orig_h"))
    val joined = res.join(orig, "doc_id")
    val clean = joined.filter(col("n_dropped") === 0)
    assert(clean.count() > 0, "expected some untouched docs")
    assert(clean.filter(col("cleaned_h") =!= col("orig_h")).isEmpty,
      "segment rebuild corrupted an untouched document")
    // and some docs must actually lose segments on this corpus
    assert(joined.filter(col("n_dropped") > 0).count() > 0)
  }

  test("broadcast join == shuffle join (strategy-independence)") {
    val big = randomDf(7)
    val dim = {
      import spark.implicits._
      (0 until 7).map(i => (s"cat_$i", s"name_$i")).toDF("category", "cat_name")
    }
    val a = big.join(broadcast(dim), "category").collect().map(_.toSeq).sortBy(_.toString)
    val b = big.hint("shuffle_hash").join(dim, "category").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
  }
}
