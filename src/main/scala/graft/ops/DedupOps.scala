package graft.ops

import graft.{Q, Tables}
import graft.functions.HashFns._
import graft.functions.VectorFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` (north-star:
  * the dedup stages of an LLM training-data pipeline).
  *
  * Scale design: the text-dedup operators never do an O(n²) cross join
  * in Spark — candidate pairs always come from an equi-join on a
  * derived key (minhash band, simhash chunk, shared shingle posting),
  * which shuffles on that key and parallelizes like any other join.
  * The DuckDB twins replicate the *same candidate generation* (not a
  * brute force) so borderline pairs agree exactly. The one deliberate
  * exception is dedupEmbedding (q37): the EXACT top-k-pairs baseline
  * is all-pairs by definition and bounded to the embeddings table's
  * size — the scale paths for embeddings are the LSH/IVF candidate
  * generators (q39/q50 in SimilarityOps).
  */
object DedupOps {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---- exact dedup: hash-groupBy, keep lowest doc_id ----
  def dedupExact(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  private val dedupExactSql =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  // ---- shared shingle-set base (word 3-grams, distinct, md5-hashed
  //      to longs ONCE — md5 is the expensive step, and long sets
  //      shuffle/intersect far cheaper than n-gram strings) ----
  //
  // repartition: the documents table arrives as ONE small parquet file
  // = one input partition; without an explicit shuffle every md5 below
  // would run single-threaded (at cluster scale the input arrives in
  // many splits, but per-row-expensive stages after a collapsed scan
  // still want compute parallelism, not scan parallelism).
  // persist: the base feeds candidate generation AND both sides of the
  // rescore join — without it the whole shingle+hash pipeline re-runs
  // three times.
  // tokens are bound to a real column BEFORE shingling: the gram lambda
  // indexes the token array per position, and an unbound split(text)
  // would re-tokenize the whole document for every gram (quadratic).
  // The non-empty filter runs on size(toks) BEFORE shingling (the two
  // are equivalent: a doc has 3-grams iff it has >= 3 tokens). Filtering
  // on size(sh) after the projection looks natural but Catalyst pushes
  // the predicate below the project, duplicating the whole
  // shingle+hash pipeline into the filter — 2× the md5 work.
  private def shingledRaw(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), hashedShingles(shingles(col("toks"), 3)).as("sh"))

  private def shingled(s: SparkSession, d: String): DataFrame =
    shingledRaw(s, d).persist()

  private val shingledCte =
    s"""t0 AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
       |t1 AS (SELECT doc_id, toks FROM t0 WHERE len(toks) >= 3),
       |s2 AS (SELECT doc_id,
       |  ${hashedShinglesSql(shinglesSql("toks", 3))} AS sh
       |       FROM t1)""".stripMargin

  // ---- MinHash + LSH banding ----
  // Materialize-then-release: each op's final output is tiny (pair
  // lists), so localCheckpoint(eager) it and unpersist the cached
  // intermediates before returning — library-style composition then
  // accumulates no cache entries (ADVICE r1). The checkpoint blocks
  // themselves are reclaimed by the ContextCleaner once the returned
  // frame is unreferenced.
  def dedupMinhash(s: SparkSession, d: String): DataFrame = {
    val (result, sh) = dedupMinhashLazy(s, d)
    val out = result.localCheckpoint(true)
    sh.unpersist(false)
    out
  }

  /** The un-materialized minhash plan + the persisted base to release —
    * split out so graft.Plans can dump the REAL plan (the public entry
    * point eagerly checkpoints, which collapses its plan to an RDD
    * scan).
    */
  private[graft] def dedupMinhashLazy(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // native fused kernel (one pass over the gram set for all 16
    // permutations) — bit-identical to minhashSigFromHashes, proven by
    // MinHashSigSpec, so the SQL twin below is unchanged.
    // The persist sits ABOVE the sig column (r17): base feeds FOUR
    // consumers (both banded join sides + both rescore attaches), and
    // persisting only the shingle set made each of them re-run the
    // MinHash kernel — the lane's single most expensive expression —
    // from cache. One relation, one kernel pass.
    val base = shingledRaw(s, d).withColumn("sig",
      graft.expressions.MinHashSig.minhashSig(col("sh")))
      .persist()
    val bandCols = array((0 until MinhashBands).map(b => bandKey(col("sig"), b)): _*)
    val banded = base.select(col("doc_id"),
      posexplode(bandCols).as(Seq("band", "key")))
    // hot-bucket bound: the smaller-id side is capped to its bucket's
    // BandBucketCap lowest doc_ids (see HashFns.capBanded) — pairs per
    // bucket stay linear in membership even under template skew
    val pairs = capBanded(banded).as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val joined = pairs
      .join(base.select(col("doc_id").as("a"), col("sig").as("sig_a"), col("sh").as("sh_a")), "a")
      .join(base.select(col("doc_id").as("b"), col("sig").as("sig_b"), col("sh").as("sh_b")), "b")
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), _ + _)
    val interD = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val jac = interD / ((size(col("sh_a")) + size(col("sh_b"))) - interD)
    val result = joined
      .select(col("a"), col("b"),
              (matches.cast("double") / lit(MinhashK.toDouble)).as("est_j"),
              jac.as("jaccard"))
      .filter(col("est_j") >= 0.5)
      .orderBy("a", "b")
    (result, base)
  }

  /** SQL CTE chain producing `scored (a, b, est_j, jaccard)` — the
    * full MinHash candidate+rescore pipeline, shared by the q34 oracle
    * and q145's cross-split contamination audit.
    */
  private[graft] val minhashScoredCteSql: String = {
    val bands = (0 until MinhashBands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeySql("sig", b)} AS key FROM sigs")
      .mkString("\n UNION ALL ")
    s"""$shingledCte,
       |sigs AS (SELECT doc_id, sh, ${minhashSigFromHashesSql("sh")} AS sig FROM s2),
       |banded AS ($bands),
       |bandedc AS (${capBandedSql("banded")}),
       |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |          FROM bandedc x JOIN banded y
       |            ON x.band = y.band AND x.key = y.key
       |           AND x.doc_id < y.doc_id),
       |joined AS (SELECT pairs.a, pairs.b, x.sig AS sig_a, y.sig AS sig_b,
       |                  x.sh AS sh_a, y.sh AS sh_b
       |           FROM pairs JOIN sigs x ON x.doc_id = pairs.a
       |                      JOIN sigs y ON y.doc_id = pairs.b),
       |scored AS (SELECT a, b,
       |  CAST(list_sum(list_transform(range(1, ${MinhashK + 1}),
       |    i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |    / ${MinhashK.toDouble} AS est_j,
       |  CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
       |    / ((len(sh_a) + len(sh_b))
       |       - CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)) AS jaccard
       |  FROM joined)""".stripMargin
  }

  private val dedupMinhashSql =
    s"""WITH $minhashScoredCteSql
       |SELECT a, b, est_j, jaccard FROM scored
       |WHERE est_j >= 0.5 ORDER BY a, b""".stripMargin

  // ---- q137: INCREMENTAL near-dup dedup — the daily-ingest shape.
  //      A real curation pipeline does not re-dedup the corpus when a
  //      new batch lands: the corpus's banded MinHash index is a
  //      materialized table, and only DELTA×CORPUS candidates are
  //      generated (delta-delta pairs belong to the next full pass;
  //      corpus-corpus pairs were settled when those docs arrived).
  //      That asymmetry is the scale story: per ingest the join cost
  //      is |delta_bands| probing the corpus index — linear in the
  //      batch, NOT in the corpus — and the corpus side shuffles only
  //      its (band, key) index rows, never re-pairing itself. Here the
  //      "new batch" is the deterministic 20% slice doc_id % 5 = 4
  //      (sf-stable, identical in both engines); candidates come from
  //      the same banded equi-join as q34 with delta/corpus predicates
  //      pushed to the two sides, rescored by exact Jaccard. Output is
  //      the per-delta-doc verdict the ingest job writes: kept flag,
  //      best-matching corpus doc (max Jaccard, min-id tie-break), all
  //      delta docs present (sub-3-token docs have no shingles and are
  //      trivially kept). ----
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val (result, sh) = dedupIncrementalLazy(s, d)
    val out = result.localCheckpoint(true)
    sh.unpersist(false)
    out
  }

  private[graft] def dedupIncrementalLazy(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // persist ABOVE the sig column (r17, the q34 discipline): base
    // feeds the banded explode and both rescore attaches — one MinHash
    // kernel pass instead of three
    val base = shingledRaw(s, d).withColumn("sig",
      graft.expressions.MinHashSig.minhashSig(col("sh")))
      .persist()
    val bandCols = array((0 until MinhashBands).map(b => bandKey(col("sig"), b)): _*)
    val banded = base.select(col("doc_id"),
      posexplode(bandCols).as(Seq("band", "key")))
    val isDelta = (c: org.apache.spark.sql.Column) => c % 5 === 4
    // hot-bucket bound on the CORPUS (index) side: a delta doc probing
    // a template cluster's bucket meets its BandBucketCap lowest-id
    // representatives, not all m members — probe cost per bucket is
    // |delta| * cap, linear, and any real near-dup still matches a rep.
    // capBandedFor: the rank window runs only over the buckets the
    // delta actually probes (broadcast semi-prefilter — identical
    // output, the corpus index never pays a full exchange per ingest)
    val deltaBand = banded.filter(isDelta(col("doc_id")))
    val corpusBand =
      capBandedFor(banded.filter(!isDelta(col("doc_id"))), deltaBand)
    val cands = deltaBand.as("x")
      .join(corpusBand.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val joined = cands
      .join(base.select(col("doc_id").as("a"), col("sig").as("sig_a"), col("sh").as("sh_a")), "a")
      .join(base.select(col("doc_id").as("b"), col("sig").as("sig_b"), col("sh").as("sh_b")), "b")
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), _ + _)
    val interD = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val jac = interD / ((size(col("sh_a")) + size(col("sh_b"))) - interD)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("jac_r").desc, col("b").asc)
    val best = joined
      .select(col("a"), col("b"),
              (matches.cast("double") / lit(MinhashK.toDouble)).as("est_j"),
              round(jac, 6).as("jac_r"))
      .filter(col("est_j") >= 0.5)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("a"), col("b").as("dup_of"), col("jac_r"))
    val result = docs(s, d).filter(isDelta(col("doc_id")))
      .select(col("doc_id"))
      .join(best.withColumnRenamed("a", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNull.as("kept"),
              col("dup_of"), col("jac_r"))
      .orderBy("doc_id")
    (result, base)
  }

  // shared with q138's streaming twin (same output contract, so the
  // same oracle proves stream-static == batch incremental)
  private[graft] val dedupIncrementalSql = {
    val bands = (0 until MinhashBands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeySql("sig", b)} AS key FROM sigs")
      .mkString("\n UNION ALL ")
    s"""WITH $shingledCte,
       |sigs AS (SELECT doc_id, sh, ${minhashSigFromHashesSql("sh")} AS sig FROM s2),
       |banded AS ($bands),
       |corpusb AS (${capBandedSql("(SELECT * FROM banded WHERE doc_id % 5 <> 4)")}),
       |cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |          FROM banded x JOIN corpusb y
       |            ON x.band = y.band AND x.key = y.key
       |          WHERE x.doc_id % 5 = 4),
       |joined AS (SELECT cands.a, cands.b, x.sig AS sig_a, y.sig AS sig_b,
       |                  x.sh AS sh_a, y.sh AS sh_b
       |           FROM cands JOIN sigs x ON x.doc_id = cands.a
       |                      JOIN sigs y ON y.doc_id = cands.b),
       |scored AS (SELECT a, b,
       |  CAST(list_sum(list_transform(range(1, ${MinhashK + 1}),
       |    i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |    / ${MinhashK.toDouble} AS est_j,
       |  round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
       |    / ((len(sh_a) + len(sh_b))
       |       - CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)), 6) AS jac_r
       |  FROM joined),
       |best AS (SELECT a, b AS dup_of, jac_r, row_number() OVER
       |           (PARTITION BY a ORDER BY jac_r DESC, b ASC) AS rn
       |         FROM scored WHERE est_j >= 0.5)
       |SELECT d.doc_id, b.dup_of IS NULL AS kept, b.dup_of, b.jac_r
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 4) d
       |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.a = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- SimHash: 32-bit fingerprint, chunk-join candidates ----
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    // bind token hashes to a real column first: referencing the md5
    // transform expression from all 32 bit-aggregates would re-hash
    // every token 32 times (no CSE across lambda trees)
    val base = docs(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
              transform(tokens(col("text")), t => hash64(t)).as("hashes"))
      .select(col("doc_id"), simhash(col("hashes")).as("sh32"))
      .persist()
    val chunkCols = array((0 until 4).map(c => simhashChunk(col("sh32"), c)): _*)
    val chunked = base.select(col("doc_id"), col("sh32"),
      posexplode(chunkCols).as(Seq("ci", "cv")))
    // pigeonhole: hd<=3 over 4 chunks ⇒ at least one chunk equal, so the
    // union-of-equi-joins finds exactly the brute-force hd<=3 pairs
    val pairs = chunked.as("x").join(chunked.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
              col("x.sh32").as("sha"), col("y.sh32").as("shb"))
      .distinct()
    val result = pairs
      .withColumn("hd", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hd") <= 3)
      .select("a", "b", "hd")
      .orderBy("a", "b")
      .localCheckpoint(true)
    base.unpersist(false)
    result
  }

  private val dedupSimhashSql = {
    val toks = tokensSql("text")
    s"""WITH h AS (SELECT doc_id,
       |  list_transform($toks, t -> ${hash64Sql("t")}) AS hashes
       |  FROM documents),
       |s AS (SELECT doc_id, ${simhashSql("hashes")} AS sh32 FROM h)
       |SELECT x.doc_id AS a, y.doc_id AS b,
       |       CAST(bit_count(xor(x.sh32, y.sh32)) AS INTEGER) AS hd
       |FROM s x JOIN s y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sh32, y.sh32)) <= 3
       |ORDER BY a, b""".stripMargin
  }

  // ---- n-gram Jaccard over DISCRIMINATIVE shingles (df <= cap), via
  //      a counting inverted index. Ultra-common grams are dropped
  //      before pairing — the standard corpus-scale trick that (a)
  //      bounds every posting list, so pair generation is O(cap²) per
  //      gram, and (b) stops boilerplate grams from linking unrelated
  //      docs. Candidate pairs are emitted IN PLACE from each gram's
  //      sorted, df-capped posting list with a combinations HOF
  //      (exactly C(df,2) structs, a < b by construction): one shuffle
  //      of the index by gram replaces the former index self-join —
  //      no second exchange, no join hash table, and run-to-run
  //      variance from the join build drops with it. Intersection size
  //      is COUNTED from shared postings (groupBy(a,b)), never
  //      materialized as arrays. Set sizes join back from a per-doc
  //      count — only longs and cap-bounded lists ever shuffle. ----
  private val DfCap = 50

  def dedupNgram(s: SparkSession, d: String): DataFrame = {
    val (lazyPlan, handles) = dedupNgramLazy(s, d)
    val result = lazyPlan.localCheckpoint(true)
    handles.foreach(_.unpersist(false))
    result
  }

  /** Un-materialized q36 plan + persisted handles to release — split
    * out so graft.Plans can dump the REAL plan (the public entry point
    * eagerly checkpoints, which collapses its plan to an RDD scan).
    */
  private[graft] def dedupNgramLazy(
      s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val base = shingled(s, d)
    val idx = base.select(col("doc_id"), explode(col("sh")).as("g"))
    val posts = idx.groupBy("g")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= DfCap)
      .persist()
    val sizes = posts.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairCol = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))), y =>
        struct(x.as("a"), y.as("b")))))
    val inter = posts.filter(size(col("ds")) >= 2)
      .select(explode(pairCol).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val result = inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
              (col("c").cast("double")
                / (col("sza") + col("szb") - col("c")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .orderBy("a", "b")
    (result, Seq(posts, base))
  }

  private val dedupNgramSql =
    s"""WITH $shingledCte,
       |idx AS (SELECT doc_id, unnest(sh) AS g FROM s2),
       |kept AS (SELECT g FROM idx GROUP BY g HAVING COUNT(*) <= $DfCap),
       |idx2 AS (SELECT idx.doc_id, idx.g FROM idx JOIN kept USING (g)),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx2 GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
       |          FROM idx2 x JOIN idx2 y
       |            ON x.g = y.g AND x.doc_id < y.doc_id
       |          GROUP BY 1, 2),
       |scored AS (SELECT a, b,
       |  CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE) AS jaccard
       |  FROM inter JOIN sizes sa ON sa.doc_id = inter.a
       |             JOIN sizes sb ON sb.doc_id = inter.b)
       |SELECT a, b, jaccard FROM scored WHERE jaccard >= 0.6 ORDER BY a, b""".stripMargin

  // ---- embedding cosine near-dup: top-20 pairs ----
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(graft.expressions.VecDot.vecDot(col("v"), col("v"))))
      .persist()
    val x = e.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val y = e.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    val result = x.join(y, col("a") < col("b"))
      .select(col("a"), col("b"),
              round(graft.expressions.VecDot.vecDot(col("va"), col("vb"))
                / (col("na") * col("nb")), 6).as("cos_r"))
      .orderBy(col("cos_r").desc, col("a"), col("b"))
      .limit(20)
      .localCheckpoint(true)
    e.unpersist(false)
    result
  }

  private val dedupEmbeddingSql =
    s"""WITH e AS (SELECT vec_id, ${toDoubleSql("embedding")} AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e)
       |SELECT x.vec_id AS a, y.vec_id AS b,
       |  round(${dotFoldSql("x.v", "y.v")} / (x.nrm * y.nrm), 6) AS cos_r
       |FROM n x JOIN n y ON x.vec_id < y.vec_id
       |ORDER BY cos_r DESC, a, b LIMIT 20""".stripMargin

  // ---- dedup clustering: near-dup PAIRS → connected components →
  //      canonical doc per cluster. The step that makes pair output
  //      actionable: every document maps to the minimum doc_id of its
  //      transitive near-dup cluster ("keep the canonical, drop the
  //      rest"). Spark side is Pregel-style min-label propagation — a
  //      handful of equi-join rounds, each a single shuffle, converging
  //      in O(cluster diameter) iterations (near-dup clusters are tiny,
  //      so this terminates fast at any corpus size). The DuckDB twin
  //      computes the same fixpoint as a recursive-CTE transitive
  //      closure + MIN over reachable ids. ----
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    // same candidate pairs as q34 (minhash LSH, est_j >= 0.5)
    val pairs = dedupMinhash(s, d).select(col("a"), col("b")).persist()
    val edges = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist()
    // localCheckpoint (not persist) per round: it truncates the logical
    // plan lineage, so round N's plan does not embed rounds 1..N-1 —
    // without this, analysis+optimization cost grows every round and
    // dominates wall-clock long before the data does.
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    // labels only ever decrease, so the (exact decimal) label sum is
    // strictly monotone until the fixpoint — an unchanged sum IS
    // convergence, for one cheap aggregate per round instead of an
    // anti-join
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(30,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    val maxIter = 12 // with pointer jumping this covers diameter 2^12
    while (!converged && iter < maxIter) {
      // one hop along graph edges...
      val propagated = edges
        .join(labels, edges("b") === labels("node"))
        .select(edges("a").as("node"), col("label"))
      val hop = labels.unionByName(propagated)
        .groupBy("node").agg(min(col("label")).as("label"))
      // ...then pointer jumping (label := label(label)): labels are
      // node ids of the same component with label(x) <= x, so the jump
      // stays inside the component and monotonically decreases — it
      // turns O(diameter) rounds into O(log diameter)
      val next = hop.as("l1")
        .join(hop.select(col("node").as("jn"), col("label").as("jl")).as("l2"),
              col("l1.label") === col("jn"), "left")
        .select(col("l1.node").as("node"),
                coalesce(col("jl"), col("l1.label")).as("label"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    // a silent cap-exit would diverge from the oracle's exact transitive
    // closure — make non-convergence a hard failure instead (ADVICE r1)
    if (!converged)
      throw new IllegalStateException(
        s"dedupClusters: label propagation not converged after $maxIter rounds")
    val result = labels
      .filter(col("node") =!= col("label"))
      .select(col("node").as("doc_id"), col("label").as("canonical_id"))
      .orderBy("doc_id")
      .localCheckpoint(true)
    pairs.unpersist(false)
    edges.unpersist(false)
    result
  }

  private val dedupClustersSql = {
    // reuse q34's SQL up to `pairs`, then close transitively
    val pairsCte = dedupMinhashSql
      .replaceFirst("(?s)SELECT a, b, est_j, jaccard FROM scored.*",
        "SELECT a, b FROM scored WHERE est_j >= 0.5")
    s"""WITH RECURSIVE base AS ($pairsCte),
       |edges AS (SELECT a, b FROM base UNION ALL SELECT b, a FROM base),
       |reach(node, anc) AS (
       |  SELECT a AS node, a AS anc FROM edges
       |  UNION
       |  SELECT e.a AS node, r.anc
       |  FROM edges e JOIN reach r ON e.b = r.node),
       |labels AS (SELECT node, MIN(anc) AS label FROM reach GROUP BY node)
       |SELECT node AS doc_id, label AS canonical_id
       |FROM labels WHERE node <> label ORDER BY doc_id""".stripMargin
  }

  // ---- benchmark decontamination: flag corpus documents sharing any
  //      exact 8-gram with a held-out benchmark set (doc_id < 20 stands
  //      in for an eval suite). The scale shape: eval suites are tiny,
  //      so their distinct gram-hash set BROADCASTS and the 100 TB
  //      corpus streams past it — no shuffle of the corpus, no index
  //      build. Grams travel as md5-derived longs (both engines hash
  //      identically), matching the other dedup ops' currency. ----
  private val DecontamN = 8
  private val BenchIds = 20

  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val grams = docs(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= DecontamN)
      .select(col("doc_id"),
              explode(hashedShingles(shingles(col("toks"), DecontamN))).as("g"))
    val bench = grams.filter(col("doc_id") < BenchIds).select("g").distinct()
    grams.filter(col("doc_id") >= BenchIds)
      .join(broadcast(bench), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  private val decontaminateSql = {
    val grams = hashedShinglesSql(shinglesSql("toks", DecontamN))
    s"""WITH t AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
       |g AS (SELECT doc_id, unnest($grams) AS g
       |      FROM t WHERE len(toks) >= $DecontamN),
       |bench AS (SELECT DISTINCT g FROM g WHERE doc_id < $BenchIds)
       |SELECT g.doc_id, COUNT(*) AS n_shared
       |FROM g JOIN bench USING (g)
       |WHERE g.doc_id >= $BenchIds
       |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- PageRank (3 fixed iterations) over the near-dup graph: ranks
  //      centrality inside duplicate clusters (which doc is the "hub"
  //      of a template family). All arithmetic is integer micro-units —
  //      rank/deg and the 0.85 damping use integer division — so
  //      per-node sums are order-independent and the unrolled-CTE
  //      oracle matches bit-for-bit; float PageRank would drift with
  //      summation order. Per-iteration plan shape is one equi-join +
  //      one hash aggregate (the Pregel step), same as q58. ----
  private val PrIters = 3

  def pagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = dedupMinhash(s, d).select(col("a"), col("b")).persist()
    val edges = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("src"), col("b").as("dst"))
      .persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .localCheckpoint(true)
    // fixed 3 iterations: the composed plan stays bounded (3 join
    // levels over the cached edges/deg), so unlike the open-ended q58
    // loop there is nothing to gain from per-round checkpoints — they
    // would cost three eager materialization jobs
    var ranks = deg.withColumn("r", lit(1000000L))
    for (_ <- 1 to PrIters) {
      val contrib = edges
        .join(ranks.select(col("node").as("src"), expr("r div deg").as("c")), "src")
        .select(col("dst").as("node"), col("c"))
      val summed = contrib.groupBy("node").agg(sum(col("c")).as("sc"))
      ranks = deg
        .join(summed, Seq("node"), "left")
        .select(col("node"), col("deg"),
                (lit(150000L) + expr("(coalesce(sc, 0L) * 85) div 100")).as("r"))
    }
    val result = ranks
      .select(col("node").as("doc_id"), col("r").as("rank_micro"))
      .orderBy("doc_id")
      .localCheckpoint(true)
    pairs.unpersist(false)
    edges.unpersist(false)
    result
  }

  private val pagerankSql = {
    val pairsCte = dedupMinhashSql
      .replaceFirst("(?s)SELECT a, b, est_j, jaccard FROM scored.*",
        "SELECT a, b FROM scored WHERE est_j >= 0.5")
    val iters = (1 to PrIters).map { k =>
      s"""c$k AS (SELECT e.dst AS node, CAST(SUM(r${k - 1}.r // r${k - 1}.deg) AS BIGINT) AS sc
         |        FROM edges e JOIN r${k - 1} ON e.src = r${k - 1}.node GROUP BY e.dst),
         |r$k AS (SELECT d.node, d.deg,
         |          CAST(150000 + (COALESCE(c$k.sc, 0) * 85) // 100 AS BIGINT) AS r
         |        FROM deg d LEFT JOIN c$k ON c$k.node = d.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS ($pairsCte),
       |edges AS (SELECT a AS src, b AS dst FROM base
       |          UNION ALL SELECT b AS src, a AS dst FROM base),
       |deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS r FROM deg),
       |$iters
       |SELECT node AS doc_id, r AS rank_micro FROM r$PrIters ORDER BY doc_id""".stripMargin
  }

  // ---- q118: triangle counting over the part-category co-occurrence
  //      graph (categories bought in the same order are connected; raw
  //      part keys give a graph whose density — and wedge-join cost —
  //      grows with data volume, so nodes are coarsened to 300
  //      categories and only edges STRICTLY stronger than the average
  //      pair count are kept: a self-scaling association filter that
  //      stays non-degenerate from sf0.001 to sf0.1 and bounds compute
  //      by the category count at ANY data scale). The count is the
  //      classic two-join formulation: wedges = e⋈e on the middle node,
  //      closed by a third equi-join — every step a hash equi-join, no
  //      nested loop. The a<b<c orientation dedupes each triangle; at
  //      100 TB you orient low-degree→high-degree instead (bounds
  //      wedges by arboricity) — same plan, different ordering key. The
  //      average-strength cut is one scalar aggregate broadcast into
  //      the filter (cnt·n_edges > total_cnt — integer-exact in both
  //      engines). One output row: edge/triangle counts + a corner-sum
  //      checksum that only matches if both engines found the identical
  //      triangle SET.
  private val TriCats = 300

  def triangles(s: SparkSession, d: String): DataFrame = {
    val np = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"),
              pmod(col("l_partkey"), lit(TriCats.toLong)).as("p")).distinct()
    val w = np.alias("l")
      .join(np.alias("r"), col("l.o") === col("r.o") && col("l.p") < col("r.p"))
      .groupBy(col("l.p").as("x"), col("r.p").as("y"))
      .agg(count(lit(1)).as("cnt"))
    val tot = w.agg(count(lit(1)).as("ne"), sum(col("cnt")).as("tc"))
    val e = w.crossJoin(broadcast(tot))
      .filter(col("cnt") * col("ne") > col("tc"))
      .select("x", "y")
      .persist()
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.y") === col("e2.x"))
      .join(e.alias("e3"),
            col("e3.x") === col("e1.x") && col("e3.y") === col("e2.y"))
      .select(col("e1.x").as("a"), col("e1.y").as("b"), col("e2.y").as("c"))
    // edge count folded in as a 1-row broadcast cross join (same shape
    // as the `tot` cut above) — one Spark job, no driver-side action
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val result = tri
      .agg(count(lit(1)).as("n_triangles"),
           sum(col("a") + col("b") + col("c")).as("corner_checksum"))
      .crossJoin(broadcast(nEdges))
      .select(col("n_edges"), col("n_triangles"), col("corner_checksum"))
      .localCheckpoint(true)
    e.unpersist(false)
    result
  }

  private val trianglesSql =
    s"""WITH np AS (SELECT DISTINCT l_orderkey AS o,
       |    ((l_partkey % $TriCats) + $TriCats) % $TriCats AS p FROM lineitem),
       |w AS (SELECT a.p AS x, b.p AS y, COUNT(*) AS cnt
       |      FROM np a JOIN np b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
       |tot AS (SELECT COUNT(*) AS ne, SUM(cnt) AS tc FROM w),
       |e AS (SELECT x, y FROM w, tot WHERE cnt * ne > tc),
       |tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
       |        FROM e e1 JOIN e e2 ON e1.y = e2.x
       |          JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
       |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       | COUNT(*) AS n_triangles,
       | CAST(SUM(a + b + c) AS BIGINT) AS corner_checksum
       |FROM tri""".stripMargin

  // ---- q145: cross-split contamination audit — the check a curation
  //      team runs BEFORE shipping a train/val split: q143's split is
  //      leak-proof for EXACT duplicates by construction, but near-dup
  //      pairs (the q34 MinHash lane) can still straddle the boundary
  //      and leak eval content into training. Label every confirmed
  //      near-dup pair (est_j >= 0.5) with both members' splits and
  //      roll up pair counts + id checksums per (a_split, b_split):
  //      the (train, val)/(val, train) rows ARE the measured leak.
  //      100 TB: the pair set is the q34 output (band-join bounded,
  //      never all-pairs) and the label join is two hash joins of the
  //      tiny pair list against the assignment relation — the audit
  //      costs one dedup pass + two equi-joins, exactly what an ingest
  //      pipeline already pays. ----
  def splitContamination(s: SparkSession, d: String): DataFrame = {
    val (pairsLazy, sh) = dedupMinhashLazy(s, d)
    val assign = TextOps.leakageSplitAssign(s, d)
      .select(col("doc_id"), col("split"))
    val result = pairsLazy
      .join(assign.select(col("doc_id").as("a"), col("split").as("a_split")), "a")
      .join(assign.select(col("doc_id").as("b"), col("split").as("b_split")), "b")
      .groupBy("a_split", "b_split")
      .agg(count(lit(1)).as("n_pairs"),
           sum(col("a")).cast("long").as("sum_a"),
           sum(col("b")).cast("long").as("sum_b"))
      .orderBy("a_split", "b_split")
      .localCheckpoint(true)
    sh.unpersist(false)
    result
  }

  private val splitContaminationSql =
    s"""WITH $minhashScoredCteSql,
       |${TextOps.leakageSplitCteSql},
       |nd AS (SELECT a, b FROM scored WHERE est_j >= 0.5),
       |lab AS (SELECT nd.a, nd.b, sa.split AS a_split, sb.split AS b_split
       |        FROM nd JOIN sp sa ON sa.doc_id = nd.a
       |                JOIN sp sb ON sb.doc_id = nd.b)
       |SELECT a_split, b_split, COUNT(*) AS n_pairs,
       | CAST(SUM(a) AS BIGINT) AS sum_a, CAST(SUM(b) AS BIGINT) AS sum_b
       |FROM lab GROUP BY 1, 2 ORDER BY a_split, b_split""".stripMargin

  // ---- q147: split quarantine — the REMEDIATION after the q145
  //      audit: for every cross-split near-dup pair, the VAL-side
  //      member is quarantined (dropped from val) so the eval set
  //      stays clean while training keeps its copy — evicting from
  //      val, not train, because eval integrity is the point of the
  //      split and training-set size barely moves. Emits the
  //      quarantine manifest a pipeline actually applies: per source,
  //      how many val docs are evicted and which (id checksum), plus
  //      the surviving val count. Deterministic: quarantine membership
  //      is a pure function of the pair set. Cost on top of q145: one
  //      distinct + one broadcast-sized anti-join against the val
  //      slice (the quarantine list is bounded by the near-dup pair
  //      count, orders of magnitude smaller than the corpus). ----
  def splitQuarantine(s: SparkSession, d: String): DataFrame = {
    val (pairsLazy, sh) = dedupMinhashLazy(s, d)
    val assign = TextOps.leakageSplitAssign(s, d)
      .select(col("doc_id"), col("source"), col("split"))
    val labeled = pairsLazy
      .join(assign.select(col("doc_id").as("a"), col("split").as("a_split")), "a")
      .join(assign.select(col("doc_id").as("b"), col("split").as("b_split")), "b")
    // val-side members of cross-split pairs, either orientation
    val quarantined = labeled
      .filter(col("a_split") =!= col("b_split"))
      .select(when(col("a_split") === "val", col("a")).otherwise(col("b"))
        .as("doc_id"))
      .distinct()
    val valDocs = assign.filter(col("split") === "val")
    val result = valDocs
      .join(quarantined.withColumn("quarantined", lit(1L)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_val"),
           sum(coalesce(col("quarantined"), lit(0L))).cast("long").as("n_quarantined"),
           sum(when(col("quarantined").isNotNull, col("doc_id")).otherwise(lit(0L)))
             .cast("long").as("quarantine_checksum"),
           (count(lit(1)) -
             sum(coalesce(col("quarantined"), lit(0L)))).cast("long").as("n_val_kept"))
      .orderBy("source")
      .localCheckpoint(true)
    sh.unpersist(false)
    result
  }

  private val splitQuarantineSql =
    s"""WITH $minhashScoredCteSql,
       |${TextOps.leakageSplitCteSql},
       |nd AS (SELECT a, b FROM scored WHERE est_j >= 0.5),
       |lab AS (SELECT nd.a, nd.b, sa.split AS a_split, sb.split AS b_split
       |        FROM nd JOIN sp sa ON sa.doc_id = nd.a
       |                JOIN sp sb ON sb.doc_id = nd.b),
       |q AS (SELECT DISTINCT
       |        CASE WHEN a_split = 'val' THEN a ELSE b END AS doc_id
       |      FROM lab WHERE a_split <> b_split)
       |SELECT sp.source, COUNT(*) AS n_val,
       | CAST(SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_quarantined,
       | CAST(SUM(CASE WHEN q.doc_id IS NOT NULL THEN sp.doc_id ELSE 0 END)
       |   AS BIGINT) AS quarantine_checksum,
       | CAST(COUNT(*) - SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS n_val_kept
       |FROM sp LEFT JOIN q ON q.doc_id = sp.doc_id
       |WHERE sp.split = 'val'
       |GROUP BY 1 ORDER BY sp.source""".stripMargin

  // ---- q148: ingest-time contamination gate — the ADMISSION check a
  //      live pipeline runs on every arriving batch: delta docs are
  //      destined for training, so a delta doc that near-dups any
  //      CORPUS doc already assigned to val would contaminate eval the
  //      moment it lands. Candidates come from the same delta-probes-
  //      corpus band equi-join as q137 (cost ∝ delta, corpus index
  //      pre-materialized in production); the corpus split is the
  //      q143 rule computed over the corpus subset only (the split
  //      that EXISTS when the batch arrives — delta has none yet).
  //      Output per source: arriving docs, rejected (would-contaminate)
  //      count + id checksum, admitted count. ----
  def incrementalContamination(s: SparkSession, d: String): DataFrame = {
    // `base` feeds FOUR scans below (both sides of the banded
    // self-join + the two signature attaches). localCheckpoint it so
    // the tokenize->shingle->MinHash chain runs ONCE: the previous
    // shape leaned on a shingle persist alone, and when suite/driver
    // heap pressure evicted those blocks every downstream scan
    // re-derived the full MinHash chain — r15's only unexplained
    // driver-bench anomaly (q148 at 12.5 s in both driver reps vs
    // 0.89 s idle). The checkpoint pins the lane's cost to one
    // signature pass regardless of cache pressure. (r17: the shingle
    // relation feeds ONLY this checkpoint, so it is no longer
    // persisted at all — the cache materialization was pure overhead.)
    val base = shingledRaw(s, d).withColumn("sig",
      graft.expressions.MinHashSig.minhashSig(col("sh")))
      .select(col("doc_id"), col("sig"))
      .localCheckpoint(true)
    val bandCols = array((0 until MinhashBands).map(b => bandKey(col("sig"), b)): _*)
    val banded = base.select(col("doc_id"),
      posexplode(bandCols).as(Seq("band", "key")))
    val isDelta = (c: org.apache.spark.sql.Column) => c % 5 === 4
    // same corpus-side hot-bucket bound as q137 (the gate probes the
    // corpus index; a capped bucket still rejects on any rep match).
    // capBandedFor: rank only the delta-probed buckets (broadcast
    // semi-prefilter, identical output, no full corpus-side exchange)
    val deltaBand = banded.filter(isDelta(col("doc_id")))
    val corpusBand =
      capBandedFor(banded.filter(!isDelta(col("doc_id"))), deltaBand)
    val cands = deltaBand.as("x")
      .join(corpusBand.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), _ + _)
    val confirmed = cands
      .join(base.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
      .join(base.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
      .select(col("a"), col("b"),
              (matches.cast("double") / lit(MinhashK.toDouble)).as("est_j"))
      .filter(col("est_j") >= 0.5)
    // the split that already exists: q143's rule over the corpus only
    val corpusSplit = TextOps.leakageSplitAssignDf(
        docs(s, d).filter(!isDelta(col("doc_id"))))
      .select(col("doc_id").as("b"), col("split"))
    val rejected = confirmed
      .join(corpusSplit, "b")
      .filter(col("split") === "val")
      .select(col("a").as("doc_id"))
      .distinct()
    val result = docs(s, d).filter(isDelta(col("doc_id")))
      .select(col("doc_id"), col("source"))
      .join(rejected.withColumn("rej", lit(1L)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_delta"),
           sum(coalesce(col("rej"), lit(0L))).cast("long").as("n_rejected"),
           sum(when(col("rej").isNotNull, col("doc_id")).otherwise(lit(0L)))
             .cast("long").as("rejected_checksum"),
           (count(lit(1)) - sum(coalesce(col("rej"), lit(0L)))).cast("long")
             .as("n_admitted"))
      .orderBy("source")
      .localCheckpoint(true)
    result
  }

  /** CTE chain producing `rej (doc_id)` — the delta docs the ingest
    * gate rejects. Shared by the q148 rollup and q149's streaming
    * per-doc twin.
    */
  private[graft] val ingestGateRejCteSql: String = {
    val bands = (0 until MinhashBands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeySql("sig", b)} AS key FROM sigs")
      .mkString("\n UNION ALL ")
    s"""$shingledCte,
       |sigs AS (SELECT doc_id, sh, ${minhashSigFromHashesSql("sh")} AS sig FROM s2),
       |banded AS ($bands),
       |corpusb AS (${capBandedSql("(SELECT * FROM banded WHERE doc_id % 5 <> 4)")}),
       |cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |          FROM banded x JOIN corpusb y
       |            ON x.band = y.band AND x.key = y.key
       |          WHERE x.doc_id % 5 = 4),
       |conf AS (SELECT cands.a, cands.b
       |         FROM cands JOIN sigs x ON x.doc_id = cands.a
       |                    JOIN sigs y ON y.doc_id = cands.b
       |         WHERE CAST(list_sum(list_transform(range(1, ${MinhashK + 1}),
       |           i -> CASE WHEN x.sig[i] = y.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |           / ${MinhashK.toDouble} >= 0.5),
       |${TextOps.leakageSplitCteSqlWhere("WHERE doc_id % 5 <> 4")},
       |rej AS (SELECT DISTINCT conf.a AS doc_id
       |        FROM conf JOIN sp ON sp.doc_id = conf.b
       |        WHERE sp.split = 'val')""".stripMargin
  }

  /** Per-doc admission verdicts — the q149 streaming twin's oracle
    * (same rejected set, per-row instead of rolled up).
    */
  private[graft] val ingestGatePerDocSql: String =
    s"""WITH $ingestGateRejCteSql
       |SELECT d.doc_id, d.source, rej.doc_id IS NULL AS admitted
       |FROM documents d LEFT JOIN rej ON rej.doc_id = d.doc_id
       |WHERE d.doc_id % 5 = 4 ORDER BY d.doc_id""".stripMargin

  private val incrementalContaminationSql =
    s"""WITH $ingestGateRejCteSql
       |SELECT d.source, COUNT(*) AS n_delta,
       | CAST(SUM(CASE WHEN rej.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_rejected,
       | CAST(SUM(CASE WHEN rej.doc_id IS NOT NULL THEN d.doc_id ELSE 0 END)
       |   AS BIGINT) AS rejected_checksum,
       | CAST(COUNT(*) - SUM(CASE WHEN rej.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS n_admitted
       |FROM documents d LEFT JOIN rej ON rej.doc_id = d.doc_id
       |WHERE d.doc_id % 5 = 4
       |GROUP BY 1 ORDER BY d.source""".stripMargin

  // ---- exact-substring dedup (q151) ----
  // The "deduplicating training data makes LMs better" lane: find doc
  // pairs sharing an EXACT run of >= SpanN consecutive tokens, and the
  // length of the longest such run. Unlike q36 (set-Jaccard over
  // distinct 3-grams) this is positional: every occurrence of every
  // 8-token span is indexed with its offset, candidate matches come
  // from a df-capped posting list per span (the cap drops boilerplate
  // spans exactly like production substring-dedup drops hot n-grams),
  // and runs are recovered per pair along position diagonals
  // (pa - pb = const) with the classic gaps-and-islands grouping —
  // len consecutive matching 8-gram starts = one exact common run of
  // len + 7 tokens. One exchange by span hash + one by pair; no
  // suffix array, no all-pairs.
  private[graft] val SpanN = 8
  private[graft] val SpanDfCap = 10

  def substringDedup(s: SparkSession, d: String): DataFrame = {
    // window partitions by (a, b) ONLY, ordered (diag, pa): pa - rn is
    // still constant exactly on each diagonal's consecutive run (both
    // advance by 1 inside a run, and grp is only ever compared within
    // one diag by the grouping key), while hashpartitioning(a, b) now
    // satisfies BOTH downstream aggregates — the run-length groupBy and
    // the per-pair rollup run exchange-free on the window's shuffle
    // (plan-verified: PLANS.md shows one exchange by span hash + one by
    // pair + the presentation sort, nothing else)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a"), col("b")).orderBy(col("diag"), col("pa"))
    val spans = docs(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= SpanN)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(1), size(col("toks")) - (SpanN - 1)),
        i => hash64(concat_ws(" ",
          (0 until SpanN).map(o => element_at(col("toks"), i + o)): _*)))))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("g"))
    val posts = spans.groupBy("g")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("p")))).as("es"))
      .filter(size(col("es")).between(2, SpanDfCap))
    val pairCol = flatten(transform(col("es"), (x, i) =>
      transform(slice(col("es"), i + lit(2), size(col("es"))), y =>
        struct(x.getField("doc_id").as("a"), x.getField("p").as("pa"),
               y.getField("doc_id").as("b"), y.getField("p").as("pb")))))
    val cand = posts.select(explode(pairCol).as("c"))
      .select(col("c.a").as("a"), col("c.pa").as("pa"),
              col("c.b").as("b"), col("c.pb").as("pb"))
      .filter(col("a") < col("b"))
    val runs = cand
      .withColumn("diag", col("pa") - col("pb"))
      .withColumn("grp", col("pa") - row_number().over(w))
      .groupBy("a", "b", "diag", "grp")
      .agg(count(lit(1)).as("len"))
    runs.groupBy("a", "b")
      .agg(sum(col("len")).as("n_matches"),
           (max(col("len")) + lit(SpanN - 1).cast("long")).as("max_run_tokens"))
      .orderBy("a", "b")
  }

  private val substringDedupSql = {
    val gramE = (0 until SpanN).map(o => s"toks[p + $o]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
       |tt AS (SELECT doc_id, toks FROM t WHERE len(toks) >= $SpanN),
       |pp AS (SELECT doc_id, unnest(range(1, len(toks) - ${SpanN - 2})) AS p, toks
       |       FROM tt),
       |sp AS (SELECT doc_id, p, ${hash64Sql(s"($gramE)")} AS g FROM pp),
       |ok AS (SELECT g FROM sp GROUP BY g
       |       HAVING COUNT(*) BETWEEN 2 AND $SpanDfCap),
       |cand AS (SELECT s1.doc_id AS a, s1.p AS pa, s2.doc_id AS b, s2.p AS pb
       |         FROM (SELECT sp.* FROM sp JOIN ok USING (g)) s1
       |         JOIN (SELECT sp.* FROM sp JOIN ok USING (g)) s2 USING (g)
       |         WHERE s1.doc_id < s2.doc_id),
       |runs AS (SELECT a, b, pa,
       |           pa - ROW_NUMBER() OVER (PARTITION BY a, b, pa - pb
       |                                   ORDER BY pa) AS grp,
       |           pa - pb AS diag
       |         FROM cand),
       |rl AS (SELECT a, b, COUNT(*) AS len
       |       FROM runs GROUP BY a, b, diag, grp)
       |SELECT a, b, CAST(SUM(len) AS BIGINT) AS n_matches,
       |       CAST(MAX(len) + ${SpanN - 1} AS BIGINT) AS max_run_tokens
       |FROM rl GROUP BY a, b ORDER BY a, b""".stripMargin
  }

  // ---- intra-doc repeated spans (q156) ----
  // The within-document half of repetition filtering (the cross-doc
  // half is q151): find every document whose text repeats an exact
  // RepeatN-token span, with the count of excess span occurrences and
  // the longest repeated run, recovered with the same positional
  // diagonal machinery as q151 applied to SELF-pairs (pa < pb inside
  // one doc; diag = pb - pa is the repeat offset). RepeatN = 3 because
  // that is this corpus's repetition scale (27 docs repeat a 3-token
  // span at sf0.01; none repeats 5+) — production long-doc corpora
  // raise it. Per-gram occurrence cap bounds pair fan-out exactly like
  // q151's df-cap. Every exchange keys on doc_id (the input
  // repartition feeds the (doc, gram) groupBy exchange-free; one
  // re-cluster after the cached pair explode feeds the window and both
  // rollups; the n_dup join broadcasts) — at 100 TB each doc's work is
  // independent: embarrassingly parallel.
  private[graft] val RepeatN = 3
  private val RepeatOccCap = 10

  def intraRepeat(s: SparkSession, d: String): DataFrame = {
    val (lazyPlan, handles) = intraRepeatLazy(s, d)
    val out = lazyPlan.localCheckpoint(true)
    handles.foreach(_.unpersist(false))
    out
  }

  /** Un-materialized q156 plan + persisted handle to release (the
    * public entry checkpoints, collapsing its plan to an RDD scan).
    */
  private[graft] def intraRepeatLazy(
      s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("diag"), col("pa"))
    val spans = docs(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= RepeatN)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(1), size(col("toks")) - (RepeatN - 1)),
        i => hash64(concat_ws(" ",
          (0 until RepeatN).map(o => element_at(col("toks"), i + o)): _*)))))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("g"))
    val reps = spans.groupBy("doc_id", "g")
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .filter(size(col("ps")).between(2, RepeatOccCap))
      .persist()
    val nDup = reps
      .select(col("doc_id"), (size(col("ps")) - 1).cast("long").as("extra"))
      .groupBy("doc_id").agg(sum(col("extra")).as("n_dup_spans"))
    val pairCol = flatten(transform(col("ps"), (x, i) =>
      transform(slice(col("ps"), i + lit(2), size(col("ps"))), y =>
        struct(x.as("pa"), y.as("pb")))))
    val cand = reps.select(col("doc_id"), explode(pairCol).as("c"))
      .select(col("doc_id"), col("c.pa").as("pa"), col("c.pb").as("pb"))
    val runs = cand
      .withColumn("diag", col("pb") - col("pa"))
      .withColumn("grp", col("pa") - row_number().over(w))
      .groupBy("doc_id", "diag", "grp")
      .agg(count(lit(1)).as("len"))
    val result = runs.groupBy("doc_id")
      .agg((max(col("len")) + lit(RepeatN - 1).cast("long")).as("max_repeat_run"))
      .join(nDup, "doc_id")
      .select(col("doc_id"), col("n_dup_spans"), col("max_repeat_run"))
      .orderBy("doc_id")
    (result, Seq(reps))
  }

  private val intraRepeatSql = {
    val gramE = (0 until RepeatN).map(o => s"toks[p + $o]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
       |tt AS (SELECT doc_id, toks FROM t WHERE len(toks) >= $RepeatN),
       |pp AS (SELECT doc_id, unnest(range(1, len(toks) - ${RepeatN - 2})) AS p,
       |       toks FROM tt),
       |sp AS (SELECT doc_id, p, ${hash64Sql(s"($gramE)")} AS g FROM pp),
       |occ AS (SELECT doc_id, g, COUNT(*) AS cnt FROM sp GROUP BY doc_id, g
       |        HAVING COUNT(*) BETWEEN 2 AND $RepeatOccCap),
       |ndup AS (SELECT doc_id, CAST(SUM(cnt - 1) AS BIGINT) AS n_dup_spans
       |         FROM occ GROUP BY doc_id),
       |spk AS (SELECT sp.doc_id, sp.p, sp.g FROM sp
       |        JOIN occ ON occ.doc_id = sp.doc_id AND occ.g = sp.g),
       |cand AS (SELECT s1.doc_id, s1.p AS pa, s2.p AS pb
       |         FROM spk s1 JOIN spk s2
       |           ON s1.doc_id = s2.doc_id AND s1.g = s2.g AND s1.p < s2.p),
       |runs AS (SELECT doc_id, pb - pa AS diag,
       |           pa - ROW_NUMBER() OVER (PARTITION BY doc_id, pb - pa
       |                                   ORDER BY pa) AS grp
       |         FROM cand),
       |rl AS (SELECT doc_id, COUNT(*) AS len FROM runs
       |       GROUP BY doc_id, diag, grp),
       |mx AS (SELECT doc_id, CAST(MAX(len) + ${RepeatN - 1} AS BIGINT)
       |         AS max_repeat_run FROM rl GROUP BY doc_id)
       |SELECT doc_id, n_dup_spans, max_repeat_run
       |FROM mx JOIN ndup USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // ---- LSH candidate-generation eval (q153) ----
  // "Measure, don't guess" for the approximate dedup path: how much of
  // the exact-Jaccard truth does the q34 MinHash band join actually
  // surface, and how much junk rides along? Truth = pairs with exact
  // 3-gram Jaccard >= 0.5 computed the scale-feasible way (the q36
  // df-capped posting lists — the only truth a 100 TB corpus can
  // afford; pairs whose every shared gram is df-capped are outside the
  // measurement by the same boilerplate-drop rule the production lane
  // uses). Candidates = the q34 banded equi-join BEFORE the est_j
  // filter. One full-outer join of two bounded pair lists; recall and
  // precision reported integer-exact in millionths.
  def lshEval(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d)
    // truth lane (q36 machinery, threshold 0.5)
    val idx = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val posts = idx.groupBy("g")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= DfCap)
      .persist()
    val sizes = posts.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairCol = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))), y =>
        struct(x.as("a"), y.as("b")))))
    val inter = posts.filter(size(col("ds")) >= 2)
      .select(explode(pairCol).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val truth = inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .filter(col("c").cast("double")
        / (col("sza") + col("szb") - col("c")).cast("double") >= 0.5)
      .select(col("a"), col("b"), lit(1L).as("t"))
    // candidate lane (q34 band join, pre-rescore). banded is persisted
    // (r17): it feeds both sides of the capped join, and uncached each
    // side re-ran the MinHash kernel + band explode from the shingle
    // cache — the banded relation is 3 longs/row, the cheapest thing
    // in the lane to hold
    val base = sh.withColumn("sig",
      graft.expressions.MinHashSig.minhashSig(col("sh")))
    val bandCols = array((0 until MinhashBands).map(b => bandKey(col("sig"), b)): _*)
    val banded = base.select(col("doc_id"),
      posexplode(bandCols).as(Seq("band", "key")))
      .persist()
    // the candidate rule under eval IS q34's capped band join — the
    // eval must measure what production generates, cap included
    val cand = capBanded(banded).as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .withColumn("cd", lit(1L))
    val u = truth.join(cand, Seq("a", "b"), "full")
      .select(coalesce(col("t"), lit(0L)).as("t"),
              coalesce(col("cd"), lit(0L)).as("cd"))
    val result = u.agg(
      sum(col("t")).as("n_truth"),
      sum(col("cd")).as("n_cand"),
      sum(col("t") * col("cd")).as("n_hit"),
      expr("(sum(t * cd) * 1000000) div sum(t)").as("recall_millionths"),
      expr("(sum(t * cd) * 1000000) div sum(cd)").as("precision_millionths"))
    val out = result.localCheckpoint(true)
    posts.unpersist(false)
    banded.unpersist(false)
    sh.unpersist(false)
    out
  }

  private val lshEvalSql = {
    val bands = (0 until MinhashBands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeySql("sig", b)} AS key FROM sigs")
      .mkString("\n UNION ALL ")
    s"""WITH $shingledCte,
       |idx AS (SELECT doc_id, unnest(sh) AS g FROM s2),
       |kept AS (SELECT g FROM idx GROUP BY g HAVING COUNT(*) <= $DfCap),
       |idx2 AS (SELECT idx.doc_id, idx.g FROM idx JOIN kept USING (g)),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx2 GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
       |          FROM idx2 x JOIN idx2 y
       |            ON x.g = y.g AND x.doc_id < y.doc_id
       |          GROUP BY 1, 2),
       |truth AS (SELECT a, b, 1 AS t
       |          FROM inter JOIN sizes sa ON sa.doc_id = inter.a
       |                     JOIN sizes sb ON sb.doc_id = inter.b
       |          WHERE CAST(c AS DOUBLE)
       |            / CAST(sa.sz + sb.sz - c AS DOUBLE) >= 0.5),
       |sigs AS (SELECT doc_id, sh, ${minhashSigFromHashesSql("sh")} AS sig FROM s2),
       |banded AS ($bands),
       |bandedc AS (${capBandedSql("banded")}),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, 1 AS cd
       |         FROM bandedc x JOIN banded y
       |           ON x.band = y.band AND x.key = y.key
       |          AND x.doc_id < y.doc_id),
       |u AS (SELECT COALESCE(t, 0) AS t, COALESCE(cd, 0) AS cd
       |      FROM truth FULL JOIN cand USING (a, b))
       |SELECT CAST(SUM(t) AS BIGINT) AS n_truth,
       |       CAST(SUM(cd) AS BIGINT) AS n_cand,
       |       CAST(SUM(t * cd) AS BIGINT) AS n_hit,
       |       (CAST(SUM(t * cd) AS BIGINT) * 1000000) // CAST(SUM(t) AS BIGINT)
       |         AS recall_millionths,
       |       (CAST(SUM(t * cd) AS BIGINT) * 1000000) // CAST(SUM(cd) AS BIGINT)
       |         AS precision_millionths
       |FROM u""".stripMargin
  }

  // ---- q221: HOT-BUCKET SKEW STRESS — the adversarial shape the
  //      BandBucketCap exists for. Web corpora carry near-identical
  //      TEMPLATE clusters (boilerplate pages, mirrored docs with a
  //      one-token delta) that exact dedup cannot remove: every member
  //      lands in the SAME (band, key) bucket, and an uncapped band
  //      self-join emits O(m²) candidate pairs from it — the one
  //      quadratic LSH banding admits at 100 TB. This lane INJECTS
  //      that cluster (SkewK copies of the lowest-id doc's text, each
  //      with a distinct trailing token — deterministic, so both
  //      engines build the identical corpus), runs the production
  //      capped candidate generation, and reports the counts that
  //      prove the bound: max bucket membership ~ SkewK, the uncapped
  //      counterfactual Σ C(m,2) in the millions, the ACTUAL candidate
  //      count linear (≤ cap·Σm), and every injected doc still flagged
  //      as a duplicate (the cap bounds work, it does not lose the
  //      cluster — each member meets the bucket's lowest-id reps, and
  //      for a genuinely near-identical cluster those rescore green).
  //      BandBucketCapSpec fences linearity across two SkewK values.
  private[graft] val SkewK = 2000L
  private[graft] val SkewBase = 9000000L

  /** The skew lane's capped candidate machinery over an amplified
    * corpus with a k-member injected cluster — shared by q221 and the
    * BandBucketCapSpec linearity fence.
    * Returns (n_skew, max_bucket, uncapped_pairs, n_cand,
    * n_dup_flagged) as a single-row DataFrame.
    */
  private[graft] def dedupSkewAt(s: SparkSession, d: String,
      k: Long): DataFrame = {
    val seed = docs(s, d).orderBy("doc_id").limit(1)
      .select(col("text").as("seed_text"))
    val skewDocs = s.range(k).crossJoin(broadcast(seed))
      .select((lit(SkewBase) + col("id")).as("doc_id"),
        concat(col("seed_text"), lit(" v"),
          col("id").cast("string")).as("text"))
    val corpus = docs(s, d).select("doc_id", "text").unionByName(skewDocs)
    val sh = corpus
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), hashedShingles(shingles(col("toks"), 3)).as("sh"))
    val base = sh.withColumn("sig",
        graft.expressions.MinHashSig.minhashSig(col("sh")))
      .select("doc_id", "sig")
      .localCheckpoint(true)
    val bandCols = array((0 until MinhashBands).map(b => bandKey(col("sig"), b)): _*)
    val banded = base.select(col("doc_id"),
      posexplode(bandCols).as(Seq("band", "key"))).persist()
    val cand = capBanded(banded).as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .persist()
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), _ + _)
    val dupFlagged = cand
      .join(base.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
      .join(base.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
      .filter(matches.cast("double") / lit(MinhashK.toDouble) >= 0.5)
      .select(col("b")).distinct()
    val sSkew = skewDocs.agg(count(lit(1)).as("n_skew"))
    val sBuckets = banded.groupBy("band", "key").agg(count(lit(1)).as("m"))
      .agg(max(col("m")).as("max_bucket"),
        sum(expr("(m * (m - 1)) div 2")).cast("long").as("uncapped_pairs"))
    val sCand = cand.agg(count(lit(1)).as("n_cand"))
    val sDup = dupFlagged.agg(count(lit(1)).as("n_dup_flagged"))
    val result = sSkew.crossJoin(broadcast(sBuckets))
      .crossJoin(broadcast(sCand)).crossJoin(broadcast(sDup))
      .select("n_skew", "max_bucket", "uncapped_pairs", "n_cand",
        "n_dup_flagged")
      .localCheckpoint(true)
    cand.unpersist(false)
    banded.unpersist(false)
    result
  }

  def dedupSkew(s: SparkSession, d: String): DataFrame =
    dedupSkewAt(s, d, SkewK)

  private val dedupSkewSql = {
    val bands = (0 until MinhashBands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeySql("sig", b)} AS key FROM sigs")
      .mkString("\n UNION ALL ")
    s"""WITH seed AS (SELECT text FROM documents ORDER BY doc_id LIMIT 1),
       |sk AS (SELECT $SkewBase + i AS doc_id,
       |         (SELECT text FROM seed) || ' v' || CAST(i AS VARCHAR) AS text
       |       FROM range($SkewK) t(i)),
       |corpus AS (SELECT doc_id, text FROM documents
       |           UNION ALL SELECT doc_id, text FROM sk),
       |t0 AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM corpus),
       |t1 AS (SELECT doc_id, toks FROM t0 WHERE len(toks) >= 3),
       |s2 AS (SELECT doc_id,
       |  ${hashedShinglesSql(shinglesSql("toks", 3))} AS sh FROM t1),
       |sigs AS MATERIALIZED (SELECT doc_id,
       |  ${minhashSigFromHashesSql("sh")} AS sig FROM s2),
       |banded AS MATERIALIZED ($bands),
       |bandedc AS (${capBandedSql("banded")}),
       |cand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |        FROM bandedc x JOIN banded y
       |          ON x.band = y.band AND x.key = y.key
       |         AND x.doc_id < y.doc_id),
       |conf AS (SELECT DISTINCT cand.b FROM cand
       |         JOIN sigs sx ON sx.doc_id = cand.a
       |         JOIN sigs sy ON sy.doc_id = cand.b
       |         WHERE CAST(list_sum(list_transform(range(1, ${MinhashK + 1}),
       |           i -> CASE WHEN sx.sig[i] = sy.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |           / ${MinhashK.toDouble} >= 0.5),
       |bstats AS (SELECT band, key, COUNT(*) AS m FROM banded GROUP BY 1, 2)
       |SELECT (SELECT COUNT(*) FROM sk) AS n_skew,
       |       (SELECT MAX(m) FROM bstats) AS max_bucket,
       |       (SELECT CAST(SUM((m * (m - 1)) // 2) AS BIGINT) FROM bstats)
       |         AS uncapped_pairs,
       |       (SELECT COUNT(*) FROM cand) AS n_cand,
       |       (SELECT COUNT(*) FROM conf) AS n_dup_flagged""".stripMargin
  }

  // ---- q206: UNICODE-EQUIVALENCE DEDUP (NFC) — web text arrives in
  //      mixed Unicode normalization (the same word with a precomposed
  //      accent or a base letter + combining mark), and byte-level
  //      dedup is BLIND to it: the renderings differ in every byte.
  //      The fixture constructs exactly that corpus: every doc gets a
  //      composed-accent rendering (every 'e' -> U+00E9) and, for
  //      doc_id % 3 != 0, a decomposed rendering of the SAME text
  //      ('e' -> e + U+0301) — group sizes therefore vary (1 or 2) and
  //      multi-member groups are invisible to raw-byte grouping. The
  //      verb normalizes to NFC (the graft_nfc_normalize CODEGEN
  //      expression on the Spark side — rendering, normalize and the
  //      dedup hash all fuse into one whole-stage-codegen loop, no
  //      row-to-object conversion; DuckDB's nfc_normalize on the oracle side: two
  //      INDEPENDENT UAX#15 implementations must agree on every
  //      normalized byte or the group hashes diverge) and groups by
  //      the normalized hash. Shape at 100 TB: rendering + normalize
  //      are map-side; the exchanges are the dedup groupBy's standard
  //      two-phase count-distinct pair (partial by (key, raw form),
  //      final by key) plus the presentation sort. ----
  def nfcDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val composed = docs.select((col("doc_id") * 2).as("vid"),
      regexp_replace(col("text"), "e", "\u00e9").as("vtext"))
    val decomposed = docs.filter(col("doc_id") % 3 =!= 0)
      .select((col("doc_id") * 2 + 1).as("vid"),
        regexp_replace(col("text"), "e", "e\u0301").as("vtext"))
    composed.unionByName(decomposed)
      .withColumn("ntext",
        graft.expressions.NfcNormalize.normalize(col("vtext")))
      .groupBy(md5(col("ntext").cast("binary")).as("nfc_md5"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(md5(col("vtext").cast("binary"))).as("n_raw_forms"),
           min(col("vid")).as("min_vid"))
      .orderBy("nfc_md5")
  }

  private val nfcDedupSql =
    """WITH v AS (
      |  SELECT doc_id * 2 AS vid,
      |    replace(text, 'e', chr(233)) AS vtext FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1 AS vid,
      |    replace(text, 'e', 'e' || chr(769)) AS vtext FROM documents
      |  WHERE doc_id % 3 <> 0),
      |n AS (SELECT vid, vtext, nfc_normalize(vtext) AS ntext FROM v)
      |SELECT md5(ntext) AS nfc_md5, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(vtext)) AS n_raw_forms,
      |  CAST(MIN(vid) AS BIGINT) AS min_vid
      |FROM n GROUP BY md5(ntext) ORDER BY nfc_md5""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q206_nfc_dedup", nfcDedup, Some(nfcDedupSql),
      "Unicode-equivalence dedup: mixed-normalization renderings (precomposed vs combining-mark accents) grouped by NFC hash — two independent UAX#15 implementations (JDK Normalizer / DuckDB nfc_normalize) must agree byte-for-byte; byte-level dedup is provably blind to every multi-member group"),
    Q("q58_dedup_clusters", dedupClusters, Some(dedupClustersSql),
      "near-dup pairs -> connected components -> canonical doc per cluster"),
    Q("q118_triangles", triangles, Some(trianglesSql),
      "triangle count over the part co-occurrence graph (two equi-joins)"),
    Q("q74_pagerank", pagerank, Some(pagerankSql),
      "integer-quantized PageRank (3 iters) over the near-dup graph"),
    Q("q81_decontaminate", decontaminate, Some(decontaminateSql),
      "benchmark decontamination: broadcast gram set vs streamed corpus"),
    Q("q33_dedup_exact", dedupExact, Some(dedupExactSql),
      "exact dedup via hash-groupBy"),
    Q("q34_dedup_minhash", dedupMinhash, Some(dedupMinhashSql),
      "MinHash sigs + LSH band join + exact-Jaccard rescore"),
    Q("q35_dedup_simhash", dedupSimhash, Some(dedupSimhashSql),
      "32-bit SimHash, chunk-join candidates, hd<=3"),
    Q("q36_dedup_ngram", dedupNgram, Some(dedupNgramSql),
      "exact 3-gram Jaccard via df-capped inverted index"),
    Q("q37_dedup_embedding", dedupEmbedding, Some(dedupEmbeddingSql),
      "embedding cosine near-dup top-20 pairs"),
    Q("q137_dedup_incremental", dedupIncremental, Some(dedupIncrementalSql),
      "incremental ingest dedup: delta batch vs corpus band index, corpus never self-pairs"),
    Q("q145_split_contamination", splitContamination, Some(splitContaminationSql),
      "cross-split contamination audit: near-dup pairs labeled by q143 split, leak rows measured"),
    Q("q147_split_quarantine", splitQuarantine, Some(splitQuarantineSql),
      "split remediation: val-side members of cross-split near-dup pairs quarantined, manifest per source"),
    Q("q148_ingest_gate", incrementalContamination, Some(incrementalContaminationSql),
      "ingest-time contamination gate: delta batch rejected where it near-dups corpus val, cost proportional to delta"),
    Q("q151_substring_dedup", substringDedup, Some(substringDedupSql),
      "exact-substring dedup: positional 8-token span index, df-capped, longest common run via diagonal gaps-and-islands"),
    Q("q153_lsh_eval", lshEval, Some(lshEvalSql),
      "LSH candidate-generation eval: recall/precision of the q34 band join vs exact-Jaccard truth, integer millionths"),
    Q("q156_intra_repeat", intraRepeat, Some(intraRepeatSql),
      "intra-doc repeated spans: positional self-pairs per doc, occurrence-capped, longest repeat run via diagonals"),
    Q("q221_dedup_skew", dedupSkew, Some(dedupSkewSql),
      "hot-bucket skew stress: a 2000-member injected template cluster; candidate count stays linear (BandBucketCap) vs the quadratic uncapped counterfactual, and every injected doc is still flagged as a duplicate"))
}
