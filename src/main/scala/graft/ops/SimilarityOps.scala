package graft.ops

import graft.{Q, Tables}
import graft.functions.VectorFns._
import graft.expressions.VecDot.vecDot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (north-star: ANN retrieval for
  * training-data curation).
  *
  * The ANN lanes, in the roles the q163 eval measured them into:
  *  - q38 brute-force top-k: the exact baseline. The query set is tiny
  *    and broadcast; the corpus streams past it — no shuffle of the big
  *    side, scales linearly with corpus size and number of executors.
  *  - q164 multi-table LSH: THE REGISTERED 100 TB ANN PATH. T=8
  *    independent hyperplane tables, any-table collision, MAX-dedup
  *    before ranking — q163 measures it at mean nDCG@10 ≈ 0.5 where
  *    the single-table lane reads ≈ 0.01–0.07 (miss probability
  *    multiplies across tables). Index cost: T entries per vector,
  *    T bucket probes per query; geometry picked by the DevAnnSweep
  *    measured grid.
  *  - q39 single-table LSH: kept as the pedagogical single-table lane.
  *    Its own eval row (q163 'lsh') shows why one table is not enough:
  *    a 6-plane signature either nails a bucket or returns almost
  *    nothing. Correct, bucketed, scale-shaped — and quality-weak by
  *    measurement, which is the point of shipping the eval.
  *  - q50 IVF and q155/q157 PQ-ADC: the inverted-list and compressed
  *    serving shapes; both also scored in the q163 grid.
  *
  * Hyperplane weights are seeded Scala-side (md5 of "hp_<plane>_<dim>")
  * and inlined as integer/1000.0 literals into BOTH the Spark plan and
  * the SQL twin — the two engines never have to agree on an RNG.
  */
object SimilarityOps {

  private val Dim = 64
  private[graft] val NPlanes = 6
  private[graft] val NQueries = 5

  /** q163's eval width (r12 verdict #2): 5 queries cannot resolve the
    * nDCG effects the grid exists to measure (single-query swings
    * exceed 0.5 — bench_evidence/r12_pq_budget.md), and 25 still reads
    * the trained-vs-seed residual delta as a 0.001 coin-flip; 100 — the
    * width the r12 wide dev eval proved resolvable — reproduces the
    * trained-book win (+0.004 at sf0.1) INSIDE the lane. The
    * rank-metrics lane, its truth sets and the shared routing kit all
    * evaluate this width; the single-system registered lanes keep the
    * 5-query presentation (their outputs are per-qid independent, so a
    * kit probing a SUPERSET of queries serves them unchanged). A side
    * benefit: the old width's IVF floors were inflated by
    * centroid-query leakage (queries 0..24 were themselves cell
    * centroids); at 100 the grid measures honest recall.
    */
  private[graft] val EvalQueries = 100
  private[graft] val TopK = 10

  /** md5-seeded weight in [-1000, 1000] — the shared deterministic
    * hyperplane recipe (both engines inline the same integers, so the
    * two never have to agree on an RNG).
    */
  private def h15(sck: String): Long = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    val hex = mdig.digest(sck.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 2001L - 1000L
  }

  /** Deterministic pseudo-random hyperplane weights, seed-prefix-stable
    * in the plane count (plane p's weights don't depend on how many
    * planes are requested) — the q163-driven sweep varies the count
    * without perturbing the registered lane's buckets.
    */
  private[graft] def planeIntFor(planes: Int): IndexedSeq[IndexedSeq[Long]] =
    (0 until planes).map(p => (0 until Dim).map(j => h15(s"hp_${p}_$j")))
  private[graft] val planeInt: IndexedSeq[IndexedSeq[Long]] = planeIntFor(NPlanes)

  /** Raw float vectors feed graft.expressions.VecDot directly (floats
    * widen exactly, so results match the double-list SQL twin bit for
    * bit) — no per-element cast pass in the hot path.
    */
  /** Exposed for DevAnnSweep's grid (same relation every lane starts from). */
  private[graft] def baseFor(s: SparkSession, d: String): DataFrame = base(s, d)

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .repartition(col("vec_id")) // single-file input → force compute parallelism
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))

  private val baseCte =
    s"""e AS (SELECT vec_id, ${toDoubleSql("embedding")} AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e)""".stripMargin

  // ---- exact brute-force top-k for a broadcast query set ----
  def simTopK(s: SparkSession, d: String): DataFrame = simTopKOn(base(s, d))

  private[graft] def simTopKOn(all: DataFrame, nq: Int = NQueries): DataFrame = {
    val q = all.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
              round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_r"))
    val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      // BIGINT after the filter (cast between window and filter would
      // hide the rn<=k shape from TopKRankPushdown)
      .withColumn("rn", col("rn").cast("long"))
      .orderBy("qid", "rn")
  }

  private val simTopKSql =
    s"""WITH $baseCte,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
       |      WHERE vec_id < $NQueries),
       |scored AS (SELECT q.qid, n.vec_id,
       |  round(${dotFoldSql("q.qv", "n.v")} / (q.qn * n.nrm), 6) AS cos_r
       |  FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
       |ranked AS (SELECT qid, vec_id, cos_r, row_number() OVER
       |  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM scored)
       |SELECT qid, vec_id, cos_r, rn FROM ranked
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin

  // ---- LSH-bucketed ANN (sign of hyperplane projections) ----
  // Spark side: VecDot against the literal weight array — a 64-term
  // explicit sum chain per plane codegens into a huge method (slow to
  // compile, JIT-hostile); the native loop is equivalent because
  // 0.0 + x == x bit-for-bit and both fold left-to-right. The SQL twin
  // keeps the explicit chain.
  private def planeDot(v: Column, w: IndexedSeq[Long]): Column =
    vecDot(v, typedLit(w.map(_ / 1000.0)))
  private def planeDotSql(vE: String, p: Int): String =
    (0 until Dim).map(j => s"($vE)[${j + 1}] * (${planeInt(p)(j)} / 1000.0)")
      .mkString(" + ")

  private def bucketFor(v: Column, ws: IndexedSeq[IndexedSeq[Long]]): Column =
    ws.indices.map(p => when(planeDot(v, ws(p)) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
  private def bucket(v: Column): Column = bucketFor(v, planeInt)
  private def bucketSql(vE: String): String =
    (0 until NPlanes)
      .map(p => s"(CASE WHEN ${planeDotSql(vE, p)} > 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("(", " + ", ")")

  def simAnnLsh(s: SparkSession, d: String): DataFrame =
    simAnnLshOn(base(s, d), planeInt)

  /** Single-table LSH over an externally-supplied plane set — the
    * registered q39 lane at [[planeInt]]; the sweep passes other counts.
    */
  /** Shared top-K presentation: rank candidates per query by cosine
    * with a deterministic id tie-break, keep K, BIGINT the rank after
    * the filter (a cast between window and filter would hide the rn<=k
    * shape from TopKRankPushdown).
    */
  private def rankTopK(cand: DataFrame): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .withColumn("rn", col("rn").cast("long"))
      .orderBy("qid", "rn")
  }

  /** Single-table candidate set (qid, vec_id, cos_r) — scored bucket
    * collisions, pre-ranking (DevAnnSweep counts these as probe cost).
    */
  private[graft] def lshCandidates(
      allIn: DataFrame, ws: IndexedSeq[IndexedSeq[Long]],
      nq: Int = NQueries): DataFrame = {
    val all = allIn.withColumn("bkt", bucketFor(col("v"), ws))
    val q = all.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
              col("nrm").as("qn"), col("bkt").as("qbkt"))
    all.join(broadcast(q),
        col("bkt") === col("qbkt") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
              round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_r"))
  }

  private[graft] def simAnnLshOn(
      allIn: DataFrame, ws: IndexedSeq[IndexedSeq[Long]],
      nq: Int = NQueries): DataFrame =
    rankTopK(lshCandidates(allIn, ws, nq))

  private val simAnnLshSql =
    s"""WITH $baseCte,
       |b AS (SELECT vec_id, v, nrm, ${bucketSql("v")} AS bkt FROM n),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bkt AS qbkt FROM b
       |      WHERE vec_id < $NQueries),
       |cand AS (SELECT q.qid, b.vec_id,
       |  round(${dotFoldSql("q.qv", "b.v")} / (q.qn * b.nrm), 6) AS cos_r
       |  FROM b JOIN q ON b.bkt = q.qbkt AND b.vec_id <> q.qid),
       |ranked AS (SELECT qid, vec_id, cos_r, row_number() OVER
       |  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn
       |  FROM cand)
       |SELECT qid, vec_id, cos_r, rn FROM ranked
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin

  // ---- q164: multi-table LSH — THE REGISTERED 100 TB ANN PATH (the
  //      recall fix for q39 that q163's eval demanded: single-table
  //      6-plane LSH measures near-zero top-10 agreement): T=8
  //      independent tables of 5 hyperplanes each; a pair collides if
  //      ANY table buckets it together, so the miss probability
  //      multiplies across tables (1−(1−p^k)^T). Cost model at 100 TB:
  //      the index stores T entries per vector and probes T buckets per
  //      query — the classic recall-for-space trade, here measured
  //      rather than asserted (q163 scores this lane as 'mlsh' next to
  //      'lsh', 'ivf' and 'adc'). Geometry chosen BY the DevAnnSweep
  //      grid (bench_evidence/r9_ann_sweep.md): at fixed k=5, mean
  //      nDCG@10 climbs 0.19 → 0.27 → 0.45 → 0.53 as T goes
  //      2 → 4 → 6 → 8, each table paying ~n/2^k scored candidates
  //      per query. In deployment k scales as log2(n / target bucket
  //      size) — k pins the per-table candidate fraction (2^-k of the
  //      corpus), T multiplies recall at T× index entries; both are
  //      parameters of the lane now (simAnnMultiLshOn), so re-sizing
  //      is a measurement away, not a code change. Duplicate
  //      candidates from multiple tables collapse
  //      via a (qid, vec_id) MAX aggregate BEFORE ranking (scores of
  //      duplicates are identical doubles, so MAX is a dedup, not a
  //      choice). Same seeded-md5 plane recipe as q39, seeded per
  //      table — both engines derive identical buckets. ----
  private[graft] val MtTables = 8
  private[graft] val MtPlanes = 5

  /** Per-table plane weights, seed-stable in both counts (table t /
    * plane p weights don't depend on how many are requested).
    */
  private[graft] def mtPlaneIntFor(
      tables: Int, planes: Int): IndexedSeq[IndexedSeq[IndexedSeq[Long]]] =
    (0 until tables).map(t => (0 until planes).map(p =>
      (0 until Dim).map(j => h15(s"mt_${t}_${p}_$j"))))
  private[graft] val mtPlaneInt: IndexedSeq[IndexedSeq[IndexedSeq[Long]]] =
    mtPlaneIntFor(MtTables, MtPlanes)

  private def mtBucket(v: Column, ws: IndexedSeq[IndexedSeq[Long]]): Column =
    ws.indices.map { p =>
      when(vecDot(v, typedLit(ws(p).map(_ / 1000.0))) > 0,
           lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  private def mtBucketSql(vE: String, t: Int): String =
    (0 until MtPlanes).map { p =>
      val chain = (0 until Dim)
        .map(j => s"($vE)[${j + 1}] * (${mtPlaneInt(t)(p)(j)} / 1000.0)")
        .mkString(" + ")
      s"(CASE WHEN $chain > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def simAnnMultiLsh(s: SparkSession, d: String): DataFrame =
    simAnnMultiLshOn(base(s, d), mtPlaneInt)

  /** Multi-table LSH over an externally-supplied table×plane weight
    * set — the registered q164 lane at [[mtPlaneInt]]; DevAnnSweep
    * passes other (T, k) geometries.
    */
  /** PRE-dedup collision rows — one per (query, candidate, TABLE)
    * collision, each paying a full scored dot product. This is the
    * lane's true probe COST (DevAnnSweep reports it as scored/query;
    * r9 ADVICE: counting the MAX-deduped uniques understated the
    * per-table work the T-tables model describes).
    */
  private[graft] def mtCollisions(
      all: DataFrame, tws: IndexedSeq[IndexedSeq[IndexedSeq[Long]]],
      nq: Int = NQueries): DataFrame = {
    val tagged = all.select(col("vec_id"), col("v"), col("nrm"),
        posexplode(array(tws.map(tw => mtBucket(col("v"), tw)): _*))
          .as(Seq("t", "bkt")))
    val q = tagged.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
              col("t").as("qt"), col("bkt").as("qbkt"))
    tagged.join(broadcast(q),
        col("t") === col("qt") && col("bkt") === col("qbkt")
          && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
              round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
                .as("cos_r"))
  }

  private[graft] def mtCandidates(
      all: DataFrame, tws: IndexedSeq[IndexedSeq[IndexedSeq[Long]]],
      nq: Int = NQueries): DataFrame =
    mtCollisions(all, tws, nq)
      .groupBy("qid", "vec_id").agg(max(col("cos_r")).as("cos_r"))

  private[graft] def simAnnMultiLshOn(
      all: DataFrame, tws: IndexedSeq[IndexedSeq[IndexedSeq[Long]]],
      nq: Int = NQueries): DataFrame =
    rankTopK(mtCandidates(all, tws, nq))

  /** CTE chain ending in `mr (qid, vec_id, cos_r, rn)` — the SQL twin
    * of [[simAnnMultiLsh]]'s ranked list, shared by q164 and q163.
    */
  private def multiLshCteSql(nq: Int = NQueries): String = {
    val arms = (0 until MtTables)
      .map(t => s"SELECT vec_id, v, nrm, $t AS t, ${mtBucketSql("v", t)} AS bkt FROM n")
      .mkString("\n       UNION ALL ")
    s"""mb AS ($arms),
       |mq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, t AS qt, bkt AS qbkt
       |       FROM mb WHERE vec_id < $nq),
       |mc AS (SELECT mq.qid, mb.vec_id,
       |  round(${dotFoldSql("mq.qv", "mb.v")} / (mq.qn * mb.nrm), 6) AS cos_r
       |  FROM mb JOIN mq ON mb.t = mq.qt AND mb.bkt = mq.qbkt
       |    AND mb.vec_id <> mq.qid),
       |md AS (SELECT qid, vec_id, MAX(cos_r) AS cos_r FROM mc
       |       GROUP BY qid, vec_id),
       |mr AS (SELECT qid, vec_id, cos_r, rn FROM (SELECT qid, vec_id, cos_r,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC)
       |    AS rn FROM md) WHERE rn <= $TopK)""".stripMargin
  }

  private val simAnnMultiLshSql =
    s"""WITH $baseCte,
       |${multiLshCteSql()}
       |SELECT qid, vec_id, cos_r, CAST(rn AS BIGINT) AS rn
       |FROM mr ORDER BY qid, rn""".stripMargin

  // ---- IVF ANN: coarse-quantize into inverted lists, probe the
  //      nearest lists only. Centroids are seed vectors chosen
  //      deterministically (a production build would k-means them —
  //      the plan shape is identical). The cell count GROWS WITH THE
  //      CORPUS (k = min(50k, max(16, ceil(n/64))), the same capped
  //      regime as SemDeDup's semCellCount) so cells keep ~64 members
  //      at any scale, and assignment is a BROADCAST-JOIN argmin like
  //      [[assignCells]] — a literal expression per cell would blow up
  //      codegen once k reaches the thousands (VERDICT r7 #4). The SQL
  //      twin replicates the argmin as a row_number over per-centroid
  //      negated cosine and derives k from the same COUNT(*): both
  //      engines compute bit-identical doubles (same left-to-right
  //      fold, same float→double-widened centroid values), so cell
  //      assignment, probing and the final ranking agree exactly;
  //      recall-vs-exact envelope additionally asserted in
  //      SimilaritySpec. ----
  private[graft] val IvfProbes = 2
  private val IvfCellTarget = 64L // target members per cell
  private val IvfMinCells = 16L
  private val IvfKMax = 50000L // bounds assignment at O(n·k_max), broadcast at MB-scale

  /** Corpus-derived IVF cell count — footer-metadata count, no scan. */
  private def ivfCellCount(s: SparkSession, d: String): Long =
    ivfKFor(Tables.embeddings(s, d).count())

  private[graft] def ivfKFor(n: Long): Long =
    math.min(IvfKMax, math.max(IvfMinCells, (n + IvfCellTarget - 1) / IvfCellTarget))

  /** k-means demo (q64) keeps a FIXED 16-cell index: it exercises the
    * one-Lloyd-iteration primitive, not index sizing.
    */
  private val KmeansCells = 16

  /** Deterministic "centroids" for q64: the first KmeansCells vectors
    * by id, collected to the driver (metadata-scale: cells × dim
    * floats) and inlined as literal arrays — assignment is then a pure
    * map-side argmin, no shuffle, no second pass over the corpus.
    */
  private def literalCentroids(all: DataFrame): Array[(Long, Array[Double], Double)] =
    all.filter(col("vec_id") < KmeansCells).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getDouble(2))
    }

  /** (negated cosine, cid) structs sort lexicographically → index 0 is
    * the nearest cell, prefix IvfProbes are the probe cells.
    */
  private def cellStructs(cents: Array[(Long, Array[Double], Double)]): Array[Column] =
    cents.map { case (cid, cv, cn) =>
      struct((-vecDot(col("v"), typedLit(cv.toSeq)) / (col("nrm") * lit(cn))).as("negSim"),
             lit(cid).as("cid"))
    }

  def simAnnIvf(s: SparkSession, d: String): DataFrame =
    simAnnIvfOn(base(s, d), ivfCellCount(s, d))

  private[graft] def simAnnIvfOn(
      all: DataFrame, k: Long, nProbes: Int = IvfProbes): DataFrame =
    rankTopK(ivfCandidates(all, k, nProbes))

  /** IVF exact-cosine ranking from an ALREADY-COMPUTED routing — q163
    * evaluates three systems that share the same n×k coarse pass
    * ('ivf', 'ivfpq', 'rivfpq'); feeding them one materialized routing
    * instead of re-deriving it per system removes two full corpus
    * routing exchanges from the grid (r9 VERDICT #3).
    */
  private[graft] def simAnnIvfRouted(
      assigned: DataFrame, probes: DataFrame): DataFrame =
    rankTopK(scoreProbed(assigned, probes))

  /** IVF candidate set (qid, vec_id, cos_r) at a given probe count —
    * scored members of the probed cells, pre-ranking (DevAnnSweep
    * sweeps `nProbes` and counts these as probe cost).
    */
  private[graft] def ivfCandidates(
      all: DataFrame, k: Long, nProbes: Int = IvfProbes): DataFrame = {
    val (assigned, probes) = ivfRouting(all, k, nProbes)
    scoreProbed(assigned, probes)
  }

  /** The IVF coarse index split from its scoring: `assigned (vec_id, v,
    * nrm, cell)` — every corpus vector routed to its nearest cell — and
    * `probes (qid, qv, qn, cell)` — each query's top-nProbes cells.
    * q50 joins them and scores exact cosine; q171 joins them and scores
    * by the PQ lookup table instead.
    */
  private[graft] def ivfRouting(
      all: DataFrame, k: Long, nProbes: Int = IvfProbes): (DataFrame, DataFrame) = {
    val (assigned, ranked) = ivfRoutingRanked(all, k, nProbes)
    (assigned, ranked.drop("crn"))
  }

  /** Routing with the probe rank kept (`crn`) — lanes needing several
    * probe budgets from ONE n×k scoring pass (q174's post/boost modes)
    * filter this instead of re-routing.
    */
  private[graft] def ivfRoutingRanked(
      all: DataFrame, k: Long, nProbes: Int): (DataFrame, DataFrame) =
    ivfRoutingRankedFor(all, k, nProbes, col("vec_id") < NQueries)

  /** Routing with an arbitrary QUERY-set predicate — q180's batch twin
    * probes for the streaming arrival slice instead of the standard
    * vec_id < NQueries query set.
    */
  private[graft] def ivfRoutingRankedFor(
      all: DataFrame, k: Long, nProbes: Int,
      queryPred: Column): (DataFrame, DataFrame) = {
    val cents = all.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), toDouble(col("v")).as("cv"),
              col("nrm").as("cn"))
    ivfRoutingRankedWith(all, cents, nProbes, queryPred)
  }

  /** Routing against an EXPLICIT centroid relation `(cid, cv, cn)` —
    * q199 routes the corpus under the post-split kit, whose centroids
    * are no longer a vec_id prefix of the corpus.
    */
  private[graft] def ivfRoutingRankedWith(
      all: DataFrame, cents: DataFrame, nProbes: Int,
      queryPred: Column): (DataFrame, DataFrame) = {
    // n×k candidate scores from a broadcast nested-loop join; the
    // corpus side never shuffles
    val scored = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        (-vecDot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("negsim"))
    // assignment: min(struct) argmin via a map-side-combined hash agg —
    // collapses n×k back to n BEFORE any shuffle (no window over n×k)
    val assigned = scored
      .groupBy("vec_id")
      .agg(min(struct(col("negsim"), col("cid"))).as("sc"),
           first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("v"), col("nrm"),
              col("sc").getField("cid").as("cell"))
    // probes: top-nProbes cells per QUERY vector only (the predicate
    // pushes below the centroid cross join, so this scores
    // |queries|×k rows — window is fine at that cardinality)
    val wp = Window.partitionBy("vec_id").orderBy(col("negsim").asc, col("cid").asc)
    val probes = scored.filter(queryPred)
      .withColumn("crn", row_number().over(wp))
      .filter(col("crn") <= nProbes)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
              col("nrm").as("qn"), col("cid").as("cell"), col("crn"))
    (assigned, probes)
  }

  /** Exact-cosine scoring of a probe set — q180's batch twin needs the
    * otherwise-private scorer from outside this object.
    */
  private[graft] def scoreProbedOn(
      assigned: DataFrame, probes: DataFrame): DataFrame =
    scoreProbed(assigned, probes)

  /** ON-DISK serving index for the exact-rerank read path (r10 VERDICT
    * #1, closing the q173→q179→q180 lifecycle loop): every corpus
    * vector routed to its cell (the q50 assignment) WRITTEN
    * partitionBy(cell) — the raw (v, nrm) sibling of q179's PQ-code
    * postings, i.e. the piece of the index a serving tier re-ranks
    * with. q180 no longer probes an in-memory checkpoint: each
    * micro-batch reads ONLY its probed cells back through
    * [[probedVectorRead]]'s partition-PRUNED scan, so a probes-of-k
    * fetch touches probes-of-k partition directories on disk at any
    * scale. Fixture-markered against the source parquet (the r7
    * stale-fixture discipline).
    */
  private[graft] def vectorLayoutDir(s: SparkSession, d: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_srvvec_" +
      java.lang.Integer.toHexString(d.hashCode)
    val marker = java.nio.file.Paths.get(out, "_FIXTURE_OK")
    if (!graft.Fixtures.markerCurrent(marker, s"$d/embeddings.parquet")) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(out))
      val (assigned, _) = ivfRouting(base(s, d), ivfCellCount(s, d))
      // one writer task per cell, clustered by vec_id within the list
      assigned.repartition(col("cell"))
        .sortWithinPartitions("cell", "vec_id")
        .write.partitionBy("cell").mode("overwrite").parquet(out)
      graft.Fixtures.writeMarker(marker, s"$d/embeddings.parquet")
    }
    out
  }

  /** Partition-pruned read of the probed cells' vector lists — the
    * serving tier's per-request fetch against [[vectorLayoutDir]].
    * `cells` is metadata-scale (arrivals × probes), inlined as a
    * literal isin so pruning happens at the FileScan (PlanShapeSpec
    * asserts PartitionFilters non-empty). The partition column comes
    * back as the directory-inferred integer type — cast to long so
    * joins against the routing's long cells line up.
    */
  private[graft] def probedVectorRead(
      s: SparkSession, dir: String, cells: Seq[Long]): DataFrame =
    s.read.parquet(dir)
      .filter(col("cell").isin(cells: _*))
      .select(col("cell").cast("long").as("cell"), col("vec_id"),
              col("v"), col("nrm"))

  /** Exact-cosine scoring of a probe set's cell members — the shared
    * candidate generator behind [[ivfCandidates]] and q174's modes.
    */
  private def scoreProbed(assigned: DataFrame, probes: DataFrame): DataFrame =
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
              round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_r"))

  /** Routing-only prefix of the IVF twin: CTEs through `iasg`
    * (assignment) and `iprb` (query probes) — shared by the exact
    * scorer below and q171's ADC scorer.
    */
  private def ivfRouteCteSql(nq: Int = NQueries): String =
    s"""ikq AS (SELECT LEAST($IvfKMax, GREATEST($IvfMinCells,
       |  CAST(CEIL(COUNT(*) / $IvfCellTarget.0) AS BIGINT))) AS k FROM n),
       |icc AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n, ikq
       |      WHERE vec_id < ikq.k),
       |ia AS (SELECT n.vec_id, n.v, n.nrm, icc.cid,
       |  -(${dotFoldSql("n.v", "icc.cv")}) / (n.nrm * icc.cn) AS negsim
       |  FROM n CROSS JOIN icc),
       |ir0 AS (SELECT vec_id, v, nrm, cid, row_number() OVER
       |  (PARTITION BY vec_id ORDER BY negsim ASC, cid ASC) AS crn
       |  FROM ia),
       |iasg AS (SELECT vec_id, v, nrm, cid AS cell FROM ir0 WHERE crn = 1),
       |iprb AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, cid AS cell
       |           FROM ir0 WHERE crn <= $IvfProbes AND vec_id < $nq)""".stripMargin

  /** CTE chain ending in `ivr (qid, vec_id, cos_r, rn)` — the SQL twin
    * of [[simAnnIvfOn]]'s ranked list, i-prefixed so it composes with
    * the PQ and multi-LSH chains inside q163's twin.
    */
  private def ivfCteSql(nq: Int = NQueries): String =
    s"""${ivfRouteCteSql(nq)},
       |icand AS (SELECT p.qid, s.vec_id,
       |  round(${dotFoldSql("p.qv", "s.v")} / (p.qn * s.nrm), 6) AS cos_r
       |  FROM iasg s JOIN iprb p ON s.cell = p.cell
       |  WHERE s.vec_id <> p.qid),
       |ivr AS (SELECT qid, vec_id, cos_r, rn FROM (SELECT qid, vec_id, cos_r,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC)
       |    AS rn FROM icand) WHERE rn <= $TopK)""".stripMargin

  private val simAnnIvfSql =
    s"""WITH $baseCte,
       |${ivfCteSql()}
       |SELECT qid, vec_id, cos_r, rn FROM ivr ORDER BY qid, rn""".stripMargin

  // ---- one full k-means (Lloyd) iteration: the iterative-ML primitive
  //      underlying IVF index training. Assignment is a map-side
  //      literal-centroid argmin (fixed 16 cells — the primitive under
  //      test is the Lloyd update, not index sizing; q50's index derives
  //      its k from the corpus); the centroid
  //      update is ONE partial+final hash aggregate over (cell, dim)
  //      pairs — at 100 TB that is a single shuffle of 16×64 partial
  //      sums per map task, not of the data. Element sums are
  //      floor(x·1e6) integer-quantized so the cross-engine mean is
  //      exact (double summation order would otherwise differ). ----
  def kmeansIter(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d)
    val candStructs = cellStructs(literalCentroids(all))
    all
      .withColumn("cell",
        sort_array(array(candStructs.toIndexedSeq: _*)).getItem(0).getField("cid"))
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("dim", col("dim").cast("long")) // BIGINT like the SQL twin's range()
      .groupBy("cell", "dim")
      .agg(count(lit(1)).as("n_members"),
           ((sum(floor(col("x").cast("double") * 1000000.0).cast("long")).cast("double")
             / 1000000.0) / count(lit(1))).as("new_c"))
      .orderBy("cell", "dim")
  }

  private val kmeansIterSql =
    s"""WITH $baseCte,
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
       |      WHERE vec_id < $KmeansCells),
       |a AS (SELECT n.vec_id, n.v, c.cid,
       |  -(${dotFoldSql("n.v", "c.cv")}) / (n.nrm * c.cn) AS negsim
       |  FROM n CROSS JOIN c),
       |r AS (SELECT vec_id, v, cid, row_number() OVER
       |  (PARTITION BY vec_id ORDER BY negsim ASC, cid ASC) AS crn
       |  FROM a),
       |assigned AS (SELECT vec_id, v, cid AS cell FROM r WHERE crn = 1),
       |x AS (SELECT cell, t.i - 1 AS dim,
       |        CAST(floor(v[t.i] * 1000000.0) AS BIGINT) AS q
       |      FROM assigned, range(1, ${Dim + 1}) t(i))
       |SELECT cell, dim, COUNT(*) AS n_members,
       | ((CAST(SUM(q) AS DOUBLE) / 1000000.0) / COUNT(*)) AS new_c
       |FROM x GROUP BY cell, dim ORDER BY cell, dim""".stripMargin

  // ---- q96: int8 embedding quantization — the storage/serving-side
  //      compression step of a vector pipeline (4x smaller index,
  //      SIMD-able integer dot products). Per-vector symmetric scale
  //      127/max|x|; rounding is floor(x+0.5) (identical half-up in
  //      both engines — round() HALF_EVEN/HALF_UP variance is exactly
  //      the cross-engine trap). Map-side expressions only: at 100 TB
  //      this is a scan-shaped pass — the repartition below exists ONLY
  //      because the local testdata is a single parquet file (one scan
  //      task); a multi-file deployment drops it and shuffles nothing
  //      but the final sort. An all-zero vector (padding / failed
  //      encode) must not reach 127/0 = Inf → 0·Inf = NaN, whose
  //      BIGINT cast diverges across engines: its scale is pinned to
  //      0 on both sides. ----
  def quantizeEmbeddings(s: SparkSession, d: String): DataFrame = {
    val q127 = lit(127L)
    Tables.embeddings(s, d)
      .repartition(col("vec_id"))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("maxabs",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("scale",
        when(col("maxabs") === 0, lit(0.0))
          .otherwise(lit(127.0) / col("maxabs")))
      .withColumn("qv", transform(col("v"), x =>
        greatest(-q127, least(q127,
          floor(x * col("scale") + lit(0.5)).cast("long")))))
      .select(col("vec_id"),
              floor(col("maxabs") * 1e6).cast("long").as("maxabs_q6"),
              aggregate(col("qv"), lit(0L), _ + _).as("sum_q"),
              aggregate(col("qv"), lit(0L), (a, x) => a + abs(x)).as("sum_absq"),
              aggregate(col("qv"), lit(0L),
                (a, x) => a + when(abs(x) === q127, 1L).otherwise(0L)).as("n_sat"))
      .orderBy("vec_id")
  }

  private val quantizeEmbeddingsSql =
    s"""WITH e AS (SELECT vec_id, ${toDoubleSql("embedding")} AS v FROM embeddings),
       |m AS (SELECT vec_id, v,
       |        list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
       |q AS (SELECT vec_id, maxabs, list_transform(v, x ->
       |        greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
       |          CAST(floor(x * (CASE WHEN maxabs = 0 THEN 0.0
       |                          ELSE 127.0 / maxabs END) + 0.5) AS BIGINT)))) AS qv
       |      FROM m)
       |SELECT vec_id, CAST(floor(maxabs * 1e6) AS BIGINT) AS maxabs_q6,
       | CAST(list_sum(qv) AS BIGINT) AS sum_q,
       | CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS sum_absq,
       | CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
       |FROM q ORDER BY vec_id""".stripMargin

  // ---- q131/q134: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) —
  //      semantic dedup by clustering embeddings and comparing pairs
  //      WITHIN each cluster only. That is the whole trick: the O(n²)
  //      all-pairs cosine becomes Σ over cells of O(|cell|²), and the
  //      candidate generator is a plain equi-join on the cell id that
  //      shuffles each vector once. The cell count is DERIVED FROM THE
  //      CORPUS — k = min(50k, ceil(n / target-cell-size)) — the cap is
  //      the paper's own regime (~50k clusters at LAION scale) and it
  //      is what keeps the OTHER stage linear: assignment computes n·k
  //      dot products, so an uncapped k ∝ n would make assignment
  //      O(n²/64) and grow the centroid broadcast without bound. With
  //      the cap, assignment is O(n·k_max) and the broadcast tops out
  //      at k_max×(dim+2) doubles ≈ 26 MB — cluster-viable. Past the
  //      cap, cells grow beyond 64 members; per-cell pair work is then
  //      bounded by the cosine threshold density, not the cell size,
  //      which matches the paper (fixed k, growing cells). Centroids
  //      are the first k
  //      vectors refined by ONE Lloyd step (the q64 update: quantized-
  //      exact per-(cell,dim) means, identical in both engines), and
  //      assignment is a BROADCAST-JOIN argmin (see [[assignCells]]) —
  //      never a per-cell literal expression, which could not codegen
  //      once k reaches the thousands. Drop policy is deterministic
  //      and closed-form (no iteration): a vector is dropped when any
  //      same-cell neighbor with a SMALLER vec_id sits at cosine >=
  //      tau. q131 emits the per-cell audit a curation run reports
  //      (members, pairs checked, dropped, kept); q134 emits the kept
  //      vec_id set — the artifact the downstream pipeline consumes. ----
  private val SemTau = 0.40
  private val SemCellTarget = 64L // target members per cell
  private val SemMinCells = 16L
  private val SemKMax = 50000L // the paper's LAION regime; caps assignment at O(n·k_max)

  /** Corpus-derived cell count: k = min(50k, max(16, ceil(n / 64))).
    * The count is a parquet footer-metadata read, not a data scan. The
    * upper cap is load-bearing at scale: it bounds the assignment
    * stage's n·k dot products to O(n·k_max) and the centroid broadcast
    * to k_max×(dim+2) doubles.
    */
  private def semCellCount(s: SparkSession, d: String): Long = {
    val n = Tables.embeddings(s, d).count()
    math.min(SemKMax, math.max(SemMinCells, (n + SemCellTarget - 1) / SemCellTarget))
  }

  /** Seed centroids: the first k vectors by id, double-widened so the
    * pass-1 dot product is float×double on both engines (floats widen
    * exactly — same values as the SQL twin's double lists).
    */
  private def semSeeds(all: DataFrame, k: Long): DataFrame =
    all.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), toDouble(col("v")).as("cv"),
              col("nrm").as("cn"))

  /** Broadcast-join argmin assignment: every vector meets every
    * centroid through a broadcast nested-loop join (centroids are
    * bounded by the k cap — at most k_max × dim doubles ≈ 26 MB,
    * comfortably broadcastable), `min(struct(negsim, cid))`
    * picks the nearest cell with a deterministic cid tie-break, and a
    * map-side-combined hash aggregate collapses the n×k candidate rows
    * back to n before the (single) shuffle. This survives k in the
    * thousands where a literal expression per cell (the fixed-k shape
    * q64 uses for its 16-cell Lloyd demo) would blow up codegen; q50's
    * IVF assignment uses the same broadcast-argmin shape inline.
    * The SQL twin is the same argmin as a row_number() = 1.
    */
  private def assignCells(all: DataFrame, cents: DataFrame): DataFrame =
    all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"),
        struct((-vecDot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("negsim"),
               col("cid")).as("sc"))
      .groupBy("vec_id")
      .agg(min(col("sc")).as("sc"),
           first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("v"), col("nrm"),
              col("sc").getField("cid").as("cell"))

  /** One Lloyd refinement — the q64 update step feeding back into
    * assignment: per-(cell, dim) quantized-exact means (floor(x·1e6)
    * longs, so both engines agree bit-for-bit), reassembled into
    * per-cell centroid vectors + norms. Output is k×(dim+2) with
    * k ≤ [[SemKMax]], so the broadcast stays MB-scale by construction.
    */
  private def lloydRefine(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg(((sum(floor(col("x").cast("double") * 1000000.0).cast("long")).cast("double")
             / 1000000.0) / count(lit(1))).as("cx"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cx")))),
                     e => e.getField("cx")).as("cv"))
      .select(col("cell").as("cid"), col("cv"),
              sqrt(vecDot(col("cv"), col("cv"))).as("cn"))

  /** Shared SemDeDup core: cluster (derived k, seeded + one Lloyd
    * step, broadcast-join argmin) and generate same-cell candidate
    * pairs. Returns (assigned, pairs), both persisted — callers own
    * the release.
    */
  private def semCore(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val k = semCellCount(s, d)
    val all = base(s, d)
    val assigned = assignCells(all, lloydRefine(assignCells(all, semSeeds(all, k))))
      .persist()
    val x = assigned.select(col("cell"), col("vec_id").as("a"),
                            col("v").as("va"), col("nrm").as("na"))
    val y = assigned.select(col("cell"), col("vec_id").as("b"),
                            col("v").as("vb"), col("nrm").as("nb"))
    val pairs = x.join(y, Seq("cell")).filter(col("a") < col("b"))
      .select(col("cell"), col("b"),
              round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos_r"))
      .persist()
    (assigned, pairs)
  }

  /** Lazy variant for plan dumps: the audit BEFORE the eager
    * checkpoint, plus the persisted handles the caller must release.
    */
  private[graft] def semDedupLazy(s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val (assigned, pairs) = semCore(s, d)
    val members = assigned.groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    val checked = pairs.groupBy("cell").agg(count(lit(1)).as("n_pairs"))
    val dropped = pairs.filter(col("cos_r") >= SemTau)
      .groupBy("cell").agg(countDistinct(col("b")).as("n_dropped"))
    val result = members
      .join(checked, Seq("cell"), "left")
      .join(dropped, Seq("cell"), "left")
      .select(col("cell"), col("n_vecs"),
              coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
              coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
              (col("n_vecs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
      .orderBy("cell")
    (result, Seq(pairs, assigned))
  }

  def semDedup(s: SparkSession, d: String): DataFrame = {
    val (lazyResult, handles) = semDedupLazy(s, d)
    val result = lazyResult.localCheckpoint(true)
    handles.foreach(_.unpersist(false))
    result
  }

  /** q134: the kept-id lane — same clustering and drop policy as the
    * q131 audit, emitting the surviving (vec_id, cell) rows a curation
    * pipeline actually writes out. Anti-join against the dropped set:
    * the dropped ids are a distinct aggregate of the pair table, never
    * the corpus itself.
    */
  private[graft] def semKeptLazy(s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val (assigned, pairs) = semCore(s, d)
    val droppedIds = pairs.filter(col("cos_r") >= SemTau)
      .select(col("b").as("vec_id")).distinct()
    val result = assigned.join(droppedIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
    (result, Seq(pairs, assigned))
  }

  def semDedupKept(s: SparkSession, d: String): DataFrame = {
    val (lazyResult, handles) = semKeptLazy(s, d)
    val result = lazyResult.localCheckpoint(true)
    handles.foreach(_.unpersist(false))
    result
  }

  /** The clustering pipeline as SQL CTEs shared by the q131 and q134
    * twins: derived k → seeds → pass-1 argmin → quantized-mean Lloyd
    * update → pass-2 argmin → same-cell pairs.
    */
  private val semCoreCte =
    s"""$baseCte,
       |params AS (SELECT LEAST($SemKMax, GREATEST($SemMinCells,
       |    CAST(CEIL(COUNT(*) / $SemCellTarget.0) AS BIGINT))) AS k
       |  FROM embeddings),
       |seeds AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n, params
       |          WHERE vec_id < k),
       |a1 AS (SELECT n.vec_id, n.v, s.cid,
       |  -(${dotFoldSql("n.v", "s.cv")}) / (n.nrm * s.cn) AS negsim
       |  FROM n CROSS JOIN seeds s),
       |r1 AS (SELECT vec_id, v, cid, row_number() OVER
       |  (PARTITION BY vec_id ORDER BY negsim ASC, cid ASC) AS crn
       |  FROM a1),
       |asg1 AS (SELECT vec_id, v, cid AS cell FROM r1 WHERE crn = 1),
       |xq AS (SELECT cell, t.i - 1 AS dim,
       |        CAST(floor(v[t.i] * 1000000.0) AS BIGINT) AS q
       |       FROM asg1, range(1, ${Dim + 1}) t(i)),
       |cm AS (SELECT cell, dim,
       |        ((CAST(SUM(q) AS DOUBLE) / 1000000.0) / COUNT(*)) AS cx
       |       FROM xq GROUP BY cell, dim),
       |cents AS (SELECT cell AS cid, list(cx ORDER BY dim) AS cv
       |          FROM cm GROUP BY cell),
       |c2 AS (SELECT cid, cv, ${normSql("cv")} AS cn FROM cents),
       |a2 AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
       |  -(${dotFoldSql("n.v", "c.cv")}) / (n.nrm * c.cn) AS negsim
       |  FROM n CROSS JOIN c2 c),
       |r2 AS (SELECT vec_id, v, nrm, cid, row_number() OVER
       |  (PARTITION BY vec_id ORDER BY negsim ASC, cid ASC) AS crn
       |  FROM a2),
       |assigned AS (SELECT vec_id, v, nrm, cid AS cell FROM r2 WHERE crn = 1),
       |pairs AS (SELECT x.cell, y.vec_id AS b,
       |  round(${dotFoldSql("x.v", "y.v")} / (x.nrm * y.nrm), 6) AS cos_r
       |  FROM assigned x JOIN assigned y
       |    ON x.cell = y.cell AND x.vec_id < y.vec_id)""".stripMargin

  private val semDedupSql =
    s"""WITH $semCoreCte,
       |members AS (SELECT cell, COUNT(*) AS n_vecs FROM assigned GROUP BY cell),
       |checked AS (SELECT cell, COUNT(*) AS n_pairs FROM pairs GROUP BY cell),
       |dropped AS (SELECT cell, COUNT(DISTINCT b) AS n_dropped FROM pairs
       |            WHERE cos_r >= $SemTau GROUP BY cell)
       |SELECT m.cell, m.n_vecs,
       |  COALESCE(ch.n_pairs, 0) AS n_pairs,
       |  COALESCE(dr.n_dropped, 0) AS n_dropped,
       |  m.n_vecs - COALESCE(dr.n_dropped, 0) AS n_kept
       |FROM members m
       |LEFT JOIN checked ch USING (cell)
       |LEFT JOIN dropped dr USING (cell)
       |ORDER BY m.cell""".stripMargin

  private val semDedupKeptSql =
    s"""WITH $semCoreCte,
       |dropped AS (SELECT DISTINCT b AS vec_id FROM pairs
       |            WHERE cos_r >= $SemTau)
       |SELECT a.vec_id, a.cell FROM assigned a
       |LEFT JOIN dropped d ON a.vec_id = d.vec_id
       |WHERE d.vec_id IS NULL
       |ORDER BY a.vec_id""".stripMargin

  // ---- q155: product quantization codes — the compression step real
  //      billion-vector ANN serving runs on (PQ: subspace codebooks,
  //      1 byte per subspace instead of 4·Dim bytes). Dim=64 splits
  //      into PqM=8 subspaces of PqSub=8 dims; each subspace's PqK=16
  //      "codebook" is the deterministic q64-style seed set (the first
  //      16 vectors' sub-vectors, collected once — metadata-scale —
  //      and inlined as literals), so assignment is a pure map-side
  //      argmin over 8×16 explicit squared-L2 chains: zero shuffle
  //      except the presentation sort, scan-shaped at any corpus size.
  //      The one-assignment pass is the primitive (q64's note applies:
  //      real PQ training iterates Lloyd per subspace — each iteration
  //      is exactly this pass plus q64's centroid update). Both
  //      engines fold the 8-term distance chains left-to-right over
  //      identically float→double-widened values, so codes, errors and
  //      tie-breaks agree bit-for-bit.
  private[graft] val PqM = 8
  private[graft] val PqSub = Dim / PqM
  private[graft] val PqK = 16

  /** Literal PQ codebooks: the first PqK vectors' sub-vectors,
    * float→double widened (metadata-scale collect, q64 precedent).
    */
  private def pqCents(all: DataFrame): Array[(Long, Array[Double])] =
    pqCentsFrom(all, 0L)

  /** Seed vectors [lo, lo + PqK) — lo = NQueries gives the HELD-OUT
    * seed set (no query vector inside the codebook, q169).
    */
  private def pqCentsFrom(all: DataFrame, lo: Long): Array[(Long, Array[Double])] =
    all.filter(col("vec_id") >= lo && col("vec_id") < lo + PqK).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  /** Long-form PQ assignment (vec_id, s, code, dist) — map-side argmin
    * against the literal codebooks, shared by q155 (codes) and q157
    * (ADC search). Distance is the Cauchy expansion
    * v·v − 2·v·c + c·c on subspace slices through the native vec_dot
    * kernel; the codebook loop is a transform lambda (see
    * [[pqArgminsB]] — the r9 fix that keeps the stage inside compiled
    * codegen). The SQL twin uses product chains folded in the same
    * order (0.0 + x == x bit-for-bit, the q39 argument) — same ops,
    * same order, same doubles.
    */
  /** Per-subspace codebooks: books(s) = (code, 8-dim sub-centroid)
    * pairs, code-ascending — the trained form the PQ lanes share.
    */
  private[graft] type PqBooks = IndexedSeq[IndexedSeq[(Long, Array[Double])]]

  /** Seed books: the first PqK vectors' sub-vectors per subspace (the
    * q155 codebooks, re-shaped).
    */
  private def booksFromCents(cents: Array[(Long, Array[Double])]): PqBooks =
    (0 until PqM).map { sIdx =>
      cents.toIndexedSeq.map { case (cid, cv) =>
        (cid, cv.slice(sIdx * PqSub, sIdx * PqSub + PqSub))
      }
    }

  /** Per-subspace argmin `struct(dist, cid)` columns against literal
    * per-subspace codebooks — the shared map-side assignment kernel
    * (q155/q157/q160/q165/q166/q169). Distance is the Cauchy expansion
    * v·v − 2·v·c + c·c.
    *
    * Codegen shape (r9): the former 8×16 UNROLLED struct chains — each
    * with its own slice allocation and dot chain — generated a ~13 k-
    * line class that Janino refused to compile, silently dropping the
    * whole PQ hot path to interpreted eval. The codebook now rides as
    * ONE 16×8 literal array per subspace and the 16 distances come
    * from a `transform` lambda — the loop body codegens once and the
    * HOF machinery iterates, so the class shrinks ~16× and stays
    * compiled. Value-identical by construction: the lambda computes
    * the same ops in the same left-to-right order per entry (c·c as a
    * runtime vec_dot fold == the former driver-side reduceLeft — the
    * q160 pass-2 equivalence), and the argmin is the same
    * sort_array(struct(dist, cid)) tie-break.
    */
  private def pqArgminsB(books: PqBooks): Seq[Column] = pqArgminsOn(col("v"), books)

  /** The same argmin kernel over an arbitrary vector column — q172
    * runs it over the residual array instead of the raw vector.
    */
  private def pqArgminsOn(vcol: Column, books: PqBooks): Seq[Column] =
    (0 until PqM).map { sIdx =>
      val vSub = slice(vcol, sIdx * PqSub + 1, PqSub)
      val vv = vecDot(vSub, vSub)
      val cbLit = typedLit(books(sIdx).map(_._2.toSeq))
      val cidLit = typedLit(books(sIdx).map(_._1))
      val dists = transform(cbLit, cb =>
        vv - lit(2.0) * vecDot(vSub, cb) + vecDot(cb, cb))
      sort_array(zip_with(dists, cidLit,
        (d, c) => struct(d.as("dist"), c.as("cid")))).getItem(0)
    }

  private def pqArgmins(cents: Array[(Long, Array[Double])]): Seq[Column] =
    pqArgminsB(booksFromCents(cents))

  /** Seed books accessor for PqTrainSpec's seed-vs-trained scoring
    * (seedLo = NQueries gives the held-out q169 books).
    */
  private[graft] def pqSeedBooks(all: DataFrame, seedLo: Long = 0L): PqBooks =
    booksFromCents(pqCentsFrom(all, seedLo))

  private def pqAssign(
      all: DataFrame, cents: Array[(Long, Array[Double])]): DataFrame = {
    all.select(col("vec_id"), posexplode(array(pqArgmins(cents): _*)).as(Seq("s", "c")))
      .select(col("vec_id"), col("s").cast("long").as("s"),
              col("c.cid").as("code"), col("c.dist").as("dist"))
  }

  def pqCodes(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d)
    pqAssign(all, pqCents(all))
      .select(col("vec_id"), col("s"), col("code"),
              floor(col("dist") * 1000000.0).cast("long").as("err_e6"))
      .orderBy("vec_id", "s")
  }

  /** Squared-L2 chain between `a`'s and `b`'s subspace sIdx, explicit
    * left-to-right — the shared SQL distance text for codes and LUT.
    */
  private def pqSubDistSql(sIdx: Int, a: String, b: String): String =
    (0 until PqSub).map { j =>
      val i = sIdx * PqSub + j + 1
      s"(($a[$i] - $b[$i]) * ($a[$i] - $b[$i]))"
    }.mkString(" + ")

  /** Product chain Σ a[i]·b[i] over subspace sIdx, explicit
    * left-to-right — the SQL text of the native vec_dot fold.
    */
  private def pqSubDotSql(sIdx: Int, a: String, b: String): String =
    (0 until PqSub).map { j =>
      val i = sIdx * PqSub + j + 1
      s"($a[$i] * $b[$i])"
    }.mkString(" + ")

  /** CTE chain ending in `codes (vec_id, s BIGINT, cid, dist)` — the
    * SQL twin of [[pqAssign]] (same Cauchy-expansion distance, same
    * fold order), shared by q155 and q157.
    */
  private val pqCodesCteSql = {
    val distCols = (0 until PqM)
      .map(sI => s"((${pqSubDotSql(sI, "n.v", "n.v")}) " +
        s"- 2.0 * (${pqSubDotSql(sI, "n.v", "c.cv")}) " +
        s"+ (${pqSubDotSql(sI, "c.cv", "c.cv")})) AS dist_$sI").mkString(",\n  ")
    val caseArms = (0 until PqM).map(sI => s"WHEN ${sI + 1} THEN dist_$sI").mkString(" ")
    s"""c AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id < $PqK),
       |a AS (SELECT n.vec_id, c.cid,
       |  $distCols
       |  FROM n CROSS JOIN c),
       |u AS (SELECT vec_id, cid, t.i - 1 AS s,
       |        CASE t.i $caseArms END AS dist
       |      FROM a, range(1, ${PqM + 1}) t(i)),
       |r AS (SELECT vec_id, s, cid, dist, row_number() OVER
       |  (PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS crn FROM u),
       |codes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, cid, dist
       |          FROM r WHERE crn = 1)""".stripMargin
  }

  private val pqCodesSql =
    s"""WITH $baseCte,
       |$pqCodesCteSql
       |SELECT vec_id, s, cid AS code,
       |       CAST(floor(dist * 1000000.0) AS BIGINT) AS err_e6
       |FROM codes ORDER BY vec_id, s""".stripMargin

  // ---- q157: ADC top-k search over the PQ codes, with measured
  //      recall — the lookup-table search PQ exists for: per query the
  //      8×16 subspace distances to every codebook entry are
  //      precomputed ONCE (driver-side constants — query × codebook is
  //      metadata-scale) and broadcast as a 640-row LUT, so scoring a
  //      corpus vector is 8 integer lookups + a sum: no float vector
  //      math per candidate at all, the shape that makes PQ serve
  //      billion-vector indexes from RAM. LUT entries are floor-e6
  //      INTEGERS so the 8-way sum is order-independent (a float sum's
  //      accumulation order would be engine-dependent); exact-L2 truth
  //      is computed in the same query (v·v − 2·q·v + q·q via the
  //      native vec_dot kernel — identical fold both engines) and
  //      per-query top-10 overlap reported integer-exact. Like q153,
  //      the approximate path's quality ships as data.
  /** (ADC top-K with ranks, exact-L2 top-K with ranks) — the shared
    * ranked lists behind q157 (overlap) and q163 (rank metrics).
    */
  private def pqSearchParts(s: SparkSession, all: DataFrame,
                            nq: Int = NQueries): (DataFrame, DataFrame) =
    pqSearchPartsB(s, all, booksFromCents(pqCents(all)), nq)

  /** ADC search under arbitrary (e.g. trained) books — q157 runs it on
    * the seed books, q166 on the [[pqTrainCore]] output (PqTrainSpec
    * also scores both with the q163 nDCG fold).
    */
  /** The driver-computed ADC lookup table `(qid, ls, lcid, dlut)` —
    * query × codebook is metadata-scale (NQueries × PqM × PqK rows of
    * floor-e6 integers), broadcast to every scorer. Shared by q157/
    * q166/q169 (full-corpus ADC) and q171 (IVF-pruned ADC).
    */
  private def pqLutDf(s: SparkSession, all: DataFrame, books: PqBooks,
                      nq: Int = NQueries): DataFrame = {
    // query vectors collected directly (bounded: nq rows) — the old
    // `pqCents.take(NQueries)` shortcut only worked while nq <= PqK;
    // q163's EvalQueries width exceeds the seed set
    val queries: Array[(Long, Array[Double])] =
      all.filter(col("vec_id") < nq).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)
    val lutRows: Seq[(Long, Long, Long, Long)] = for {
      (qid, qv) <- queries.toSeq
      sIdx <- 0 until PqM
      (cid, cSub) <- books(sIdx)
    } yield {
      var acc = 0.0
      for (j <- 0 until PqSub) {
        val dd = qv(sIdx * PqSub + j) - cSub(j); acc += dd * dd
      }
      (qid, sIdx.toLong, cid, math.floor(acc * 1000000.0).toLong)
    }
    import s.implicits._
    lutRows.toDF("qid", "ls", "lcid", "dlut")
  }

  /** PQ code assignment under `books`, codes only: (vec_id, s, code). */
  private def pqCodesOnly(all: DataFrame, books: PqBooks): DataFrame =
    all.select(col("vec_id"), posexplode(array(pqArgminsB(books): _*)).as(Seq("s", "c")))
      .select(col("vec_id"), col("s").cast("long").as("s"), col("c.cid").as("code"))

  private[graft] def pqSearchPartsB(
      s: SparkSession, all: DataFrame, books: PqBooks,
      nq: Int = NQueries): (DataFrame, DataFrame) = {
    val codes = pqCodesOnly(all, books)
    val lut = pqLutDf(s, all, books, nq)
    val adc = codes
      .join(broadcast(lut), col("s") === col("ls") && col("code") === col("lcid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id").agg(sum(col("dlut")).as("adc_e6"))
    val q = all.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(vecDot(col("v"), col("v")) - lit(2.0) * vecDot(col("qv"), col("v"))
          + vecDot(col("qv"), col("qv")), 6).as("d_r"))
    val we = Window.partitionBy("qid").orderBy(col("d_r").asc, col("vec_id").asc)
    val wa = Window.partitionBy("qid").orderBy(col("adc_e6").asc, col("vec_id").asc)
    val topExact = exact.withColumn("rn", row_number().over(we))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("rn").cast("long").as("rn"))
    val topAdc = adc.withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("rn").cast("long").as("rn"))
    (topAdc, topExact)
  }

  /** Per-query top-K overlap of the ADC ranking vs exact L2 — the
    * measured-recall presentation q157 and q166 share.
    */
  private def pqOverlap(topAdc: DataFrame, topExact: DataFrame): DataFrame =
    topExact.select("qid", "vec_id")
      // both sides are ≤ NQueries·TopK rows; broadcast keeps the
      // presentation tail exchange-free
      .join(broadcast(topAdc.select(col("qid"), col("vec_id"), lit(1L).as("hit"))),
            Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
           expr(s"(sum(coalesce(hit, 0)) * 1000000) div $TopK").as("recall_millionths"))
      .orderBy("qid")

  def pqSearch(s: SparkSession, d: String): DataFrame = {
    val (topAdc, topExact) = pqSearchParts(s, base(s, d))
    pqOverlap(topAdc, topExact)
  }

  private val pqSearchSql = {
    val lutDistCols = (0 until PqM)
      .map(sI => s"${pqSubDistSql(sI, "q.qv", "c.cv")} AS ld_$sI").mkString(",\n  ")
    val lutCaseArms = (0 until PqM).map(sI => s"WHEN ${sI + 1} THEN ld_$sI").mkString(" ")
    s"""WITH $baseCte,
       |$pqCodesCteSql,
       |q AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < $NQueries),
       |l0 AS (SELECT q.qid, c.cid,
       |  $lutDistCols
       |  FROM q CROSS JOIN c),
       |lut AS (SELECT qid, cid, CAST(t.i - 1 AS BIGINT) AS s,
       |          CAST(floor((CASE t.i $lutCaseArms END) * 1000000.0) AS BIGINT)
       |            AS dlut
       |        FROM l0, range(1, ${PqM + 1}) t(i)),
       |adc AS (SELECT lut.qid, codes.vec_id,
       |          CAST(SUM(dlut) AS BIGINT) AS adc_e6
       |        FROM codes JOIN lut ON lut.s = codes.s AND lut.cid = codes.cid
       |        WHERE codes.vec_id <> lut.qid
       |        GROUP BY lut.qid, codes.vec_id),
       |exact AS (SELECT q.qid, n.vec_id,
       |  round(${dotFoldSql("n.v", "n.v")} - 2.0 * ${dotFoldSql("q.qv", "n.v")}
       |    + ${dotFoldSql("q.qv", "q.qv")}, 6) AS d_r
       |  FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
       |te AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER
       |  (PARTITION BY qid ORDER BY d_r ASC, vec_id ASC) AS rn FROM exact)
       |  WHERE rn <= $TopK),
       |ta AS (SELECT qid, vec_id, 1 AS hit FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY adc_e6 ASC, vec_id ASC)
       |    AS rn FROM adc) WHERE rn <= $TopK)
       |SELECT qid, CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_overlap,
       |       (CAST(SUM(COALESCE(hit, 0)) AS BIGINT) * 1000000) // $TopK
       |         AS recall_millionths
       |FROM te LEFT JOIN ta USING (qid, vec_id)
       |GROUP BY qid ORDER BY qid""".stripMargin
  }

  // ---- q192: SCALAR-QUANTIZATION (SQ8) SEARCH — the OTHER standard
  //      index compression (FAISS IndexScalarQuantizer QT_8bit): one
  //      byte PER DIMENSION instead of PQ's one code per subspace.
  //      Train = a single mergeable per-dimension min/max aggregate
  //      (Dim keys — no Lloyd loop at all, SQ's whole selling point);
  //      encode = a map-side transform (clamped half-up affine code,
  //      span-0 dims pinned to 0 like q96's zero-vector guard);
  //      serve = the ADC discipline of q157 with M=Dim, K=256: the
  //      per-(query, dim) 256-entry distance LUT is floor-e6 INTEGER
  //      rows (NQueries·Dim·256 ≈ 82k — per-query-batch metadata,
  //      broadcast), so scoring is Dim integer lookups + an
  //      order-independent sum, and the one exchange is the score
  //      groupBy. Quantization params and query vectors are collected
  //      from the engine's own relation and inlined (the
  //      literalCentroids discipline); the oracle re-derives min/max,
  //      codes, LUT and ranking closed-form. Output = q157's measured
  //      per-query recall shape, so PQ-8-bytes vs SQ-64-bytes quality
  //      at the same TopK reads off the q157/q192 pair directly. ----
  private[graft] val SqK = 256

  /** SQ8 training: per-dim (min, span) from one mergeable aggregate —
    * Dim rows, collected as quantization params (the literalCentroids
    * discipline: params come from the engine's own relation).
    */
  private[graft] def sqStats(all: DataFrame): (Array[Double], Array[Double]) = {
    val stats = all.select(posexplode(toDouble(col("v"))).as(Seq("s", "x")))
      .groupBy("s").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    (stats.map(_._2), stats.map(t => t._3 - t._2))
  }

  /** The map-side SQ8 encoder: clamped half-up affine byte code per
    * dimension, span-0 dims pinned to 0.
    */
  private[graft] def sqCodesExpr(
      mins: Array[Double], spans: Array[Double]): Column = {
    val minsArr = array(mins.map(lit): _*)
    val spansArr = array(spans.map(lit): _*)
    transform(toDouble(col("v")), (x, j) => {
      val mn = element_at(minsArr, (j + 1).cast("int"))
      val sp = element_at(spansArr, (j + 1).cast("int"))
      when(sp === 0.0, lit(0L)).otherwise(
        greatest(lit(0L), least(lit(255L),
          floor((x - mn) * lit(255.0) / sp + lit(0.5)).cast("long"))))
    })
  }

  /** Spec-side audit relation: every (vec_id, dim, raw x, code) with
    * its params — for the reconstruction-error-bound property.
    */
  private[graft] def sqEncodedFor(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d)
    val (mins, spans) = sqStats(all)
    val minsArr = array(mins.map(lit): _*)
    val spansArr = array(spans.map(lit): _*)
    all.select(col("vec_id"),
        posexplode(arrays_zip(toDouble(col("v")),
          sqCodesExpr(mins, spans)).as("z")).as(Seq("s", "zc")))
      .select(col("vec_id"), col("s"),
        col("zc.0").as("x"), col("zc.1").as("code"),
        element_at(minsArr, (col("s") + 1).cast("int")).as("mn"),
        element_at(spansArr, (col("s") + 1).cast("int")).as("sp"))
  }

  def sqSearch(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d)
    val vd = toDouble(col("v")) // raw floats widen exactly; SQL's v is double
    val (mins, spans) = sqStats(all)
    val codes = sqCodesExpr(mins, spans)
    val enc = all.select(col("vec_id"), posexplode(codes).as(Seq("s", "code")))
      .select(col("vec_id"), col("s").cast("long").as("s"), col("code"))
    // the SQ-ADC LUT: query × dim × 256 codes, floor-e6 integers
    val qs = all.filter(col("vec_id") < NQueries)
      .select(col("vec_id"), vd.as("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val lutRows: Seq[(Long, Long, Long, Long)] = for {
      (qid, qv) <- qs.toSeq
      j <- 0 until Dim
      c <- 0 until SqK
    } yield {
      val dd = qv(j) - (mins(j) + c * spans(j) / 255.0)
      (qid, j.toLong, c.toLong, math.floor(dd * dd * 1000000.0).toLong)
    }
    import s.implicits._
    val lut = lutRows.toDF("qid", "ls", "lcid", "dlut")
    val adc = enc
      .join(broadcast(lut), col("s") === col("ls") && col("code") === col("lcid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id").agg(sum(col("dlut")).as("sq_e6"))
    val q = all.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(vecDot(col("v"), col("v")) - lit(2.0) * vecDot(col("qv"), col("v"))
          + vecDot(col("qv"), col("qv")), 6).as("d_r"))
    val we = Window.partitionBy("qid").orderBy(col("d_r").asc, col("vec_id").asc)
    val wa = Window.partitionBy("qid").orderBy(col("sq_e6").asc, col("vec_id").asc)
    val topExact = exact.withColumn("rn", row_number().over(we))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("rn").cast("long").as("rn"))
    val topSq = adc.withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("rn").cast("long").as("rn"))
    pqOverlap(topSq, topExact)
  }

  private val sqSearchSql =
    s"""WITH $baseCte,
       |dims AS (SELECT CAST(t.j AS BIGINT) AS j FROM range(0, $Dim) t(j)),
       |st AS (SELECT d.j, MIN(n.v[CAST(d.j + 1 AS INTEGER)]) AS mn,
       |         MAX(n.v[CAST(d.j + 1 AS INTEGER)]) AS mx
       |       FROM n CROSS JOIN dims d GROUP BY d.j),
       |cd AS (SELECT n.vec_id, st.j,
       |         CASE WHEN st.mx = st.mn THEN 0
       |           ELSE greatest(CAST(0 AS BIGINT), least(CAST(255 AS BIGINT),
       |             CAST(floor((n.v[CAST(st.j + 1 AS INTEGER)] - st.mn) * 255.0
       |               / (st.mx - st.mn) + 0.5) AS BIGINT))) END AS code
       |       FROM n CROSS JOIN st),
       |q AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < $NQueries),
       |l0 AS (SELECT q.qid, st.j, CAST(t.c AS BIGINT) AS c,
       |         q.qv[CAST(st.j + 1 AS INTEGER)]
       |           - (st.mn + t.c * (st.mx - st.mn) / 255.0) AS dd
       |       FROM q CROSS JOIN st CROSS JOIN range(0, $SqK) t(c)),
       |lut AS (SELECT qid, j, c,
       |          CAST(floor(dd * dd * 1000000.0) AS BIGINT) AS dlut FROM l0),
       |adc AS (SELECT lut.qid, cd.vec_id, CAST(SUM(dlut) AS BIGINT) AS sq_e6
       |        FROM cd JOIN lut ON lut.j = cd.j AND lut.c = cd.code
       |        WHERE cd.vec_id <> lut.qid
       |        GROUP BY lut.qid, cd.vec_id),
       |exact AS (SELECT q.qid, n.vec_id,
       |  round(${dotFoldSql("n.v", "n.v")} - 2.0 * ${dotFoldSql("q.qv", "n.v")}
       |    + ${dotFoldSql("q.qv", "q.qv")}, 6) AS d_r
       |  FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
       |te AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER
       |  (PARTITION BY qid ORDER BY d_r ASC, vec_id ASC) AS rn FROM exact)
       |  WHERE rn <= $TopK),
       |ta AS (SELECT qid, vec_id, 1 AS hit FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY sq_e6 ASC, vec_id ASC)
       |    AS rn FROM adc) WHERE rn <= $TopK)
       |SELECT qid, CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_overlap,
       |       (CAST(SUM(COALESCE(hit, 0)) AS BIGINT) * 1000000) // $TopK
       |         AS recall_millionths
       |FROM te LEFT JOIN ta USING (qid, vec_id)
       |GROUP BY qid ORDER BY qid""".stripMargin

  // ---- q160: one Lloyd refinement of the PQ codebooks — the training
  //      step q155/q157 document as "the knob" for ADC recall. Pass 1
  //      is ONE corpus scan: each vector's 8 argmin codes are a pure
  //      map-side expression (the q155 kernel), elements explode to
  //      (s, code, j) rows and a single map-side-combined hash
  //      aggregate emits 8×16×8 partial rows per task — at 100 TB the
  //      shuffle carries 1 024 partial sums per map task, never data.
  //      Element sums are floor(x·1e6) integer-quantized so the
  //      cross-engine mean is exact (q64's trick); the j=0 slice of the
  //      same aggregate doubles as the old-assignment audit (count +
  //      floor-e6 error sum), so the update pays zero extra passes.
  //      Pass 2 re-assigns against the refined books: the ≤128-row
  //      codebook relation is broadcast, each (vector, subspace) scores
  //      16 candidates through the native vec_dot Cauchy form, and a
  //      partial+final min(struct(dist, code)) collapses candidates
  //      before the exchange. Dead codebook entries (zero members)
  //      drop out exactly like real Lloyd; the full-outer audit keeps
  //      their old-side row. Lloyd monotonicity (total err_new ≤
  //      err_old up to the 1e-6 quantization) and the measured ADC
  //      recall gain are asserted in PqRefineSpec. ----
  def pqRefine(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d)
    val cents = pqCents(all)
    val withCw = all.withColumn("cw", array(pqArgmins(cents): _*))
    val elems = withCw
      .select(col("cw"), posexplode(col("v")).as(Seq("i", "x")))
      .select(expr(s"CAST(i div $PqSub AS BIGINT)").as("s"),
              expr(s"CAST(i % $PqSub AS BIGINT)").as("j"),
              col("x").cast("double").as("x"), col("cw"))
      .select(col("s"), col("j"), col("x"),
              element_at(col("cw"), (col("s") + 1).cast("int"))
                .getField("cid").as("code"),
              element_at(col("cw"), (col("s") + 1).cast("int"))
                .getField("dist").as("dist"))
    val upd = elems.groupBy("s", "code", "j")
      .agg(count(lit(1)).as("n"),
           sum(floor(col("x") * lit(1000000.0)).cast("long")).as("qx"),
           sum(floor(col("dist") * lit(1000000.0)).cast("long")).as("qd"))
    // j=0 carries exactly one row per assigned (vector, subspace)
    val oldStats = upd.filter(col("j") === 0)
      .select(col("s"), col("code"), col("n").as("n_old"), col("qd").as("err_old_e6"))
    val newcb = upd.groupBy("s", "code")
      .agg(transform(
             array_sort(collect_list(struct(col("j"),
               ((col("qx").cast("double") / lit(1000000.0)) / col("n")).as("c")))),
             e => e.getField("c")).as("cv"))
    val vsubs = all.select(col("vec_id"),
        posexplode(array((0 until PqM)
          .map(sI => slice(col("v"), sI * PqSub + 1, PqSub)): _*)).as(Seq("si", "vs")))
      .select(col("vec_id"), col("si").cast("long").as("s"), col("vs"))
    val nd = vsubs.join(broadcast(newcb), Seq("s"))
      .select(col("vec_id"), col("s"), col("code"),
              (vecDot(col("vs"), col("vs")) - lit(2.0) * vecDot(col("vs"), col("cv"))
                + vecDot(col("cv"), col("cv"))).as("dist"))
    val newStats = nd.groupBy("vec_id", "s")
      .agg(min(struct(col("dist"), col("code"))).as("m"))
      .select(col("s"), col("m.code").as("code"), col("m.dist").as("dist"))
      .groupBy("s", "code")
      .agg(count(lit(1)).as("n_new"),
           sum(floor(col("dist") * lit(1000000.0)).cast("long")).as("err_new_e6"))
    oldStats.join(newStats, Seq("s", "code"), "full_outer")
      .select(col("s"), col("code"),
              coalesce(col("n_old"), lit(0L)).as("n_old"),
              coalesce(col("err_old_e6"), lit(0L)).as("err_old_e6"),
              coalesce(col("n_new"), lit(0L)).as("n_new"),
              coalesce(col("err_new_e6"), lit(0L)).as("err_new_e6"))
      .orderBy("s", "code")
  }

  private val pqRefineSql = {
    def sliceSql = s"list_slice(n.v, CAST(b.s * $PqSub + 1 AS BIGINT), " +
      s"CAST(b.s * $PqSub + $PqSub AS BIGINT))"
    s"""WITH $baseCte,
       |$pqCodesCteSql,
       |oldst AS (SELECT s, cid AS code, COUNT(*) AS n_old,
       |            CAST(SUM(CAST(floor(dist * 1000000.0) AS BIGINT)) AS BIGINT)
       |              AS err_old_e6
       |          FROM codes GROUP BY s, cid),
       |elems AS (SELECT vec_id, CAST((t.i - 1) // $PqSub AS BIGINT) AS s,
       |            CAST((t.i - 1) % $PqSub AS BIGINT) AS j, v[t.i] AS x
       |          FROM n, range(1, ${Dim + 1}) t(i)),
       |je AS (SELECT e.s, c2.cid AS code, e.j, e.x
       |       FROM elems e JOIN codes c2 ON e.vec_id = c2.vec_id AND e.s = c2.s),
       |newc AS (SELECT s, code, j,
       |           ((CAST(SUM(CAST(floor(x * 1000000.0) AS BIGINT)) AS DOUBLE)
       |             / 1000000.0) / COUNT(*)) AS c
       |         FROM je GROUP BY s, code, j),
       |newcb AS (SELECT s, code, list(c ORDER BY j) AS cv
       |          FROM newc GROUP BY s, code),
       |nd AS (SELECT n.vec_id, b.s, b.code,
       |         (${dotFoldSql(sliceSql, sliceSql)}
       |          - 2.0 * ${dotFoldSql(sliceSql, "b.cv")}
       |          + ${dotFoldSql("b.cv", "b.cv")}) AS dist
       |       FROM n CROSS JOIN newcb b),
       |ra AS (SELECT vec_id, s, code, dist, row_number() OVER
       |         (PARTITION BY vec_id, s ORDER BY dist ASC, code ASC) AS rn
       |       FROM nd),
       |newst AS (SELECT s, code, COUNT(*) AS n_new,
       |            CAST(SUM(CAST(floor(dist * 1000000.0) AS BIGINT)) AS BIGINT)
       |              AS err_new_e6
       |          FROM ra WHERE rn = 1 GROUP BY s, code)
       |SELECT COALESCE(o.s, nw.s) AS s, COALESCE(o.code, nw.code) AS code,
       |       CAST(COALESCE(o.n_old, 0) AS BIGINT) AS n_old,
       |       CAST(COALESCE(o.err_old_e6, 0) AS BIGINT) AS err_old_e6,
       |       CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new,
       |       CAST(COALESCE(nw.err_new_e6, 0) AS BIGINT) AS err_new_e6
       |FROM oldst o FULL OUTER JOIN newst nw ON o.s = nw.s AND o.code = nw.code
       |ORDER BY s, code""".stripMargin
  }

  // ---- q165/q166: PQ codebook training to a measured plateau — the
  //      bounded Lloyd LOOP q160's single refinement documents as "the
  //      knob" (VERDICT r8 #2). Each round is ONE corpus scan: the
  //      current books ride the plan as literals (books are metadata —
  //      8×16×8 doubles ≈ 1 KB — so collecting the 1 024-row update
  //      aggregate to the driver and re-inlining is exactly how real PQ
  //      training distributes: data never moves, books do), assignment
  //      is the q155 map-side argmin kernel, and the update is the
  //      quantized-exact per-(s, code, j) mean. The round count is a
  //      FIXED constant (3): a data-dependent stopping rule would not
  //      be SQL-expressible, so the twin unrolls the same 3 rounds as
  //      generated CTEs and both engines emit identical per-round
  //      audits (round, s, code, n_members, err_e6). Lloyd guarantees
  //      err non-increasing per round (up to the 1e-6 mean
  //      quantization); PqTrainSpec asserts the monotone audit and the
  //      plateau, and q166 re-runs the q157 ADC search under the
  //      trained books so the recall gain ships as data. ----
  /** Unrolled round CEILING of the training CTE twins (the SQL
    * structure is static; the EFFECTIVE round count is data-dependent
    * below it — rounds past the ladder value pass books through
    * unchanged in both engines).
    */
  private[graft] val PqTrainMaxRounds = 16

  /** Corpus-scaled Lloyd budget (r11 verdict #2, measured in
    * bench_evidence/r12_pq_budget.md): the r11 grid's "trained books
    * lose at sf0.1" inversion was a training-budget artifact — at a
    * 100-query eval the fixed 3-round budget leaves the trained books
    * behind the seed books at 2000 rows (-0.018 nDCG@10) while
    * 4 rounds/500 rows puts them ahead at every measured scale
    * (+0.006 at 500 rows, +0.004 at 2000). Ladder: 4 rounds per 500
    * corpus rows, floor 4, cap [[PqTrainMaxRounds]] (each round is one
    * bounded corpus scan; the cap bounds index-build cost). The SQL
    * twins compute the SAME ladder from COUNT(*) so hash-equality
    * holds at every scale factor.
    */
  private[graft] def pqTrainRoundsFor(n: Long): Int =
    math.min(PqTrainMaxRounds, math.max(4, math.ceil(4.0 * n / 500.0).toInt))

  /** The ladder in DuckDB form — MUST mirror [[pqTrainRoundsFor]]. */
  private def pqRoundsSqlExpr: String =
    s"LEAST($PqTrainMaxRounds, GREATEST(4, CAST(ceil(" +
      "4.0 * (SELECT COUNT(*) FROM embeddings) / 500.0) AS INTEGER)))"

  // (the legacy fixed 3-round budget is gone — every caller passes the
  //  corpus-scaled pqTrainRoundsFor ladder explicitly, r12 advice)

  /** One training pass under literal books: per (s, code, j) member
    * count, quantized element sum, and quantized assignment-error sum
    * (the j=0 slice carries exactly one row per assigned (vector,
    * subspace) — the q160 trick, so the audit costs no extra pass).
    * Collected: ≤ PqM·PqK·PqSub = 1 024 rows of metadata.
    */
  private def pqPassAgg(
      all: DataFrame, books: PqBooks): Array[org.apache.spark.sql.Row] =
    pqPassAggOn(all, col("v"), books)

  /** The same training pass over an arbitrary vector column — q177
    * runs the loop over the RESIDUAL relation's `rv` instead of the
    * raw vectors.
    */
  private def pqPassAggOn(
      df: DataFrame, vcol: Column, books: PqBooks): Array[org.apache.spark.sql.Row] =
    df.withColumn("cw", array(pqArgminsOn(vcol, books): _*))
      .select(col("cw"), posexplode(vcol).as(Seq("i", "x")))
      .select(expr(s"CAST(i div $PqSub AS BIGINT)").as("s"),
              expr(s"CAST(i % $PqSub AS BIGINT)").as("j"),
              col("x").cast("double").as("x"), col("cw"))
      .select(col("s"), col("j"), col("x"),
              element_at(col("cw"), (col("s") + 1).cast("int"))
                .getField("cid").as("code"),
              element_at(col("cw"), (col("s") + 1).cast("int"))
                .getField("dist").as("dist"))
      .groupBy("s", "code", "j")
      .agg(count(lit(1)).as("n"),
           sum(floor(col("x") * lit(1000000.0)).cast("long")).as("qx"),
           sum(floor(col("dist") * lit(1000000.0)).cast("long")).as("qd"))
      .collect()

  /** Bounded Lloyd loop: returns the trained books and the per-round
    * audit rows (round, s, code, n_members, err_e6), round r scoring
    * the assignment under books_{r-1} (round 1 == the seed books, so
    * its rows equal q160's old-side audit).
    */
  private[graft] def pqTrainCoreFor(s: SparkSession, d: String)
      : (IndexedSeq[IndexedSeq[(Long, Array[Double])]],
         Seq[(Long, Long, Long, Long, Long)]) = {
    val all = base(s, d).persist()
    try pqTrainCore(all, rounds = trainRoundsOf(s, d))
    finally all.unpersist(false)
  }

  /** The ladder evaluated for a table dir (footer-metadata count). */
  private[graft] def trainRoundsOf(s: SparkSession, d: String): Int =
    pqTrainRoundsFor(Tables.embeddings(s, d).count())

  private[graft] def pqTrainCore(all: DataFrame, seedLo: Long = 0L,
                                 rounds: Int)
      : (PqBooks, Seq[(Long, Long, Long, Long, Long)]) =
    lloydLoopOn(all, col("v"), booksFromCents(pqCentsFrom(all, seedLo)), rounds)

  /** The bounded Lloyd loop over an arbitrary (DataFrame, vector
    * column, seed books) triple — q165 trains on raw vectors, q177 on
    * the residual relation. Quantized-integer means keep every round's
    * books (and so the audit) bit-identical across engines.
    */
  private[graft] def lloydLoopOn(df: DataFrame, vcol: Column, seed: PqBooks,
                                 rounds: Int)
      : (PqBooks, Seq[(Long, Long, Long, Long, Long)]) = {
    var books = seed
    val audit = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val rows = pqPassAggOn(df, vcol, books)
      audit ++= rows.filter(_.getLong(2) == 0L)
        .map(w => (r.toLong, w.getLong(0), w.getLong(1), w.getLong(3), w.getLong(5)))
      val grouped = rows.groupBy(w => (w.getLong(0), w.getLong(1)))
      books = (0 until PqM).map { sIdx =>
        grouped.collect { case ((s, code), ws) if s == sIdx =>
          (code,
           ws.sortBy(_.getLong(2))
             .map(w => (w.getLong(4).toDouble / 1e6) / w.getLong(3)).toArray)
        }.toIndexedSeq.sortBy(_._1)
      }
    }
    (books, audit.result())
  }

  /** Dev probe for the PQ TRAINING BUDGET (r11 verdict #2): per rounds
    * value, the trained residual books' mean nDCG@10 vs exact-L2 truth
    * — alongside the seed-book baseline — over the standard query set.
    * Shares one routing + one materialized residual relation across
    * every rounds value (only the Lloyd loop re-runs).
    */
  private[graft] def pqBudgetProbe(s: SparkSession, d: String,
                                   roundsList: Seq[Int],
                                   nq: Int = NQueries): Seq[(Int, Long, Long)] = {
    val all = base(s, d).persist()
    try {
      val k = ivfCellCount(s, d)
      // exact-L2 truth over a WIDE query set: the registered lanes eval
      // at NQueries = 5, where single-query nDCG swings exceed 0.5 —
      // the budget question needs the variance beaten down
      val q = all.filter(col("vec_id") < nq)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val exact = all.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(vecDot(col("v"), col("v"))
            - lit(2.0) * vecDot(col("qv"), col("v"))
            + vecDot(col("qv"), col("qv")), 6).as("d_r"))
      val we = Window.partitionBy("qid").orderBy(col("d_r").asc, col("vec_id").asc)
      val topL2 = exact.withColumn("rn", row_number().over(we))
        .filter(col("rn") <= TopK)
        .select(col("qid"), col("vec_id"), col("rn").cast("long").as("rn"))
        .localCheckpoint(true)
      val (asg0, ranked) = ivfRoutingRankedFor(all, k, IvfProbes,
        col("vec_id") < nq)
      val routing = (asg0.localCheckpoint(true),
        ranked.drop("crn").localCheckpoint(true))
      val kit0 = residKit(all, k, Some(routing))
      val kit = kit0.copy(resid = kit0.resid.localCheckpoint(true))
      val discArms = (1 to TopK)
        .map(p => s"WHEN $p THEN ${NdcgDisc(p - 1)}").mkString(" ")
      def perQuery(top: DataFrame): Map[Long, Long] = {
        val g = topL2.select(col("qid"), col("vec_id"),
          (lit(TopK + 1L) - col("rn")).as("gain"))
        top.join(g, Seq("qid", "vec_id"), "left")
          .withColumn("gain", coalesce(col("gain"), lit(0L)))
          .withColumn("disc", expr(s"CASE rn $discArms ELSE 0 END"))
          .groupBy("qid").agg(sum(col("gain") * col("disc")).as("dcg"))
          .select(col("qid"), expr(s"(dcg * 1000000) div $NdcgIdcgE9").as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      val seedPer = perQuery(adcTopK(residualAdcOn(s, kit, kit.books)._2))
      val seedN = seedPer.values.sum / nq
      roundsList.map { r =>
        val (books, _) = lloydLoopOn(kit.resid, col("rv"), kit.books, r)
        val tp = perQuery(adcTopK(residualAdcOn(s, kit, books)._2))
        (r, seedN, tp.values.sum / nq)
      }
    } finally { all.unpersist(false); () }
  }

  /** Code-survival diagnostic: after `rounds` of Lloyd, how many of
    * the PqM*PqK codebook entries still exist (empty codes drop out
    * permanently in the current loop), plus the final round's total
    * assignment error.
    */
  private[graft] def pqBudgetCodeSurvival(s: SparkSession, d: String,
      roundsList: Seq[Int]): Seq[(Int, Int, Long)] = {
    val all = base(s, d).persist()
    try {
      val k = ivfCellCount(s, d)
      val (asg0, prb0) = ivfRouting(all, k, IvfProbes)
      val routing = (asg0.localCheckpoint(true), prb0.localCheckpoint(true))
      val kit0 = residKit(all, k, Some(routing))
      val kit = kit0.copy(resid = kit0.resid.localCheckpoint(true))
      roundsList.map { r =>
        val (books, audit) = lloydLoopOn(kit.resid, col("rv"), kit.books, r)
        val lastErr = audit.filter(_._1 == r.toLong).map(_._5).sum
        (r, books.map(_.size).sum, lastErr)
      }
    } finally { all.unpersist(false); () }
  }

  def pqTrain(s: SparkSession, d: String): DataFrame = {
    val (_, audit) = sharedRawTrain(s, d) // session-cached, shared with q166
    import s.implicits._
    audit.toDF("round", "s", "code", "n_members", "err_e6")
      .orderBy("round", "s", "code")
  }

  /** Generated-CTE twin of [[pqTrainCore]]: cb0 (seed books) then, per
    * round r, assignment (ndR/raR/asgR), audit (auR) and the quantized-
    * mean update (upR/cbR). Same fold orders as the Spark kernels
    * (dotFoldSql's leading 0.0 + x == x; quantized means are exact
    * integers over identical doubles), so every round's books — and
    * therefore every audit row — agree bit-for-bit.
    */
  private def pqTrainCteSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"pqprm AS MATERIALIZED (SELECT $pqRoundsSqlExpr AS rnds),\n"
    sb ++= s"cb0 AS (SELECT t.i - 1 AS s, vec_id AS code,\n" +
      s"  list_slice(v, (t.i - 1) * $PqSub + 1, (t.i - 1) * $PqSub + $PqSub) AS cv\n" +
      s"  FROM n, range(1, ${PqM + 1}) t(i) WHERE vec_id < $PqK)"
    for (r <- 1 to rounds) {
      val sliceSql = s"list_slice(n.v, CAST(b.s * $PqSub + 1 AS BIGINT), " +
        s"CAST(b.s * $PqSub + $PqSub AS BIGINT))"
      // the round gate lives on ndR, the EARLIEST per-round CTE, not
      // just on the cbR union (r12 advice #4): DuckDB does not prune
      // the dead update arm at plan time (measured — literal rnds=4 vs
      // 16 both ran ~15 s), so an ungated ndR pays a full distance
      // pass per dead round; gated here, a dead round degrades to an
      // empty join (live rounds see a constant-true filter: no-op)
      sb ++= s""",
nd$r AS (SELECT n.vec_id, n.v, b.s, b.code,
  (${dotFoldSql(sliceSql, sliceSql)}
   - 2.0 * ${dotFoldSql(sliceSql, "b.cv")}
   + ${dotFoldSql("b.cv", "b.cv")}) AS dist
  FROM n CROSS JOIN cb${r - 1} b
  WHERE $r <= (SELECT rnds FROM pqprm)),
ra$r AS (SELECT vec_id, v, s, code, dist, row_number() OVER
  (PARTITION BY vec_id, s ORDER BY dist ASC, code ASC) AS rn FROM nd$r),
asg$r AS (SELECT vec_id, v, s, code, dist FROM ra$r WHERE rn = 1),
au$r AS (SELECT CAST($r AS BIGINT) AS round, s, code,
  COUNT(*) AS n_members,
  CAST(SUM(CAST(floor(dist * 1000000.0) AS BIGINT)) AS BIGINT) AS err_e6
  FROM asg$r GROUP BY s, code),
up$r AS (SELECT a.s, a.code, t.i - 1 AS j,
  ((CAST(SUM(CAST(floor(a.v[a.s * $PqSub + t.i] * 1000000.0) AS BIGINT)) AS DOUBLE)
    / 1000000.0) / COUNT(*)) AS c
  FROM asg$r a, range(1, ${PqSub + 1}) t(i) GROUP BY a.s, a.code, t.i),
cb$r AS MATERIALIZED (
  SELECT s, code, list(c ORDER BY j) AS cv FROM up$r
  WHERE $r <= (SELECT rnds FROM pqprm) GROUP BY s, code
  UNION ALL
  SELECT s, code, cv FROM cb${r - 1}
  WHERE $r > (SELECT rnds FROM pqprm))"""
    }
    sb.toString
  }

  private val pqTrainSql = {
    val unions = (1 to PqTrainMaxRounds).map(r =>
      s"SELECT * FROM au$r WHERE $r <= (SELECT rnds FROM pqprm)")
      .mkString(" UNION ALL ")
    s"""WITH $baseCte,
       |${pqTrainCteSql(PqTrainMaxRounds)}
       |SELECT round, s, code, n_members, err_e6 FROM ($unions)
       |ORDER BY round, s, code""".stripMargin
  }

  // ---- q166: ADC search under the TRAINED books — q157 re-measured
  //      after the q165 loop, so the training's retrieval effect is a
  //      CORRECTNESS-gated artifact, not a spec-only claim. Same
  //      640-row integer LUT shape; the LUT and codes just come from
  //      cb{R} instead of the seeds. MEASURED OUTCOME (PqTrainSpec,
  //      sf0.001): reconstruction error drops 24% to a plateau, but
  //      top-10 recall reads 0.34 → 0.26 and nDCG 0.39 → 0.27 — the
  //      5 query vectors are themselves among the 16 SEED centroids,
  //      so the seed books quantize the query neighborhoods atypically
  //      well and Lloyd training genericizes that advantage away. The
  //      eval exists precisely to catch this: reconstruction error is
  //      a proxy, and at this corpus/query scale it is NOT a reliable
  //      stand-in for retrieval quality. q169 runs exactly that
  //      control (held-out seeds) and CONFIRMS the mechanism: without
  //      leakage, the same training loop lifts recall 0.18 → 0.34 —
  //      see the 2×2 in PqTrainSpec. ----
  def pqSearchTrained(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d).persist()
    val (books, _) = sharedRawTrain(s, d) // session-cached, shared with q165
    val (topAdc, topExact) = pqSearchPartsB(s, all, books)
    val result = pqOverlap(topAdc, topExact).localCheckpoint(true)
    all.unpersist(false)
    result
  }

  /** CTE suffix + final SELECT: ADC search (codes, query LUT, ranked
    * overlap vs exact L2) against an arbitrary codebook RELATION `cb`
    * (s, code, cv[PqSub]) — shared by the q166 (trained cb3) and q169
    * (held-out seed) twins. Same fold orders as [[pqSearchPartsB]].
    */
  private def pqAdcSearchVsCbSql(cb: String): String = {
    val fSlice = s"list_slice(n.v, CAST(b.s * $PqSub + 1 AS BIGINT), " +
      s"CAST(b.s * $PqSub + $PqSub AS BIGINT))"
    val lutChain = (1 to PqSub).map { j =>
      val t = s"(q.qv[b.s * $PqSub + $j] - b.cv[$j])"
      s"($t * $t)"
    }.mkString(" + ")
    s"""ndF AS (SELECT n.vec_id, b.s, b.code,
       |  (${dotFoldSql(fSlice, fSlice)}
       |   - 2.0 * ${dotFoldSql(fSlice, "b.cv")}
       |   + ${dotFoldSql("b.cv", "b.cv")}) AS dist
       |  FROM n CROSS JOIN $cb b),
       |codesF AS (SELECT vec_id, s, code FROM (SELECT vec_id, s, code,
       |  row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, code ASC)
       |    AS rn FROM ndF) WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < $NQueries),
       |lutF AS (SELECT q.qid, b.s, b.code,
       |  CAST(floor(($lutChain) * 1000000.0) AS BIGINT) AS dlut
       |  FROM q CROSS JOIN $cb b),
       |adc AS (SELECT l.qid, c.vec_id, CAST(SUM(dlut) AS BIGINT) AS adc_e6
       |        FROM codesF c JOIN lutF l ON l.s = c.s AND l.code = c.code
       |        WHERE c.vec_id <> l.qid GROUP BY l.qid, c.vec_id),
       |exact AS (SELECT q.qid, n.vec_id,
       |  round(${dotFoldSql("n.v", "n.v")} - 2.0 * ${dotFoldSql("q.qv", "n.v")}
       |    + ${dotFoldSql("q.qv", "q.qv")}, 6) AS d_r
       |  FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
       |te AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER
       |  (PARTITION BY qid ORDER BY d_r ASC, vec_id ASC) AS rn FROM exact)
       |  WHERE rn <= $TopK),
       |ta AS (SELECT qid, vec_id, 1 AS hit FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY adc_e6 ASC, vec_id ASC)
       |    AS rn FROM adc) WHERE rn <= $TopK)
       |SELECT qid, CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_overlap,
       |       (CAST(SUM(COALESCE(hit, 0)) AS BIGINT) * 1000000) // $TopK
       |         AS recall_millionths
       |FROM te LEFT JOIN ta USING (qid, vec_id)
       |GROUP BY qid ORDER BY qid""".stripMargin
  }

  private val pqSearchTrainedSql =
    s"""WITH $baseCte,
       |${pqTrainCteSql(PqTrainMaxRounds)},
       |${pqAdcSearchVsCbSql(s"cb$PqTrainMaxRounds")}""".stripMargin

  // ---- q169: held-out-seed ADC search — the control experiment the
  //      q166 finding demands: the q157/q166 codebooks CONTAIN the 5
  //      query vectors (vec_id < 16 ⊇ vec_id < 5), which inflates
  //      seed-book retrieval around the queries; here the seed set is
  //      vectors [NQueries, NQueries + PqK) — zero query leakage — and
  //      the same ADC search runs against it. The 2×2 measurement
  //      (PqTrainSpec, sf0.001) resolves the q166 anomaly completely:
  //      leaked seeds 0.34 → 0.26 after training, held-out seeds
  //      0.18 → 0.34 — training HELPS (+89%) once the seeds are
  //      clean; the leaked-seed 0.34 was query leakage, not codebook
  //      quality. Config-change-as-promised: one offset parameter. ----
  def pqSearchHoldout(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d).persist()
    val books = booksFromCents(pqCentsFrom(all, NQueries.toLong))
    val (topAdc, topExact) = pqSearchPartsB(s, all, books)
    val result = pqOverlap(topAdc, topExact).localCheckpoint(true)
    all.unpersist(false)
    result
  }

  private val pqSearchHoldoutSql =
    s"""WITH $baseCte,
       |hc AS (SELECT t.i - 1 AS s, vec_id AS code,
       |  list_slice(v, (t.i - 1) * $PqSub + 1, (t.i - 1) * $PqSub + $PqSub) AS cv
       |  FROM n, range(1, ${PqM + 1}) t(i)
       |  WHERE vec_id >= $NQueries AND vec_id < ${NQueries + PqK}),
       |${pqAdcSearchVsCbSql("hc")}""".stripMargin

  // ---- q171: IVF-ADC (IVF-PQ) — the combined billion-vector serving
  //      shape (FAISS IVFADC without residual encoding, the
  //      by_residual=false variant: codes quantize raw vectors, the
  //      coarse index only prunes). The two structures the other lanes
  //      build separately compose here: the IVF coarse index (q50's
  //      routing — assignment argmin + query probe cells) shrinks the
  //      candidate set from n to the probed cells' members, and each
  //      surviving candidate is scored by the PQ lookup table (q157's
  //      640-row broadcast integer LUT — 8 lookups + a sum, no vector
  //      math). At 100 TB that is the only pairing that serves: exact
  //      scoring of IVF candidates still reads full vectors
  //      (q50 — memory-bound), full-corpus ADC still scores everything
  //      (q157 — compute-bound); IVF×ADC prunes THEN compresses, so
  //      per query the work is (n·probes/k) LUT sums. Output ships the
  //      measured trade per query: candidate count (the pruning
  //      factor) + recall vs the exact-L2 top-10 over the FULL corpus,
  //      so the lane's quality-vs-cost sits in the oracle-checked
  //      result like q153/q157/q163. ----
  def ivfPqSearch(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d).persist()
    val result = ivfPqSearchCore(s, all, ivfCellCount(s, d))
      .localCheckpoint(true) // sever lineage before the unpersist below
    all.unpersist(false)
    result
  }

  /** The q171 plan, lazily, for PlanShapeSpec (the registered entry
    * checkpoints eagerly — the q168/bpeEncodeLazy precedent).
    */
  private[graft] def ivfPqSearchCore(
      s: SparkSession, all: DataFrame, k: Long): DataFrame = {
    val (cand, adc) = ivfPqAdc(s, all, k)
    prunedAdcResult(all, cand, adc)
  }

  /** q171's candidate set and ADC scores, pre-presentation — q163
    * ranks the same scores as system 'ivfpq'.
    */
  private[graft] def ivfPqAdc(
      s: SparkSession, all: DataFrame, k: Long,
      routing: Option[(DataFrame, DataFrame)] = None,
      nq: Int = NQueries): (DataFrame, DataFrame) = {
    val (assigned, probes) = routing.getOrElse(ivfRouting(all, k, IvfProbes))
    val books = pqSeedBooks(all)
    val codes = pqCodesOnly(all, books)
    // nq must cover the routing's query width (q163 passes a wide
    // routing + EvalQueries; LUT rows for unprobed qids never join)
    val lut = pqLutDf(s, all, books, nq)
      .withColumnRenamed("qid", "lqid")
    // prune: probed-cell members only — the equi-join on cell is the
    // inverted-list probe; probes is NQueries·nProbes rows, broadcast
    val cand = assigned.select(col("vec_id"), col("cell"))
      .join(broadcast(probes.select(col("qid"), col("cell"))), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    // score survivors by ADC: integer LUT lookups, order-independent
    // sum. cand is BOUNDED — NQueries·probes·~IvfCellTarget rows, the
    // cell size being corpus-independent by construction — so it
    // broadcasts against the corpus-scale codes: scoring stays
    // map-side and codes never shuffles
    val adc = codes.join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(lut),
            col("s") === col("ls") && col("code") === col("lcid") &&
              col("qid") === col("lqid"))
      .groupBy("qid", "vec_id").agg(sum(col("dlut")).as("adc_e6"))
    (cand, adc)
  }

  /** Per-query ADC top-K ranking (qid, vec_id, rn) — shared by the
    * q171/q172 presentation and the q163 'ivfpq'/'rivfpq' systems.
    */
  private[graft] def adcTopK(adc: DataFrame): DataFrame = {
    val wa = Window.partitionBy("qid").orderBy(col("adc_e6").asc, col("vec_id").asc)
    adc.withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("rn").cast("long").as("rn"))
  }

  /** Shared presentation tail of the IVF-ADC lanes (q171/q172): rank
    * the ADC scores, rank full-corpus exact L2 — so recall prices the
    * coarse quantizer's misses too — and report per-query candidate
    * count + top-K overlap.
    */
  private def prunedAdcResult(
      all: DataFrame, cand: DataFrame, adc: DataFrame): DataFrame = {
    val topAdc = adcTopK(adc)
    val q = all.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(vecDot(col("v"), col("v")) - lit(2.0) * vecDot(col("qv"), col("v"))
          + vecDot(col("qv"), col("qv")), 6).as("d_r"))
    val we = Window.partitionBy("qid").orderBy(col("d_r").asc, col("vec_id").asc)
    val topExact = exact.withColumn("rn", row_number().over(we))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), col("rn").cast("long").as("rn"))
    val nCand = cand.groupBy("qid").agg(count(lit(1)).as("n_cand"))
    pqOverlap(topAdc, topExact)
      .join(broadcast(nCand), Seq("qid"))
      .select(col("qid"), col("n_cand"), col("n_overlap"), col("recall_millionths"))
      .orderBy("qid")
  }

  /** Shared tail of the IVF-ADC twins (q171/q172): exact-L2 truth,
    * both top-K ranks, candidate counts, final recall presentation.
    * Expects CTEs `n`, `pq (qid, qv)`, `$cnd (qid, vec_id, ...)`,
    * `$adcc (qid, vec_id, adc_e6)` upstream.
    */
  private def ivfAdcTailSqlFor(cnd: String, adcc: String): String =
    s"""exact AS (SELECT pq.qid, n.vec_id,
       |  round(${dotFoldSql("n.v", "n.v")} - 2.0 * ${dotFoldSql("pq.qv", "n.v")}
       |    + ${dotFoldSql("pq.qv", "pq.qv")}, 6) AS d_r
       |  FROM n CROSS JOIN pq WHERE n.vec_id <> pq.qid),
       |te AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER
       |  (PARTITION BY qid ORDER BY d_r ASC, vec_id ASC) AS rn FROM exact)
       |  WHERE rn <= $TopK),
       |ta AS (SELECT qid, vec_id, 1 AS hit FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY adc_e6 ASC, vec_id ASC)
       |    AS rn FROM $adcc) WHERE rn <= $TopK),
       |nc AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand
       |       FROM $cnd GROUP BY qid)
       |SELECT te.qid, nc.n_cand, CAST(SUM(COALESCE(hit, 0)) AS BIGINT)
       |         AS n_overlap,
       |       (CAST(SUM(COALESCE(hit, 0)) AS BIGINT) * 1000000) // $TopK
       |         AS recall_millionths
       |FROM te LEFT JOIN ta USING (qid, vec_id) JOIN nc ON nc.qid = te.qid
       |GROUP BY te.qid, nc.n_cand ORDER BY te.qid""".stripMargin

  private val ivfAdcTailSql = ivfAdcTailSqlFor("icnd", "adcc")

  /** q171's candidate + ADC CTEs `icnd`/`adcc` — expects `iasg`/`iprb`
    * (route), `codes` (PQ codes) and `plut` (qid-keyed integer LUT)
    * upstream; composes into both the standalone twin and q163's.
    */
  private val ivfCandAdcCteSql =
    s"""icnd AS (SELECT p.qid, s.vec_id FROM iasg s JOIN iprb p
       |         ON s.cell = p.cell WHERE s.vec_id <> p.qid),
       |adcc AS (SELECT icnd.qid, icnd.vec_id,
       |          CAST(SUM(plut.dlut) AS BIGINT) AS adc_e6
       |        FROM icnd JOIN codes ON codes.vec_id = icnd.vec_id
       |        JOIN plut ON plut.qid = icnd.qid AND plut.s = codes.s
       |          AND plut.cid = codes.cid
       |        GROUP BY icnd.qid, icnd.vec_id)""".stripMargin

  private val ivfPqSearchSql = {
    val lutDistCols = (0 until PqM)
      .map(sI => s"${pqSubDistSql(sI, "pq.qv", "c.cv")} AS ld_$sI").mkString(",\n  ")
    val lutCaseArms = (0 until PqM).map(sI => s"WHEN ${sI + 1} THEN ld_$sI").mkString(" ")
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$pqCodesCteSql,
       |pq AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < $NQueries),
       |pl0 AS (SELECT pq.qid, c.cid,
       |  $lutDistCols
       |  FROM pq CROSS JOIN c),
       |plut AS (SELECT qid, cid, CAST(t.i - 1 AS BIGINT) AS s,
       |          CAST(floor((CASE t.i $lutCaseArms END) * 1000000.0) AS BIGINT)
       |            AS dlut
       |        FROM pl0, range(1, ${PqM + 1}) t(i)),
       |$ivfCandAdcCteSql,
       |$ivfAdcTailSql""".stripMargin
  }

  // ---- q172: RESIDUAL IVF-PQ (FAISS IVFADC, by_residual=true — the
  //      production default): codes quantize the residual
  //      v − centroid(cell(v)) instead of the raw vector. Residuals
  //      concentrate near zero, so a fixed-size codebook spends its 16
  //      entries on a much smaller ball — the standard fidelity win
  //      residual encoding exists for, and q172's output (same shape
  //      and same routing as q171) isolates exactly that delta as
  //      oracle-checked data. Two structural changes vs q171:
  //       * the codebooks come from seed ids [k, k+PqK): the first k
  //         vectors ARE the centroids, so their residuals are zero —
  //         seeding from them would build degenerate all-zero books
  //         (a bonus: the seeds cannot contain the queries, the q169
  //         leakage lesson);
  //       * the LUT is keyed (query, PROBED CELL, s, code) — the
  //         query's residual differs per cell — so it has
  //         NQueries·probes·PqM·PqK rows (1 280 here): still
  //         metadata-scale, still broadcast.
  //      Books and query residuals are collected FROM THE ENGINE's
  //      residual relation (not recomputed driver-side), so the
  //      inlined literals are bit-identical to what the plan computes;
  //      the SQL twin derives the same quantities from its own routing
  //      CTEs. ----
  def ivfPqResidual(s: SparkSession, d: String): DataFrame = {
    // the kit is the session-cached artifact shared with q177/q163
    // (the UNTRAINED layer — no Lloyd run on this path). The shared
    // kit probes the EvalQueries superset for q163; this lane's
    // presentation is the 5-query set, and candidates are per-qid
    // independent — filtering the probes BEFORE candidate generation
    // keeps the output bit-identical while the serving join carries
    // only this lane's queries (r13: the wide kit had grown q172's
    // candidate set 20x for rows its pqOverlap then discarded).
    val kit0 = sharedResidKit(s, d)
    val kit = kit0.copy(probes = kit0.probes.filter(col("qid") < NQueries))
    val all = base(s, d)
    val (cand, adc) = residualAdcOn(s, kit, kit.books)
    prunedAdcResult(all, cand, adc).localCheckpoint(true)
  }

  /** The residual-encoding building blocks shared by q172 and q173:
    * the routed corpus, the centroid table (with norms), the residual
    * relation (every vector minus its cell's centroid — one broadcast
    * join, map-side at any corpus size), and the residual codebooks
    * from seeds [k, k+PqK) (the first k vectors ARE the centroids —
    * their residuals are zero, so seeding from them would build
    * degenerate books).
    */
  private[graft] case class ResidKit(
      assigned: DataFrame, probes: DataFrame, cents: DataFrame,
      resid: DataFrame, books: PqBooks)

  private[graft] def residKit(
      all: DataFrame, k: Long,
      routing: Option[(DataFrame, DataFrame)] = None): ResidKit = {
    val (assigned0, probes) = routing.getOrElse(ivfRouting(all, k, IvfProbes))
    // the n×k routing argmin feeds THREE consumers (the seed-book
    // collect, the corpus code assignment, the candidate join) —
    // materialize it once instead of recomputing per consumer; at
    // 100 TB this is the "write the routed corpus" step a real
    // pipeline persists. probes stays lazy: its vec_id < NQueries
    // filter pushes below the centroid cross join, so it scores
    // NQueries×k rows, not n×k. When the caller shares a routing
    // across systems (q163), `assigned0` arrives checkpointed —
    // localCheckpoint on it is then a no-op-cheap lineage cut.
    val assigned = if (routing.isDefined) assigned0
                   else assigned0.localCheckpoint(true)
    val centsDf = all.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), toDouble(col("v")).as("cv"),
              col("nrm").as("cn"))
    val resid = assigned.join(broadcast(centsDf), col("cell") === col("cid"))
      .select(col("vec_id"), col("cell"),
              zip_with(toDouble(col("v")), col("cv"), (a, b) => a - b).as("rv"))
    val seedRes: Array[(Long, Array[Double])] =
      resid.filter(col("vec_id") >= k && col("vec_id") < k + PqK)
        .select("vec_id", "rv").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    // Seeding reads vec_ids [k, k + PqK): a corpus with n < k + PqK
    // silently underfills the seed set and the books degenerate
    // (null argmin structs downstream) — fail loudly instead
    // (r9 ADVICE). The corpus-derived k (ceil(n/64), floor 16) keeps
    // real corpora far above this bound; it only bites on toy inputs.
    require(seedRes.length == PqK,
      s"residKit needs corpus vec_ids [$k, ${k + PqK}) present to seed " +
        s"residual codebooks (n >= k + PqK); found ${seedRes.length} of $PqK seeds")
    val books: PqBooks = (0 until PqM).map { sIdx =>
      seedRes.toIndexedSeq.map { case (cid, rv) =>
        (cid, rv.slice(sIdx * PqSub, sIdx * PqSub + PqSub))
      }
    }
    ResidKit(assigned, probes, centsDf, resid, books)
  }

  /** Residual PQ codes with their cell and floor-e6 reconstruction
    * error, restricted by `pred` — the batch twin StreamingSpec holds
    * q173 against (same semantics, the broadcast-join plan instead of
    * the literal-index stream plan).
    */
  private[graft] def residualCodesBatch(
      s: SparkSession, d: String, pred: Column): DataFrame = {
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    kit.resid.filter(pred)
      .select(col("vec_id"), col("cell"),
        posexplode(array(pqArgminsOn(col("rv"), kit.books): _*)).as(Seq("s", "c")))
      .select(col("vec_id"), col("cell"), col("s").cast("long").as("s"),
              col("c.cid").as("code"),
              floor(col("c.dist") * 1000000.0).cast("long").as("err_e6"))
      .orderBy("vec_id", "s")
  }

  /** Static prep for the q173 ingest coder: a ONE-ROW DataFrame
    * carrying the whole centroid index as a cid-ascending
    * `cents: array<struct<cid, cv, cn>>` column, plus the residual
    * codebooks. The stream side joins the one-row relation as a
    * stream-static BROADCAST (q170's vocab shape) instead of
    * inlining the centroids as plan literals — at the documented
    * 50k-cell cap the centroid table is ~25 MB, which a broadcast
    * variable carries fine but a plan literal would push into
    * constant-pool/codegen breakage (r9 VERDICT #2). The books stay
    * a driver-side value: they are PqM·PqK·PqSub = 1 024 doubles by
    * construction, corpus-INDEPENDENT, so the literal path is safe
    * for them at any scale.
    */
  private[graft] def ingestCoderKitDf(s: SparkSession, d: String)
      : (DataFrame, PqBooks) = {
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    val centsRow = kit.cents
      .agg(array_sort(collect_list(struct(col("cid"), col("cv"), col("cn"))))
        .as("cents"))
    (centsRow.localCheckpoint(true), kit.books)
  }

  /** Stream-side residual PQ argmin structs — q173 plugs the arriving
    * vector's residual column into the shared kernel.
    */
  private[graft] def residArgmins(rv: Column, books: PqBooks): Seq[Column] =
    pqArgminsOn(rv, books)

  private[graft] def ivfPqResidualCore(
      s: SparkSession, all: DataFrame, k: Long): DataFrame = {
    val (cand, adc) = ivfPqResidualAdc(s, all, k)
    prunedAdcResult(all, cand, adc)
  }

  // ---- q177: residual IVF-PQ under LLOYD-TRAINED books — q172's
  //      serving lane upgraded with q165's training loop run on the
  //      RESIDUAL relation (seeded from the [k, k+PqK) seed residuals,
  //      so the q169 leakage discipline carries over: no query vector
  //      seeds a codebook). This closes the loop the r9 verdict asked
  //      for (#8): the oracle-checked trainer now feeds the
  //      oracle-checked production index shape, and q163's 'trivfpq'
  //      row measures what training buys at serving time against the
  //      same exact-L2 truth as 'rivfpq'. Cost shape at 100 TB: the
  //      training rounds are pqTrainRoundsFor(n) extra scans of the routed
  //      residual corpus, each collapsing map-side to ≤ PqM·PqK·PqSub
  //      = 1 024 rows of quantized partial sums — the index-BUILD
  //      cost a real deployment amortizes offline; the serving-time
  //      plan (routing, candidate join, LUT broadcast) is bit-for-bit
  //      q172's. ----
  def ivfPqResidualTrained(s: SparkSession, d: String): DataFrame = {
    // the kit (routing + residuals + Lloyd rounds) is the session-
    // cached build artifact shared with q163; serving below is the
    // per-run work (ivfPqResidualTrainedCore stays the uncached lazy
    // surface PlanShapeSpec fences). Probes filtered to this lane's
    // 5-query presentation — see ivfPqResidual's note.
    val kitT = sharedTrainedKit(s, d)
    val kit = kitT.kit.copy(
      probes = kitT.kit.probes.filter(col("qid") < NQueries))
    val all = base(s, d)
    val (cand, adc) = residualAdcOn(s, kit, kitT.trained)
    prunedAdcResult(all, cand, adc).localCheckpoint(true)
  }

  private[graft] def ivfPqResidualTrainedCore(
      s: SparkSession, all: DataFrame, k: Long, rounds: Int): DataFrame = {
    val kit = residTrainedKit(all, k, rounds = rounds)
    val (cand, adc) = residualAdcOn(s, kit.kit, kit.trained)
    prunedAdcResult(all, cand, adc)
  }

  // ---- cross-lane session cache (r11 verdict #6): expensive build
  //      artifacts that several lanes derive IDENTICALLY from the same
  //      corpus — the exact-cosine truth (q163's gain source, q199's
  //      recall referent) and the trained residual kit (q177's subject,
  //      q163's rivfpq/trivfpq systems: routing + materialized
  //      residuals + the corpus-scaled Lloyd rounds) — are computed
  //      once per (session, corpus fingerprint) and checkpointed, the
  //      r9 within-lane routing-sharing pattern lifted ACROSS lanes.
  //      This is what a deployment does: books and truth sets are
  //      build artifacts served many times, not per-query work. Keyed
  //      by the embeddings file fingerprint so a regenerated corpus
  //      invalidates; derivations are deterministic, so every lane's
  //      output is bit-identical with or without a cache hit (Verify
  //      proves it — the oracle knows nothing of the cache). ----
  // The generic weak-keyed compute-once machinery lives in
  // graft.SessionCache (r13: PipelineOps shares the same discipline);
  // this wrapper just pins the corpus fingerprint to the embeddings
  // file every similarity artifact derives from.
  private def cachedAs[T <: AnyRef](s: SparkSession, d: String,
                                    kind: String)(f: => T): T =
    graft.SessionCache.cachedAs(s, kind, Seq(s"$d/embeddings.parquet"))(f)

  /** Shared exact-cosine top-K truth (qid, vec_id, cos_r, rn) —
    * computed at [[EvalQueries]] width (q163's gain source needs it;
    * q199's recall referent filters to its own 5-query probe set).
    * PERSISTED to disk keyed by the corpus fingerprint (r13 verdict
    * #7): the 100-query exact scan is the dominant share of q163's
    * wall-clock, and a truth set is a BUILD artifact — a deployment
    * computes it once per corpus version and every later eval (and
    * every later JVM) reads it. The derivation is deterministic, so
    * read-back and recompute are bit-identical and the oracles never
    * observe the cache; a regenerated corpus invalidates the marker
    * and rebuilds.
    */
  private[graft] def sharedSimTruth(s: SparkSession, d: String): DataFrame =
    cachedAs(s, d, "simtruth") {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_simtruth_" +
        java.lang.Integer.toHexString(d.hashCode)
      val marker = java.nio.file.Paths.get(dir, "_FIXTURE_OK")
      // derivation-version token alongside the corpus fingerprint
      // (r14 ADVICE: a marker keyed only on the corpus would silently
      // reuse a stale truth set after a simTopKOn/EvalQueries change —
      // same discipline as amp-fixture-v2 / admidx-v3)
      val srcs = Seq(s"$d/embeddings.parquet",
        s"simtruth-v1:topk$TopK-q$EvalQueries")
      if (!graft.Fixtures.markerCurrent(marker, srcs: _*)) {
        simTopKOn(base(s, d), EvalQueries)
          .write.mode("overwrite").parquet(dir)
        graft.Fixtures.writeMarker(marker, srcs: _*)
      }
      s.read.parquet(dir)
    }

  /** Shared RAW-vector training run (q165's audit, q166's books):
    * one corpus-scaled Lloyd run per (session, corpus).
    */
  private[graft] def sharedRawTrain(s: SparkSession, d: String)
      : (PqBooks, Seq[(Long, Long, Long, Long, Long)]) =
    cachedAs(s, d, "rawtrain") {
      pqTrainCore(base(s, d).localCheckpoint(true),
        rounds = trainRoundsOf(s, d))
    }

  /** Shared UNTRAINED residual kit: one routing + one materialized
    * residual relation (q172's serving input; the training below
    * builds on it). Cached separately from the trained kit so a lane
    * that only needs the seed books never pays a Lloyd run.
    */
  private[graft] def sharedResidKit(s: SparkSession, d: String): ResidKit =
    cachedAs(s, d, "residkit") {
      val all = base(s, d).localCheckpoint(true)
      val k = ivfCellCount(s, d)
      // probe the EvalQueries SUPERSET: q163's seven systems need the
      // wide width; q172/q177's presentations key on their 5-query
      // exact-truth side, so extra probed qids fall out of their
      // outputs unchanged (per-qid independence)
      val (a0, p0raw) = ivfRoutingRankedFor(all, k, IvfProbes,
        col("vec_id") < EvalQueries)
      val p0 = p0raw.drop("crn")
      val kit0 = residKit(all, k,
        Some((a0.localCheckpoint(true), p0.localCheckpoint(true))))
      kit0.copy(resid = kit0.resid.localCheckpoint(true))
    }

  /** Shared trained residual kit: the shared kit + one corpus-scaled
    * Lloyd run.
    */
  private[graft] def sharedTrainedKit(s: SparkSession, d: String): ResidTrainedKit =
    cachedAs(s, d, "trainedkit") {
      val kit = sharedResidKit(s, d)
      val (trained, _) = lloydLoopOn(kit.resid, col("rv"), kit.books,
        trainRoundsOf(s, d))
      ResidTrainedKit(kit, trained)
    }

  /** A residKit with its residual relation MATERIALIZED (the training
    * loop re-scans it rounds + 1 times) plus the Lloyd-trained
    * residual books — shared by q177 and q163's 'trivfpq' system.
    */
  private[graft] case class ResidTrainedKit(kit: ResidKit, trained: PqBooks)

  private[graft] def residTrainedKit(
      all: DataFrame, k: Long,
      routing: Option[(DataFrame, DataFrame)] = None,
      rounds: Int): ResidTrainedKit = {
    val kit0 = residKit(all, k, routing)
    val kit = kit0.copy(resid = kit0.resid.localCheckpoint(true))
    val (trained, _) = lloydLoopOn(kit.resid, col("rv"), kit.books, rounds)
    ResidTrainedKit(kit, trained)
  }

  /** q172's candidate set and residual-ADC scores, pre-presentation —
    * q163 ranks the same scores as system 'rivfpq'.
    */
  private[graft] def ivfPqResidualAdc(
      s: SparkSession, all: DataFrame, k: Long,
      routing: Option[(DataFrame, DataFrame)] = None): (DataFrame, DataFrame) = {
    val kit = residKit(all, k, routing)
    residualAdcOn(s, kit, kit.books)
  }

  /** Residual candidate set + ADC scores under ARBITRARY residual
    * books — q172 scores under the seed books (kit.books), q177 under
    * the Lloyd-trained ones. Same routing, same candidate join; only
    * the codebook contents differ, so the recall delta between the two
    * lanes isolates exactly what training buys.
    */
  private[graft] def residualAdcOn(
      s: SparkSession, kit: ResidKit, books: PqBooks): (DataFrame, DataFrame) = {
    val assigned = kit.assigned; val probes = kit.probes
    val codes = kit.resid
      .select(col("vec_id"), posexplode(array(pqArgminsOn(col("rv"), books): _*))
        .as(Seq("s", "c")))
      .select(col("vec_id"), col("s").cast("long").as("s"), col("c.cid").as("code"))
    val lut = residLutDf(s, kit, books)
    val cand = assigned.select(col("vec_id"), col("cell"))
      .join(broadcast(probes.select(col("qid"), col("cell"))), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"))
    val adc = codes.join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(lut),
            col("qid") === col("lqid") && col("cell") === col("lcell") &&
              col("s") === col("ls") && col("code") === col("lcid"))
      .groupBy("qid", "vec_id").agg(sum(col("dlut")).as("adc_e6"))
    (cand, adc)
  }

  /** Per-(query, probed cell) residual ADC lookup table — the query's
    * residual is cell-dependent; NQueries·probes rows collected, LUT
    * built driver-side (NQueries·probes·PqM·PqK integer rows —
    * metadata-scale, broadcasts). Shared by [[residualAdcOn]] (q172/
    * q177 in-memory serving) and [[adcServeFromDisk]] (q185, the same
    * LUT against the compacted on-disk postings).
    */
  private def residLutDf(
      s: SparkSession, kit: ResidKit, books: PqBooks): DataFrame = {
    val qRes: Array[(Long, Long, Array[Double])] =
      kit.probes.join(broadcast(kit.cents), col("cell") === col("cid"))
        .select(col("qid"), col("cell"),
                zip_with(toDouble(col("qv")), col("cv"), (a, b) => a - b).as("qr"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val lutRows: Seq[(Long, Long, Long, Long, Long)] = for {
      (qid, cell, qr) <- qRes.toSeq
      sIdx <- 0 until PqM
      (cid, cb) <- books(sIdx)
    } yield {
      var acc = 0.0; var j = 0
      while (j < PqSub) { val dd = qr(sIdx * PqSub + j) - cb(j); acc += dd * dd; j += 1 }
      (qid, cell, sIdx.toLong, cid, math.floor(acc * 1000000.0).toLong)
    }
    import s.implicits._
    lutRows.toDF("lqid", "lcell", "ls", "lcid", "dlut")
  }

  /** Σ over subspace sI of (x1[i]-x2[i])·(y1[i]-y2[i]) — the residual
    * product chain (residuals inline as centroid subtractions).
    */
  private def resDotSql(sI: Int, x: (String, String), y: (String, String)): String =
    (0 until PqSub).map { j =>
      val i = sI * PqSub + j + 1
      s"((${x._1}[$i] - ${x._2}[$i]) * (${y._1}[$i] - ${y._2}[$i]))"
    }.mkString(" + ")

  /** CTE chain (after base + route) deriving the residual relation,
    * the [k, k+PqK) seed books, and the per-(vector, subspace, seed)
    * distance long-form `ru (vec_id, scid, s, dist)` — shared by
    * q172's twin and q173's ingest twin.
    */
  private val residRuCteSql = {
    val v = ("r.v", "r.cv"); val c = ("sd.sv", "sd.scv")
    val codeDistCols = (0 until PqM).map { sI =>
      s"((${resDotSql(sI, v, v)}) - 2.0 * (${resDotSql(sI, v, c)}) " +
        s"+ (${resDotSql(sI, c, c)})) AS dist_$sI"
    }.mkString(",\n  ")
    val codeCaseArms = (0 until PqM).map(sI => s"WHEN ${sI + 1} THEN dist_$sI").mkString(" ")
    s"""rv AS (SELECT a.vec_id, a.cell, a.v, c.cv FROM iasg a
       |       JOIN icc c ON a.cell = c.cid),
       |sd AS (SELECT vec_id AS scid, v AS sv, cv AS scv FROM rv, ikq
       |       WHERE vec_id >= ikq.k AND vec_id < ikq.k + $PqK),
       |ra AS (SELECT r.vec_id, sd.scid,
       |  $codeDistCols
       |  FROM rv r CROSS JOIN sd),
       |ru AS (SELECT vec_id, scid, t.i - 1 AS s,
       |        CASE t.i $codeCaseArms END AS dist
       |      FROM ra, range(1, ${PqM + 1}) t(i))""".stripMargin
  }

  /** q172's residual candidate + ADC CTEs `rcodes`/`qr`/`rpl0`/
    * `rplut`/`rcnd`/`radc` — expects the route chain and
    * [[residRuCteSql]] upstream; composes into both the standalone
    * twin and q163's.
    */
  private val residAdcCteSql = {
    val lutDistCols = (0 until PqM).map { sI =>
      (0 until PqSub).map { j =>
        val i = sI * PqSub + j + 1
        val dd = s"((qr.qv[$i] - qr.cv[$i]) - (sd.sv[$i] - sd.scv[$i]))"
        s"($dd * $dd)"
      }.mkString(" + ") + s" AS ld_$sI"
    }.mkString(",\n  ")
    val lutCaseArms = (0 until PqM).map(sI => s"WHEN ${sI + 1} THEN ld_$sI").mkString(" ")
    s"""rcodes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, scid AS cid FROM
       |  (SELECT vec_id, s, scid, row_number() OVER (PARTITION BY vec_id, s
       |     ORDER BY dist ASC, scid ASC) AS rn FROM ru) WHERE rn = 1),
       |qr AS (SELECT p.qid, p.cell, p.qv, c.cv FROM iprb p
       |       JOIN icc c ON p.cell = c.cid),
       |rpl0 AS (SELECT qr.qid, qr.cell, sd.scid AS cid,
       |  $lutDistCols
       |  FROM qr CROSS JOIN sd),
       |rplut AS (SELECT qid, cell, cid, CAST(t.i - 1 AS BIGINT) AS s,
       |          CAST(floor((CASE t.i $lutCaseArms END) * 1000000.0) AS BIGINT)
       |            AS dlut
       |        FROM rpl0, range(1, ${PqM + 1}) t(i)),
       |rcnd AS (SELECT p.qid, s.vec_id, s.cell FROM iasg s JOIN iprb p
       |         ON s.cell = p.cell WHERE s.vec_id <> p.qid),
       |radc AS (SELECT rcnd.qid, rcnd.vec_id,
       |          CAST(SUM(rplut.dlut) AS BIGINT) AS adc_e6
       |        FROM rcnd JOIN rcodes ON rcodes.vec_id = rcnd.vec_id
       |        JOIN rplut ON rplut.qid = rcnd.qid AND rplut.cell = rcnd.cell
       |          AND rplut.s = rcodes.s AND rplut.cid = rcodes.cid
       |        GROUP BY rcnd.qid, rcnd.vec_id)""".stripMargin
  }

  private val ivfPqResidualSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residRuCteSql,
       |$residAdcCteSql,
       |pq AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < $NQueries),
       |${ivfAdcTailSqlFor("rcnd", "radc")}""".stripMargin

  /** CTE chain for the TRAINED-residual serving lane (q177 and q163's
    * 'trivfpq' system), tv-prefixed to compose collision-free into
    * q163's twin. Expects `ikq`/`icc`/`iasg`/`iprb` (route) upstream.
    * Derives: the residual ARRAYS (`tvx` — the twin of residKit's
    * zip_with subtraction), seed books `tvcb0` from the [k, k+PqK)
    * residuals, pqTrainRoundsFor(n) Lloyd rounds (assignment under the
    * previous round's books + quantized-integer mean update — the
    * q165 recipe verbatim, so every round's books are bit-identical
    * to [[lloydLoopOn]]'s), a final assignment `tvcodes` under the
    * trained books, the per-(query, probed-cell) trained LUT
    * `tvlut`, and the candidate + ADC tail `tvcnd`/`tvadc`.
    */
  private val residTrainedCteSql: String = {
    val sb = new StringBuilder
    sb ++= s"""tvx AS (SELECT a.vec_id,
      |  list_transform(range(1, ${Dim + 1}), i -> (a.v)[i] - (c.cv)[i]) AS v
      |  FROM iasg a JOIN icc c ON a.cell = c.cid),
      |tvcb0 AS (SELECT t.i - 1 AS s, x.vec_id AS code,
      |  list_slice(x.v, (t.i - 1) * $PqSub + 1, (t.i - 1) * $PqSub + $PqSub) AS cv
      |  FROM tvx x, ikq, range(1, ${PqM + 1}) t(i)
      |  WHERE x.vec_id >= ikq.k AND x.vec_id < ikq.k + $PqK),
      |tvprm AS MATERIALIZED (SELECT $pqRoundsSqlExpr AS rnds)""".stripMargin
    val sliceSql = s"list_slice(x.v, CAST(b.s * $PqSub + 1 AS BIGINT), " +
      s"CAST(b.s * $PqSub + $PqSub AS BIGINT))"
    val cauchy = s"(${dotFoldSql(sliceSql, sliceSql)}\n" +
      s"   - 2.0 * ${dotFoldSql(sliceSql, "b.cv")}\n" +
      s"   + ${dotFoldSql("b.cv", "b.cv")})"
    for (r <- 1 to PqTrainMaxRounds) {
      // same dead-round gate as pqTrainCteSql's ndR (r12 advice #4)
      sb ++= s""",
tvnd$r AS (SELECT x.vec_id, x.v, b.s, b.code,
  $cauchy AS dist
  FROM tvx x CROSS JOIN tvcb${r - 1} b
  WHERE $r <= (SELECT rnds FROM tvprm)),
tvra$r AS (SELECT vec_id, v, s, code, dist, row_number() OVER
  (PARTITION BY vec_id, s ORDER BY dist ASC, code ASC) AS rn FROM tvnd$r),
tvasg$r AS (SELECT vec_id, v, s, code FROM tvra$r WHERE rn = 1),
tvup$r AS (SELECT a.s, a.code, t.i - 1 AS j,
  ((CAST(SUM(CAST(floor(a.v[a.s * $PqSub + t.i] * 1000000.0) AS BIGINT)) AS DOUBLE)
    / 1000000.0) / COUNT(*)) AS c
  FROM tvasg$r a, range(1, ${PqSub + 1}) t(i) GROUP BY a.s, a.code, t.i),
tvcb$r AS MATERIALIZED (
  SELECT s, code, list(c ORDER BY j) AS cv FROM tvup$r
  WHERE $r <= (SELECT rnds FROM tvprm) GROUP BY s, code
  UNION ALL
  SELECT s, code, cv FROM tvcb${r - 1}
  WHERE $r > (SELECT rnds FROM tvprm))"""
    }
    val lutChain = (0 until PqSub).map { j =>
      val el = s"(q.qr)[CAST(b.s * $PqSub + ${j + 1} AS BIGINT)]"
      s"(($el - (b.cv)[${j + 1}]) * ($el - (b.cv)[${j + 1}]))"
    }.mkString(" + ")
    sb ++= s""",
tvfd AS (SELECT x.vec_id, b.s, b.code,
  $cauchy AS dist
  FROM tvx x CROSS JOIN tvcb$PqTrainMaxRounds b),
tvcodes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, code AS cid FROM
  (SELECT vec_id, s, code, row_number() OVER (PARTITION BY vec_id, s
     ORDER BY dist ASC, code ASC) AS rn FROM tvfd) WHERE rn = 1),
tvqr AS (SELECT p.qid, p.cell,
  list_transform(range(1, ${Dim + 1}), i -> (p.qv)[i] - (c.cv)[i]) AS qr
  FROM iprb p JOIN icc c ON p.cell = c.cid),
tvl0 AS (SELECT q.qid, q.cell, b.s, b.code AS cid,
  $lutChain AS ld
  FROM tvqr q CROSS JOIN tvcb$PqTrainMaxRounds b),
tvlut AS (SELECT qid, cell, CAST(s AS BIGINT) AS s, cid,
  CAST(floor(ld * 1000000.0) AS BIGINT) AS dlut FROM tvl0),
tvcnd AS (SELECT p.qid, s.vec_id, s.cell FROM iasg s JOIN iprb p
          ON s.cell = p.cell WHERE s.vec_id <> p.qid),
tvadc AS (SELECT tvcnd.qid, tvcnd.vec_id,
          CAST(SUM(tvlut.dlut) AS BIGINT) AS adc_e6
        FROM tvcnd JOIN tvcodes ON tvcodes.vec_id = tvcnd.vec_id
        JOIN tvlut ON tvlut.qid = tvcnd.qid AND tvlut.cell = tvcnd.cell
          AND tvlut.s = tvcodes.s AND tvlut.cid = tvcodes.cid
        GROUP BY tvcnd.qid, tvcnd.vec_id)"""
    sb.toString
  }

  private val ivfPqTrainedSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residTrainedCteSql,
       |pq AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < $NQueries),
       |${ivfAdcTailSqlFor("tvcnd", "tvadc")}""".stripMargin

  /** SQL twin of q180's streaming ANN query serving (StreamingOps.
    * streamAnnQuery): the q50 probe-and-score chain with the QUERY set
    * being the arrival slice `vec_id % 7 = 5` — `ir0` already ranks
    * every corpus vector's cells, so the slice's probes come from the
    * same machinery (identical negsim + tie-break) as `iprb`.
    */
  private[graft] val streamAnnQuerySql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |sq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, cid AS cell
       |       FROM ir0 WHERE crn <= $IvfProbes AND vec_id % 7 = 5),
       |scand AS (SELECT q.qid, a.vec_id,
       |  round(${dotFoldSql("q.qv", "a.v")} / (q.qn * a.nrm), 6) AS cos_r
       |  FROM iasg a JOIN sq q ON a.cell = q.cell WHERE a.vec_id <> q.qid)
       |SELECT qid, vec_id, cos_r, CAST(rn AS BIGINT) AS rn FROM
       |  (SELECT qid, vec_id, cos_r, row_number() OVER
       |    (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM scand)
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin

  /** SQL twin of q193's versioned serving stream (StreamingOps.
    * streamVersionedServe): arriving queries are the % 7 = 5 slice,
    * routed by the same `ir0` machinery; EVEN qids arrive in batch 0
    * and are served from the gen-0 snapshot (postings exclude the
    * % 7 = 3 delta slice), ODD qids arrive in batch 1 — after the
    * mid-stream manifest commit — and are served from gen 1 (all
    * postings). Green == each batch's fetch is snapshot-consistent
    * with the generation committed at its fetch time.
    */
  /** q212's twin: three query slices (qid % 3, arrival order), batch 0
    * against the pre-delta corpus, batches 1 and 2 against the full
    * corpus — the mid-stream vacuum between batches 1 and 2 must be
    * invisible at the served pin, so their relations are IDENTICAL by
    * construction.
    */
  private[graft] val streamVacuumServeSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residRuCteSql,
       |lcodes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, scid AS cid,
       |  CAST(floor(dist * 1000000.0) AS BIGINT) AS err_e6 FROM
       |  (SELECT vec_id, s, scid, dist, row_number() OVER (PARTITION BY vec_id, s
       |     ORDER BY dist ASC, scid ASC) AS rn FROM ru) WHERE rn = 1),
       |sq AS (SELECT vec_id AS qid, cid AS cell FROM ir0
       |       WHERE crn <= $IvfProbes AND vec_id % 7 = 5),
       |post AS (SELECT q.qid, CAST(a.cell AS BIGINT) AS cell, l.vec_id, l.s,
       |    l.cid AS code, l.err_e6
       |  FROM sq q JOIN iasg a ON a.cell = q.cell
       |  JOIN lcodes l ON l.vec_id = a.vec_id
       |  WHERE a.vec_id <> q.qid)
       |SELECT CAST(0 AS INTEGER) AS batch, CAST(0 AS INTEGER) AS gen_served,
       |  qid, cell, vec_id, s, code, err_e6
       |FROM post WHERE qid % 3 = 0 AND vec_id % 7 <> 3
       |UNION ALL
       |SELECT CAST(1 AS INTEGER), CAST(1 AS INTEGER),
       |  qid, cell, vec_id, s, code, err_e6 FROM post WHERE qid % 3 = 1
       |UNION ALL
       |SELECT CAST(2 AS INTEGER), CAST(1 AS INTEGER),
       |  qid, cell, vec_id, s, code, err_e6 FROM post WHERE qid % 3 = 2
       |ORDER BY batch, qid, cell, vec_id, s""".stripMargin

  private[graft] val streamVersionedServeSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residRuCteSql,
       |lcodes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, scid AS cid,
       |  CAST(floor(dist * 1000000.0) AS BIGINT) AS err_e6 FROM
       |  (SELECT vec_id, s, scid, dist, row_number() OVER (PARTITION BY vec_id, s
       |     ORDER BY dist ASC, scid ASC) AS rn FROM ru) WHERE rn = 1),
       |sq AS (SELECT vec_id AS qid, cid AS cell FROM ir0
       |       WHERE crn <= $IvfProbes AND vec_id % 7 = 5),
       |post AS (SELECT q.qid, CAST(a.cell AS BIGINT) AS cell, l.vec_id, l.s,
       |    l.cid AS code, l.err_e6
       |  FROM sq q JOIN iasg a ON a.cell = q.cell
       |  JOIN lcodes l ON l.vec_id = a.vec_id
       |  WHERE a.vec_id <> q.qid)
       |SELECT CAST(0 AS INTEGER) AS gen_served, qid, cell, vec_id, s, code,
       |  err_e6 FROM post WHERE qid % 2 = 0 AND vec_id % 7 <> 3
       |UNION ALL
       |SELECT CAST(1 AS INTEGER) AS gen_served, qid, cell, vec_id, s, code,
       |  err_e6 FROM post WHERE qid % 2 = 1
       |ORDER BY gen_served, qid, cell, vec_id, s""".stripMargin

  /** SQL twin of q173's streaming ingest coder (StreamingOps.
    * streamVectorIngest): the same residual-code derivation as q172's
    * chain, restricted to the arrival slice `vec_id % 7 = 3`.
    */
  private[graft] val streamVectorIngestSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residRuCteSql,
       |best AS (SELECT vec_id, s, scid, dist FROM (SELECT vec_id, s, scid,
       |  dist, row_number() OVER (PARTITION BY vec_id, s
       |    ORDER BY dist ASC, scid ASC) AS rn FROM ru) WHERE rn = 1)
       |SELECT b.vec_id, r.cell, CAST(b.s AS BIGINT) AS s, b.scid AS code,
       |  CAST(floor(b.dist * 1000000.0) AS BIGINT) AS err_e6
       |FROM best b JOIN rv r ON r.vec_id = b.vec_id
       |WHERE b.vec_id % 7 = 3
       |ORDER BY b.vec_id, b.s""".stripMargin

  // ---- q176: MMR DIVERSIFIED RE-RANKING — maximal marginal relevance
  //      (Carbonell & Goldstein '98) over the exact top-MmrPool
  //      candidates: greedily pick argmax(λ·rel − (1−λ)·max-sim-to-
  //      selected), the standard way retrieval results are de-
  //      redundified before they reach a training batch or a context
  //      window (near-identical passages waste both). λ = 0.5 makes
  //      the objective rel − maxsim, so with relevance and pairwise
  //      similarity quantized to e6 INTEGERS the greedy argmax (score
  //      desc, vec_id asc) is bit-identical across engines. The k-step
  //      greedy loop is inherently sequential, but everything it
  //      touches is metadata-scale — the pool is queries×MmrPool rows,
  //      pairwise sims queries×MmrPool² — so the corpus-scale work is
  //      exactly one exact-top-K pass and the loop runs as TopK
  //      driver-coordinated rounds over bounded relations (the q165/
  //      q167 bounded-loop pattern; the SQL twin unrolls the same
  //      rounds as CTEs). Output ships each pick's rel and the
  //      max-sim-to-selected it paid — the diversity audit. ----
  private[graft] val MmrPool = 30

  /** q176's ONE corpus-scale stage, lazily: exact cosine scoring of
    * the broadcast query set, top-MmrPool per query — the plan Plans/
    * PlanShapeSpec guard (everything after it is driver-paced rounds
    * over bounded checkpointed relations).
    */
  private[graft] def mmrPoolOn(all: DataFrame): DataFrame = {
    val q = all.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wp = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
    all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("v"), col("nrm"),
              round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_r"))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= MmrPool)
      .select(col("qid"), col("vec_id"), col("v"), col("nrm"),
              round(col("cos_r") * 1000000.0).cast("long").as("rel_e6"))
  }

  def mmrRerank(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d).persist()
    val pool = mmrPoolOn(all)
      .localCheckpoint(true) // bounded: NQueries×MmrPool rows
    val pb = pool.select(col("qid").as("bqid"), col("vec_id").as("b"),
                         col("v").as("bv"), col("nrm").as("bn"))
    val sims = pool.join(pb, col("qid") === col("bqid") && col("vec_id") =!= col("b"))
      .select(col("qid"), col("vec_id").as("a"), col("b"),
        round(round(vecDot(col("v"), col("bv")) / (col("nrm") * col("bn")), 6)
          * 1000000.0).cast("long").as("sim_e6"))
      .localCheckpoint(true) // bounded: NQueries×MmrPool² rows
    val cand0 = pool.select("qid", "vec_id", "rel_e6")
    var sel: DataFrame = null
    for (r <- 1 to TopK) {
      val remaining =
        if (r == 1) cand0
        else cand0.join(sel.select("qid", "vec_id"), Seq("qid", "vec_id"), "left_anti")
      val scored =
        if (r == 1) remaining.withColumn("maxsim_e6", lit(0L))
        else {
          val ms = sims
            .join(sel.select(col("qid"), col("vec_id").as("b")), Seq("qid", "b"))
            .groupBy(col("qid"), col("a").as("vec_id"))
            .agg(max(col("sim_e6")).as("ms"))
            .select(col("qid"), col("vec_id"), col("ms"))
          remaining.join(ms, Seq("qid", "vec_id"), "left")
            .withColumn("maxsim_e6", coalesce(col("ms"), lit(0L)))
        }
      val wr = Window.partitionBy("qid")
        .orderBy((col("rel_e6") - col("maxsim_e6")).desc, col("vec_id").asc)
      val pick = scored.withColumn("prn", row_number().over(wr))
        .filter(col("prn") === 1)
        .select(col("qid"), col("vec_id"), col("rel_e6"),
                col("maxsim_e6"), lit(r.toLong).as("pick"))
      // eager per-round materialization keeps the 10-round plan flat
      // (the q165/q167 bounded-loop pattern); every round touches
      // ≤ NQueries×MmrPool rows
      sel = (if (r == 1) pick else sel.unionByName(pick)).localCheckpoint(true)
    }
    val result = sel
      .select(col("qid"), col("pick"), col("vec_id"), col("rel_e6"),
              col("maxsim_e6"), (col("rel_e6") - col("maxsim_e6")).as("score_e6"))
      .orderBy("qid", "pick")
      .localCheckpoint(true)
    all.unpersist(false)
    result
  }

  private val mmrRerankSql = {
    val rounds = (2 to TopK).map { r =>
      s"""m$r AS (SELECT p.qid, p.vec_id, p.rel_e6, COALESCE(mx.ms, 0) AS maxsim_e6
         |  FROM p LEFT JOIN (SELECT ps.qid, ps.a, MAX(ps.sim_e6) AS ms
         |    FROM ps JOIN sel${r - 1} s ON s.qid = ps.qid AND s.vec_id = ps.b
         |    GROUP BY ps.qid, ps.a) mx ON mx.qid = p.qid AND mx.a = p.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s2
         |    WHERE s2.qid = p.qid AND s2.vec_id = p.vec_id)),
         |s$r AS (SELECT qid, vec_id, rel_e6, maxsim_e6, $r AS pick FROM
         |  (SELECT qid, vec_id, rel_e6, maxsim_e6, row_number() OVER
         |    (PARTITION BY qid ORDER BY rel_e6 - maxsim_e6 DESC, vec_id ASC)
         |    AS rn FROM m$r) WHERE rn = 1),
         |sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $baseCte,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
       |      WHERE vec_id < $NQueries),
       |sc AS (SELECT q.qid, n.vec_id, n.v, n.nrm,
       |  round(${dotFoldSql("q.qv", "n.v")} / (q.qn * n.nrm), 6) AS cos_r
       |  FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
       |p AS MATERIALIZED (SELECT qid, vec_id, v, nrm,
       |        CAST(round(cos_r * 1000000.0) AS BIGINT) AS rel_e6
       |      FROM (SELECT qid, vec_id, v, nrm, cos_r, row_number() OVER
       |        (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM sc)
       |      WHERE rn <= $MmrPool),
       |ps AS MATERIALIZED (SELECT x.qid, x.vec_id AS a, y.vec_id AS b,
       |  CAST(round(round(${dotFoldSql("x.v", "y.v")} / (x.nrm * y.nrm), 6)
       |    * 1000000.0) AS BIGINT) AS sim_e6
       |  FROM p x JOIN p y ON x.qid = y.qid AND x.vec_id <> y.vec_id),
       |sel1 AS MATERIALIZED (SELECT qid, vec_id, rel_e6, CAST(0 AS BIGINT) AS maxsim_e6,
       |           1 AS pick FROM
       |  (SELECT qid, vec_id, rel_e6, row_number() OVER
       |    (PARTITION BY qid ORDER BY rel_e6 DESC, vec_id ASC) AS rn FROM p)
       |  WHERE rn = 1),
       |$rounds
       |SELECT qid, CAST(pick AS BIGINT) AS pick, vec_id, rel_e6, maxsim_e6,
       |       (rel_e6 - maxsim_e6) AS score_e6
       |FROM sel$TopK ORDER BY qid, pick""".stripMargin
  }

  // ---- q175: IVF INDEX-HEALTH AUDIT — the cell-occupancy histogram a
  //      real vector-store deployment monitors: skewed cells are the
  //      ANN analogue of hot keys (a probe into a 10×-oversized cell
  //      costs 10× the scoring work; empty cells waste probe budget),
  //      and the k = ceil(n/64) sizing policy (q50) is a CLAIM about
  //      occupancy that this lane turns into oracle-checked data.
  //      Shape: the routing argmin (one exchange of k-group partial
  //      counts), a LEFT join from the k-row cell table so EMPTY cells
  //      surface as occupancy-0 rows, and a second tiny aggregate —
  //      histogram rows are mergeable, so at 100 TB this is partial
  //      counts per task, never data. ----
  def ivfStats(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d)
    val k = ivfCellCount(s, d)
    val (assigned, _) = ivfRouting(all, k, IvfProbes)
    val occ = all.filter(col("vec_id") < k).select(col("vec_id").as("cid"))
      .join(broadcast(assigned.groupBy("cell").agg(count(lit(1)).as("occ0"))),
            col("cid") === col("cell"), "left")
      .select(col("cid"), coalesce(col("occ0"), lit(0L)).as("occupancy"))
    occ.groupBy("occupancy").agg(count(lit(1)).as("n_cells"))
      .orderBy("occupancy")
  }

  private val ivfStatsSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |occ AS (SELECT c.cid, CAST(COUNT(a.vec_id) AS BIGINT) AS occupancy
       |        FROM icc c LEFT JOIN iasg a ON a.cell = c.cid GROUP BY c.cid)
       |SELECT occupancy, CAST(COUNT(*) AS BIGINT) AS n_cells
       |FROM occ GROUP BY occupancy ORDER BY occupancy""".stripMargin

  // ---- q198: IVF CELL SPLIT — the maintenance op q175's audit calls
  //      for: when occupancy skews, a deployment SPLITS heavy cells
  //      rather than retraining the whole coarse index. Policy is a
  //      deterministic REBALANCE BUDGET (top ceil(k/8) most-occupied
  //      cells per maintenance cycle, ties to the lower cell id) —
  //      measured occupancy at the registered scales is fairly
  //      balanced (max ≈ 1.3× mean at sf0.01), so a skew THRESHOLD
  //      would fire on nothing; a budgeted pass over the heaviest
  //      cells is what a periodic maintenance job actually runs.
  //      Each chosen cell splits on two deterministic seeds — its
  //      min-id and max-id members (the q07 min_by(struct) discipline
  //      carries the seed VECTORS out of the same aggregate, no
  //      second fetch join) — and members reassign to the nearer seed
  //      by cosine (ties to sub 0, so the degenerate occupancy-1 and
  //      duplicate-vector cells are well-defined). Scale shape: the
  //      routed relation is checkpointed once and scanned three times
  //      (occupancy count, seed-kit aggregate, reassignment); the
  //      cell ranking windows over k ≤ 50k metadata rows, the chosen
  //      set and seed kits ride as broadcasts; the corpus never
  //      shuffles after routing. Output = per split cell: occupancy
  //      before and per-sub-cell after — the balance evidence the
  //      next q175 audit would read. Oracle re-derives the whole
  //      chain (routing, budget ranking, seed selection, cosine
  //      reassignment) in SQL from the shared CTEs. ----
  def cellSplit(s: SparkSession, d: String): DataFrame = {
    val all = base(s, d)
    val k = ivfCellCount(s, d)
    val (assigned0, _) = ivfRouting(all, k, IvfProbes)
    // reused by three aggregates below — materialize the n×k routing
    // pass once (the q174/q171 checkpoint precedent)
    cellSplitOn(assigned0.localCheckpoint(true), k)
  }

  /** The split chain from an already-routed relation — the registered
    * lane feeds it the checkpointed routing; Plans dumps it lazily.
    */
  private[graft] def cellSplitOn(assigned: DataFrame, k: Long): DataFrame = {
    val nSplit = math.max(1L, k / 8)
    val occ = assigned.groupBy("cell").agg(count(lit(1)).as("occ_before"))
    // ranking k metadata rows: the single-partition window is k ≤ 50k
    val wo = Window.orderBy(col("occ_before").desc, col("cell").asc)
    val chosen = occ.withColumn("orn", row_number().over(wo))
      .filter(col("orn") <= nSplit)
      .select("cell", "occ_before")
    // seed kit: min-id / max-id member of each chosen cell, vectors
    // carried through the struct agg (vec_id leads, so the array field
    // is never compared)
    val seedKit = assigned.join(broadcast(chosen), Seq("cell"))
      .groupBy("cell")
      .agg(min(struct(col("vec_id"), col("v"), col("nrm"))).as("m0"),
           max(struct(col("vec_id"), col("v"), col("nrm"))).as("m1"),
           first(col("occ_before")).as("occ_before"))
      .select(col("cell"), col("occ_before"),
              col("m0.v").as("v0"), col("m0.nrm").as("n0"),
              col("m1.v").as("v1"), col("m1.nrm").as("n1"))
    // reassignment: nearer seed by cosine, identical fold + division
    // order on both engines; >= sends ties (and the occ-1 cell, where
    // both seeds are the member itself) to sub 0
    assigned.join(broadcast(seedKit), Seq("cell"))
      .withColumn("sub",
        when(vecDot(col("v"), col("v0")) / (col("nrm") * col("n0"))
          >= vecDot(col("v"), col("v1")) / (col("nrm") * col("n1")), 0L)
          .otherwise(1L))
      .groupBy("cell")
      .agg(first(col("occ_before")).as("occ_before"),
           sum(when(col("sub") === 0L, 1L).otherwise(0L)).as("occ_sub0"),
           sum(when(col("sub") === 1L, 1L).otherwise(0L)).as("occ_sub1"))
      .orderBy("cell")
  }

  private val cellSplitSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |socc AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS occ_before
       |         FROM iasg GROUP BY cell),
       |schosen AS (SELECT cell, occ_before FROM
       |   (SELECT cell, occ_before, row_number() OVER
       |      (ORDER BY occ_before DESC, cell ASC) AS orn FROM socc)
       |   WHERE orn <= (SELECT GREATEST(1, k // 8) FROM ikq)),
       |ssds AS (SELECT a.cell, MIN(a.vec_id) AS s0, MAX(a.vec_id) AS s1
       |         FROM iasg a JOIN schosen c ON a.cell = c.cell
       |         GROUP BY a.cell),
       |skit AS (SELECT ssds.cell, a0.v AS v0, a0.nrm AS n0,
       |                a1.v AS v1, a1.nrm AS n1
       |         FROM ssds JOIN iasg a0 ON a0.vec_id = ssds.s0
       |                   JOIN iasg a1 ON a1.vec_id = ssds.s1),
       |sre AS (SELECT m.cell,
       |   CASE WHEN (${dotFoldSql("m.v", "skit.v0")}) / (m.nrm * skit.n0)
       |          >= (${dotFoldSql("m.v", "skit.v1")}) / (m.nrm * skit.n1)
       |        THEN 0 ELSE 1 END AS sub
       |   FROM iasg m JOIN skit ON m.cell = skit.cell)
       |SELECT c.cell, c.occ_before,
       |  CAST(SUM(CASE WHEN sub = 0 THEN 1 ELSE 0 END) AS BIGINT) AS occ_sub0,
       |  CAST(SUM(CASE WHEN sub = 1 THEN 1 ELSE 0 END) AS BIGINT) AS occ_sub1
       |FROM sre JOIN schosen c ON sre.cell = c.cell
       |GROUP BY c.cell, c.occ_before ORDER BY c.cell""".stripMargin

  // ---- q199: SERVING UNDER THE POST-SPLIT KIT — q198 decides the
  //      split; this lane prices it at the serving surface. The new
  //      centroid kit = the unsplit original centroids plus BOTH seed
  //      vectors of every split cell (seed ids cannot collide with
  //      kept cids: a centroid vector self-assigns, so the only
  //      member of cell c with id < k is c itself, which the split
  //      removes). The corpus then re-routes by exact argmin over the
  //      new kit — the honest referent: a production rebalance
  //      reassigns only the split cells' members (q198's move) and
  //      tolerates the approximation; this lane prices the EXACT
  //      re-route so that approximation has a measured baseline.
  //      Output = per query and phase (before/after): probe candidate
  //      count and recall@$TopK vs the exact truth, plus the index
  //      balance metrics the split exists to improve — max cell
  //      occupancy and Σocc² (the expected-probe-cost proxy: a
  //      uniformly-routed query scores a list of expected length
  //      Σocc²/n). Scale shape: both routings are the q50 broadcast
  //      argmin (map-side collapse before any exchange), the kit and
  //      probe relations broadcast, truth is the one controlled
  //      broadcast cross join every eval lane pays; the before-phase
  //      routing is checkpointed and REUSED for occupancy, seeds and
  //      scoring. ----
  def splitServing(s: SparkSession, d: String): DataFrame = {
    val (pb, pa) = splitServingPhases(s, d)
    pb.unionByName(pa).orderBy("phase", "qid")
  }

  /** The two q199 phases separately (before/after the split), each a
    * LAZY plan over the checkpointed routings — the surface Plans and
    * PlanShapeSpec fence: per phase, ONE routing (checkpointed, reused
    * by occupancy/seeds/scoring), probe scoring a broadcast equi-join,
    * the only nested loop the 1-row occupancy stats attach.
    */
  private[graft] def splitServingPhases(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val all = base(s, d).localCheckpoint(true)
    val k = ivfCellCount(s, d)
    val (assignedB0, probesB) = ivfRouting(all, k, IvfProbes)
    val assignedB = assignedB0.localCheckpoint(true)
    val nSplit = math.max(1L, k / 8)
    val occB = assignedB.groupBy("cell").agg(count(lit(1)).as("ob"))
    val wo = Window.orderBy(col("ob").desc, col("cell").asc)
    val chosen = occB.withColumn("orn", row_number().over(wo))
      .filter(col("orn") <= nSplit).select("cell")
    val seeds = assignedB.join(broadcast(chosen), Seq("cell"))
      .groupBy("cell")
      .agg(min(struct(col("vec_id"), col("v"), col("nrm"))).as("m0"),
           max(struct(col("vec_id"), col("v"), col("nrm"))).as("m1"))
    val keptCents = all.filter(col("vec_id") < k)
      .join(broadcast(chosen), col("vec_id") === col("cell"), "left_anti")
      .select(col("vec_id").as("cid"), toDouble(col("v")).as("cv"),
              col("nrm").as("cn"))
    val seedCents = seeds
      .select(explode(array(col("m0"), col("m1"))).as("m"))
      .select(col("m.vec_id").as("cid"), toDouble(col("m.v")).as("cv"),
              col("m.nrm").as("cn"))
      .dropDuplicates("cid") // degenerate occ-1 cells: both seeds coincide
    val newKit = keptCents.unionByName(seedCents).localCheckpoint(true)
    val (assignedA0, rankedA) =
      ivfRoutingRankedWith(all, newKit, IvfProbes, col("vec_id") < NQueries)
    val assignedA = assignedA0.localCheckpoint(true)
    val probesA = rankedA.drop("crn")
    // sharedSimTruth is the 100-query r13 artifact; THIS lane's
    // contract is the NQueries probe set — filter at the use site
    // (r13 ADVICE: the 5-query width must not depend on an incidental
    // downstream inner join with nCand)
    val truth = sharedSimTruth(s, d).select("qid", "vec_id")
      .filter(col("qid") < NQueries)
    def phase(tag: String, assigned: DataFrame, probes: DataFrame): DataFrame = {
      val scored = scoreProbed(assigned, probes)
      val nCand = scored.groupBy("qid").agg(count(lit(1)).as("n_cand"))
      val top = rankTopK(scored)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      val occStats = assigned.groupBy("cell").agg(count(lit(1)).as("o"))
        .agg(max(col("o")).as("max_occ"),
             sum(col("o") * col("o")).as("occ_sq_sum"))
      truth.join(broadcast(top), Seq("qid", "vec_id"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
             expr(s"(sum(coalesce(hit, 0)) * 1000000) div $TopK")
               .as("recall_millionths"))
        .join(broadcast(nCand), Seq("qid"))
        .crossJoin(broadcast(occStats))
        .select(lit(tag).as("phase"), col("qid"), col("n_cand"),
                col("n_overlap"), col("recall_millionths"),
                col("max_occ"), col("occ_sq_sum"))
    }
    (phase("before", assignedB, probesB),
     phase("after", assignedA, probesA))
  }

  private val splitServingSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |zocc AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS ob
       |         FROM iasg GROUP BY cell),
       |zchosen AS (SELECT cell FROM
       |   (SELECT cell, row_number() OVER (ORDER BY ob DESC, cell ASC) AS orn
       |    FROM zocc)
       |   WHERE orn <= (SELECT GREATEST(1, k // 8) FROM ikq)),
       |zsds AS (SELECT a.cell, MIN(a.vec_id) AS s0, MAX(a.vec_id) AS s1
       |         FROM iasg a JOIN zchosen c ON a.cell = c.cell
       |         GROUP BY a.cell),
       |zsid AS (SELECT DISTINCT sid FROM
       |   (SELECT s0 AS sid FROM zsds UNION ALL SELECT s1 AS sid FROM zsds)),
       |zncc AS (SELECT cid, cv, cn FROM icc
       |           WHERE cid NOT IN (SELECT cell FROM zchosen)
       |         UNION ALL
       |         SELECT n.vec_id AS cid, n.v AS cv, n.nrm AS cn
       |           FROM n JOIN zsid ON n.vec_id = zsid.sid),
       |zia AS (SELECT n.vec_id, n.v, n.nrm, zncc.cid,
       |  -(${dotFoldSql("n.v", "zncc.cv")}) / (n.nrm * zncc.cn) AS negsim
       |  FROM n CROSS JOIN zncc),
       |zr0 AS (SELECT vec_id, v, nrm, cid, row_number() OVER
       |  (PARTITION BY vec_id ORDER BY negsim ASC, cid ASC) AS crn FROM zia),
       |zasg AS (SELECT vec_id, v, nrm, cid AS cell FROM zr0 WHERE crn = 1),
       |zprb AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, cid AS cell
       |           FROM zr0 WHERE crn <= $IvfProbes AND vec_id < $NQueries),
       |ztq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
       |        WHERE vec_id < $NQueries),
       |zts AS (SELECT q.qid, n.vec_id,
       |  round(${dotFoldSql("q.qv", "n.v")} / (q.qn * n.nrm), 6) AS cos_r
       |  FROM n CROSS JOIN ztq q WHERE n.vec_id <> q.qid),
       |ztruth AS (SELECT qid, vec_id FROM
       |   (SELECT qid, vec_id, row_number() OVER
       |      (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM zts)
       |   WHERE rn <= $TopK),
       |zcb AS (SELECT p.qid, s.vec_id,
       |  round(${dotFoldSql("p.qv", "s.v")} / (p.qn * s.nrm), 6) AS cos_r
       |  FROM iasg s JOIN iprb p ON s.cell = p.cell WHERE s.vec_id <> p.qid),
       |zca AS (SELECT p.qid, s.vec_id,
       |  round(${dotFoldSql("p.qv", "s.v")} / (p.qn * s.nrm), 6) AS cos_r
       |  FROM zasg s JOIN zprb p ON s.cell = p.cell WHERE s.vec_id <> p.qid),
       |znb AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand
       |        FROM zcb GROUP BY qid),
       |zna AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand
       |        FROM zca GROUP BY qid),
       |ztb AS (SELECT qid, vec_id FROM
       |   (SELECT qid, vec_id, row_number() OVER
       |      (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM zcb)
       |   WHERE rn <= $TopK),
       |zta AS (SELECT qid, vec_id FROM
       |   (SELECT qid, vec_id, row_number() OVER
       |      (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM zca)
       |   WHERE rn <= $TopK),
       |zob AS (SELECT CAST(MAX(ob) AS BIGINT) AS max_occ,
       |               CAST(SUM(ob * ob) AS BIGINT) AS occ_sq_sum FROM zocc),
       |zoa AS (SELECT CAST(MAX(oa) AS BIGINT) AS max_occ,
       |               CAST(SUM(oa * oa) AS BIGINT) AS occ_sq_sum FROM
       |        (SELECT cell, CAST(COUNT(*) AS BIGINT) AS oa
       |         FROM zasg GROUP BY cell)),
       |zrb AS (SELECT t.qid, CAST(SUM(CASE WHEN h.vec_id IS NOT NULL
       |          THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
       |        FROM ztruth t LEFT JOIN ztb h
       |          ON t.qid = h.qid AND t.vec_id = h.vec_id GROUP BY t.qid),
       |zra AS (SELECT t.qid, CAST(SUM(CASE WHEN h.vec_id IS NOT NULL
       |          THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
       |        FROM ztruth t LEFT JOIN zta h
       |          ON t.qid = h.qid AND t.vec_id = h.vec_id GROUP BY t.qid)
       |SELECT * FROM (
       |  SELECT 'before' AS phase, zrb.qid, znb.n_cand, zrb.n_overlap,
       |    CAST((zrb.n_overlap * 1000000) // $TopK AS BIGINT)
       |      AS recall_millionths,
       |    zob.max_occ, zob.occ_sq_sum
       |  FROM zrb JOIN znb ON zrb.qid = znb.qid CROSS JOIN zob
       |  UNION ALL
       |  SELECT 'after' AS phase, zra.qid, zna.n_cand, zra.n_overlap,
       |    CAST((zra.n_overlap * 1000000) // $TopK AS BIGINT)
       |      AS recall_millionths,
       |    zoa.max_occ, zoa.occ_sq_sum
       |  FROM zra JOIN zna ON zra.qid = zna.qid CROSS JOIN zoa)
       |ORDER BY phase, qid""".stripMargin

  // ---- q174: FILTERED ANN — metadata-filtered vector search, the
  //      serving feature every production vector store exposes
  //      ("nearest neighbors WHERE label = X") and the classic
  //      pre/post-filtering trade, here MEASURED: the IVF index routes
  //      on the unfiltered corpus, so post-filtering the probed
  //      candidates by the query's own label discards ~(1 − 1/|labels|)
  //      of them and recall against the exact FILTERED truth craters;
  //      the standard mitigation — oversample the probes when a filter
  //      is attached — runs as a second mode ('boost', 4× cells) in
  //      the same output, so the recall-vs-probe-cost curve ships as
  //      oracle-checked data. All scale shapes are inherited: routing
  //      is the q50 broadcast argmin, the scored candidate set is
  //      bounded (queries·probes·~cell-size) and BROADCASTS against
  //      the label scan (the label attach is map-side — the corpus
  //      never shuffles for the filter), truth is the one controlled
  //      broadcast cross join every eval lane pays. The 4× boost is
  //      MEASURED, not guessed (r10): the DevFilteredSweep grid
  //      (bench_evidence/r10_filtered_sweep.md) shows 4× is the
  //      largest budget that still prunes at test scale while
  //      recovering +0.20 recall at the registered label granularity;
  //      ≥8× saturates probes ≥ k there (degenerate full scan), and
  //      the cross-granularity rows show boost must track
  //      1/selectivity. ----
  private[graft] val FilterBoost = 4

  def filteredAnn(s: SparkSession, d: String): DataFrame = {
    val allL = labeledBase(s, d).persist()
    val result = filteredAnnCore(s, allL, ivfCellCount(s, d))
      .localCheckpoint(true)
    allL.unpersist(false)
    result
  }

  /** The labeled corpus relation q174 routes and filters over. */
  private[graft] def labeledBase(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").as("v"),
              col("label").cast("long").as("lbl"))
      .withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))

  /** The q174 plan, lazily, for Plans/PlanShapeSpec (the registered
    * entry checkpoints eagerly — the q168/q171 precedent).
    */
  private[graft] def filteredAnnCore(
      s: SparkSession, allL: DataFrame, k: Long): DataFrame = {
    val q = allL.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
              col("nrm").as("qn"), col("lbl").as("qlbl"))
    val qlbl = q.select("qid", "qlbl")
    // exact FILTERED truth: brute force over the same-label slice only
    val wt = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
    val truth = allL.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid") && col("lbl") === col("qlbl"))
      .select(col("qid"), col("vec_id"),
              round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_r"))
      .withColumn("rn", row_number().over(wt))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id")
    // ONE n×k routing pass at the boost budget; each mode filters the
    // ranked probe set instead of re-routing (the post probes are a
    // prefix of the boost probes by construction)
    val (assigned, probesR) = ivfRoutingRanked(allL, k, IvfProbes * FilterBoost)
    def mode(tag: String, nProbes: Int): DataFrame = {
      val scored = scoreProbed(assigned,
        probesR.filter(col("crn") <= nProbes).drop("crn"))
      val nCand = scored.groupBy("qid").agg(count(lit(1)).as("n_cand"))
      // label attach: the bounded scored set broadcasts against the
      // (vec_id, lbl) scan — map-side, no corpus exchange
      val kept = allL.select(col("vec_id"), col("lbl"))
        .join(broadcast(scored), Seq("vec_id"))
        .join(broadcast(qlbl), Seq("qid"))
        .filter(col("lbl") === col("qlbl"))
      val nKept = kept.groupBy("qid").agg(count(lit(1)).as("n_kept"))
      val wk = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
      val top = kept.withColumn("rn", row_number().over(wk))
        .filter(col("rn") <= TopK)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      truth.join(broadcast(top), Seq("qid", "vec_id"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
             expr(s"(sum(coalesce(hit, 0)) * 1000000) div $TopK").as("recall_millionths"))
        .join(broadcast(nCand), Seq("qid"))
        .join(broadcast(nKept), Seq("qid"))
        .join(broadcast(qlbl), Seq("qid"))
        .select(lit(tag).as("mode"), col("qid"), col("qlbl"), col("n_cand"),
                col("n_kept"), col("n_overlap"), col("recall_millionths"))
    }
    mode("post", IvfProbes)
      .unionByName(mode("boost", IvfProbes * FilterBoost))
      .orderBy("mode", "qid")
  }

  // ---- q179: INDEX STORAGE LAYOUT — the piece that makes IVF probes
  //      cheap ON DISK at 100 TB. The routed + residual-coded corpus
  //      (exactly the q172/q173 postings: vec_id, cell, s, code,
  //      err_e6) is WRITTEN partitioned by cell — hash-repartition on
  //      cell so each inverted list is owned by one writer task,
  //      sorted within (cell, vec_id, s) so each list is a contiguous
  //      clustered run — and a probe then reads ONLY its cells back:
  //      the partition filter prunes at the FileScan (PlanShapeSpec
  //      asserts non-empty PartitionFilters), so a 2-of-50k-cell probe
  //      touches 2/50k of the files instead of scanning the index.
  //      This closes the serving-index lifecycle: train (q165/q177),
  //      ingest (q173), serve (q171/q172/q174), audit (q175), eval
  //      (q163), and now PERSIST. Output = query 0's probe cells'
  //      postings read back through the pruned scan; oracle derives
  //      the same postings from the routing + residual-code CTEs
  //      without seeing the directory (the q124 discipline). ----
  def indexLayout(s: SparkSession, d: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfidx_" +
      java.lang.Integer.toHexString(d.hashCode)
    val marker = java.nio.file.Paths.get(out, "_FIXTURE_OK")
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    if (!graft.Fixtures.markerCurrent(marker, s"$d/embeddings.parquet")) {
      val codes = kit.resid.select(col("vec_id"), col("cell"),
          posexplode(array(pqArgminsOn(col("rv"), kit.books): _*)).as(Seq("s", "c")))
        .select(col("vec_id"), col("cell"), col("s").cast("long").as("s"),
                col("c.cid").as("code"),
                floor(col("c.dist") * 1000000.0).cast("long").as("err_e6"))
      codes.repartition(col("cell"))
        .sortWithinPartitions("cell", "vec_id", "s")
        .write.partitionBy("cell").mode("overwrite").parquet(out)
      graft.Fixtures.writeMarker(marker, s"$d/embeddings.parquet")
    }
    // the probe: query 0's IvfProbes cells — metadata-scale collect
    val probeCells = kit.probes.filter(col("qid") === 0)
      .select("cell").collect().map(_.getLong(0)).sorted
    openCells(s, out, probeCells.toIndexedSeq)
      .filter(col("cell").isin(probeCells: _*))
      .select(col("cell").cast("long").as("cell"), col("vec_id"),
              col("s"), col("code"), col("err_e6"))
      .orderBy("cell", "vec_id", "s")
  }

  private val indexLayoutSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residRuCteSql,
       |lcodes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, scid AS cid,
       |  CAST(floor(dist * 1000000.0) AS BIGINT) AS err_e6 FROM
       |  (SELECT vec_id, s, scid, dist, row_number() OVER (PARTITION BY vec_id, s
       |     ORDER BY dist ASC, scid ASC) AS rn FROM ru) WHERE rn = 1),
       |pc AS (SELECT DISTINCT cell FROM iprb WHERE qid = 0)
       |SELECT CAST(a.cell AS BIGINT) AS cell, l.vec_id, l.s, l.cid AS code,
       |       l.err_e6
       |FROM lcodes l JOIN iasg a ON a.vec_id = l.vec_id
       |JOIN pc ON pc.cell = a.cell
       |ORDER BY a.cell, l.vec_id, l.s""".stripMargin

  // ---- q182: INDEX COMPACTION — the LSM step every serving system
  //      needs between q173 (deltas stream IN) and q179/q180 (probes
  //      read the layout): fold an arrival delta into the base
  //      cell-partitioned layout WITHOUT a full rebuild. The base
  //      index is the corpus minus the q173 arrival slice
  //      (vec_id % 7 = 3), bulk-loaded once as a q179-shaped layout;
  //      compaction then (1) derives the delta's codes (exactly what
  //      q173's stream already produced), (2) reads back ONLY the
  //      delta-touched cells through a partition-PRUNED scan — at
  //      100 TB an hourly delta touches a small fraction of 50k
  //      cells, and untouched cells are never read OR rewritten —
  //      (3) merges and rewrites those cells via a stage-and-swap
  //      (write merged lists to a staging dir, then atomically swap
  //      the touched cell directories — the manifest-commit a real
  //      compactor does, so readers never see a half-written list).
  //      The merge plan carries ONE exchange, on the DELTA side only:
  //      the touched base lists are already cell-pure files, so each
  //      base task reads one clustered list and writes it straight
  //      back (union, no repartition), while the delta hash-partitions
  //      by cell to co-group — cost ∝ delta + touched lists, never
  //      ∝ corpus. Output = q179's probe read-back against the
  //      COMPACTED index; oracle = the full-rebuild derivation
  //      (indexLayoutSql verbatim), so the green row IS the proof
  //      that minor compaction and a from-scratch rebuild are
  //      hash-indistinguishable. ----
  def indexCompaction(s: SparkSession, d: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_lsmidx_" +
      java.lang.Integer.toHexString(d.hashCode)
    val marker = java.nio.file.Paths.get(out, "_COMPACTED_OK")
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    if (!graft.Fixtures.markerCurrent(marker, s"$d/embeddings.parquet")) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(out))
      // bulk load: the base index = corpus minus the arrival slice
      compactionCodes(kit, col("vec_id") % 7 =!= 3)
        .repartition(col("cell"))
        .sortWithinPartitions("cell", "vec_id", "s")
        .write.partitionBy("cell").mode("overwrite").parquet(out)
      // the delta: the q173 arrival slice's codes, materialized so the
      // merge plan below is exactly Union(prunedBaseScan, Exchange(delta))
      val delta = compactionCodes(kit, col("vec_id") % 7 === 3)
        .localCheckpoint(true)
      val (merged, touched) = compactionMerge(s, out, delta)
      stageAndSwap(out, merged, touched)
      graft.Fixtures.writeMarker(marker, s"$d/embeddings.parquet")
    }
    // q179's probe against the compacted index — must be
    // hash-indistinguishable from the full rebuild
    val probeCells = kit.probes.filter(col("qid") === 0)
      .select("cell").collect().map(_.getLong(0)).sorted
    openCells(s, out, probeCells.toIndexedSeq)
      .filter(col("cell").isin(probeCells: _*))
      .select(col("cell").cast("long").as("cell"), col("vec_id"),
              col("s"), col("code"), col("err_e6"))
      .orderBy("cell", "vec_id", "s")
  }

  /** The delta/base code derivation shared by q182's two stages —
    * q172's residual-code chain (the same rows q173 streams in),
    * restricted by `pred`.
    */
  private def compactionCodes(kit: ResidKit, pred: Column): DataFrame =
    kit.resid.filter(pred)
      .select(col("vec_id"), col("cell"),
        posexplode(array(pqArgminsOn(col("rv"), kit.books): _*)).as(Seq("s", "c")))
      .select(col("vec_id"), col("cell"), col("s").cast("long").as("s"),
              col("c.cid").as("code"),
              floor(col("c.dist") * 1000000.0).cast("long").as("err_e6"))

  /** q182's lazy merge relation over an existing base layout — split
    * out so PlanShapeSpec can hold its physical plan: one pruned
    * FileScan on the base (PartitionFilters non-empty) unioned with
    * ONE Exchange on the delta, and nothing corpus-scale. Returns the
    * merged relation plus the touched cell ids (metadata-scale —
    * bounded by min(delta rows, k)).
    */
  private[graft] def compactionMerge(
      s: SparkSession, out: String, delta: DataFrame): (DataFrame, Seq[Long]) = {
    val touched = delta.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val baseTouched = openCells(s, out, touched)
      .filter(col("cell").isin(touched: _*))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
              col("s"), col("code"), col("err_e6"))
    val merged = baseTouched.unionByName(
      delta.repartition(col("cell"))
        .sortWithinPartitions("cell", "vec_id", "s")
        .select("vec_id", "cell", "s", "code", "err_e6"))
    (merged, touched)
  }

  /** The arrival-slice delta codes over the existing fixture — the
    * spec-side handle for building [[compactionMerge]]'s plan without
    * re-running the bulk load.
    */
  private[graft] def compactionDeltaFor(s: SparkSession, d: String): DataFrame =
    compactionCodes(residKit(base(s, d), ivfCellCount(s, d)),
      col("vec_id") % 7 === 3).localCheckpoint(true)

  /** Predicate-sliced corpus codes (q172's derivation) — q188's
    * streaming-compaction lane bulk-loads its base through this.
    */
  private[graft] def compactionCodesFor(
      s: SparkSession, d: String, pred: Column): DataFrame =
    compactionCodes(residKit(base(s, d), ivfCellCount(s, d)), pred)

  /** Open ONLY the given partition subdirectories of an on-disk
    * layout (`basePath` keeps the partition columns). A root open
    * pays an O(all-partitions) partition-DISCOVERY listing BEFORE any
    * pruning applies, and every compaction/delete invalidates the
    * listing cache — measured on the text-side twin at an 8000-dir
    * layout: 14 s per maintenance op via the root vs ~1.9 s targeted,
    * flat across a 100x corpus (bench_evidence/r15_idx_prune.md). At
    * deployment cell counts (50 k) the listing term would dominate
    * every probe. Missing subdirs (cells that never materialized)
    * skip — same rows as the root open + isin filter; the degenerate
    * all-missing selection falls back to the root open filtered to
    * false (schema-exact empty relation).
    */
  private[graft] def openPartDirs(
      s: SparkSession, dir: String, subdirs: Seq[String]): DataFrame = {
    // existence resolves through the path's Hadoop FileSystem (r15
    // ADVICE: java.nio only ever worked on local disk — this is the
    // code path a cluster runs against HDFS/S3)
    val paths = subdirs.map(sd => s"$dir/$sd").filter(graft.io.LayoutFs.exists)
    if (paths.isEmpty) s.read.parquet(dir).filter(lit(false))
    else s.read.option("basePath", dir).parquet(paths: _*)
  }

  private[graft] def openCells(
      s: SparkSession, dir: String, cells: Seq[Long]): DataFrame =
    openPartDirs(s, dir, cells.map(c => s"cell=$c"))

  /** The stage-and-swap commit shared by q182/q187/q188 (and, via
    * `partCol`, by the q217 text admission index): write the merged
    * partitions to a staging dir, then atomically replace exactly
    * the touched partition directories (a fully-emptied partition
    * writes no stage dir — the cleared destination IS its correct
    * final state).
    */
  private[graft] def stageAndSwap(
      out: String, merged: DataFrame, touched: Seq[Long],
      partCol: String = "cell"): Unit = {
    import graft.io.LayoutFs
    val stage = out + "_stage"
    LayoutFs.deleteTree(stage)
    merged.write.partitionBy(partCol).mode("overwrite").parquet(stage)
    touched.foreach { c =>
      val src = s"$stage/$partCol=$c"
      val dst = s"$out/$partCol=$c"
      LayoutFs.deleteTree(dst)
      if (LayoutFs.exists(src)) LayoutFs.rename(src, dst)
    }
    LayoutFs.deleteTree(stage)
  }

  /** q179's probe read-back tail, shared by every on-disk index lane:
    * query 0's probe cells read through the pruned scan.
    */
  private[graft] def probeReadBack(
      s: SparkSession, d: String, dir: String): DataFrame = {
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    val probeCells = kit.probes.filter(col("qid") === 0)
      .select("cell").collect().map(_.getLong(0)).sorted
    openCells(s, dir, probeCells.toIndexedSeq)
      .filter(col("cell").isin(probeCells: _*))
      .select(col("cell").cast("long").as("cell"), col("vec_id"),
              col("s"), col("code"), col("err_e6"))
      .orderBy("cell", "vec_id", "s")
  }

  /** The shared rebuild oracle text — q182/q188 register it as their
    * twin (green == indistinguishable from a full rebuild).
    */
  private[graft] def indexLayoutOracle: String = indexLayoutSql

  /** q182's fixture directory — for specs needing the on-disk base. */
  private[graft] def compactionDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_lsmidx_" +
      java.lang.Integer.toHexString(d.hashCode)

  // ---- q187: INDEX TOMBSTONE DELETES — the LSM write path q182
  //      doesn't cover and every production corpus eventually needs
  //      (a right-to-be-forgotten request, a licensing takedown, a
  //      poisoned-source purge): remove a set of vectors from the
  //      persisted index WITHOUT a rebuild. The tombstone set is
  //      (vec_id, cell) pairs — delete-window-scale, not corpus-scale;
  //      its cell list is the only thing collected. Compaction reads
  //      back ONLY the tombstone-touched cells through a
  //      partition-PRUNED scan, drops the deleted postings with a
  //      broadcast LEFT ANTI join (map-side — deletes never shuffle
  //      anything), and rewrites those cells via the q182
  //      stage-and-swap. The merge plan carries ZERO exchanges: the
  //      touched lists ride partition-aligned and the anti join
  //      broadcasts, so a delete costs the touched lists, never the
  //      index. Oracle = the rebuild-from-retained-corpus derivation
  //      (q179's twin + the delete predicate), so the green row IS
  //      the proof that tombstone compaction == rebuild-without-the-
  //      deleted; DeleteSpec additionally holds the FULL index equal
  //      to the filtered rebuild and proves no survivor row was
  //      touched. ----
  private[graft] val DeletePredSql = "l.vec_id % 11 <> 4"

  def indexDelete(s: SparkSession, d: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_delidx_" +
      java.lang.Integer.toHexString(d.hashCode)
    val marker = java.nio.file.Paths.get(out, "_DELETED_OK")
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    if (!graft.Fixtures.markerCurrent(marker, s"$d/embeddings.parquet")) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(out))
      // bulk load: the full-corpus index (q179's shape)
      compactionCodes(kit, lit(true))
        .repartition(col("cell"))
        .sortWithinPartitions("cell", "vec_id", "s")
        .write.partitionBy("cell").mode("overwrite").parquet(out)
      // the tombstone set: delete-window-scale (vec_id, cell) pairs
      val tombstones = kit.assigned.filter(col("vec_id") % 11 === 4)
        .select("vec_id", "cell").localCheckpoint(true)
      val (survivors, touched) = deleteMerge(s, out, tombstones)
      // a cell whose every posting was tombstoned writes no stage
      // dir — stageAndSwap leaves its cleared destination, which IS
      // the correct final state
      stageAndSwap(out, survivors, touched)
      graft.Fixtures.writeMarker(marker, s"$d/embeddings.parquet")
    }
    val probeCells = kit.probes.filter(col("qid") === 0)
      .select("cell").collect().map(_.getLong(0)).sorted
    openCells(s, out, probeCells.toIndexedSeq)
      .filter(col("cell").isin(probeCells: _*))
      .select(col("cell").cast("long").as("cell"), col("vec_id"),
              col("s"), col("code"), col("err_e6"))
      .orderBy("cell", "vec_id", "s")
  }

  /** q187's lazy merge relation: the tombstone-touched cells' postings
    * minus the tombstoned vec_ids — pruned FileScan + broadcast anti
    * join, ZERO exchanges (PlanShapeSpec holds this). Returns the
    * survivor relation plus the touched cell ids.
    */
  private[graft] def deleteMerge(
      s: SparkSession, out: String, tombstones: DataFrame): (DataFrame, Seq[Long]) = {
    val touched = tombstones.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val survivors = openCells(s, out, touched)
      .filter(col("cell").isin(touched: _*))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
              col("s"), col("code"), col("err_e6"))
      .join(broadcast(tombstones.select("vec_id")), Seq("vec_id"), "left_anti")
    (survivors, touched)
  }

  /** The tombstone set over the existing fixture — the spec-side
    * handle for building [[deleteMerge]]'s plan.
    */
  private[graft] def deleteTombstonesFor(s: SparkSession, d: String): DataFrame =
    residKit(base(s, d), ivfCellCount(s, d)).assigned
      .filter(col("vec_id") % 11 === 4)
      .select("vec_id", "cell").localCheckpoint(true)

  /** q187's fixture directory — for specs needing the on-disk state. */
  private[graft] def deleteDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_delidx_" +
      java.lang.Integer.toHexString(d.hashCode)

  private val indexDeleteSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residRuCteSql,
       |lcodes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, scid AS cid,
       |  CAST(floor(dist * 1000000.0) AS BIGINT) AS err_e6 FROM
       |  (SELECT vec_id, s, scid, dist, row_number() OVER (PARTITION BY vec_id, s
       |     ORDER BY dist ASC, scid ASC) AS rn FROM ru) WHERE rn = 1),
       |pc AS (SELECT DISTINCT cell FROM iprb WHERE qid = 0)
       |SELECT CAST(a.cell AS BIGINT) AS cell, l.vec_id, l.s, l.cid AS code,
       |       l.err_e6
       |FROM lcodes l JOIN iasg a ON a.vec_id = l.vec_id
       |JOIN pc ON pc.cell = a.cell
       |WHERE $DeletePredSql
       |ORDER BY a.cell, l.vec_id, l.s""".stripMargin

  // ---- q185: ADC SERVING FROM THE COMPACTED ON-DISK INDEX — the
  //      final stitch in the lifecycle loop: q165/q177 train, q173
  //      ingests, q179 persists, q182 compacts, and NOW the q172
  //      serving path runs against that compacted layout instead of
  //      re-deriving codes in memory. Per query set: route (the
  //      shared broadcast argmin), collect the probed cell ids
  //      (metadata-scale), read ONLY those cells' code postings back
  //      from q182's compacted parquet (partition-PRUNED FileScan —
  //      PlanShapeSpec-guarded), broadcast the NQueries·probes probe
  //      relation and the per-(query, cell) integer LUT against the
  //      pruned postings, sum lookups map-side, rank. The scores are
  //      integer sums of LUT entries — order-independent — so the
  //      results are BYTE-IDENTICAL to q172's in-memory lane
  //      (CompactionSpec holds the full collect equal): oracle =
  //      q172's twin verbatim, proving serve-from-compacted-disk ==
  //      serve-from-rebuilt-memory end to end. Cost per query batch ∝
  //      probes × cell size postings read, never ∝ index size. ----
  def adcServeFromDisk(s: SparkSession, d: String): DataFrame = {
    indexCompaction(s, d) // ensure the compacted layout fixture exists
    val all = base(s, d).persist()
    val kit = residKit(all, ivfCellCount(s, d))
    val lut = residLutDf(s, kit, kit.books)
    val probeCells = kit.probes.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    // the serving read: probed cells' postings only, pruned on disk
    val postings = openCells(s, compactionDir(d), probeCells)
      .filter(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
              col("s"), col("code"))
      .join(broadcast(kit.probes.select(col("qid"), col("cell"))), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
    val cand = postings.filter(col("s") === 0).select("qid", "vec_id")
    val adc = postings.join(broadcast(lut),
        col("qid") === col("lqid") && col("cell") === col("lcell") &&
          col("s") === col("ls") && col("code") === col("lcid"))
      .groupBy("qid", "vec_id").agg(sum(col("dlut")).as("adc_e6"))
    val result = prunedAdcResult(all, cand, adc).localCheckpoint(true)
    all.unpersist(false)
    result
  }

  /** q185's lazy serving relation over the existing fixture — the
    * spec-side handle for the plan guard (the registered entry
    * checkpoints eagerly, the q168 precedent).
    */
  private[graft] def adcServePostingsFor(
      s: SparkSession, d: String): DataFrame = {
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    val probeCells = kit.probes.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    openCells(s, compactionDir(d), probeCells)
      .filter(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
              col("s"), col("code"))
      .join(broadcast(kit.probes.select(col("qid"), col("cell"))), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
  }

  // ---- q191: VERSIONED INDEX MANIFEST — generation-pinned reads,
  //      the snapshot-isolation piece the LSM family (q179 layout,
  //      q182 compaction, q187 deletes, q188 stream fold) still
  //      lacked: a real serving tier swaps indexes ATOMICALLY and
  //      keeps old snapshots readable while queries pinned to them
  //      drain. The manifest is the Iceberg/Delta idea at cell
  //      granularity: generation g0 = the bulk-loaded base layout,
  //      g1 = the compaction fold of the arrival delta written to its
  //      OWN directory (never touching g0's files), and a tiny
  //      manifest relation (gen, cell, dir) — committed LAST, so the
  //      manifest write IS the atomic swap: a reader pinned at gen 0
  //      resolves every cell to g0 and cannot observe a half-written
  //      g1, and after the commit a reader pinned at gen 1 resolves
  //      delta-touched cells to g1 and untouched cells to g0 (reads
  //      span generations — the whole point of the manifest). Owner
  //      resolution is manifest-scale (≤ k cells; the only collect),
  //      and each generation directory is read through a
  //      partition-PRUNED FileScan on exactly its owned probe cells.
  //      Output = query 0's probe postings under BOTH pins; oracle
  //      derives pin 1 from the full corpus and pin 0 from the
  //      corpus minus the delta slice — green proves time travel
  //      (the old snapshot is byte-identical to pre-delta state) AND
  //      the post-swap read (identical to a full rebuild). ----
  def indexVersions(s: SparkSession, d: String): DataFrame = {
    val out = versionDir(d)
    val marker = java.nio.file.Paths.get(out, "_VERSIONED_OK")
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    if (!graft.Fixtures.markerCurrent(marker, s"$d/embeddings.parquet")) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(out))
      // generation 0: bulk load of the pre-delta corpus
      compactionCodes(kit, col("vec_id") % 7 =!= 3)
        .repartition(col("cell"))
        .sortWithinPartitions("cell", "vec_id", "s")
        .write.partitionBy("cell").mode("overwrite").parquet(s"$out/g0")
      commitManifest(s, out, gen = 0, dir = "g0", cells = listCells(s"$out/g0"))
      // generation 1: the q182 fold, written to its OWN directory —
      // g0's files are never modified, so pin-0 readers stay correct
      val delta = compactionCodes(kit, col("vec_id") % 7 === 3)
        .localCheckpoint(true)
      val touched = delta.select("cell").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      val merged = openCells(s, s"$out/g0", touched)
        .filter(col("cell").isin(touched: _*))
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
                col("s"), col("code"), col("err_e6"))
        .unionByName(delta.repartition(col("cell"))
          .sortWithinPartitions("cell", "vec_id", "s")
          .select("vec_id", "cell", "s", "code", "err_e6"))
      merged.write.partitionBy("cell").mode("overwrite").parquet(s"$out/g1")
      // the ATOMIC swap: commit gen 1's manifest rows last
      commitManifest(s, out, gen = 1, dir = "g1", cells = touched)
      graft.Fixtures.writeMarker(marker, s"$d/embeddings.parquet")
    }
    val probeCells = kit.probes.filter(col("qid") === 0)
      .select("cell").collect().map(_.getLong(0)).sorted.toSeq
    Seq(0, 1).map { pin =>
      genPinnedRead(s, out, pin, probeCells)
        .select(lit(pin).as("gen_pin"), col("cell"), col("vec_id"),
                col("s"), col("code"), col("err_e6"))
    }.reduce(_ unionByName _)
      .orderBy("gen_pin", "cell", "vec_id", "s")
  }

  /** One manifest commit: a (cell, dir) relation written under
    * manifest/gen=N — append-only, generation-partitioned, and tiny
    * (cell-granularity metadata, never postings).
    */
  private def commitManifest(
      s: SparkSession, out: String, gen: Int, dir: String, cells: Seq[Long]): Unit = {
    import s.implicits._
    cells.map(c => (c, dir)).toDF("cell", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$out/manifest/gen=$gen")
  }

  /** The cells a generation directory owns — pure directory-listing
    * metadata (cell=N partition dirs), no data files opened.
    */
  private def listCells(dir: String): Seq[Long] =
    graft.io.LayoutFs.listSubdirNames(dir)
      .filter(_.startsWith("cell="))
      .map(_.substring(5).toLong).sorted

  /** A generation-pinned probe read: resolve each probe cell's owner
    * directory from the manifest (max gen ≤ pin — manifest-scale, the
    * only collect), then read each owner directory through a
    * partition-PRUNED scan of exactly its owned cells.
    */
  private[graft] def genPinnedRead(
      s: SparkSession, out: String, pin: Int, probeCells: Seq[Long]): DataFrame =
    manifestPinnedRead(s, s"$out/manifest", out, pin, probeCells)

  /** The same resolution against a manifest living OUTSIDE the data
    * root — q193's serving stream keeps a run-local manifest (the
    * mid-stream commit mutates it) over q191's immutable generation
    * directories.
    */
  private[graft] def manifestPinnedRead(
      s: SparkSession, manifestDir: String, dataRoot: String, pin: Int,
      probeCells: Seq[Long]): DataFrame = {
    // a vacuumed store records its pin floor — generations below it
    // were reclaimed, and serving them would silently return partial
    // cells (the g0 scan finds no files); refuse LOUDLY instead. The
    // floor lives beside whichever layer the vacuum ran against: the
    // data root (physical vacuumTo) or the manifest's own root (the
    // logical vacuumManifest a run-local overlay uses) — check both.
    (Seq(s"$dataRoot/_VACUUM_FLOOR") ++ floorPathFor(manifestDir))
      .distinct
      .flatMap(graft.io.LayoutFs.readSmallFile)
      .foreach { raw =>
        val floor = raw.trim.toInt
        require(pin >= floor,
          s"pin $pin is below the vacuum floor $floor: its generation data was reclaimed")
      }
    val owners = s.read.parquet(manifestDir)
      .filter(col("gen") <= pin && col("cell").isin(probeCells: _*))
      .groupBy("cell").agg(max(struct(col("gen"), col("dir"))).as("o"))
      .select(col("cell"), col("o.dir").as("dir"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // explicit schema: a fully-vacuumed generation directory may hold
    // nothing but _SUCCESS, so the base cannot be inferred from files
    val empty = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(
        Seq("cell", "vec_id", "s", "code", "err_e6").map(n =>
          org.apache.spark.sql.types.StructField(
            n, org.apache.spark.sql.types.LongType))))
    owners.groupBy(_._2).toSeq.sortBy(_._1).map { case (dir, cs) =>
      val cells = cs.map(_._1).sorted
      openCells(s, s"$dataRoot/$dir", cells.toIndexedSeq)
        .filter(col("cell").isin(cells: _*))
        .select(col("cell").cast("long").as("cell"), col("vec_id"),
                col("s"), col("code"), col("err_e6"))
    }.foldLeft(empty)(_ unionByName _)
  }

  /** The `_VACUUM_FLOOR` path beside a manifest directory (its parent
    * root) — None for a degenerate path with no parent.
    */
  private def floorPathFor(manifestDir: String): Option[String] = {
    val trimmed = manifestDir.stripSuffix("/")
    val cut = trimmed.lastIndexOf('/')
    if (cut <= 0) None else Some(trimmed.substring(0, cut) + "/_VACUUM_FLOOR")
  }

  /** q191's fixture directory — for specs needing the on-disk state. */
  private[graft] def versionDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_genidx_" +
      java.lang.Integer.toHexString(d.hashCode)

  // ---- q210: GENERATION VACUUM — the lifecycle piece q191/q193 left
  //      open (r11 verdict "what's missing" #4): nothing reclaimed
  //      superseded generation data after a swap, so the store grew
  //      forever. The vacuum is MANIFEST-DRIVEN: given a pin FLOOR
  //      (the lowest generation any live reader may still hold), a
  //      cell's data under generation g is reclaimable iff some newer
  //      generation <= floor owns that cell — resolution is the same
  //      metadata-scale manifest fold every pinned read does, and the
  //      deletes are per-cell partition directories (never whole
  //      generations: g0 keeps serving every cell g1 did not touch —
  //      reads SPAN generations, so the vacuum must too). The floor is
  //      then recorded beside the vacuumed layer and pinned reads
  //      BELOW it refuse loudly (a pin-0 read against a vacuumed store
  //      would otherwise silently return partial cells). The vacuum
  //      SPLITS Iceberg/Delta-style: the lane commits the METADATA
  //      half (vacuumManifest — floor + superseded manifest rows
  //      dropped) against a run-local manifest over the pristine
  //      store, clone-free; the PHYSICAL half (vacuumTo — delete the
  //      unreferenced per-cell dirs) is the GC a deployment schedules
  //      on a store it owns, proven by VersionSpec on spec-local
  //      copies. The lane reads pin 1 BEFORE, vacuums to floor 1,
  //      reads pin 1 AFTER: oracle = the q191 pin-1 relation TWICE
  //      (vacuum must be invisible at or above the floor), plus the
  //      reclaimed-cell count in closed form (cells with both a
  //      pre-delta and a delta member — exactly the g0 partitions g1
  //      superseded). VersionSpec additionally vacuums while a pin-1
  //      read is in flight. ----
  private[graft] def vacuumDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_vacidx_" +
      java.lang.Integer.toHexString(d.hashCode)

  /** Zero-data-byte clone of a layout tree (hardlinks on the local
    * scheme — r15 VERDICT #2: the byte-copy this replaces made every
    * mutation lane pay an O(index) setup term; linked inodes are safe
    * because mutations only ever REPLACE partition files via
    * stageAndSwap, never write in place). See
    * [[graft.io.LayoutFs.cloneTree]].
    */
  private[graft] def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit =
    graft.io.LayoutFs.cloneTree(src.toString, dst.toString)

  /** SPEC-ONLY since r17: clone the q191 generation store into a
    * throwaway root for proving the PHYSICAL vacuum half ([[vacuumTo]])
    * — the registered lanes (q210/q212) enter via a run-local manifest
    * over the pristine store instead ([[vacuumManifest]]) and never
    * clone.
    */
  private[graft] def cloneVersionStore(s: SparkSession, d: String): String =
    cloneVersionStoreTo(s, d, s"${vacuumDir(d)}_phys")

  /** Clone into an explicit root (spec scaffolding for physical-vacuum
    * proofs; see [[cloneVersionStore]]).
    */
  private[graft] def cloneVersionStoreTo(s: SparkSession, d: String,
                                         root: String): String = {
    indexVersions(s, d) // stages the source store if absent
    graft.io.LayoutFs.deleteTree(root)
    graft.io.LayoutFs.cloneTree(versionDir(d), root)
    root
  }

  /** Reclaim generation data superseded at `floor`: delete each
    * (gen, cell) partition directory whose cell is owned by a NEWER
    * generation <= floor, then record the floor so lower pins refuse.
    * Returns the distinct cells reclaimed. Metadata-scale throughout —
    * the manifest fold is the only collect, deletes are directory ops.
    */
  private[graft] def vacuumTo(s: SparkSession, root: String, floor: Int): Seq[Long] = {
    // The recorded floor is monotone (r12 advice): a later vacuum with a
    // LOWER floor must not lower it — generation data at the old floor
    // was already reclaimed, and a lowered record would let
    // manifestPinnedRead accept pins whose cells silently read partial.
    val floorPath = s"$root/_VACUUM_FLOOR"
    val recorded = graft.io.LayoutFs.readSmallFile(floorPath)
      .map(_.trim.toInt).getOrElse(Int.MinValue)
    val eff = math.max(recorded, floor)
    val rows = s.read.parquet(s"$root/manifest")
      .filter(col("gen") <= eff)
      .select(col("gen").cast("int"), col("cell"), col("dir"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val ownerGen = rows.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._1).max }
    val stale = rows.filter { case (g, c, _) => g < ownerGen(c) }
    stale.foreach { case (_, c, dir) =>
      graft.io.LayoutFs.deleteTree(s"$root/$dir/cell=$c")
    }
    graft.io.LayoutFs.writeSmallFile(floorPath, eff.toString)
    stale.map(_._2).distinct.sorted.toSeq
  }

  /** The METADATA half of the vacuum — the Iceberg/Delta split: record
    * the floor and drop superseded (gen, cell) rows from the MANIFEST,
    * leaving generation data untouched. Pinned reads at/above the
    * floor are unchanged (owner resolution never picks a superseded
    * row); reads below refuse on the recorded floor. Physical
    * reclamation ([[vacuumTo]] — delete the now-unreferenced dirs) is
    * the separate GC step a deployment schedules against a store it
    * OWNS; the registered lanes run over the shared pristine fixture
    * through a run-local manifest, so they commit exactly this
    * metadata half and never need a cloned store (r16 verdict #3 —
    * the clone's non-`file`-scheme byte-copy fallback leaves the
    * timed path entirely). Returns the reclaimed cells — identical to
    * what vacuumTo would return for the same manifest state
    * (VersionSpec proves the physical half on spec-local copies).
    */
  private[graft] def vacuumManifest(
      s: SparkSession, manifestDir: String, floor: Int): Seq[Long] = {
    val floorPath = floorPathFor(manifestDir).getOrElse(
      sys.error(s"manifest dir $manifestDir has no parent for a floor"))
    val recorded = graft.io.LayoutFs.readSmallFile(floorPath)
      .map(_.trim.toInt).getOrElse(Int.MinValue)
    val eff = math.max(recorded, floor)
    val rows = s.read.parquet(manifestDir)
      .filter(col("gen") <= eff)
      .select(col("gen").cast("int"), col("cell"), col("dir"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val ownerGen = rows.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._1).max }
    val stale = rows.filter { case (g, c, _) => g < ownerGen(c) }
    // rewrite only the generations that lost rows (manifest-scale)
    stale.groupBy(_._1).foreach { case (g, gone) =>
      val goneCells = gone.map(_._2).toSet
      val keep = rows.filter { case (rg, c, _) => rg == g && !goneCells.contains(c) }
      val genDir = s"$manifestDir/gen=$g"
      if (keep.isEmpty) graft.io.LayoutFs.deleteTree(genDir)
      else {
        import s.implicits._
        keep.map { case (_, c, dir) => (c, dir) }.toSeq.toDF("cell", "dir")
          .coalesce(1).write.mode("overwrite").parquet(genDir)
      }
    }
    graft.io.LayoutFs.writeSmallFile(floorPath, eff.toString)
    stale.map(_._2).distinct.sorted.toSeq
  }

  /** Seed a run-local manifest from a store's committed one (tiny —
    * cell-granularity metadata rows, never postings).
    */
  private[graft] def seedManifest(
      s: SparkSession, srcManifest: String, dstManifest: String,
      gens: Seq[Int]): Unit =
    gens.foreach { g =>
      s.read.parquet(srcManifest).filter(col("gen") === g)
        .select("cell", "dir").coalesce(1)
        .write.mode("overwrite").parquet(s"$dstManifest/gen=$g")
    }

  def indexVacuum(s: SparkSession, d: String): DataFrame = {
    // generation-pinned overlay entry (r16 verdict #3): the pristine
    // store stays the data root; the lane owns only a run-local
    // manifest + floor and vacuums THAT (the metadata half — see
    // vacuumManifest). No clone, O(manifest) entry on every scheme.
    indexVersions(s, d) // stages the pristine store if absent
    val pristine = versionDir(d)
    val laneRoot = vacuumDir(d)
    graft.io.LayoutFs.deleteTree(laneRoot)
    val laneManifest = s"$laneRoot/manifest"
    seedManifest(s, s"$pristine/manifest", laneManifest, Seq(0, 1))
    val kit = residKit(base(s, d), ivfCellCount(s, d))
    val probeCells = kit.probes.filter(col("qid") === 0)
      .select("cell").collect().map(_.getLong(0)).sorted.toSeq
    def read(phase: String) =
      manifestPinnedRead(s, laneManifest, pristine, 1, probeCells)
        .select(lit(phase).as("phase"), col("cell"), col("vec_id"),
                col("s"), col("code"), col("err_e6"))
    // BEFORE must materialize before the manifest mutates
    val before = read("before").localCheckpoint(true)
    val reclaimed = vacuumManifest(s, laneManifest, floor = 1)
    val after = read("after")
    before.unionByName(after)
      .withColumn("n_reclaimed", lit(reclaimed.size.toLong))
      .orderBy("phase", "cell", "vec_id", "s")
  }

  private val indexVacuumSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residRuCteSql,
       |lcodes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, scid AS cid,
       |  CAST(floor(dist * 1000000.0) AS BIGINT) AS err_e6 FROM
       |  (SELECT vec_id, s, scid, dist, row_number() OVER (PARTITION BY vec_id, s
       |     ORDER BY dist ASC, scid ASC) AS rn FROM ru) WHERE rn = 1),
       |pc AS (SELECT DISTINCT cell FROM iprb WHERE qid = 0),
       |pfull AS (SELECT CAST(a.cell AS BIGINT) AS cell, l.vec_id, l.s,
       |    l.cid AS code, l.err_e6
       |  FROM lcodes l JOIN iasg a ON a.vec_id = l.vec_id
       |  JOIN pc ON pc.cell = a.cell),
       |rec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reclaimed FROM (
       |  SELECT cell FROM iasg GROUP BY cell
       |  HAVING SUM(CASE WHEN vec_id % 7 = 3 THEN 1 ELSE 0 END) > 0
       |     AND SUM(CASE WHEN vec_id % 7 <> 3 THEN 1 ELSE 0 END) > 0))
       |SELECT 'before' AS phase, cell, vec_id, s, code, err_e6, n_reclaimed
       |FROM pfull, rec
       |UNION ALL
       |SELECT 'after' AS phase, cell, vec_id, s, code, err_e6, n_reclaimed
       |FROM pfull, rec
       |ORDER BY phase, cell, vec_id, s""".stripMargin

  private val indexVersionsSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |$residRuCteSql,
       |lcodes AS (SELECT vec_id, CAST(s AS BIGINT) AS s, scid AS cid,
       |  CAST(floor(dist * 1000000.0) AS BIGINT) AS err_e6 FROM
       |  (SELECT vec_id, s, scid, dist, row_number() OVER (PARTITION BY vec_id, s
       |     ORDER BY dist ASC, scid ASC) AS rn FROM ru) WHERE rn = 1),
       |pc AS (SELECT DISTINCT cell FROM iprb WHERE qid = 0),
       |pfull AS (SELECT CAST(a.cell AS BIGINT) AS cell, l.vec_id, l.s,
       |    l.cid AS code, l.err_e6
       |  FROM lcodes l JOIN iasg a ON a.vec_id = l.vec_id
       |  JOIN pc ON pc.cell = a.cell)
       |SELECT CAST(0 AS INTEGER) AS gen_pin, cell, vec_id, s, code, err_e6
       |FROM pfull WHERE vec_id % 7 <> 3
       |UNION ALL
       |SELECT CAST(1 AS INTEGER) AS gen_pin, cell, vec_id, s, code, err_e6
       |FROM pfull
       |ORDER BY gen_pin, cell, vec_id, s""".stripMargin

  /** Dev-only sweep grid behind bench_evidence/r10_filtered_sweep.md +
    * r11_filtered_sweep.md (r9 VERDICT #7, r10 VERDICT #3): recall vs
    * probe budget for filtered ANN, per label granularity AND per
    * serving mode — "post" scores the whole probed membership then
    * filters (q174), "part" reads only the query-label's (lbl, cell)
    * lists so every fetched candidate already matches (q183); the two
    * modes share the kept set and therefore the recall at a given
    * probe count — what differs is the CANDIDATE COST column, which is
    * the entire point of the partitioned layout. One routing pass at
    * the max budget per variant; each probe count filters the ranked
    * probe set (the q174 prefix property). Label variants re-derive
    * `lbl` from the raw label so selectivity sweeps from ~1/2 to
    * ~1/(3·|labels|) without touching the corpus. Recall is
    * TRUTH-ADJUSTED (r10 ADVICE): each query's overlap divides by
    * min(TopK, its filtered-truth size) so fine granularities with
    * small label classes aren't understated, and queries with NO
    * same-label mate are counted explicitly instead of silently
    * dropped. Returns (variant, n_labels, mode, probes, mean n_cand,
    * mean n_kept, mean adjusted recall, n_truthless).
    */
  private[graft] def filteredSweepRows(
      s: SparkSession, d: String, probeCounts: Seq[Int],
      labelVariants: Seq[(String, Column)])
      : Seq[(String, Long, String, Int, Double, Double, Double, Long)] = {
    val maxP = probeCounts.max
    labelVariants.flatMap { case (vname, lblCol) =>
      val allL = Tables.embeddings(s, d)
        .repartition(col("vec_id"))
        .select(col("vec_id"), col("embedding").as("v"), lblCol.as("lbl"))
        .withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))
        .persist()
      val nLabels = allL.select("lbl").distinct().count()
      val q = allL.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
                col("nrm").as("qn"), col("lbl").as("qlbl"))
      val qlbl = q.select("qid", "qlbl")
      val wt = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
      val truth = allL.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid") && col("lbl") === col("qlbl"))
        .select(col("qid"), col("vec_id"),
                round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_r"))
        .withColumn("rn", row_number().over(wt))
        .filter(col("rn") <= TopK)
        .select("qid", "vec_id")
        .localCheckpoint(true)
      // per-query filtered-truth sizes: the adjusted-recall denominator
      val truthCnt = truth.groupBy("qid").agg(count(lit(1)).as("tc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nTruthless = NQueries.toLong - truthCnt.size
      val (assigned0, probesR0) = ivfRoutingRanked(allL, ivfCellCount(s, d), maxP)
      val assigned = assigned0.localCheckpoint(true)
      val probesR = probesR0.localCheckpoint(true)
      val rows = probeCounts.flatMap { p =>
        val scored = scoreProbed(assigned,
          probesR.filter(col("crn") <= p).drop("crn"))
        val kept = allL.select(col("vec_id"), col("lbl"))
          .join(broadcast(scored), Seq("vec_id"))
          .join(broadcast(qlbl), Seq("qid"))
          .filter(col("lbl") === col("qlbl"))
        val wk = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
        val top = kept.withColumn("rn", row_number().over(wk))
          .filter(col("rn") <= TopK).select(col("qid"), col("vec_id"), lit(1L).as("hit"))
        val ovByQ = truth.join(broadcast(top), Seq("qid", "vec_id"), "left")
          .groupBy("qid").agg(sum(coalesce(col("hit"), lit(0L))).as("ov"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val recall =
          if (truthCnt.isEmpty) 0.0
          else truthCnt.map { case (qid, tc) =>
            ovByQ.getOrElse(qid, 0L).toDouble / math.min(TopK.toLong, tc)
          }.sum / truthCnt.size
        val nCand = scored.count().toDouble / NQueries
        val nKept = kept.count().toDouble / NQueries
        // "part" fetches exactly the kept set (pre-filter lists), so
        // its candidate cost IS nKept; recall is shared by construction
        Seq((vname, nLabels, "post", p, nCand, nKept, recall, nTruthless),
            (vname, nLabels, "part", p, nKept, nKept, recall, nTruthless))
      }
      allL.unpersist(false)
      rows
    }
  }

  private val filteredAnnSql = {
    def modeSql(tag: String, prb: String): String =
      s"""${tag}c AS (SELECT p.qid, s.vec_id,
         |  round(${dotFoldSql("p.qv", "s.v")} / (p.qn * s.nrm), 6) AS cos_r
         |  FROM iasg s JOIN $prb p ON s.cell = p.cell
         |  WHERE s.vec_id <> p.qid),
         |${tag}n AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand
         |           FROM ${tag}c GROUP BY qid),
         |${tag}k AS (SELECT c.qid, c.vec_id, c.cos_r FROM ${tag}c c
         |           JOIN nl ON nl.vec_id = c.vec_id
         |           JOIN fq ON fq.qid = c.qid
         |           WHERE nl.lbl = fq.qlbl),
         |${tag}kn AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_kept
         |            FROM ${tag}k GROUP BY qid),
         |${tag}t AS (SELECT qid, vec_id, 1 AS hit FROM (SELECT qid, vec_id,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC)
         |    AS rn FROM ${tag}k) WHERE rn <= $TopK),
         |${tag}f AS (SELECT ftt.qid,
         |        CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_overlap,
         |        (CAST(SUM(COALESCE(hit, 0)) AS BIGINT) * 1000000) // $TopK
         |          AS recall_millionths
         |      FROM ftt LEFT JOIN ${tag}t USING (qid, vec_id) GROUP BY ftt.qid)""".stripMargin
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |el AS (SELECT vec_id, ${toDoubleSql("embedding")} AS v,
       |       CAST(label AS BIGINT) AS lbl FROM embeddings),
       |nl AS (SELECT vec_id, v, lbl, ${normSql("v")} AS nrm FROM el),
       |fq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, lbl AS qlbl FROM nl
       |       WHERE vec_id < $NQueries),
       |ft AS (SELECT fq.qid, nl.vec_id,
       |  round(${dotFoldSql("fq.qv", "nl.v")} / (fq.qn * nl.nrm), 6) AS cos_r
       |  FROM nl CROSS JOIN fq
       |  WHERE nl.vec_id <> fq.qid AND nl.lbl = fq.qlbl),
       |ftt AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER
       |  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM ft)
       |  WHERE rn <= $TopK),
       |ipb AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, cid AS cell
       |        FROM ir0 WHERE crn <= ${IvfProbes * FilterBoost}
       |          AND vec_id < $NQueries),
       |${modeSql("fp", "iprb")},
       |${modeSql("fb", "ipb")}
       |SELECT 'post' AS mode, fq.qid, fq.qlbl, fpn.n_cand, fpkn.n_kept,
       |       fpf.n_overlap, fpf.recall_millionths
       |FROM fq JOIN fpn ON fpn.qid = fq.qid JOIN fpkn ON fpkn.qid = fq.qid
       |JOIN fpf ON fpf.qid = fq.qid
       |UNION ALL
       |SELECT 'boost', fq.qid, fq.qlbl, fbn.n_cand, fbkn.n_kept,
       |       fbf.n_overlap, fbf.recall_millionths
       |FROM fq JOIN fbn ON fbn.qid = fq.qid JOIN fbkn ON fbkn.qid = fq.qid
       |JOIN fbf ON fbf.qid = fq.qid
       |ORDER BY mode, qid""".stripMargin
  }

  // ---- q183: LABEL-PARTITIONED PRE-FILTER ANN — the fine-granularity
  //      filtered-ANN design q174's own sweep called for
  //      (bench_evidence/r10_filtered_sweep.md reading #3: at fine
  //      label granularity, post-filter recall craters and unbounded
  //      probe boost pays linearly for candidates the filter then
  //      throws away). Here the index itself is partitioned by
  //      (label, cell): the corpus is routed once (same argmin as
  //      q50) and written partitionBy(lbl, cell), so each inverted
  //      list holds ONE label's members of ONE cell. A filtered query
  //      then reads ONLY its own label's lists for its probed cells —
  //      the filter prunes at the FileScan, BEFORE any scoring — and
  //      every candidate fetched already satisfies the filter:
  //      n_cand == n_kept by construction, vs q174's boost mode which
  //      scores the whole probed membership and discards ~(1-1/|lbl|)
  //      of it. Same boosted probe budget as q174 (sweep-chosen 4x),
  //      so the q174-vs-q183 rows price exactly the layout: equal
  //      recall at ~1/|labels| the scored candidates. Scale shapes:
  //      routing is the one n×k broadcast argmin, the probe relation
  //      is NQueries·probes rows (its label/cell sets are
  //      metadata-scale literals for the pruned read), candidates
  //      join the pruned lists against a BROADCAST probe set. The
  //      tradeoff a deployment weighs — label-partitioned lists
  //      fragment the index (|labels|×k directories, skewed label
  //      marginals make skewed files) — is the documented cost of
  //      buying pre-filter reads. ----
  def partitionedFilteredAnn(s: SparkSession, d: String): DataFrame = {
    val allL = labeledBase(s, d).persist()
    val k = ivfCellCount(s, d)
    val q = allL.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
              col("nrm").as("qn"), col("lbl").as("qlbl"))
    val qlbl = q.select("qid", "qlbl")
    // exact FILTERED truth (q174's control)
    val wt = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
    val truth = allL.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid") && col("lbl") === col("qlbl"))
      .select(col("qid"), col("vec_id"),
              round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_r"))
      .withColumn("rn", row_number().over(wt))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id")
      .localCheckpoint(true)
    // boosted probe routing (q174's budget); the query label rides on
    // the bounded probe relation, not the corpus
    val (_, probesR) = ivfRoutingRanked(allL, k, IvfProbes * FilterBoost)
    val probes = probesR.drop("crn")
      .join(broadcast(qlbl), Seq("qid"))
      .select(col("qid"), col("qv"), col("qn"), col("qlbl"),
              col("cell").as("pcell"))
      .localCheckpoint(true) // NQueries·probes rows — metadata-scale
    val dir = labelLayoutDir(s, d)
    val qlbls = probes.select("qlbl").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val pcells = probes.select("pcell").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    // the pre-filter read: only (query-label, probed-cell) lists leave disk
    val lists = labelProbedRead(s, dir, qlbls, pcells)
    val cand = lists.join(broadcast(probes),
        col("lbl") === col("qlbl") && col("cell") === col("pcell")
          && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
              round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_r"))
    val nCand = cand.groupBy("qid").agg(count(lit(1)).as("n_cand"))
    val wk = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id").asc)
    val top = cand.withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
    val result = truth.join(broadcast(top), Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
           expr(s"(sum(coalesce(hit, 0)) * 1000000) div $TopK").as("recall_millionths"))
      .join(broadcast(nCand), Seq("qid"))
      .join(broadcast(qlbl), Seq("qid"))
      .select(lit("part").as("mode"), col("qid"), col("qlbl"),
              col("n_cand"), col("n_cand").as("n_kept"),
              col("n_overlap"), col("recall_millionths"))
      .orderBy("qid")
      .localCheckpoint(true)
    allL.unpersist(false)
    result
  }

  /** Corpus routed to cells WITH the label kept — the (lbl, cell)
    * layout's write relation. Same centroids, negsim and min(struct)
    * tie-break as [[ivfRoutingRankedFor]]'s assignment.
    */
  private def labeledAssigned(allL: DataFrame, k: Long): DataFrame = {
    val cents = allL.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), toDouble(col("v")).as("cv"),
              col("nrm").as("cn"))
    allL.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("lbl"), col("cid"),
        (-vecDot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("negsim"))
      .groupBy("vec_id")
      .agg(min(struct(col("negsim"), col("cid"))).as("sc"),
           first(col("v")).as("v"), first(col("nrm")).as("nrm"),
           first(col("lbl")).as("lbl"))
      .select(col("vec_id"), col("v"), col("nrm"), col("lbl"),
              col("sc").getField("cid").as("cell"))
  }

  /** q183's on-disk (label, cell)-partitioned index — one inverted
    * list per (label, cell), clustered by vec_id. Fixture-markered.
    */
  private[graft] def labelLayoutDir(s: SparkSession, d: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_lblidx_" +
      java.lang.Integer.toHexString(d.hashCode)
    val marker = java.nio.file.Paths.get(out, "_FIXTURE_OK")
    if (!graft.Fixtures.markerCurrent(marker, s"$d/embeddings.parquet")) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(out))
      labeledAssigned(labeledBase(s, d), ivfCellCount(s, d))
        .repartition(col("lbl"), col("cell"))
        .sortWithinPartitions("lbl", "cell", "vec_id")
        .write.partitionBy("lbl", "cell").mode("overwrite").parquet(out)
      graft.Fixtures.writeMarker(marker, s"$d/embeddings.parquet")
    }
    out
  }

  /** Partition-pruned read of the (query-label, probed-cell) lists —
    * both literal isin sets are metadata-scale, so BOTH partition
    * levels prune at the FileScan (PlanShapeSpec guards this).
    */
  private[graft] def labelProbedRead(
      s: SparkSession, dir: String,
      lbls: Seq[Long], cells: Seq[Long]): DataFrame =
    openPartDirs(s, dir,
        for { l <- lbls; c <- cells } yield s"lbl=$l/cell=$c")
      .filter(col("lbl").isin(lbls: _*) && col("cell").isin(cells: _*))
      .select(col("lbl").cast("long").as("lbl"),
              col("cell").cast("long").as("cell"),
              col("vec_id"), col("v"), col("nrm"))

  private val partitionedFilteredAnnSql =
    s"""WITH $baseCte,
       |${ivfRouteCteSql()},
       |el AS (SELECT vec_id, ${toDoubleSql("embedding")} AS v,
       |       CAST(label AS BIGINT) AS lbl FROM embeddings),
       |nl AS (SELECT vec_id, v, lbl, ${normSql("v")} AS nrm FROM el),
       |fq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, lbl AS qlbl FROM nl
       |       WHERE vec_id < $NQueries),
       |ft AS (SELECT fq.qid, nl.vec_id,
       |  round(${dotFoldSql("fq.qv", "nl.v")} / (fq.qn * nl.nrm), 6) AS cos_r
       |  FROM nl CROSS JOIN fq
       |  WHERE nl.vec_id <> fq.qid AND nl.lbl = fq.qlbl),
       |ftt AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, row_number() OVER
       |  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM ft)
       |  WHERE rn <= $TopK),
       |ipb AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, cid AS cell
       |        FROM ir0 WHERE crn <= ${IvfProbes * FilterBoost}
       |          AND vec_id < $NQueries),
       |pcand AS (SELECT p.qid, s.vec_id,
       |  round(${dotFoldSql("p.qv", "s.v")} / (p.qn * s.nrm), 6) AS cos_r
       |  FROM iasg s JOIN nl ON nl.vec_id = s.vec_id
       |  JOIN ipb p ON s.cell = p.cell JOIN fq ON fq.qid = p.qid
       |  WHERE nl.lbl = fq.qlbl AND s.vec_id <> p.qid),
       |pn AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand
       |       FROM pcand GROUP BY qid),
       |pt AS (SELECT qid, vec_id, 1 AS hit FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC)
       |    AS rn FROM pcand) WHERE rn <= $TopK),
       |pf AS (SELECT ftt.qid,
       |        CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_overlap,
       |        (CAST(SUM(COALESCE(hit, 0)) AS BIGINT) * 1000000) // $TopK
       |          AS recall_millionths
       |      FROM ftt LEFT JOIN pt USING (qid, vec_id) GROUP BY ftt.qid)
       |SELECT 'part' AS mode, fq.qid, fq.qlbl, pn.n_cand,
       |       pn.n_cand AS n_kept, pf.n_overlap, pf.recall_millionths
       |FROM fq JOIN pn ON pn.qid = fq.qid JOIN pf ON pf.qid = fq.qid
       |ORDER BY fq.qid""".stripMargin

  // ---- q163: retrieval rank-quality metrics (nDCG@10, MRR, hits) for
  //      the approximate ANN lanes — the "measure, don't guess" eval
  //      q153 gives the dedup path, here for serving: each approximate
  //      ranking (single- and multi-table LSH and IVF-probed cosine;
  //      PQ-ADC) is scored against ITS
  //      exact counterpart (brute-force cosine; exact L2), with graded
  //      gains 11−truth_rank. The float-free trick: the log2 position
  //      discounts are a 10-entry LITERAL LUT (floor(1e9/log2(p+1)),
  //      computed once driver-side, inlined into both engines) and the
  //      ideal DCG is a compile-time constant, so nDCG and MRR are
  //      integer-exact millionths — rank metrics that hash-match. All
  //      corpus-scale work stays in the bounded upstream retrieval
  //      lanes; the metric join touches O(queries·K) rows. A full
  //      (system × query) grid keeps zero-candidate queries visible as
  //      zero rows in both engines. ----
  private val NdcgDisc: IndexedSeq[Long] =
    (1 to TopK).map(p => math.floor(1e9 / (math.log(p + 1.0) / math.log(2.0))).toLong)
  private val NdcgIdcgE9: Long =
    (1 to TopK).map(i => (TopK + 1 - i) * NdcgDisc(i - 1)).sum

  def rankMetrics(s: SparkSession, d: String): DataFrame = {
    // ONE persisted base feeds all seven upstream lanes (r8 ADVICE:
    // every lane re-deriving base() re-scanned and re-normalized the
    // corpus); the cross-join candidate generation stays per-lane by
    // design — it IS what each system under eval does differently.
    val all = base(s, d).persist()
    val k = ivfCellCount(s, d)
    // the grid evaluates at EvalQueries width (r12 verdict #2: 5-query
    // deltas are noise-dominated — single-query nDCG swings exceed 0.5)
    val (topAdc, topL2) = pqSearchParts(s, all, EvalQueries)
    val cosTop = sharedSimTruth(s, d) // shared with q199 (session cache)
    // the trained kit is the session-cached build artifact shared with
    // q177: ONE n×k coarse routing (feeding all three IVF-family
    // systems — r9 VERDICT #3), ONE materialized residual relation and
    // ONE corpus-scaled Lloyd run per (session, corpus)
    val kitT = sharedTrainedKit(s, d)
    val routing = (kitT.kit.assigned, kitT.kit.probes)
    def sysList(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("sys"), col("qid"), col("vec_id"), col("rn"))
    val sysRows = sysList("lsh", simAnnLshOn(all, planeInt, EvalQueries))
      .unionByName(sysList("mlsh", simAnnMultiLshOn(all, mtPlaneInt, EvalQueries)))
      .unionByName(sysList("ivf", simAnnIvfRouted(routing._1, routing._2)))
      .unionByName(sysList("adc", topAdc))
      .unionByName(sysList("ivfpq",
        adcTopK(ivfPqAdc(s, all, k, Some(routing), EvalQueries)._2)))
      .unionByName(sysList("rivfpq", adcTopK(residualAdcOn(s, kitT.kit, kitT.kit.books)._2)))
      .unionByName(sysList("trivfpq", adcTopK(residualAdcOn(s, kitT.kit, kitT.trained)._2)))
    // cosine-ranked truth for the cosine lanes; exact-L2 truth for the
    // ADC-scored lanes (full-corpus and both IVF-pruned variants)
    val cosGain = (sysName: String) => cosTop
      .select(lit(sysName).as("sys"), col("qid"), col("vec_id"),
              (lit(TopK + 1L) - col("rn")).as("gain"))
    val l2Gain = (sysName: String) => topL2
      .select(lit(sysName).as("sys"), col("qid"), col("vec_id"),
              (lit(TopK + 1L) - col("rn")).as("gain"))
    val gains = cosGain("lsh")
      .unionByName(cosGain("mlsh"))
      .unionByName(cosGain("ivf"))
      .unionByName(l2Gain("adc"))
      .unionByName(l2Gain("ivfpq"))
      .unionByName(l2Gain("rivfpq"))
      .unionByName(l2Gain("trivfpq"))
    val discArms = (1 to TopK)
      .map(p => s"WHEN $p THEN ${NdcgDisc(p - 1)}").mkString(" ")
    val m = sysRows.join(gains, Seq("sys", "qid", "vec_id"), "left")
      .withColumn("gain", coalesce(col("gain"), lit(0L)))
      .withColumn("disc", expr(s"CASE rn $discArms ELSE 0 END"))
      .groupBy("sys", "qid")
      .agg(sum(when(col("gain") > 0, 1L).otherwise(0L)).as("n_rel0"),
           min(when(col("gain") > 0, col("rn"))).as("frp0"),
           sum(col("gain") * col("disc")).as("dcg0"))
    import s.implicits._
    val grid = Seq("adc", "ivf", "ivfpq", "lsh", "mlsh", "rivfpq", "trivfpq").toDF("sys")
      .crossJoin(broadcast(
        all.filter(col("vec_id") < EvalQueries).select(col("vec_id").as("qid"))))
    val result = grid.join(m, Seq("sys", "qid"), "left")
      .select(col("sys"), col("qid"),
              coalesce(col("n_rel0"), lit(0L)).as("n_rel"),
              coalesce(col("frp0"), lit(0L)).as("first_rel_pos"),
              coalesce(col("dcg0"), lit(0L)).as("dcg_e9"))
      .withColumn("mrr_e6",
        expr("CASE WHEN first_rel_pos = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE 1000000 div first_rel_pos END"))
      .withColumn("ndcg_e6", expr(s"(dcg_e9 * 1000000) div $NdcgIdcgE9"))
      .orderBy("sys", "qid")
      .localCheckpoint(true)
    all.unpersist(false)
    result
  }

  private val rankMetricsSql = {
    val discArms = (1 to TopK)
      .map(p => s"WHEN $p THEN ${NdcgDisc(p - 1)}").mkString(" ")
    val lutDistCols = (0 until PqM)
      .map(sI => s"${pqSubDistSql(sI, "qq.qv", "c.cv")} AS ld_$sI").mkString(",\n  ")
    val lutCaseArms = (0 until PqM).map(sI => s"WHEN ${sI + 1} THEN ld_$sI").mkString(" ")
    s"""WITH $baseCte,
       |$pqCodesCteSql,
       |${multiLshCteSql(EvalQueries)},
       |${ivfCteSql(EvalQueries)},
       |qq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
       |       WHERE vec_id < $EvalQueries),
       |cs AS (SELECT qq.qid, n.vec_id,
       |  round(${dotFoldSql("qq.qv", "n.v")} / (qq.qn * n.nrm), 6) AS cos_r
       |  FROM n CROSS JOIN qq WHERE n.vec_id <> qq.qid),
       |ct AS (SELECT qid, vec_id, rn FROM (SELECT qid, vec_id, row_number()
       |  OVER (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM cs)
       |  WHERE rn <= $TopK),
       |lb AS (SELECT vec_id, v, nrm, ${bucketSql("v")} AS bkt FROM n),
       |lq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bkt AS qbkt FROM lb
       |       WHERE vec_id < $EvalQueries),
       |lc AS (SELECT lq.qid, lb.vec_id,
       |  round(${dotFoldSql("lq.qv", "lb.v")} / (lq.qn * lb.nrm), 6) AS cos_r
       |  FROM lb JOIN lq ON lb.bkt = lq.qbkt AND lb.vec_id <> lq.qid),
       |lr AS (SELECT qid, vec_id, rn FROM (SELECT qid, vec_id, row_number()
       |  OVER (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM lc)
       |  WHERE rn <= $TopK),
       |pl0 AS (SELECT qq.qid, c.cid,
       |  $lutDistCols
       |  FROM qq CROSS JOIN c),
       |plut AS (SELECT qid, cid, CAST(t.i - 1 AS BIGINT) AS s,
       |           CAST(floor((CASE t.i $lutCaseArms END) * 1000000.0) AS BIGINT)
       |             AS dlut
       |         FROM pl0, range(1, ${PqM + 1}) t(i)),
       |padc AS (SELECT plut.qid, codes.vec_id,
       |           CAST(SUM(dlut) AS BIGINT) AS adc_e6
       |         FROM codes JOIN plut ON plut.s = codes.s AND plut.cid = codes.cid
       |         WHERE codes.vec_id <> plut.qid
       |         GROUP BY plut.qid, codes.vec_id),
       |pex AS (SELECT qq.qid, n.vec_id,
       |  round(${dotFoldSql("n.v", "n.v")} - 2.0 * ${dotFoldSql("qq.qv", "n.v")}
       |    + ${dotFoldSql("qq.qv", "qq.qv")}, 6) AS d_r
       |  FROM n CROSS JOIN qq WHERE n.vec_id <> qq.qid),
       |pet AS (SELECT qid, vec_id, rn FROM (SELECT qid, vec_id, row_number()
       |  OVER (PARTITION BY qid ORDER BY d_r ASC, vec_id ASC) AS rn FROM pex)
       |  WHERE rn <= $TopK),
       |pat AS (SELECT qid, vec_id, rn FROM (SELECT qid, vec_id, row_number()
       |  OVER (PARTITION BY qid ORDER BY adc_e6 ASC, vec_id ASC) AS rn FROM padc)
       |  WHERE rn <= $TopK),
       |$ivfCandAdcCteSql,
       |ipt AS (SELECT qid, vec_id, rn FROM (SELECT qid, vec_id, row_number()
       |  OVER (PARTITION BY qid ORDER BY adc_e6 ASC, vec_id ASC) AS rn FROM adcc)
       |  WHERE rn <= $TopK),
       |$residRuCteSql,
       |$residAdcCteSql,
       |rpt AS (SELECT qid, vec_id, rn FROM (SELECT qid, vec_id, row_number()
       |  OVER (PARTITION BY qid ORDER BY adc_e6 ASC, vec_id ASC) AS rn FROM radc)
       |  WHERE rn <= $TopK),
       |$residTrainedCteSql,
       |tpt AS (SELECT qid, vec_id, rn FROM (SELECT qid, vec_id, row_number()
       |  OVER (PARTITION BY qid ORDER BY adc_e6 ASC, vec_id ASC) AS rn FROM tvadc)
       |  WHERE rn <= $TopK),
       |sys AS (SELECT 'lsh' AS sys, qid, vec_id, CAST(rn AS BIGINT) AS rn FROM lr
       |        UNION ALL
       |        SELECT 'mlsh', qid, vec_id, CAST(rn AS BIGINT) FROM mr
       |        UNION ALL
       |        SELECT 'ivf', qid, vec_id, CAST(rn AS BIGINT) FROM ivr
       |        UNION ALL
       |        SELECT 'adc', qid, vec_id, CAST(rn AS BIGINT) FROM pat
       |        UNION ALL
       |        SELECT 'ivfpq', qid, vec_id, CAST(rn AS BIGINT) FROM ipt
       |        UNION ALL
       |        SELECT 'rivfpq', qid, vec_id, CAST(rn AS BIGINT) FROM rpt
       |        UNION ALL
       |        SELECT 'trivfpq', qid, vec_id, CAST(rn AS BIGINT) FROM tpt),
       |g AS (SELECT 'lsh' AS sys, qid, vec_id,
       |        CAST(${TopK + 1} - rn AS BIGINT) AS gain FROM ct
       |      UNION ALL
       |      SELECT 'mlsh', qid, vec_id, CAST(${TopK + 1} - rn AS BIGINT) FROM ct
       |      UNION ALL
       |      SELECT 'ivf', qid, vec_id, CAST(${TopK + 1} - rn AS BIGINT) FROM ct
       |      UNION ALL
       |      SELECT 'adc', qid, vec_id, CAST(${TopK + 1} - rn AS BIGINT) FROM pet
       |      UNION ALL
       |      SELECT 'ivfpq', qid, vec_id, CAST(${TopK + 1} - rn AS BIGINT) FROM pet
       |      UNION ALL
       |      SELECT 'rivfpq', qid, vec_id, CAST(${TopK + 1} - rn AS BIGINT) FROM pet
       |      UNION ALL
       |      SELECT 'trivfpq', qid, vec_id, CAST(${TopK + 1} - rn AS BIGINT) FROM pet),
       |j AS (SELECT s.sys, s.qid, s.rn, COALESCE(g.gain, 0) AS gain
       |      FROM sys s LEFT JOIN g
       |        ON g.sys = s.sys AND g.qid = s.qid AND g.vec_id = s.vec_id),
       |m AS (SELECT sys, qid,
       |        CAST(SUM(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
       |        MIN(CASE WHEN gain > 0 THEN rn END) AS frp0,
       |        CAST(SUM(gain * CASE rn $discArms ELSE 0 END) AS BIGINT) AS dcg_e9
       |      FROM j GROUP BY sys, qid),
       |grid AS (SELECT sys, qid FROM
       |           (SELECT 'adc' AS sys UNION ALL SELECT 'ivf'
       |            UNION ALL SELECT 'ivfpq'
       |            UNION ALL SELECT 'lsh'
       |            UNION ALL SELECT 'mlsh'
       |            UNION ALL SELECT 'rivfpq'
       |            UNION ALL SELECT 'trivfpq') CROSS JOIN
       |           (SELECT vec_id AS qid FROM n WHERE vec_id < $EvalQueries)),
       |f AS (SELECT grid.sys, grid.qid,
       |        CAST(COALESCE(m.n_rel, 0) AS BIGINT) AS n_rel,
       |        CAST(COALESCE(m.frp0, 0) AS BIGINT) AS first_rel_pos,
       |        CAST(COALESCE(m.dcg_e9, 0) AS BIGINT) AS dcg_e9
       |      FROM grid LEFT JOIN m ON m.sys = grid.sys AND m.qid = grid.qid)
       |SELECT sys, qid, n_rel, first_rel_pos,
       |  CAST(CASE WHEN first_rel_pos = 0 THEN 0
       |       ELSE 1000000 // first_rel_pos END AS BIGINT) AS mrr_e6,
       |  dcg_e9,
       |  CAST((dcg_e9 * 1000000) // $NdcgIdcgE9 AS BIGINT) AS ndcg_e6
       |FROM f ORDER BY sys, qid""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q38_sim_topk", simTopK, Some(simTopKSql),
      "exact brute-force cosine top-k, broadcast query set"),
    Q("q96_quantize_emb", quantizeEmbeddings, Some(quantizeEmbeddingsSql),
      "int8 symmetric embedding quantization + saturation stats"),
    Q("q64_kmeans_iter", kmeansIter, Some(kmeansIterSql),
      "one Lloyd iteration: argmin assignment + quantized centroid update"),
    Q("q39_sim_ann_lsh", simAnnLsh, Some(simAnnLshSql),
      "single-table LSH ANN (pedagogical lane: bucket equi-join shape; quality-weak by its own q163 row — q164 is the registered scale path)"),
    Q("q50_sim_ann_ivf", simAnnIvf, Some(simAnnIvfSql),
      "IVF ANN: inverted lists + nearest-cell probing (argmin SQL twin)"),
    Q("q131_semdedup", semDedup, Some(semDedupSql),
      "SemDeDup: derived-k clustered semantic near-dup removal audit"),
    Q("q134_semdedup_kept", semDedupKept, Some(semDedupKeptSql),
      "SemDeDup kept-id lane: surviving vec_ids under the same drop policy"),
    Q("q155_pq_codes", pqCodes, Some(pqCodesSql),
      "product quantization: 8x16 literal subspace codebooks, map-side argmin codes + reconstruction error"),
    Q("q157_pq_search", pqSearch, Some(pqSearchSql),
      "ADC top-k over PQ codes: broadcast 640-row integer LUT, 8 lookups + sum per candidate, measured recall vs exact L2"),
    Q("q192_sq8_search", sqSearch, Some(sqSearchSql),
      "scalar-quantization (SQ8) search: train = one per-dim min/max aggregate (no Lloyd), encode = map-side affine byte codes, serve = q157's ADC discipline with M=Dim K=256 (82k-row integer LUT broadcast) — measured recall pairs directly against q157's PQ for the bytes-vs-quality trade"),
    Q("q160_pq_refine", pqRefine, Some(pqRefineSql),
      "one Lloyd refinement of the PQ codebooks: quantized-exact update in one scan, broadcast re-assignment, per-entry error audit"),
    Q("q165_pq_train", pqTrain, Some(pqTrainSql),
      "bounded PQ Lloyd loop (3 rounds): books ride as literals, one scan per round, per-round monotone error audit"),
    Q("q166_pq_search_trained", pqSearchTrained, Some(pqSearchTrainedSql),
      "ADC top-k under the q165-trained books: training's retrieval effect shipped as data (same 640-row integer LUT shape as q157)"),
    Q("q169_pq_search_holdout", pqSearchHoldout, Some(pqSearchHoldoutSql),
      "ADC top-k under HELD-OUT seed books (no query vector in the codebook): the leakage control for the q157/q166 comparison"),
    Q("q171_ivfpq", ivfPqSearch, Some(ivfPqSearchSql),
      "IVF-ADC combined index: coarse cells prune candidates, the PQ LUT scores survivors — per-query candidate count + recall vs full-corpus exact L2"),
    Q("q172_ivfpq_residual", ivfPqResidual, Some(ivfPqResidualSql),
      "residual IVF-PQ (FAISS by_residual=true): codes quantize v - centroid(cell), per-(query, probed-cell) residual LUT — same routing as q171, so the recall delta isolates residual encoding"),
    Q("q177_ivfpq_trained", ivfPqResidualTrained, Some(ivfPqTrainedSql),
      "residual IVF-PQ under Lloyd-TRAINED books: the q165 training loop run on the residual relation (leakage-safe seeds), then served through q172's exact plan — the recall delta vs q172 prices training"),
    Q("q179_index_layout", indexLayout, Some(indexLayoutSql),
      "index storage layout: postings written partitionBy(cell) — one inverted list per writer, clustered runs — probe cells read back through a partition-PRUNED scan (2-of-k cells touch 2-of-k files)"),
    Q("q182_index_compaction", indexCompaction, Some(indexLayoutSql),
      "LSM index compaction: the q173 arrival delta folds into the base cell-partitioned layout — pruned read of ONLY the delta-touched cells, one exchange on the delta, stage-and-swap commit; oracle = the full-rebuild chain, so green == compaction is hash-indistinguishable from rebuild"),
    Q("q183_partitioned_filtered_ann", partitionedFilteredAnn,
      Some(partitionedFilteredAnnSql),
      "label-PARTITIONED pre-filter ANN: (label, cell) inverted lists on disk, a filtered query reads only its own label's probed lists (filter prunes at the FileScan, before scoring) — q174's boost recall at ~1/|labels| the scored candidates"),
    Q("q187_index_delete", indexDelete, Some(indexDeleteSql),
      "index tombstone deletes (right-to-be-forgotten): tombstone-touched cells read through a pruned scan, deleted postings dropped by a broadcast LEFT ANTI join (zero exchanges), stage-and-swap rewrite — oracle = rebuild-from-retained-corpus, hash-equal"),
    Q("q210_index_vacuum", indexVacuum, Some(indexVacuumSql),
      "generation vacuum (manifest-driven GC): per-cell partition dirs superseded at the pin floor reclaimed (reads span generations, so the vacuum does too — untouched g0 cells survive), floor recorded so lower pins refuse LOUDLY; oracle = the pin-1 relation before AND after (the vacuum must be invisible at/above the floor) + the reclaimed-cell count in closed form"),
    Q("q191_index_versions", indexVersions, Some(indexVersionsSql),
      "versioned index manifest (snapshot isolation): g0 bulk load + g1 compaction fold in its OWN directory, tiny (gen, cell, dir) manifest committed LAST as the atomic swap — pin-0 reads are byte-identical to the pre-delta snapshot (time travel), pin-1 reads span generations via manifest resolution, every generation scan partition-pruned"),
    Q("q185_adc_serve_disk", adcServeFromDisk, Some(ivfPqResidualSql),
      "ADC serving from the COMPACTED on-disk index: probed cells' code postings read through a partition-pruned scan, broadcast probe relation + per-(query, cell) integer LUT, map-side lookup sums — byte-identical to q172's in-memory lane (shared oracle), closing train -> ingest -> persist -> compact -> serve on disk"),
    Q("q174_filtered_ann", filteredAnn, Some(filteredAnnSql),
      "metadata-filtered ANN: post-filtered IVF probes vs exact filtered truth, with a 4x probe-boost mode — the pre/post-filtering trade shipped as measured recall"),
    Q("q175_ivf_stats", ivfStats, Some(ivfStatsSql),
      "IVF index-health audit: cell-occupancy histogram incl. empty cells — the skew/hot-cell monitoring a vector-store deployment runs, and the check on the k=ceil(n/64) sizing policy"),
    Q("q199_split_serving", splitServing, Some(splitServingSql),
      "serving under the post-split centroid kit: exact re-route over unsplit centroids + seed sub-centroids, per-query probe cost + recall@10 and the Σocc² balance metric, before vs after — the rebalance priced at the serving surface"),
    Q("q198_cell_split", cellSplit, Some(cellSplitSql),
      "IVF cell split (index rebalance): top ceil(k/8) most-occupied cells split on deterministic min/max-id seed members, cosine reassignment to the nearer seed — per-cell before/after occupancies, the maintenance op q175's audit feeds"),
    Q("q176_mmr_rerank", mmrRerank, Some(mmrRerankSql),
      "MMR diversified re-ranking (lambda=0.5): 10 unrolled integer-exact greedy rounds over the exact top-30 pool — retrieval de-redundification before results reach a training batch"),
    Q("q164_ann_multilsh", simAnnMultiLsh, Some(simAnnMultiLshSql),
      "multi-table LSH ANN — the registered 100 TB ANN path: 8 tables x 5 planes (sweep-chosen), any-table collision, MAX-dedup before ranking (q163-measured nDCG ~0.5 vs ~0.05 single-table)"),
    Q("q163_rank_metrics", rankMetrics, Some(rankMetricsSql),
      "integer-exact nDCG@10/MRR for all seven serving lanes (LSH/multi-LSH/IVF/PQ-ADC/IVF-PQ/residual-IVF-PQ seed+trained) vs their exact counterparts (literal log2-discount LUT); one shared coarse routing feeds the three IVF-family systems"))
}
