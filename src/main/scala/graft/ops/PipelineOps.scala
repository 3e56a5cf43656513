package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.HashFns._
import graft.{Q, Tables}

/** q214: the END-TO-END curation pipeline composite (r12 verdict #6).
  *
  * Every gate below exists as its own green lane — ingest (q194),
  * quality (q30), language-ID (q31), PII redaction (q61), near-dup
  * downweighting (q34's MinHash pairs + q146's weight discipline),
  * benchmark decontamination (q81), mixture reweighting (q139),
  * sequence packing (q72) and the dataset card (q181) — but separate
  * lanes never prove the gates COMPOSE: does the dedup weight survive
  * the mix reweight? does the pack respect the PII quarantine? does a
  * doc the quality gate dropped stay out of the contamination scan?
  * This lane chains them into one relation and emits a per-source
  * dataset card whose every column is a composition witness, checked
  * end-to-end by one DuckDB oracle:
  *
  *   ingest (the real q194 JSONL read path; the oracle starts from the
  *     parquet source of truth the fixture was staged from)
  *   -> g1 QUALITY: composite score (q30's exact formula) >= 0.35
  *   -> g2 LANG-ID: marker-prediction (q31's formula) != 'und'
  *   -> g3 PII: redact entities+emails (q61's rewrite); quarantine
  *        docs with >= PiiQuarantineAt matches — survivors carry the
  *        REDACTED text downstream (the pipeline trains on what the
  *        redaction left, so dedup fingerprints see it too)
  *   -> g4 NEAR-DUP DOWNWEIGHT: q34's banded MinHash pairs (est_j >=
  *        0.5) over the surviving redacted texts; each doc's group key
  *        is least(own id, min paired partner) — a SINGLE-HOP
  *        neighborhood key (one content exchange; full transitive
  *        closure is q58's lane) — and every member carries q146's
  *        weight floor(1e6 / group size)
  *   -> g5 DECONTAMINATE: benchmark = ORIGINAL text 8-grams of
  *        doc_id < BenchHoldout (the eval set as published — redaction
  *        placeholders must not HIDE real overlap, so the corpus side
  *        scans original text too); bench ids leave the training set
  *        here, and any survivor sharing a gram is dropped. Weights
  *        assigned at g4 are NOT re-normalized after these drops — a
  *        real pipeline's choice, and exactly the kind of cross-gate
  *        interaction the one-oracle check exists to pin
  *   -> g6 MIX REWEIGHT (q139's sqrt-temperature discipline) over the
  *        WEIGHTED token mass sum(n_tok * w_e6) — the dedup weights
  *        surviving into the mixture is the composition under test
  *   -> g7 PACK (q72's greedy per-source bins) over final survivors
  *        only — the pack respecting every upstream quarantine
  *   -> g8 DATASET CARD: one row per INGESTED source (sources gated to
  *        zero stay visible with zeroed columns), with per-gate drop
  *        counts, the kept-set doc_id checksum (proves identical SETS,
  *        not just counts), weighted mass, mixture allocation and pack
  *        bins.
  *
  * Scale shape: one corpus exchange for the MinHash bands (q34's),
  * one broadcast anti-join for the contamination drop (bench grams are
  * metadata-scale), map-side-combined per-source aggregates, and the
  * per-source pack window — no all-pairs, no corpus-side cross join.
  */
object PipelineOps {

  private[ops] val QualityMin = 0.35
  private[ops] val PiiQuarantineAt = 11
  private[ops] val BenchHoldout = 20L
  private[ops] val DecontamGram = 8
  private[ops] val PackBudget = 4096L
  private[ops] val MixBudgetTok = 1000000000L

  /** The surviving per-doc relation after every gate, with per-stage
    * flags — the spec surface (the registered lane aggregates it).
    * Returns (per-doc audit relation, handles to unpersist).
    */
  private[graft] def pipelineDocs(s: SparkSession, d: String)
      : (DataFrame, Seq[DataFrame]) = {
    val d0 = CoreOps.jsonlDocs(s, d)
      .select(col("doc_id"), col("meta.source").as("source"), col("text"))
      .repartition(col("doc_id"))
    val toks = tokens(col("text"))
    val g1 = d0.withColumn("score", TextOps.scoreCol(toks))
    val g1k = g1.filter(col("score") >= QualityMin)
    val g2k = g1k.filter(TextOps.predCol(toks) =!= "und")
    val g3 = g2k.withColumn("n_red",
        (regexp_count(col("text"), lit(TextOps.EmailRe))
          + regexp_count(col("text"), lit(TextOps.EntityRe))).cast("long"))
      .withColumn("rtext",
        regexp_replace(regexp_replace(col("text"), TextOps.EntityRe, "[ENTITY]"),
          TextOps.EmailRe, "[EMAIL]"))
    val g3k = g3.filter(col("n_red") < PiiQuarantineAt)
      .select(col("doc_id"), col("source"), col("text"), col("rtext"))
      .persist()
    // g4: q34's banded MinHash pairs over the REDACTED survivors
    val sh = g3k
      .select(col("doc_id"), tokens(col("rtext")).as("rtoks"))
      .filter(size(col("rtoks")) >= 3)
      .select(col("doc_id"), hashedShingles(shingles(col("rtoks"), 3)).as("sh"))
      .select(col("doc_id"),
        graft.expressions.MinHashSig.minhashSig(col("sh")).as("sig"))
      .persist()
    val bandCols = array((0 until MinhashBands).map(b => bandKey(col("sig"), b)): _*)
    val banded = sh.select(col("doc_id"), posexplode(bandCols).as(Seq("band", "key")))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), _ + _)
    val nd = pairs
      .join(sh.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
      .join(sh.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
      .filter(matches.cast("double") / lit(MinhashK.toDouble) >= 0.5)
      .select("a", "b")
    val pmin = nd.select(col("a").as("doc_id"), col("b").as("p"))
      .unionByName(nd.select(col("b").as("doc_id"), col("a").as("p")))
      .groupBy("doc_id").agg(min(col("p")).as("pm"))
    val wG = Window.partitionBy("gkey")
    val g4w = g3k.join(pmin, Seq("doc_id"), "left")
      .withColumn("gkey", least(col("doc_id"), coalesce(col("pm"), col("doc_id"))))
      .withColumn("w_e6", floor(lit(1000000L) / count(lit(1)).over(wG)).cast("long"))
      .drop("pm")
    // g5: benchmark grams from the ORIGINAL corpus text (pre-gate)
    val bench = d0.filter(col("doc_id") < BenchHoldout)
      .select(tokens(col("text")).as("btoks"))
      .filter(size(col("btoks")) >= DecontamGram)
      .select(explode(hashedShingles(shingles(col("btoks"), DecontamGram))).as("g"))
      .distinct()
    val contam = g4w.filter(col("doc_id") >= BenchHoldout)
      .select(col("doc_id"), tokens(col("text")).as("ctoks"))
      .filter(size(col("ctoks")) >= DecontamGram)
      .select(col("doc_id"),
        explode(hashedShingles(shingles(col("ctoks"), DecontamGram))).as("g"))
      .join(broadcast(bench), "g")
      .select("doc_id").distinct()
    val audited = g4w
      .withColumn("is_bench", col("doc_id") < BenchHoldout)
      .join(contam.withColumn("is_contam", lit(true)), Seq("doc_id"), "left")
      .withColumn("is_contam", coalesce(col("is_contam"), lit(false)))
      .withColumn("n_tok", size(tokens(col("rtext"))).cast("long"))
    (audited, Seq(g3k, sh))
  }

  def pipelineComposite(s: SparkSession, d: String): DataFrame = {
    val d0 = CoreOps.jsonlDocs(s, d)
      .select(col("doc_id"), col("meta.source").as("source"), col("text"))
      .repartition(col("doc_id"))
      .persist()
    val toks = tokens(col("text"))
    val scored = d0.withColumn("score", TextOps.scoreCol(toks)).persist()
    val ing = d0.groupBy("source").agg(count(lit(1)).as("n_ingested"))
    val s1 = scored.filter(col("score") < QualityMin)
      .groupBy("source").agg(count(lit(1)).as("n1"))
    val s2 = scored.filter(col("score") >= QualityMin)
      .filter(TextOps.predCol(toks) === "und")
      .groupBy("source").agg(count(lit(1)).as("n2"))
    val s3 = scored.filter(col("score") >= QualityMin)
      .filter(TextOps.predCol(toks) =!= "und")
      .filter((regexp_count(col("text"), lit(TextOps.EmailRe))
        + regexp_count(col("text"), lit(TextOps.EntityRe))) >= PiiQuarantineAt)
      .groupBy("source").agg(count(lit(1)).as("n3"))
    val (audited0, handles) = pipelineDocs(s, d)
    val audited = audited0.persist()
    val s4 = audited.filter(col("w_e6") < 1000000L)
      .groupBy("source").agg(count(lit(1)).as("n4"))
    val s5b = audited.filter(col("is_bench"))
      .groupBy("source").agg(count(lit(1)).as("n5b"))
    val s5c = audited.filter(!col("is_bench") && col("is_contam"))
      .groupBy("source").agg(count(lit(1)).as("n5c"))
    val fin0 = audited.filter(!col("is_bench") && !col("is_contam")).persist()
    val fin = fin0.groupBy("source")
      .agg(count(lit(1)).as("n_final"),
           sum(col("doc_id")).as("kept_checksum"),
           sum(col("n_tok") * col("w_e6")).as("eff_tok_e6"))
      .withColumn("wq",
        floor(sqrt(col("eff_tok_e6").cast("double") / 1000000.0) * 1000000.0)
          .cast("long"))
    val wP = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pb = fin0
      .withColumn("running", sum(col("n_tok")).over(wP))
      .withColumn("bin", expr(s"(running - n_tok) div $PackBudget"))
      .groupBy("source")
      .agg((max(col("bin")) + 1L).as("n_bins"), sum(col("n_tok")).as("pack_tok"))
    val tot = fin.agg(sum(col("wq")).as("wq_tot"))
    val result = ing
      .join(s1, Seq("source"), "left").join(s2, Seq("source"), "left")
      .join(s3, Seq("source"), "left").join(s4, Seq("source"), "left")
      .join(s5b, Seq("source"), "left").join(s5c, Seq("source"), "left")
      .join(fin, Seq("source"), "left").join(pb, Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_ingested"),
        coalesce(col("n1"), lit(0L)).as("n_quality_dropped"),
        coalesce(col("n2"), lit(0L)).as("n_lang_dropped"),
        coalesce(col("n3"), lit(0L)).as("n_pii_quarantined"),
        coalesce(col("n4"), lit(0L)).as("n_dup_downweighted"),
        coalesce(col("n5b"), lit(0L)).as("n_bench_excluded"),
        coalesce(col("n5c"), lit(0L)).as("n_contam_dropped"),
        coalesce(col("n_final"), lit(0L)).as("n_final"),
        coalesce(col("kept_checksum"), lit(0L)).as("kept_checksum"),
        coalesce(col("eff_tok_e6"), lit(0L)).as("eff_tok_e6"),
        round(coalesce(col("wq"), lit(0L)).cast("double") / col("wq_tot"), 6)
          .as("mix_weight"),
        floor(lit(MixBudgetTok.toDouble) * coalesce(col("wq"), lit(0L))
          / col("wq_tot")).cast("long").as("alloc_tok"),
        coalesce(col("n_bins"), lit(0L)).as("n_bins"),
        coalesce(col("pack_tok"), lit(0L)).as("pack_tok"))
      .orderBy("source")
      .localCheckpoint(true)
    (handles :+ audited :+ fin0 :+ d0 :+ scored).foreach(_.unpersist(false))
    result
  }

  private[graft] val pipelineCompositeSql: String = {
    val t = "string_split(text, ' ')"
    val rt = "string_split(rtext, ' ')"
    val bands = (0 until MinhashBands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeySql("sig", b)} AS key FROM sigs")
      .mkString("\n UNION ALL ")
    s"""WITH d0 AS (SELECT doc_id, source, text FROM documents),
       |g1 AS (SELECT *, ${TextOps.scoreSql(t)} AS score FROM d0),
       |g1k AS (SELECT * FROM g1 WHERE score >= $QualityMin),
       |g2k AS (SELECT * FROM g1k WHERE ${TextOps.predSql(t)} <> 'und'),
       |g3 AS (SELECT *,
       |   (len(regexp_extract_all(text, '${TextOps.EmailRe}'))
       |    + len(regexp_extract_all(text, '${TextOps.EntityRe}'))) AS n_red,
       |   regexp_replace(regexp_replace(text, '${TextOps.EntityRe}', '[ENTITY]', 'g'),
       |     '${TextOps.EmailRe}', '[EMAIL]', 'g') AS rtext
       |  FROM g2k),
       |g3k AS (SELECT doc_id, source, text, rtext FROM g3
       |        WHERE n_red < $PiiQuarantineAt),
       |sh AS (SELECT doc_id, ${hashedShinglesSql(shinglesSql("rtoks", 3))} AS sh
       |       FROM (SELECT doc_id, $rt AS rtoks FROM g3k)
       |       WHERE len(rtoks) >= 3),
       |sigs AS (SELECT doc_id, ${minhashSigFromHashesSql("sh")} AS sig FROM sh),
       |banded AS ($bands),
       |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |          FROM banded x JOIN banded y
       |            ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |nd AS (SELECT a, b FROM pairs
       |       JOIN sigs sx ON sx.doc_id = pairs.a
       |       JOIN sigs sy ON sy.doc_id = pairs.b
       |       WHERE CAST(list_sum(list_transform(range(1, ${MinhashK + 1}),
       |         i -> CASE WHEN sx.sig[i] = sy.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |         / ${MinhashK.toDouble} >= 0.5),
       |pmin AS (SELECT doc_id, MIN(p) AS pm FROM
       |          (SELECT a AS doc_id, b AS p FROM nd
       |           UNION ALL SELECT b, a FROM nd) GROUP BY doc_id),
       |g4 AS (SELECT g3k.*, least(g3k.doc_id, COALESCE(pmin.pm, g3k.doc_id)) AS gkey
       |       FROM g3k LEFT JOIN pmin ON pmin.doc_id = g3k.doc_id),
       |g4w AS (SELECT *, CAST(1000000 // (COUNT(*) OVER (PARTITION BY gkey))
       |          AS BIGINT) AS w_e6 FROM g4),
       |bench AS (SELECT DISTINCT g FROM
       |           (SELECT unnest(${hashedShinglesSql(shinglesSql("btoks", DecontamGram))}) AS g
       |            FROM (SELECT $t AS btoks FROM d0 WHERE doc_id < $BenchHoldout)
       |            WHERE len(btoks) >= $DecontamGram)),
       |contam AS (SELECT DISTINCT doc_id FROM
       |            (SELECT doc_id,
       |               unnest(${hashedShinglesSql(shinglesSql("ctoks", DecontamGram))}) AS g
       |             FROM (SELECT doc_id, $t AS ctoks FROM g4w
       |                   WHERE doc_id >= $BenchHoldout)
       |             WHERE len(ctoks) >= $DecontamGram) gg
       |           JOIN bench USING (g)),
       |g5k AS (SELECT * FROM g4w WHERE doc_id >= $BenchHoldout
       |        AND doc_id NOT IN (SELECT doc_id FROM contam)),
       |ing AS (SELECT source, COUNT(*) AS n_ingested FROM d0 GROUP BY source),
       |s1 AS (SELECT source, COUNT(*) AS n1 FROM g1 WHERE score < $QualityMin
       |       GROUP BY source),
       |s2 AS (SELECT source, COUNT(*) AS n2 FROM g1k
       |       WHERE ${TextOps.predSql(t)} = 'und' GROUP BY source),
       |s3 AS (SELECT source, COUNT(*) AS n3 FROM g3 WHERE n_red >= $PiiQuarantineAt
       |       GROUP BY source),
       |s4 AS (SELECT source, COUNT(*) AS n4 FROM g4w WHERE w_e6 < 1000000
       |       GROUP BY source),
       |s5b AS (SELECT source, COUNT(*) AS n5b FROM g4w WHERE doc_id < $BenchHoldout
       |        GROUP BY source),
       |s5c AS (SELECT g4w.source, COUNT(*) AS n5c FROM g4w JOIN contam USING (doc_id)
       |        WHERE g4w.doc_id >= $BenchHoldout GROUP BY g4w.source),
       |fin AS (SELECT source, COUNT(*) AS n_final,
       |          CAST(SUM(doc_id) AS BIGINT) AS kept_checksum,
       |          CAST(SUM(CAST(len($rt) AS BIGINT) * w_e6) AS BIGINT) AS eff_tok_e6
       |        FROM g5k GROUP BY source),
       |w AS (SELECT *, CAST(floor(sqrt(CAST(eff_tok_e6 AS DOUBLE) / 1000000.0)
       |        * 1000000.0) AS BIGINT) AS wq FROM fin),
       |tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS wq_tot FROM w),
       |pk AS (SELECT source, doc_id, CAST(len($rt) AS BIGINT) AS n_tok FROM g5k),
       |pr AS (SELECT source, n_tok, SUM(n_tok) OVER (PARTITION BY source
       |         ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS running FROM pk),
       |pb AS (SELECT source, CAST(MAX((running - n_tok) // $PackBudget) + 1 AS BIGINT)
       |          AS n_bins,
       |        CAST(SUM(n_tok) AS BIGINT) AS pack_tok FROM pr GROUP BY source)
       |SELECT ing.source, ing.n_ingested,
       |  COALESCE(s1.n1, 0) AS n_quality_dropped,
       |  COALESCE(s2.n2, 0) AS n_lang_dropped,
       |  COALESCE(s3.n3, 0) AS n_pii_quarantined,
       |  COALESCE(s4.n4, 0) AS n_dup_downweighted,
       |  COALESCE(s5b.n5b, 0) AS n_bench_excluded,
       |  COALESCE(s5c.n5c, 0) AS n_contam_dropped,
       |  COALESCE(fin.n_final, 0) AS n_final,
       |  COALESCE(fin.kept_checksum, 0) AS kept_checksum,
       |  COALESCE(fin.eff_tok_e6, 0) AS eff_tok_e6,
       |  round(CAST(COALESCE(w.wq, 0) AS DOUBLE) / tot.wq_tot, 6) AS mix_weight,
       |  CAST(floor($MixBudgetTok.0 * COALESCE(w.wq, 0) / tot.wq_tot) AS BIGINT)
       |    AS alloc_tok,
       |  COALESCE(pb.n_bins, 0) AS n_bins,
       |  COALESCE(pb.pack_tok, 0) AS pack_tok
       |FROM ing
       |LEFT JOIN s1 USING (source) LEFT JOIN s2 USING (source)
       |LEFT JOIN s3 USING (source) LEFT JOIN s4 USING (source)
       |LEFT JOIN s5b USING (source) LEFT JOIN s5c USING (source)
       |LEFT JOIN fin USING (source) LEFT JOIN w USING (source)
       |LEFT JOIN pb USING (source)
       |CROSS JOIN tot
       |ORDER BY ing.source""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q214_pipeline_composite", pipelineComposite, Some(pipelineCompositeSql),
      "END-TO-END curation composite: real JSONL ingest -> quality gate -> lang-ID gate -> PII redact+quarantine -> MinHash near-dup downweighting (on the REDACTED text) -> benchmark holdout + decontamination (on ORIGINAL text) -> sqrt-temperature mix over the WEIGHTED token mass -> per-source packing -> dataset card; one oracle proves the gates compose (weights survive the mix, the pack respects every quarantine)"))
}
