package graft.ops

import graft.{Q, Tables}
import graft.functions.Stable._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core parity operators — SURVEY.md §2 O1–O16.
  *
  * The reference exercises: CSV scan/write, prefix limit, asc/desc sort,
  * numeric filter, group-by mean, group-by first, matrix export, schema
  * probe, lazy fused pipeline, synthetic generation and amplification
  * (reference call sites: main.rs:85-163, datatable_benchmark.py:30-54,
  * Benchmark1.java:31-78, notebook harness cells). Here each becomes a
  * declarative DataFrame chain — Catalyst provides pushdown, pruning and
  * whole-stage codegen; no hand-scheduling.
  *
  * Determinism rules (DuckDB oracle hash-match, SURVEY §5):
  *  - every query ends in a total ORDER BY (unique tiebreakers);
  *  - double aggregation goes through Stable.dsum/dmean (decimal-exact);
  *  - no bare first(): per-group first is row_number over explicit order.
  */
object CoreOps {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  // ---- O3+O8+O9+O15+O6: flagship scan→filter→group→agg→sort ----
  def scanAgg(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_quantity") > 25)
      .groupBy(col("l_returnflag"))
      .agg(dmean(col("l_extendedprice")).as("avg_price"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val scanAggSql =
    s"""SELECT l_returnflag, ${dmeanSql("l_extendedprice")} AS avg_price,
       | COUNT(*) AS n
       |FROM lineitem WHERE l_quantity > 25
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- O4: prefix limit (deterministic: explicit total order) ----
  def limitPrefix(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
      .limit(100)

  private val limitPrefixSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin

  // ---- O6/O7: full sorts (range-partitioned, spill-safe at scale) ----
  def sortAsc(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
               col("l_linenumber").asc)

  private val sortAscSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC""".stripMargin

  def sortDesc(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
               col("l_linenumber").asc)

  private val sortDescSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC""".stripMargin

  // ---- O8: numeric θ-filter (pushed into the parquet scan) ----
  def filterGt(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  private val filterGtSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- O9: group-by + mean (partial+final HashAggregate) ----
  def groupMean(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(dmean(col("l_quantity")).as("qty_mean"),
           dmean(col("l_extendedprice")).as("price_mean"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  private val groupMeanSql =
    s"""SELECT l_returnflag, l_linestatus,
       | ${dmeanSql("l_quantity")} AS qty_mean,
       | ${dmeanSql("l_extendedprice")} AS price_mean,
       | COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- O10: deterministic per-group first (min_by over the explicit
  //      order key; Spark's bare first() is shuffle-order-dependent).
  //      min_by aggregates map-side (partial+final), unlike the
  //      window-row_number formulation which shuffles every row into
  //      as many partitions as there are groups — with 3 group values
  //      that is 3 tasks doing all the work at any scale. ----
  def groupFirst(s: SparkSession, d: String): DataFrame = {
    val payload = struct(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"),
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("shipdate_s"))
    li(s, d)
      .groupBy("l_returnflag")
      .agg(min_by(payload, struct(col("l_orderkey"), col("l_linenumber"))).as("r"))
      .select(col("l_returnflag"), col("r.l_orderkey"), col("r.l_linenumber"),
              col("r.l_quantity"), col("r.l_extendedprice"), col("r.shipdate_s"))
      .orderBy("l_returnflag")
  }

  private val groupFirstSql =
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
      | l_extendedprice, strftime(l_shipdate, '%Y-%m-%d') AS shipdate_s
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY l_returnflag
      |         ORDER BY l_orderkey, l_linenumber) AS rn
      |      FROM lineitem)
      |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  // ---- O11: matrix export ("to_np"): row → dense double vector.
  //      Non-numeric cells become NULL (reference uses NaN,
  //      Benchmark1.java:65-75; NULL here because NaN is not
  //      hash-stable across engines — see GraftMatrixSpec for the
  //      NaN-semantics variant). ----
  private val liNumeric = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val liAll = liNumeric ++ Seq("l_returnflag", "l_linestatus", "l_shipdate")

  def toMatrix(s: SparkSession, d: String): DataFrame = {
    val cells: Seq[Column] = liAll.map { c =>
      if (liNumeric.contains(c)) col(c).cast("double")
      else lit(null).cast("double")
    }
    li(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), array(cells: _*).as("vec"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // Registry/oracle variant: the matrix flattened to long format
  // (row key, cell index, cell value) — the verify harness hashes rows
  // through pandas, which cannot sort/factorize an array cell, so the
  // oracle-facing query exposes only scalar columns. The dense-array
  // export above stays the engine op (Bench stage_to_np measures it).
  def toMatrixLong(s: SparkSession, d: String): DataFrame =
    toMatrix(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
              posexplode(col("vec")).as(Seq("cell_idx", "cell")))
      .orderBy("l_orderkey", "l_linenumber", "cell_idx")

  private val toMatrixLongSql = {
    val arms = liAll.zipWithIndex.map { case (c, i) =>
      val v = if (liNumeric.contains(c)) s"CAST($c AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"SELECT l_orderkey, l_linenumber, $i AS cell_idx, $v AS cell FROM lineitem"
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM ($arms)
       |ORDER BY l_orderkey, l_linenumber, cell_idx""".stripMargin
  }

  // ---- O14: fused lazy pipeline mirroring main.rs:143-152
  //      (scan→sort→filter→group→agg). The pre-aggregation sort is
  //      semantically dead and Catalyst eliminates it — exactly the
  //      rewrite Polars' describe_optimized_plan shows. ----
  def lazyPipeline(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .orderBy(col("l_extendedprice"))                // eliminated by optimizer
      .filter(col("l_extendedprice") > 500)
      .groupBy(col("l_returnflag"))
      .agg(dmean(col("l_orderkey")).as("id_mean"),
           dmean(col("l_extendedprice")).as("value_mean"))
      .orderBy("l_returnflag")

  private val lazyPipelineSql =
    s"""SELECT l_returnflag, ${dmeanSql("l_orderkey")} AS id_mean,
       | ${dmeanSql("l_extendedprice")} AS value_mean
       |FROM lineitem WHERE l_extendedprice > 500
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- O12/O13: row/column count + schema probe ----
  def countSchema(s: SparkSession, d: String): DataFrame = {
    val t = li(s, d)
    val firstNumeric = t.schema.fields
      .find(_.dataType.isInstanceOf[NumericType]).map(_.name).getOrElse("")
    t.agg(count(lit(1)).as("n_rows"))
      .withColumn("n_cols", lit(t.schema.length))
      .withColumn("first_numeric_col", lit(firstNumeric))
  }

  private val countSchemaSql =
    """SELECT COUNT(*) AS n_rows, 11 AS n_cols,
      | 'l_orderkey' AS first_numeric_col FROM lineitem""".stripMargin

  // ---- O1: synthetic generation (FIXTURES A2 schema; seeded rand) —
  //      distributional assertions only, Spark's rand stream is
  //      engine-specific (SURVEY §7.5). ----
  def datagen(s: SparkSession, d: String): DataFrame = {
    val n = 100000L
    val df = s.range(n).select(
      col("id"),
      concat(lit("cat_"), (rand(42) * 10).cast("int")).as("category"),
      (randn(43) * 20 + 100).as("value1"),
      (rand(44) * 1000).as("value2"))
    // countDistinct is kept OUT of the main aggregate: mixing it with
    // plain aggs triggers Catalyst's Expand rewrite (every input row
    // duplicated per distinct group — the 20-60x trap AdvancedOps.sketches
    // documents). Two single-pass aggregates + a 1x1 cross join instead.
    val plain = df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("value2") < 0 || col("value2") >= 1000, 1L).otherwise(0L)).as("oob"),
      min(col("id")).as("id_min"),
      max(col("id")).as("id_max"))
    val ncat = df.select(col("category")).distinct()
      .agg(count(lit(1)).as("n_cat"))
    plain.crossJoin(broadcast(ncat))
      .select("n_rows", "n_cat", "oob", "id_min", "id_max")
  }

  private val datagenSql =
    """SELECT CAST(100000 AS BIGINT) AS n_rows, CAST(10 AS BIGINT) AS n_cat,
      | CAST(0 AS BIGINT) AS oob, CAST(0 AS BIGINT) AS id_min,
      | CAST(99999 AS BIGINT) AS id_max""".stripMargin

  // ---- O2: dataset amplification (row repetition via cross join,
  //      the distributed analogue of index.repeat) ----
  def amplify(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d)
      .crossJoin(broadcast(s.range(1000)))
      .groupBy("r_name")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("r_name")

  private val amplifySql =
    """SELECT r_name, COUNT(*) AS cnt
      |FROM region CROSS JOIN range(1000)
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ---- O3+O5: CSV write + schema'd CSV read roundtrip, verified by
  //      aggregating the roundtripped data against the parquet oracle ----
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_${math.abs(d.hashCode)}"
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
                   "l_extendedprice", "l_returnflag")
    li(s, d).select(cols.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType)))
    s.read.option("header", "true").schema(schema).csv(tmp)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           dsum(col("l_quantity")).as("sum_qty"),
           dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  private val csvRoundtripSql =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       | ${dsumSql("l_quantity")} AS sum_qty,
       | ${dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- O3 variant: schema-INFERRED CSV read on the fast path
  //      (graft.sources.CsvIngest — sampled single-file inference
  //      instead of Spark's full extra pass; the polars
  //      infer_schema_length contract). The oracle proves the inferred
  //      types load the same values the parquet truth holds. ----
  def csvInferFast(s: SparkSession, d: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csvi_${math.abs(d.hashCode)}"
    // content-aware reuse: the marker records the SOURCE parquet's
    // size+mtime, so a driver-side testdata regeneration invalidates
    // the fixture instead of silently feeding stale rows to the oracle
    val marker = java.nio.file.Paths.get(tmp, "_FIXTURE_OK")
    if (!graft.Fixtures.markerCurrent(marker, s"$d/lineitem.parquet")) {
      li(s, d).select("l_orderkey", "l_linenumber", "l_quantity",
                      "l_extendedprice", "l_shipdate", "l_returnflag")
        .write.mode("overwrite").option("header", "true").csv(tmp)
      graft.Fixtures.writeMarker(marker, s"$d/lineitem.parquet")
    }
    graft.sources.CsvIngest.readInferFast(s, tmp)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           dsum(col("l_quantity")).as("sum_qty"),
           dsum(col("l_extendedprice")).as("sum_price"),
           max(col("l_orderkey")).cast("long").as("max_key"),
           date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"))
      .orderBy("l_returnflag")
  }

  private val csvInferFastSql =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       | ${dsumSql("l_quantity")} AS sum_qty,
       | ${dsumSql("l_extendedprice")} AS sum_price,
       | MAX(l_orderkey) AS max_key,
       | strftime(MAX(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS max_ship
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q194: JSONL ingest with NESTED metadata — the interchange
  //      format LLM corpora actually ship in (one object per line,
  //      metadata as a nested struct), read through JsonIngest's
  //      sampled single-file inference (q125's contract, but the
  //      inferred schema is a TREE: meta lands as a StructType and
  //      the aggregate addresses it by dot path — flattening at
  //      inference would break the lane). The fixture is the
  //      documents table re-shaped to {doc_id, meta:{lang, source,
  //      n_chars}, text} and written as real multi-file JSONL, so
  //      inference genuinely sees one file of many; the oracle
  //      derives the same per-source rollup from the parquet — green
  //      proves JSON write → sampled-infer → nested read → dot-path
  //      aggregation round-trips every field exactly. ----
  /** Stage (idempotently) the q194 JSONL fixture and return the
    * DECODED document relation — the composite pipeline lane (q214)
    * starts from this, so its ingest stage is the real q194 read path
    * while the oracle starts from the parquet source of truth.
    */
  private[graft] def jsonlDocs(s: SparkSession, d: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_${math.abs(d.hashCode)}"
    val marker = java.nio.file.Paths.get(tmp, "_FIXTURE_OK")
    if (!graft.Fixtures.markerCurrent(marker, s"$d/documents.parquet")) {
      Tables.documents(s, d)
        .select(col("doc_id"),
                struct(col("lang"), col("source"), col("n_chars")).as("meta"),
                col("text"))
        .repartition(4) // real multi-file JSONL — inference sees 1 of 4
        .write.mode("overwrite").json(tmp)
      graft.Fixtures.writeMarker(marker, s"$d/documents.parquet")
    }
    graft.sources.JsonIngest.readInferFast(s, tmp)
  }

  def jsonlIngest(s: SparkSession, d: String): DataFrame = {
    jsonlDocs(s, d)
      .groupBy(col("meta.source").as("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("doc_id")).as("sum_id"),
           sum(col("meta.n_chars")).as("sum_chars"),
           sum(length(col("text"))).as("sum_len"),
           countDistinct(col("meta.lang")).as("n_langs"))
      .orderBy("source")
  }

  private val jsonlIngestSql =
    s"""SELECT source, COUNT(*) AS n_docs,
       | CAST(SUM(doc_id) AS BIGINT) AS sum_id,
       | CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       | CAST(SUM(length(text)) AS BIGINT) AS sum_len,
       | COUNT(DISTINCT lang) AS n_langs
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---- q196: gzip-compressed text ingestion with an OWN DEFLATE
  //      decoder (GzipIngest) — the fixture is a parquet binary column
  //      of genuine gzip members (JDK Deflater bitstreams at levels
  //      cycling 0/1/6/9, so stored, fixed- and dynamic-Huffman blocks
  //      all occur; own RFC 1952 framing with an FNAME header field
  //      exercising the variable-length walk). The read path inflates
  //      every member with graft.sources.GzipIngest.gunzipMember —
  //      own bit reader, canonical Huffman, LZ77 window copy, CRC32 +
  //      ISIZE trailer verification — then proves EXACT byte recovery
  //      via per-doc md5 against the uncompressed source of truth.
  //      Same partition-batched opaque-binary shape as the media
  //      lanes: at 100 TB each executor inflates its own shard, no
  //      driver involvement, no shuffle before the final sort. ----
  final case class GzDoc(doc_id: Long, lvl: Int, text: String)

  def gzipIngest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_gz_${math.abs(d.hashCode)}"
    val marker = java.nio.file.Paths.get(tmp, "_STAGED")
    val srcs = Seq(s"$d/documents.parquet", "gz-fixture-v1:levels0169+fname")
    if (!graft.Fixtures.markerCurrent(marker, srcs: _*)) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(tmp))
      // distributed ENCODE stage: executors compress each document with
      // the JDK Deflater at the doc's cycling level, own gzip framing
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val lvl = graft.sources.GzipIngest.levelFor(id)
          (id, lvl, graft.sources.GzipIngest.gzip(
            text.getBytes("UTF-8"), lvl, s"doc_$id.txt"))
        })
        .toDF("doc_id", "lvl", "gz")
        .write.mode("overwrite").parquet(tmp)
      graft.Fixtures.writeMarker(marker, srcs: _*)
    }
    s.read.parquet(tmp)
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, lvl, gz) =>
        val (raw, _) = graft.sources.GzipIngest.gunzipMember(gz)
        GzDoc(id, lvl, new String(raw, "UTF-8"))
      })
      .toDF()
      .select(col("doc_id"), col("lvl"),
        length(col("text")).cast("long").as("raw_len"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  private val gzipIngestSql =
    """SELECT doc_id,
      | CAST(CASE WHEN doc_id % 4 = 0 THEN 0 WHEN doc_id % 4 = 1 THEN 1
      |           WHEN doc_id % 4 = 2 THEN 6 ELSE 9 END AS INTEGER) AS lvl,
      | CAST(length(text) AS BIGINT) AS raw_len,
      | md5(text) AS text_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- q200: WARC web-archive ingestion — the crawl-shard format
  //      LLM corpora are actually distributed in, end to end on own
  //      decoders: each fixture row is a genuine shard of CONCATENATED
  //      per-record gzip members (one WARC response record per member,
  //      the seekable layout real archives use; deflate levels cycle so
  //      all three block types occur), and the read path walks the
  //      members with GzipIngest.gunzipMembers (own DEFLATE, per-member
  //      CRC verify) then parses each record with WarcIngest
  //      .parseRecord (WARC header walk, Content-Length-driven slicing,
  //      HTTP envelope strip). Exact payload recovery proven per-doc
  //      via md5 against the uncompressed source; shard/position
  //      assignment is deterministic (doc_id % 16, ordered by doc_id)
  //      so the oracle reproduces it with arithmetic + a row_number.
  //      Scale shape: shard building is the standard bin-pack (bounded
  //      groups, one aggregate exchange); reading is partition-batched
  //      map-only work per shard — no shuffle before the final sort.
  //      ----
  final case class WarcDoc(doc_id: Long, shard: Long, pos_in_shard: Long,
                           text: String)

  def warcIngest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_warc_${math.abs(d.hashCode)}"
    val marker = java.nio.file.Paths.get(tmp, "_STAGED")
    val srcs = Seq(s"$d/documents.parquet", "warc-fixture-v1:16shards+gzip-members")
    if (!graft.Fixtures.markerCurrent(marker, srcs: _*)) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(tmp))
      // bin-pack into shards: bounded groups (n/16 docs each), records
      // ordered by doc_id inside the shard, one gzip member per record
      Tables.documents(s, d)
        .groupBy((col("doc_id") % graft.sources.WarcIngest.NShards).as("shard"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
          .as("docs"))
        .as[(Long, Seq[(Long, String)])]
        .mapPartitions(_.map { case (sh, docs) =>
          (sh, graft.sources.WarcIngest.shard(docs))
        })
        .toDF("shard", "warc")
        .write.mode("overwrite").parquet(tmp)
      graft.Fixtures.writeMarker(marker, srcs: _*)
    }
    s.read.parquet(tmp)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (sh, bytes) =>
        graft.sources.GzipIngest.gunzipMembers(bytes).iterator
          .zipWithIndex.map { case ((raw, _), i) =>
            val rec = graft.sources.WarcIngest.parseRecord(raw)
            WarcDoc(graft.sources.WarcIngest.docIdOf(rec), sh, i + 1L,
              new String(rec.payload, "UTF-8"))
          }
      })
      .toDF()
      .select(col("doc_id"), col("shard"), col("pos_in_shard"),
        length(col("text")).cast("long").as("raw_len"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Shared oracle for the sharded-archive ingest lanes (q200 WARC,
    * q208 tgz): both assign shard = doc_id % WarcIngest.NShards and
    * position = doc_id rank within the shard, so one SQL — interpolating
    * the SAME constant both lane bodies use — covers both and cannot
    * desynchronize from either (r11 ADVICE).
    */
  private val shardedDocsSql =
    s"""SELECT doc_id,
       | CAST(doc_id % ${graft.sources.WarcIngest.NShards} AS BIGINT) AS shard,
       | CAST(row_number() OVER (PARTITION BY doc_id % ${graft.sources.WarcIngest.NShards}
       |   ORDER BY doc_id) AS BIGINT) AS pos_in_shard,
       | CAST(length(text) AS BIGINT) AS raw_len,
       | md5(text) AS text_md5
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- q207: gzip SINK — the write half q196 left to the JDK: each
  //      document compresses through the OWN DEFLATE encoder (greedy
  //      LZ77 hash chains, fixed-Huffman emission — GzipIngest
  //      .deflateFixed) inside own gzip framing (gzipOwn: own CRC-32 +
  //      ISIZE trailer), then the own reader decodes it back and
  //      proves exact byte recovery per doc via md5 vs the
  //      uncompressed source. The round trip alone would be
  //      self-consistent, so the INDEPENDENT check lives in
  //      GzipSinkSpec: the JDK's GZIPInputStream (a decoder we do not
  //      control) must accept every own-encoded member byte-for-byte,
  //      and the encoder must genuinely compress (matches, not just
  //      literal coding). comp_len is in the output — it is a pure
  //      function of the deterministic encoder, but DuckDB cannot run
  //      the encoder, so the oracle checks the content columns and the
  //      ratio claims live in the spec. Same map-only scale shape as
  //      q196. ----
  def gzipSink(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_gzsink_${math.abs(d.hashCode)}"
    val marker = java.nio.file.Paths.get(tmp, "_STAGED")
    val srcs = Seq(s"$d/documents.parquet", "gzsink-fixture-v1:own-fixed-huffman")
    if (!graft.Fixtures.markerCurrent(marker, srcs: _*)) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(tmp))
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          (id, graft.sources.GzipIngest.gzipOwn(
            text.getBytes("UTF-8"), s"doc_$id.txt"))
        })
        .toDF("doc_id", "gz")
        .write.mode("overwrite").parquet(tmp)
      graft.Fixtures.writeMarker(marker, srcs: _*)
    }
    s.read.parquet(tmp)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, gz) =>
        val (raw, _) = graft.sources.GzipIngest.gunzipMember(gz)
        GzDoc(id, gz.length, new String(raw, "UTF-8"))
      })
      .toDF()
      .select(col("doc_id"),
        length(col("text")).cast("long").as("raw_len"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  private val gzipSinkSql =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS raw_len,
      | md5(text) AS text_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- q208: `.tgz` ARCHIVE shards, own code BOTH directions — the
  //      third archive discipline (q196 gzip members, q200 WARC
  //      records, now POSIX ustar): docs bin-pack into tar archives
  //      (own writer — 512-byte blocks, octal sizes, spaces-substituted
  //      header checksum, two-zero-block terminator), each archive
  //      compresses through the OWN q207 encoder, and the read path
  //      runs own gunzip -> own tar walk (checksum verified per entry)
  //      -> per-file documents. The JDK has no tar codec; TarSpec pins
  //      golden archive bytes longhand, proves the checksum fires on
  //      corruption, and — where the binary exists — has GNU tar itself
  //      list and extract an own-written archive (a decoder we do not
  //      control). Oracle = exact per-doc content via md5, shard/pos
  //      via arithmetic + row_number (the q200 discipline). ----
  def tgzArchive(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_tgz_${math.abs(d.hashCode)}"
    val marker = java.nio.file.Paths.get(tmp, "_STAGED")
    val srcs = Seq(s"$d/documents.parquet", "tgz-fixture-v1:ustar+own-gzip")
    if (!graft.Fixtures.markerCurrent(marker, srcs: _*)) {
      graft.Fixtures.clearDir(java.nio.file.Paths.get(tmp))
      Tables.documents(s, d)
        // same shard-count constant as q200 (and as shardedDocsSql) so
        // engine and oracle can never desynchronize (r11 ADVICE)
        .groupBy((col("doc_id") % graft.sources.WarcIngest.NShards)
          .as("shard"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
          .as("docs"))
        .as[(Long, Seq[(Long, String)])]
        .mapPartitions(_.map { case (sh, ds) =>
          val tar = graft.sources.TarIngest.archive(
            ds.map { case (id, t) => (s"doc_$id.txt", t.getBytes("UTF-8")) })
          (sh, graft.sources.GzipIngest.gzipOwn(tar, s"shard_$sh.tar"))
        })
        .toDF("shard", "tgz")
        .write.mode("overwrite").parquet(tmp)
      graft.Fixtures.writeMarker(marker, srcs: _*)
    }
    s.read.parquet(tmp)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (sh, tgz) =>
        val (tar, _) = graft.sources.GzipIngest.gunzipMember(tgz)
        graft.sources.TarIngest.parse(tar).iterator.zipWithIndex.map {
          case ((name, content), i) =>
            val id = name.stripPrefix("doc_").stripSuffix(".txt").toLong
            WarcDoc(id, sh, i + 1L, new String(content, "UTF-8"))
        }
      })
      .toDF()
      .select(col("doc_id"), col("shard"), col("pos_in_shard"),
        length(col("text")).cast("long").as("raw_len"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  // ---- q136: multi-file CSV file-order prefix (CsvIngest.readPrefix)
  //      with the cap landing MID-FILE — the oracle proves the
  //      boundary-file path takes exactly the FIRST remaining rows of
  //      the boundary file, not an arbitrary subset (the r6 ADVICE
  //      gap: Dataset.limit carries no order contract over file
  //      splits). Fixture: three single-file CSVs part-b0 < part-b1 <
  //      part-b2 (name order = read order), each the l_orderkey%3
  //      bucket sorted by (l_orderkey, l_linenumber), so "file-order
  //      prefix" is reconstructible in pure SQL as bucket offset +
  //      within-bucket row_number. The cap n = |b0| + |b1|/2 is
  //      derived from the data identically in both engines and lands
  //      mid-way through the second file by construction. ----
  private def csvPrefixFixture(s: SparkSession, d: String): String = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csvp_${math.abs(d.hashCode)}"
    val dir = new java.io.File(tmp)
    // content-aware reuse (see csvInferFast): rebuilt when the source
    // parquet's size+mtime fingerprint changes
    val marker = java.nio.file.Paths.get(tmp, "_FIXTURE_READY")
    if (!graft.Fixtures.markerCurrent(marker, s"$d/lineitem.parquet")) {
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmrf)
        f.delete(); ()
      }
      if (dir.exists()) rmrf(dir)
      dir.mkdirs()
      (0 until 3).foreach { b =>
        val stage = s"$tmp/_stage_b$b"
        li(s, d).filter(expr(s"l_orderkey % 3 = $b"))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .repartition(1)
          .sortWithinPartitions("l_orderkey", "l_linenumber")
          .write.mode("overwrite").option("header", "true").csv(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv")).head
        require(part.renameTo(new java.io.File(dir, s"part-b$b.csv")),
          s"fixture rename failed for bucket $b")
        rmrf(new java.io.File(stage))
      }
      graft.Fixtures.writeMarker(marker, s"$d/lineitem.parquet")
    }
    tmp
  }

  def csvPrefix(s: SparkSession, d: String): DataFrame = {
    val tmp = csvPrefixFixture(s, d)
    val sizes = li(s, d).groupBy(expr("CAST(l_orderkey % 3 AS BIGINT)").as("b"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = sizes(0L) + sizes(1L) / 2
    graft.sources.CsvIngest.readPrefix(s, tmp, n)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
           dsum(col("l_quantity")).as("sum_qty"),
           sum(col("l_orderkey")).cast("long").as("key_checksum"))
      .orderBy("l_returnflag")
  }

  private val csvPrefixSql =
    s"""WITH t AS (SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
       |             l_orderkey % 3 AS b FROM lineitem),
       |sz AS (SELECT b, COUNT(*) AS c FROM t GROUP BY b),
       |cap AS (SELECT (SELECT c FROM sz WHERE b = 0)
       |          + (SELECT c FROM sz WHERE b = 1) // 2 AS n),
       |r AS (SELECT t.*,
       |        CASE WHEN b = 0 THEN 0
       |             WHEN b = 1 THEN (SELECT c FROM sz WHERE b = 0)
       |             ELSE (SELECT c FROM sz WHERE b = 0)
       |                    + (SELECT c FROM sz WHERE b = 1) END
       |          + row_number() OVER (PARTITION BY b
       |              ORDER BY l_orderkey, l_linenumber) AS pos
       |      FROM t)
       |SELECT l_returnflag, COUNT(*) AS n_rows,
       | ${dsumSql("l_quantity")} AS sum_qty,
       | CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum
       |FROM r, cap WHERE pos <= n
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- O24: CSV read straight off a URL (graft.sources.UrlIngest —
  //      driver-side stream-to-spool, then the normal distributed CSV
  //      lane). The sandbox has zero egress, so the registry entry
  //      exercises the identical code path over a file:// URL; https
  //      differs only in the socket. ----
  def urlCsvRead(s: SparkSession, d: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_urlcsv_${math.abs(d.hashCode)}"
    // content-aware reuse (see csvInferFast)
    val marker = java.nio.file.Paths.get(tmp, "_FIXTURE_OK")
    if (!graft.Fixtures.markerCurrent(marker, s"$d/lineitem.parquet")) {
      li(s, d).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .coalesce(1) // the reference's O24 fetches ONE csv file
        .write.mode("overwrite").option("header", "true").csv(tmp)
      graft.Fixtures.writeMarker(marker, s"$d/lineitem.parquet")
    }
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv")).head
    graft.sources.UrlIngest.readCsvFromUrl(s, part.toURI.toString)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           dsum(col("l_quantity")).as("sum_qty"),
           min(col("l_orderkey")).cast("long").as("min_key"),
           max(col("l_orderkey")).cast("long").as("max_key"))
      .orderBy("l_returnflag")
  }

  private val urlCsvReadSql =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       | ${dsumSql("l_quantity")} AS sum_qty,
       | MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- O3/O5 variant: ORC source/sink roundtrip (columnar alternative
  //      to parquet; same push-down/pruning story, verified by
  //      aggregating the roundtripped data against the parquet oracle) ----
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_${math.abs(d.hashCode)}"
    li(s, d).select("l_orderkey", "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_linestatus")
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .filter(col("l_quantity") > 30) // pushed into the ORC scan
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"),
           dsum(col("l_quantity")).as("sum_qty"),
           dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_linestatus")
  }

  private val orcRoundtripSql =
    s"""SELECT l_linestatus, COUNT(*) AS n,
       | ${dsumSql("l_quantity")} AS sum_qty,
       | ${dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem WHERE l_quantity > 30
       |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ---- corrupt-tolerant ingest: PERMISSIVE JSON read with a corrupt-
  //      record column. Raw landing zones at 100 TB always contain
  //      malformed lines; the pipeline must quarantine them as data
  //      (count, inspect, reprocess) rather than fail the job or drop
  //      them silently. Corruption here is injected deterministically
  //      (every 100th doc id) so the oracle can reproduce the exact
  //      good/bad partition from the clean table. ----
  def corruptTolerantRead(s: SparkSession, d: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_badjson_${math.abs(d.hashCode)}"
    Tables.documents(s, d)
      .select(when(col("doc_id") % 100 === 0, concat(lit("{corrupt!! "), col("doc_id")))
        .otherwise(to_json(struct(col("doc_id"), col("lang")))).as("value"))
      .write.mode("overwrite").text(tmp)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("_bad", StringType)))
    s.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema(schema)
      .json(tmp)
      .groupBy(coalesce(col("lang"), lit("<corrupt>")).as("category"))
      .agg(count(lit(1)).as("n"), count(col("_bad")).as("n_bad"))
      .orderBy("category")
  }

  private val corruptTolerantReadSql =
    """SELECT CASE WHEN doc_id % 100 = 0 THEN '<corrupt>' ELSE lang END AS category,
      | COUNT(*) AS n,
      | CAST(SUM(CASE WHEN doc_id % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
      |FROM documents GROUP BY 1 ORDER BY category""".stripMargin

  // ---- schema evolution: mergeSchema over partitioned parquet written
  //      by two writer generations (v2 added a column). The production
  //      reality of long-lived 100 TB datasets: readers must span
  //      writer versions; partition discovery turns the directory
  //      layout into a `v` column and missing columns read as NULL. ----
  def schemaMerge(s: SparkSession, d: String): DataFrame = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_schevo_${math.abs(d.hashCode)}"
    val base = li(s, d)
    base.filter(col("l_linenumber") === 1)
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/v=1")
    base.filter(col("l_linenumber") === 2)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$tmp/v=2")
    s.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy("v")
      .agg(count(lit(1)).as("n"),
           dsum(col("l_quantity")).as("sum_qty"),
           count(col("l_extendedprice")).as("n_price"))
      .orderBy("v")
  }

  private val schemaMergeSql =
    s"""SELECT v, COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty,
       | COUNT(l_extendedprice) AS n_price
       |FROM (SELECT 1 AS v, l_quantity, CAST(NULL AS DOUBLE) AS l_extendedprice
       |      FROM lineitem WHERE l_linenumber = 1
       |      UNION ALL
       |      SELECT 2 AS v, l_quantity, l_extendedprice
       |      FROM lineitem WHERE l_linenumber = 2)
       |GROUP BY v ORDER BY v""".stripMargin

  // ---- top-k: orderBy+limit → TakeOrderedAndProject (no full sort) ----
  def topK(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
               col("l_linenumber").asc)
      .limit(50)

  private val topKSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 50""".stripMargin

  // ---- distinct (shuffle dedup) ----
  def distinctPairs(s: SparkSession, d: String): DataFrame =
    li(s, d).select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  private val distinctPairsSql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- set ops: UNION / INTERSECT / EXCEPT (distinct semantics) ----
  def setOps(s: SparkSession, d: String): DataFrame = {
    val hi = li(s, d).filter(col("l_quantity") > 45).select("l_orderkey").distinct()
    val disc = li(s, d).filter(col("l_discount") > 0.08).select("l_orderkey").distinct()
    val u = hi.union(disc).distinct().agg(count(lit(1)).as("n")).withColumn("op", lit("union"))
    val i = hi.intersect(disc).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
    val e = hi.except(disc).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
    u.unionByName(i).unionByName(e).select("op", "n").orderBy("op")
  }

  private val setOpsSql =
    """WITH hi AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity > 45),
      |     disc AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_discount > 0.08)
      |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM hi UNION SELECT * FROM disc)
      |UNION ALL
      |SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM hi INTERSECT SELECT * FROM disc)
      |UNION ALL
      |SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM hi EXCEPT SELECT * FROM disc)
      |ORDER BY op""".stripMargin

  // ---- describe-like numeric stats, exact (Stable.dvar) ----
  def stats(s: SparkSession, d: String): DataFrame = {
    val measures = Seq("l_quantity", "l_extendedprice", "l_discount")
    val rows = measures.map { m =>
      li(s, d).agg(
        count(col(m)).as("n"), dmean(col(m)).as("mean"), dvar(col(m)).as("var"),
        min(col(m)).as("min"), max(col(m)).as("max"))
        .withColumn("col_name", lit(m))
    }
    rows.reduce(_ unionByName _)
      .select("col_name", "n", "mean", "var", "min", "max")
      .orderBy("col_name")
  }

  private val statsSql = {
    val one = (m: String) =>
      s"""SELECT '$m' AS col_name, COUNT($m) AS n, ${dmeanSql(m)} AS mean,
         | ${dvarSql(m)} AS "var", MIN($m) AS min, MAX($m) AS max
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---- exact percentiles per group: value at rank ceil(q·n) under a
  //      total order — the deterministic, engine-agnostic definition
  //      (percentile_disc upper variant). Computed from per-(group,
  //      value) COUNTS, not a per-row window: a window partitioned by
  //      l_returnflag has 3 effective streams, so 3 tasks would sort
  //      and rank the whole fact table no matter the cluster size (the
  //      q07 trap this file documents). The value at a global rank
  //      only depends on how many rows sit at or below each VALUE, so
  //      the hash-agg count (map-side combined — the only full-data
  //      shuffle carries ≤ groups × distinct-values rows) feeds a
  //      cumulative window over the tiny count table. r5 rewrite:
  //      same output, 2.5× faster at sf0.1, and the 100 TB plan no
  //      longer has a 3-task sort stage. ----
  def percentiles(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("l_returnflag")
    li(s, d)
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy("l_returnflag")
      .agg(max(col("n")).as("n"),
           min(when(col("cum") >= ceil(col("n") * 0.5), col("l_quantity"))).as("p50"),
           min(when(col("cum") >= ceil(col("n") * 0.9), col("l_quantity"))).as("p90"),
           min(when(col("cum") >= ceil(col("n") * 0.99), col("l_quantity"))).as("p99"))
      .orderBy("l_returnflag")
  }

  private val percentilesSql =
    """SELECT l_returnflag, MAX(n) AS n,
      | MAX(CASE WHEN rn = ceil(n * 0.5) THEN l_quantity END) AS p50,
      | MAX(CASE WHEN rn = ceil(n * 0.9) THEN l_quantity END) AS p90,
      | MAX(CASE WHEN rn = ceil(n * 0.99) THEN l_quantity END) AS p99
      |FROM (SELECT l_returnflag, l_quantity,
      |        row_number() OVER (PARTITION BY l_returnflag
      |          ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
      |        COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |      FROM lineitem)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q67_percentiles", percentiles, Some(percentilesSql),
      "exact per-group percentiles (rank selection under total order)"),
    Q("q01_scan_agg", scanAgg, Some(scanAggSql),
      "flagship scan→filter→group→mean→sort (main.rs:143-152 shape)"),
    Q("q02_limit_prefix", limitPrefix, Some(limitPrefixSql), "O4 prefix limit"),
    Q("q03_sort_asc", sortAsc, Some(sortAscSql), "O6 full ascending sort"),
    Q("q04_sort_desc", sortDesc, Some(sortDescSql), "O7 descending sort"),
    Q("q05_filter_gt", filterGt, Some(filterGtSql), "O8 numeric filter"),
    Q("q06_group_mean", groupMean, Some(groupMeanSql), "O9 group-by mean"),
    Q("q07_group_first", groupFirst, Some(groupFirstSql), "O10 deterministic per-group first"),
    Q("q08_matrix", toMatrixLong, Some(toMatrixLongSql),
      "O11 matrix export (long-format for the oracle; dense array in stage_to_np)"),
    Q("q09_lazy_pipeline", lazyPipeline, Some(lazyPipelineSql), "O14 fused lazy pipeline"),
    Q("q10_count_schema", countSchema, Some(countSchemaSql), "O12/O13 counts + schema probe"),
    Q("q11_datagen", datagen, Some(datagenSql), "O1 seeded synthetic generation"),
    Q("q12_amplify", amplify, Some(amplifySql), "O2 row amplification"),
    Q("q13_csv_roundtrip", csvRoundtrip, Some(csvRoundtripSql), "O3/O5 CSV write+read"),
    Q("q125_csv_infer", csvInferFast, Some(csvInferFastSql),
      "O3 schema-inferred CSV read via sampled single-file inference (CsvIngest)"),
    Q("q194_jsonl_ingest", jsonlIngest, Some(jsonlIngestSql),
      "JSONL ingest with nested metadata: sampled single-file schema inference preserving the struct tree (JsonIngest), dot-path rollup — the LLM-corpus interchange format as a first-class source"),
    Q("q200_warc_ingest", warcIngest, Some(shardedDocsSql),
      "WARC crawl-shard ingestion: concatenated per-record gzip members walked by the own DEFLATE decoder, WARC header walk + Content-Length slicing + HTTP envelope strip — exact payload recovery proven per-doc via md5"),
    Q("q208_tgz_archive", tgzArchive, Some(shardedDocsSql),
      "`.tgz` corpus shards with own code both directions: own POSIX-ustar writer + own q207 gzip encoder on the write side, own gunzip + checksum-verified tar walk on the read side — exact per-doc recovery; GNU tar itself validates own archives in the spec"),
    Q("q207_gzip_sink", gzipSink, Some(gzipSinkSql),
      "gzip SINK via the own DEFLATE encoder (greedy LZ77 hash chains, fixed-Huffman emission, own framing + CRC-32) — exact byte recovery proven per-doc; GZIPInputStream independently accepts every own-encoded member (spec)"),
    Q("q196_gzip_ingest", gzipIngest, Some(gzipIngestSql),
      "gzip corpus ingestion decoded by an OWN full DEFLATE implementation (stored/fixed/dynamic blocks, LZ77 window, CRC32+ISIZE verify) — exact byte recovery proven per-doc via md5 vs the uncompressed source"),
    Q("q130_url_csv", urlCsvRead, Some(urlCsvReadSql),
      "O24 URL CSV fetch: stream-to-spool + distributed parse (file:// in-sandbox)"),
    Q("q136_csv_prefix", csvPrefix, Some(csvPrefixSql),
      "O4 multi-file CSV file-order prefix with a mid-file cap (readPrefix boundary path)"),
    Q("q60_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql),
      "ORC sink+source roundtrip with scan-pushed filter"),
    Q("q71_corrupt_read", corruptTolerantRead, Some(corruptTolerantReadSql),
      "PERMISSIVE JSON ingest: malformed lines quarantined as data"),
    Q("q76_schema_merge", schemaMerge, Some(schemaMergeSql),
      "mergeSchema across writer generations + partition discovery"),
    Q("q14_topk", topK, Some(topKSql), "orderBy+limit → TakeOrderedAndProject"),
    Q("q15_distinct", distinctPairs, Some(distinctPairsSql), "distinct"),
    Q("q16_set_ops", setOps, Some(setOpsSql), "union/intersect/except"),
    Q("q17_stats", stats, Some(statsSql), "exact describe-like stats"))
}
