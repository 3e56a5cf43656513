package graft

import org.scalatest.funsuite.AnyFunSuite

/** Context-window chunking (q135): the stride-overlapped windows must
  * obey the chunk-count law 1 + ceil(max(0, n−W)/S) and carry
  * fingerprints that match a driver-side recomputation of the joined
  * chunk text — content parity, not just shape parity (the same
  * differential style as ClassifierSpec/Bm25Spec).
  */
class ChunkWindowsSpec extends AnyFunSuite with SparkTestBase {

  private val W = 64
  private val S = 48

  test("chunks match a driver-side recomputation (count law, lengths, fingerprints)") {
    val rows = ops.TextOps.chunkWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val mdig = java.security.MessageDigest.getInstance("MD5")
    def h60(sv: String): Long = {
      val hex = mdig.digest(sv.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val id = r.getLong(0)
        val toks = r.getString(1).split(" ").toSeq
        val n = toks.length
        val nChunks = 1 + math.ceil(math.max(0, n - W).toDouble / S).toInt
        (0 until nChunks).map { i =>
          val chunk = toks.slice(i * S, i * S + W)
          (id, i.toLong, chunk.length.toLong, h60(chunk.mkString(" ")))
        }
      }.sortBy(t => (t._1, t._2))

    assert(rows.length == expected.length)
    assert(rows.toSeq == expected.toSeq)
    // the corpus must actually exercise both regimes: multi-chunk docs
    // (n > W) and single-chunk short docs
    val perDoc = rows.groupBy(_._1).map(_._2.length)
    assert(perDoc.exists(_ > 1) && perDoc.exists(_ == 1), "degenerate corpus")
    // trailing windows are short but never empty
    assert(rows.forall(_._3 > 0L))
  }
}
