package graft

import graft.expressions.NfcNormalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential proof for the graft_nfc_normalize codegen expression
  * that replaced q206's typed mapPartitions (r11 verdict "what's
  * wrong" #2): the expression must equal a DRIVER-SIDE
  * java.text.Normalizer recompute row-for-row (same library, but the
  * codegen path — UTF8String round trip, isNormalized fast path,
  * null handling — is what's under test; the independent UAX#15
  * implementation check is q206's DuckDB nfc_normalize oracle).
  * Fixtures are \u-escaped so no editor/transport can re-normalize
  * them silently.
  */
class NfcNormalizeSpec extends AnyFunSuite with SparkTestBase {

  private val decomposedE = "e\u0301"          // e + COMBINING ACUTE
  private val precomposedE = "\u00e9"         // U+00E9
  private val decomposedAring = "A\u030a"     // A + COMBINING RING
  private val reordered = "d\u0307\u0323"            // d + dot-above + dot-below (NFC reorders)
  private val multiMark = "A\u0301\u0327"            // A + acute + cedilla

  test("expression == driver-side Normalizer on edge cases and corpus") {
    import spark.implicits._
    val edge = Seq(
      "", " ", "plain ascii only",
      decomposedE, precomposedE, decomposedAring, reordered, multiMark,
      "caf" + precomposedE + " vs caf" + decomposedE,
      "\u4e2d\u6587" + decomposedE,
      decomposedE * 500)
    val rows = edge.toDF("s")
      .select(col("s"), NfcNormalize.normalize(col("s")).as("n"))
      .collect()
    rows.foreach { r =>
      val want = java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == want,
        s"mismatch for ${r.getString(0).codePoints().toArray.mkString(",")}")
    }
    // liveness: the edge set must exercise BOTH paths
    assert(rows.exists(r => r.getString(0) != r.getString(1)),
      "no row actually changed under NFC — denormalized fixtures missing")
    assert(rows.exists(r =>
      r.getString(0) == r.getString(1) && r.getString(0).nonEmpty))
    // the reordering case really reorders (not just composes)
    val wantReord = java.text.Normalizer.normalize(
      reordered, java.text.Normalizer.Form.NFC)
    assert(wantReord != reordered, "reordering fixture is inert")
    // corpus text (ASCII-heavy: the isNormalized fast path at scale)
    val docs = Tables.documents(spark, sf)
      .select(col("text"), NfcNormalize.normalize(col("text")).as("n"))
      .collect()
    docs.foreach { r =>
      assert(r.getString(1) == java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC))
    }
  }

  test("null propagates; interpreted eval equals codegen; fast path aliases") {
    import spark.implicits._
    val r = Seq(Some(decomposedE), Option.empty[String]).toDF("s")
      .select(NfcNormalize.normalize(col("s")).as("n")).collect()
    assert(r(0).getString(0) == precomposedE && r(1).isNullAt(0))
    import org.apache.spark.unsafe.types.UTF8String
    assert(NfcNormalize.nfc(
      UTF8String.fromString(decomposedE)).toString == precomposedE)
    val ascii = UTF8String.fromString("already nfc")
    assert(NfcNormalize.nfc(ascii) eq ascii,
      "fast path must return the input object")
  }

  test("q206 stays whole-stage-codegen fused — no typed mapPartitions (r11)") {
    val q = Registry.all.find(_.name == "q206_nfc_dedup").get
    val df = q.build(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("DeserializeToObject"),
      s"q206 fell back to a typed per-partition transform:\n$plan")
    // codegen spans print as "*(n)" in the plan string: the normalize
    // must sit INSIDE one (fused with the rendering + hash project)
    assert(plan.linesIterator.exists(l =>
        l.contains("graft_nfc_normalize") && l.contains("*(")),
      s"graft_nfc_normalize is not inside a WholeStageCodegen span:\n$plan")
  }
}
