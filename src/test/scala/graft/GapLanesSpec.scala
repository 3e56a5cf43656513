package graft

import org.scalatest.funsuite.AnyFunSuite

/** BenchIsolated's auto-gap sweep (r15 verdict #5: the hand-picked
  * isolation set missed every one of the round's outliers — the set
  * must grow from the artifacts' own disagreement, not by hand).
  */
class GapLanesSpec extends AnyFunSuite {

  private val detail =
    """{"metric":"total","value":9.0,"unit":"sec",
      |"queries":{"q01_scan_agg":0.30,"q74_pagerank":1.29,"q152_dsir":1.21},
      |"median_sec":{"q01_scan_agg":0.31,"q74_pagerank":1.38,"q152_dsir":1.21},
      |"rep_sec":{"q01_scan_agg":[0.31,0.30,0.32],
      |"q74_pagerank":[4.06,1.71,1.38,1.29,1.35],
      |"q152_dsir":[1.25,1.21,1.22]},
      |"mem_mb":{},"sf":"/root/testdata/sf0.1"}""".stripMargin.replace("\n", "")

  test("intra-run spike: a rep >2x its run's median flags the lane") {
    val got = BenchIsolated.gapLanesFrom(Some(detail), None)
    assert(got.map(_._1) == Seq("q74_pagerank"),
      s"expected only the spiked lane, got $got")
    assert(got.head._2.contains("intra-run spike"))
  }

  test("driver/idle gap: short-key driver tail vs detail medians, either direction") {
    val driver = """{"tail":"...\"q152\":12.49,\"q01\":0.30,"}"""
    val got = BenchIsolated.gapLanesFrom(Some(detail), Some(driver))
    assert(got.map(_._1).contains("q152_dsir"),
      s"driver 12.49 vs idle 1.21 must flag, got $got")
    assert(!got.map(_._1).contains("q01_scan_agg"),
      "agreeing lane must not flag")
  }

  test("sub-floor lanes never flag (scheduler noise is not a finding)") {
    val tiny =
      """{"median_sec":{"q05_filter":0.08},
        |"rep_sec":{"q05_filter":[0.40,0.08,0.07]}}""".stripMargin.replace("\n", "")
    assert(BenchIsolated.gapLanesFrom(Some(tiny), None).isEmpty)
  }

  test("absent artifacts yield an empty sweep, not an error") {
    assert(BenchIsolated.gapLanesFrom(None, None).isEmpty)
  }

  test("the sweep is self-consistent on the committed round artifact") {
    // the committed artifact's CONTENT legitimately changes every
    // round (an idle capture may carry no spikes at all), so this
    // pins the sweep's invariants, not specific lane names: it must
    // parse without error, and every lane it returns must genuinely
    // exceed the threshold in the artifact's own rep array
    val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
    assume(java.nio.file.Files.exists(p))
    val txt = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val got = BenchIsolated.gapLanesFrom(Some(txt), None)
    val reps = """"(q\d+[a-z0-9_]*)":\[([0-9.,\s]+)\]""".r
      .findAllMatchIn(""""rep_sec":\{(.*?)\}""".r
        .findFirstMatchIn(txt).map(_.group(1)).getOrElse(""))
      .map(m => m.group(1) ->
        m.group(2).split(",").map(_.trim.toDouble).toSeq).toMap
    got.foreach { case (name, why) =>
      val r = reps.getOrElse(name, Seq.empty)
      assert(r.nonEmpty, s"sweep returned $name absent from rep_sec")
      val med = r.sorted.apply(r.size / 2)
      assert(r.max > BenchIsolated.GapFloorSec &&
        r.max / med > BenchIsolated.GapRatio,
        s"sweep flagged $name ($why) but its reps $r do not qualify")
    }
  }
}
