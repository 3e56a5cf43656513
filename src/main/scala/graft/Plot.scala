package graft

import java.nio.file.{Files, Paths}
import java.util.Locale

/** O23 result visualization — the reference notebooks close their runs
  * with grouped bar charts of per-stage time and memory plus a scaling
  * view (main nb JSON lines 491-580; viz nb cell 10). This is the
  * offline analogue: a dependency-free SVG renderer over the repo's own
  * benchmark artifacts, run AFTER the benches (never inside them).
  *
  * Inputs (all optional, panels drop out when a file is absent):
  *  - SCALE_SMOKE.json — this engine's five stages at the reference's
  *    published 30.3 M-row scale (graft.ScaleSmoke), plus RSS;
  *  - SCALING.md — the measured sf sweep (graft.Scaling);
  *  - published engine numbers from BASELINE.md Table A (static data,
  *    cited there; hardcoded because BASELINE.md is prose).
  *
  * Chart decisions follow the repo's viz rules: small multiples with a
  * LINEAR scale per stage (log-scale bars distort length encoding and
  * grouped stages span 0.3 s..89 s — one shared axis would flatten four
  * of five panels); categorical colors assigned to ENGINES in fixed
  * order and never cycled; every bar carries a visible value label
  * (three palette slots sit below 3:1 contrast on the light surface —
  * the validator's relief rule); identity is never color-alone (row
  * labels name every engine). The scaling panel plots time-growth
  * against data-growth with the y=x linearity guide — a single series,
  * so no legend, with only outliers direct-labeled.
  *
  * Run: `sbt "runMain graft.Plot"` → BENCH_CHART.svg.
  */
object Plot {

  // categorical palette, fixed engine order (validated 2026-08:
  // adjacent-pair CVD dE >= 9.1, normal-vision >= 19.6, light surface)
  private val Surface = "#fcfcfb"
  private val InkPrimary = "#0b0b0b"
  private val InkSecondary = "#52514e"
  private val InkMuted = "#8a8984"
  private val Grid = "#e4e3df"
  private val EngineColors = Seq(
    "spark (this repo)" -> "#2a78d6",
    "Tablesaw" -> "#eb6834",
    "pandas" -> "#1baf7a",
    "Polars" -> "#eda100",
    "datatable" -> "#e87ba4")

  private val Stages = Seq("read", "write", "group", "sort", "to_np")

  // BASELINE.md Table A (Colab CPU, 30.3 M rows): seconds then MB
  private val PublishedSec = Map(
    "read" -> Seq(65.911, 15.528, 8.262, 4.719),
    "write" -> Seq(35.350, 88.642, 9.340, 11.232),
    "group" -> Seq(17.722, 0.966, 1.445, 0.691),
    "sort" -> Seq(4.419, 3.882, 3.309, 0.688),
    "to_np" -> Seq(7.568, 0.808, 1.153, 3.067))
  private val PublishedMb = Map(
    "read" -> Seq(3202.0, 2332.4, 2938.4, 4160.2),
    "write" -> Seq(2398.0, 2332.4, 2938.4, 4139.2),
    "group" -> Seq(733.0, 2352.2, 2938.8, 4254.7),
    "sort" -> Seq(1500.0, 4692.8, 4865.1, 4370.3),
    "to_np" -> Seq(2667.0, 6773.2, 7086.5, 6201.2))

  /** Pull `"k":v` numeric pairs out of one named JSON object in a line
    * of OUR OWN emitted JSON (flat, no nesting inside the object).
    */
  private def jsonObj(line: String, key: String): Map[String, Double] = {
    val obj = s""""$key":\\{([^}]*)\\}""".r
    obj.findFirstMatchIn(line).map { m =>
      val kv = """"([^"]+)":(-?[0-9.]+)""".r
      kv.findAllMatchIn(m.group(1)).map(p => p.group(1) -> p.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
  }

  private def readFile(p: String): Option[String] =
    if (Files.exists(Paths.get(p)))
      Some(new String(Files.readAllBytes(Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8))
    else None

  private def num(v: Double, p: Int = 2): String =
    String.format(Locale.ROOT, s"%.${p}f", Double.box(v))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  final case class ScaleRow(query: String, table: String,
                            dataX: Double, timeX: Double)

  private def parseScaling(md: String): Seq[ScaleRow] =
    md.linesIterator.collect {
      // data rows only — the header also starts with "| q" (query)
      case l if l.matches("^\\| q\\d+.*") =>
        val c = l.split("\\|").map(_.trim)
        // | query | what | table | sf0.001 | sf0.01 | sf0.1 | data x | time x |
        ScaleRow(c(1), c(3), c(7).toDouble, c(8).toDouble)
    }.toSeq

  def main(args: Array[String]): Unit = {
    val smoke = readFile("SCALE_SMOKE.json")
    val sparkSec = smoke.map(jsonObj(_, "queries")).getOrElse(Map.empty)
    val sparkRss = smoke.map(jsonObj(_, "rss_mb")).getOrElse(Map.empty)
    val scaling = readFile("SCALING.md").map(parseScaling).getOrElse(Seq.empty)

    val W = 960
    val sb = new StringBuilder
    var y = 0

    def text(x: Int, yy: Int, s: String, size: Int, fill: String,
             anchor: String = "start", weight: String = "normal"): Unit =
      sb.append(s"""<text x="$x" y="$yy" font-size="$size" fill="$fill" """ +
        s"""text-anchor="$anchor" font-weight="$weight">${esc(s)}</text>\n""")

    def barPanels(title: String, unit: String, perStage: Map[String, Seq[Double]],
                  valueFmt: Double => String): Unit = {
      text(24, y + 20, title, 15, InkPrimary, weight = "600")
      // legend row: swatch + engine name in text ink
      var lx = 24
      val ly = y + 40
      EngineColors.foreach { case (name, color) =>
        sb.append(s"""<rect x="$lx" y="${ly - 9}" width="10" height="10" rx="2" fill="$color"/>\n""")
        text(lx + 15, ly, name, 11, InkSecondary)
        lx += 15 + name.length * 6 + 22
      }
      y += 52
      val rowGutter = 92 // engine names beside panel 1's rows: identity
      val panelW = 150; val gap = 16; val left = 24 + rowGutter // is never color-alone
      val barH = 12; val barGap = 2; val labelH = 16
      val panelH = labelH + EngineColors.size * (barH + barGap) + 8
      EngineColors.zipWithIndex.foreach { case ((name, _), j) =>
        val by = y + labelH + j * (barH + barGap)
        text(left - 6, by + barH - 2, name.takeWhile(_ != ' '), 10, InkSecondary,
          anchor = "end")
      }
      Stages.zipWithIndex.foreach { case (stage, i) =>
        val px = left + i * (panelW + gap)
        val vals = perStage.getOrElse(stage, Nil)
        if (vals.size == EngineColors.size) {
          val vmax = vals.max
          text(px, y + 12, stage, 12, InkPrimary, weight = "600")
          sb.append(s"""<line x1="$px" y1="${y + labelH}" x2="$px" y2="${y + panelH - 6}" stroke="$Grid" stroke-width="1"/>\n""")
          vals.zipWithIndex.foreach { case (v, j) =>
            val by = y + labelH + j * (barH + barGap)
            val bw = math.max(2.0, v / vmax * (panelW - 52))
            sb.append(s"""<rect x="$px" y="$by" width="${num(bw, 1)}" height="$barH" rx="2" fill="${EngineColors(j)._2}"/>\n""")
            // relief rule: visible value label on every bar
            text(px + bw.toInt + 4, by + barH - 2, valueFmt(v), 10, InkSecondary)
          }
        }
      }
      y += panelH + 10
      text(24, y, s"unit: $unit - linear scale per stage panel (ranges differ); engine order fixed", 10, InkMuted)
      y += 24
    }

    // ---------- header ----------
    y = 36
    sb.append("") // header text appended after size known; placeholder
    text(24, y, "graft engine vs published reference engines", 19, InkPrimary, weight = "700")
    y += 20
    text(24, y, "30,300,000-row x 9-col diabetes CSV workload - BASELINE.md Table A " +
      "(published Colab CPU medians) vs graft.ScaleSmoke on this host", 11, InkSecondary)
    y += 18

    // ---------- panel 1: time ----------
    if (Stages.forall(sparkSec.contains)) {
      val perStage = Stages.map(s => s -> (sparkSec(s) +: PublishedSec(s))).toMap
      barPanels("Execution time per stage", "seconds, median of reps",
        perStage, v => num(v, if (v >= 10) 1 else 2))
    } else {
      text(24, y + 14, "SCALE_SMOKE.json missing - run `sbt \"runMain graft.ScaleSmoke\"` for the time/memory panels", 12, InkSecondary)
      y += 34
    }

    // ---------- panel 2: memory ----------
    if (Stages.forall(sparkRss.contains) && sparkRss.values.forall(_ > 0)) {
      val perStage = Stages.map(s => s -> (sparkRss(s) +: PublishedMb(s))).toMap
      barPanels("Process memory after stage (RSS)", "MB RSS (whole process)",
        perStage, v => num(v, 0))
    }

    // ---------- panel 3: scaling ----------
    if (scaling.nonEmpty) {
      text(24, y + 16, "Does time growth track data growth? (sf0.01 -> sf0.1)", 15,
        InkPrimary, weight = "600")
      y += 28
      val px = 70; val pw = 560; val ph = 190
      val xmax = math.max(12.0, scaling.map(_.dataX).max * 1.15)
      val ymax = math.max(12.0, scaling.map(_.timeX).max * 1.3)
      def sx(v: Double) = px + v / xmax * pw
      def sy(v: Double) = y + ph - v / ymax * ph
      // recessive grid + axes
      Seq(0.0, xmax / 2, xmax).foreach { v =>
        sb.append(s"""<line x1="${num(sx(v), 1)}" y1="$y" x2="${num(sx(v), 1)}" y2="${y + ph}" stroke="$Grid" stroke-width="1"/>\n""")
        text(sx(v).toInt, y + ph + 14, num(v, 0) + "x", 10, InkMuted, anchor = "middle")
      }
      Seq(0.0, ymax / 2, ymax).foreach { v =>
        sb.append(s"""<line x1="$px" y1="${num(sy(v), 1)}" x2="${px + pw}" y2="${num(sy(v), 1)}" stroke="$Grid" stroke-width="1"/>\n""")
        text(px - 8, sy(v).toInt + 3, num(v, 0) + "x", 10, InkMuted, anchor = "end")
      }
      // y = x linearity guide
      val gmax = math.min(xmax, ymax)
      sb.append(s"""<line x1="${num(sx(0), 1)}" y1="${num(sy(0), 1)}" x2="${num(sx(gmax), 1)}" y2="${num(sy(gmax), 1)}" stroke="$InkMuted" stroke-width="1" stroke-dasharray="5 4"/>\n""")
      text(sx(gmax).toInt - 4, sy(gmax).toInt - 6, "linear (time x = data x)", 10, InkMuted, anchor = "end")
      // single series: one color, >=8px markers, outliers direct-labeled
      // (labels sharing coordinates are stacked 11px apart, not overdrawn)
      scaling.foreach { r =>
        sb.append(s"""<circle cx="${num(sx(r.dataX), 1)}" cy="${num(sy(r.timeX), 1)}" r="4" fill="#2a78d6" stroke="$Surface" stroke-width="2"/>\n""")
      }
      val outliers = scaling.filter(r => r.timeX > r.dataX * 0.32 && r.dataX >= 10)
        .sortBy(_.timeX)
      var lastLabelY = Double.MaxValue
      outliers.foreach { r =>
        var lyy = sy(r.timeX) + 4
        if (lastLabelY - lyy < 11) lyy = lastLabelY - 11
        lastLabelY = lyy
        text(sx(r.dataX).toInt - 8, lyy.toInt, r.query, 10, InkSecondary, anchor = "end")
      }
      text(px + pw / 2, y + ph + 30, "data growth of the query's driving table", 11,
        InkSecondary, anchor = "middle")
      sb.append(s"""<text x="${px - 44}" y="${y + ph / 2}" font-size="11" fill="$InkSecondary" text-anchor="middle" transform="rotate(-90 ${px - 44} ${y + ph / 2})">time growth</text>\n""")
      y += ph + 44
      text(24, y, s"${scaling.size} representative queries (graft.Scaling, best of 2); points at/below the dashed guide scale linearly or better", 10, InkMuted)
      y += 26
    }

    // ---------- summary table ----------
    if (Stages.forall(sparkSec.contains)) {
      text(24, y + 14, "Summary - this engine vs best & worst published per stage (time)", 13,
        InkPrimary, weight = "600")
      y += 24
      val cols = Seq(("stage", 24), ("spark s", 120), ("best published s", 210),
        ("vs best", 360), ("worst published s", 450), ("vs worst", 620))
      cols.foreach { case (h, x) => text(x, y + 12, h, 11, InkSecondary, weight = "600") }
      y += 18
      Stages.foreach { s =>
        val v = sparkSec(s); val pub = PublishedSec(s)
        val best = pub.min; val worst = pub.max
        text(24, y + 12, s, 11, InkPrimary)
        text(120, y + 12, num(v), 11, InkPrimary)
        text(210, y + 12, num(best), 11, InkSecondary)
        text(360, y + 12, num(v / best, 2) + "x", 11, InkPrimary)
        text(450, y + 12, num(worst), 11, InkSecondary)
        text(620, y + 12, num(v / worst, 2) + "x", 11, InkPrimary)
        y += 16
      }
      y += 10
    }

    val H = y + 16
    val svg = new StringBuilder
    svg.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H" font-family="system-ui, -apple-system, 'Segoe UI', sans-serif">\n""")
    svg.append(s"""<rect width="$W" height="$H" fill="$Surface"/>\n""")
    svg.append(sb)
    svg.append("</svg>\n")
    Files.write(Paths.get("BENCH_CHART.svg"),
      svg.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote BENCH_CHART.svg (${H}px tall; panels: " +
      s"time=${Stages.forall(sparkSec.contains)} mem=${sparkRss.nonEmpty} " +
      s"scaling=${scaling.nonEmpty})")
  }
}
