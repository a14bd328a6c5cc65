package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Presentation-layer renderers over report result DataFrames — the
  * reference's report output surface (report/report.go:78 SetHeaders /
  * :81 AddRow RowsText+RowsHTML, report/listmatches.go:19
  * ListReporterHeaders, report/report.go:217 MetadataTable). The DATA side
  * of every report is a catalog query (q_geo_intersections et al.) or
  * `Sinks.writeMatchListCsv`; these render a bounded page of rows for
  * human output — text table, HTML table, and the sorted key/value
  * metadata table.
  *
  * Rendering is presentation, not computation: cell FORMATTING runs
  * distributed (one projection; null-safe casts), and only the bounded
  * page (`limit`) is collected — a report page, not a table scan.
  */
object Render {

  /** Header style of listmatches.go:19: column names uppercased. */
  def headers(df: DataFrame): Seq[String] = df.columns.toSeq.map(_.toUpperCase)

  private def stringCells(df: DataFrame, limit: Int): (Seq[String], Seq[Seq[String]]) = {
    val cols = df.columns.toSeq
    val formatted = df.select(cols.map(c =>
      coalesce(col(c).cast("string"), lit("")).as(c)): _*)
    (headers(df), formatted.limit(limit).collect()
      .toSeq.map(r => cols.indices.map(r.getString)))
  }

  /** Fixed-width text table: uppercased headers, one line per row, columns
    * padded to their page-local width — the RowsText surface.
    */
  def textTable(df: DataFrame, limit: Int = 1000): String = {
    val (hdr, rows) = stringCells(df, limit)
    val widths = hdr.indices.map(i =>
      (hdr(i).length +: rows.map(_(i).length)).max)
    def line(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString(" ").stripTrailing()
    (line(hdr) +: rows.map(line)).mkString("", "\n", "\n")
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** HTML table: <th> header row + <td> data rows, cells ESCAPED — unlike
    * the reference's template.HTML rows (trusted link markup), arbitrary
    * query output must not inject; a caller with trusted markup can wrap
    * its own cells.
    */
  def htmlTable(df: DataFrame, limit: Int = 1000): String = {
    val (hdr, rows) = stringCells(df, limit)
    val head = hdr.map(h => s"<th>${esc(h)}</th>").mkString("<tr>", "", "</tr>")
    val body = rows.map(r =>
      r.map(c => s"<td>${esc(c)}</td>").mkString("<tr>", "", "</tr>"))
    (s"<table>" +: head +: body :+ "</table>").mkString("\n")
  }

  /** The metadata counter table (report.go:217 MetadataTable): a (key,
    * value) DataFrame — counters, gauges, strings alike, already formatted
    * or castable — returned as rows SORTED BY KEY, the reference's stable
    * presentation order for its "[A] PreProcessed"-style buckets.
    */
  def metadataTable(counters: DataFrame): Seq[(String, String)] = {
    val Seq(k, v) = counters.columns.toSeq.take(2)
    counters.select(col(k).cast("string").as("k"), col(v).cast("string").as("v"))
      .orderBy("k").collect().toSeq.map(r => (r.getString(0), r.getString(1)))
  }

  // ---------------------------------------------------------------------------
  // Track-plot SVG — the fpdf analog's presentation step (descent.go:167
  // DrawFrames / :176 DrawCaption / :211 DrawColorSchemeKeys rendered as
  // SVG instead of PDF — pure text, no graphics dependency). The heavy
  // side (per-point projection, segment construction, color classing) ran
  // distributed in operators.Viz.segments; this collects ONE bounded page
  // of pre-projected segments and writes markup.
  // ---------------------------------------------------------------------------

  /** Color per band class — a fixed key like ColorScheme's altitude
    * legend; band indexes cycle through it.
    */
  val BandPalette: Seq[String] =
    Seq("#1b6f9e", "#2a9d5c", "#c9a227", "#d2622a", "#b02a4c", "#6a3fa0")

  /** Render pre-projected grid segments (operators.Viz.segments output —
    * u1/v1/u2/v2 page coords, band color class, oob flag) as an SVG page:
    * frame + gridlines + ticks (DrawFrames / basegrid gridline fields),
    * one line per IN-BOUNDS segment colored by band, caption
    * (DrawCaption) and band color key (DrawColorSchemeKeys). Letter-page
    * viewBox in mm, like the reference's gofpdf.New("P", "mm", "Letter").
    */
  private def uOf(grid: graft.operators.Viz.Grid)(x: Double): Double = {
    val r = (x - grid.minX) / (grid.maxX - grid.minX)
    grid.offU + (if (grid.invertX) 1.0 - r else r) * grid.w
  }
  private def vOf(grid: graft.operators.Viz.Grid)(y: Double): Double =
    grid.offV + (grid.h - (y - grid.minY) / (grid.maxY - grid.minY) * grid.h)

  /** One bounded page of in-bounds pre-projected segments
    * (u1, v1, u2, v2, band) — shared by the SVG and PDF backends.
    * Sorted HERE (full tuple, before the limit) so the deterministic page
    * order is structural, not inherited from whatever plan shape the
    * caller's pre-sort survives through the re-filter/re-select (r14
    * advice): ties at the cut are benign — tied rows are identical in
    * every rendered column.
    */
  private def collectSegments(segments: DataFrame,
                              limit: Int): Seq[(Double, Double, Double, Double, Int)] =
    segments
      .where(col("oob").cast("int") === 0)
      .select(col("u1").cast("double"), col("v1").cast("double"),
        col("u2").cast("double"), col("v2").cast("double"),
        col("band").cast("int"))
      .orderBy(col("u1"), col("v1"), col("u2"), col("v2"), col("band"))
      .limit(limit).collect().toSeq
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4)))

  def descentSvg(segments: DataFrame, grid: graft.operators.Viz.Grid,
                 caption: String = "", xTick: Double = 10.0,
                 yTick: Double = 20.0, limit: Int = 10000): String = {
    def f(d: Double): String = f"$d%.2f"
    val uG = uOf(grid) _
    val vG = vOf(grid) _

    val rows = collectSegments(segments, limit)

    val sb = new StringBuilder
    sb ++= """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 216 279">"""
    sb ++= "\n"
    // frame
    sb ++= s"""<rect x="${f(grid.offU)}" y="${f(grid.offV)}" width="${f(grid.w)}" """ +
      s"""height="${f(grid.h)}" fill="none" stroke="#333" stroke-width="0.4"/>""" + "\n"
    // gridlines + ticks
    var x = grid.minX
    while (x <= grid.maxX + 1e-9) {
      val ux = uG(x)
      sb ++= s"""<line x1="${f(ux)}" y1="${f(grid.offV)}" x2="${f(ux)}" """ +
        s"""y2="${f(grid.offV + grid.h)}" stroke="#ccc" stroke-width="0.15"/>""" + "\n"
      sb ++= s"""<text x="${f(ux)}" y="${f(grid.offV + grid.h + 4)}" """ +
        s"""font-size="3" text-anchor="middle">${f(x)}</text>""" + "\n"
      x += xTick
    }
    var y = grid.minY
    while (y <= grid.maxY + 1e-9) {
      val vy = vG(y)
      sb ++= s"""<line x1="${f(grid.offU)}" y1="${f(vy)}" x2="${f(grid.offU + grid.w)}" """ +
        s"""y2="${f(vy)}" stroke="#ccc" stroke-width="0.15"/>""" + "\n"
      sb ++= s"""<text x="${f(grid.offU - 2)}" y="${f(vy)}" """ +
        s"""font-size="3" text-anchor="end">${f(y)}</text>""" + "\n"
      y += yTick
    }
    // segments
    for (r <- rows) {
      val color = BandPalette(math.floorMod(r._5, BandPalette.size))
      sb ++= s"""<line x1="${f(r._1)}" y1="${f(r._2)}" """ +
        s"""x2="${f(r._3)}" y2="${f(r._4)}" """ +
        s"""stroke="$color" stroke-width="0.25"/>""" + "\n"
    }
    // caption + color key
    if (caption.nonEmpty)
      sb ++= s"""<text x="${f(grid.offU)}" y="${f(grid.offV - 6)}" """ +
        s"""font-size="4">${esc(caption)}</text>""" + "\n"
    for ((c, i) <- BandPalette.zipWithIndex) {
      val kx = grid.offU + i * 14
      val ky = grid.offV + grid.h + 10
      sb ++= s"""<rect x="${f(kx)}" y="${f(ky)}" width="3" height="3" fill="$c"/>""" + "\n"
      sb ++= s"""<text x="${f(kx + 4)}" y="${f(ky + 3)}" font-size="3">b$i</text>""" + "\n"
    }
    sb ++= "</svg>\n"
    sb.result()
  }

  // ---------------------------------------------------------------------------
  // Track-plot PDF — the same page as descentSvg emitted as actual PDF
  // bytes (the reference's output format: fpdf/fpdf.go:403 page
  // composition, gofpdf.New("P", "mm", "Letter")). A minimal self-written
  // PDF 1.4: one Letter page, one content stream of vector ops
  // (re/S frame, m-l-S grid + segments, BT..Tj text for ticks/caption,
  // re-f color key), Helvetica, correct xref byte offsets. No graphics
  // dependency — the PDF format's text layer is enough for line art.
  // ---------------------------------------------------------------------------

  /** mm (SVG page space) → PDF points; PDF's y axis is bottom-up. */
  private val MmToPt = 72.0 / 25.4
  private def pdfEsc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** PDF numbers format by TRUNCATION to fixed decimals built with pure
    * integer arithmetic (floor + divmod + zero-pad), never `%.kf` (r14):
    * Java's formatter rounds HALF_UP, C/DuckDB printf rounds HALF_EVEN,
    * and they disagree whenever the binary double is exactly
    * representable at the tie (x.yz5 = m/8-class values) — so a
    * printf-formatted coordinate stream can never be byte-gated across
    * engines. floor on identical doubles is bit-identical (the Viz.trunc
    * rule), and integer-built strings are engine-free. Non-negative
    * inputs only (page space).
    */
  private[graft] def trunc2(d: Double): String = {
    require(d >= 0.0, s"trunc2 requires non-negative page-space input, got $d")
    val i = math.floor(d * 100.0).toLong
    s"${i / 100}.${"%02d".format(i % 100)}"
  }
  private[graft] def trunc3(d: Double): String = {
    require(d >= 0.0, s"trunc3 requires non-negative page-space input, got $d")
    val i = math.floor(d * 1000.0).toLong
    s"${i / 1000}.${"%03d".format(i % 1000)}"
  }
  private def hexRgb(hex: String): String = {
    val v = Integer.parseInt(hex.stripPrefix("#"), 16)
    s"${trunc3(((v >> 16) & 255) / 255.0)} ${trunc3(((v >> 8) & 255) / 255.0)} " +
      trunc3((v & 255) / 255.0)
  }

  /** Render pre-projected grid segments as a one-page vector PDF —
    * byte-level analog of [[descentSvg]] (same frame, gridlines, ticks,
    * band-colored segments, caption and color key; same bounded page
    * collect). Returns the complete PDF file bytes.
    */
  def descentPdf(segments: DataFrame, grid: graft.operators.Viz.Grid,
                 caption: String = "", xTick: Double = 10.0,
                 yTick: Double = 20.0, limit: Int = 10000): Array[Byte] = {
    def px(mm: Double): Double = mm * MmToPt
    def py(mm: Double): Double = (279.0 - mm) * MmToPt // Letter height in mm
    def f(d: Double): String = trunc2(d)
    val uG = uOf(grid) _
    val vG = vOf(grid) _
    val rows = collectSegments(segments, limit)

    val c = new StringBuilder
    def text(xMm: Double, yMm: Double, size: Double, s: String): Unit =
      c ++= s"BT /F1 ${f(size * MmToPt)} Tf ${f(px(xMm))} ${f(py(yMm))} Td (${pdfEsc(s)}) Tj ET\n"
    def line(x1: Double, y1: Double, x2: Double, y2: Double): Unit =
      c ++= s"${f(px(x1))} ${f(py(y1))} m ${f(px(x2))} ${f(py(y2))} l S\n"
    // frame
    c ++= s"${f(0.4 * MmToPt)} w 0.2 0.2 0.2 RG\n"
    c ++= s"${f(px(grid.offU))} ${f(py(grid.offV + grid.h))} " +
      s"${f(grid.w * MmToPt)} ${f(grid.h * MmToPt)} re S\n"
    // gridlines + ticks
    c ++= s"${f(0.15 * MmToPt)} w 0.8 0.8 0.8 RG 0 0 0 rg\n"
    var x = grid.minX
    while (x <= grid.maxX + 1e-9) {
      line(uG(x), grid.offV, uG(x), grid.offV + grid.h)
      text(uG(x) - 3, grid.offV + grid.h + 4, 3, f(x))
      x += xTick
    }
    var y = grid.minY
    while (y <= grid.maxY + 1e-9) {
      line(grid.offU, vG(y), grid.offU + grid.w, vG(y))
      text(grid.offU - 12, vG(y), 3, f(y))
      y += yTick
    }
    // segments by band color
    c ++= s"${f(0.25 * MmToPt)} w\n"
    for (r <- rows) {
      c ++= s"${hexRgb(BandPalette(math.floorMod(r._5, BandPalette.size)))} RG\n"
      line(r._1, r._2, r._3, r._4)
    }
    // caption + color key
    if (caption.nonEmpty) text(grid.offU, grid.offV - 6, 4, caption)
    for ((hex, i) <- BandPalette.zipWithIndex) {
      val kx = grid.offU + i * 14
      val ky = grid.offV + grid.h + 10
      c ++= s"${hexRgb(hex)} rg ${f(px(kx))} ${f(py(ky + 3))} " +
        s"${f(3 * MmToPt)} ${f(3 * MmToPt)} re f 0 0 0 rg\n"
      text(kx + 4, ky + 3, 3, s"b$i")
    }

    // assemble the file: 5 objects + xref with exact byte offsets
    val stream = c.result()
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
      s"<< /Length ${stream.length} >>\nstream\n${stream}endstream",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val out = new StringBuilder
    out ++= "%PDF-1.4\n"
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.length
      out ++= s"${i + 1} 0 obj\n$body\nendobj\n"
      off
    }
    val xrefOff = out.length
    out ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    offsets.foreach(o => out ++= f"$o%010d 00000 n \n")
    out ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n"
    out.result().getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
