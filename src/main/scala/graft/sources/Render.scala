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
  def descentSvg(segments: DataFrame, grid: graft.operators.Viz.Grid,
                 caption: String = "", xTick: Double = 10.0,
                 yTick: Double = 20.0, limit: Int = 10000): String = {
    def uOf(x: Double): Double = {
      val r = (x - grid.minX) / (grid.maxX - grid.minX)
      grid.offU + (if (grid.invertX) 1.0 - r else r) * grid.w
    }
    def vOf(y: Double): Double =
      grid.offV + (grid.h - (y - grid.minY) / (grid.maxY - grid.minY) * grid.h)
    def f(d: Double): String = f"$d%.2f"

    val rows = segments
      .where(col("oob").cast("int") === 0)
      .select(col("u1").cast("double"), col("v1").cast("double"),
        col("u2").cast("double"), col("v2").cast("double"),
        col("band").cast("int"))
      .limit(limit).collect()

    val sb = new StringBuilder
    sb ++= """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 216 279">"""
    sb ++= "\n"
    // frame
    sb ++= s"""<rect x="${f(grid.offU)}" y="${f(grid.offV)}" width="${f(grid.w)}" """ +
      s"""height="${f(grid.h)}" fill="none" stroke="#333" stroke-width="0.4"/>""" + "\n"
    // gridlines + ticks
    var x = grid.minX
    while (x <= grid.maxX + 1e-9) {
      val ux = uOf(x)
      sb ++= s"""<line x1="${f(ux)}" y1="${f(grid.offV)}" x2="${f(ux)}" """ +
        s"""y2="${f(grid.offV + grid.h)}" stroke="#ccc" stroke-width="0.15"/>""" + "\n"
      sb ++= s"""<text x="${f(ux)}" y="${f(grid.offV + grid.h + 4)}" """ +
        s"""font-size="3" text-anchor="middle">${f(x)}</text>""" + "\n"
      x += xTick
    }
    var y = grid.minY
    while (y <= grid.maxY + 1e-9) {
      val vy = vOf(y)
      sb ++= s"""<line x1="${f(grid.offU)}" y1="${f(vy)}" x2="${f(grid.offU + grid.w)}" """ +
        s"""y2="${f(vy)}" stroke="#ccc" stroke-width="0.15"/>""" + "\n"
      sb ++= s"""<text x="${f(grid.offU - 2)}" y="${f(vy)}" """ +
        s"""font-size="3" text-anchor="end">${f(y)}</text>""" + "\n"
      y += yTick
    }
    // segments
    for (r <- rows) {
      val color = BandPalette(math.floorMod(r.getInt(4), BandPalette.size))
      sb ++= s"""<line x1="${f(r.getDouble(0))}" y1="${f(r.getDouble(1))}" """ +
        s"""x2="${f(r.getDouble(2))}" y2="${f(r.getDouble(3))}" """ +
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
}
