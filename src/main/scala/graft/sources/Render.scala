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
}
