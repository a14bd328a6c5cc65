package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Track-visualization DATA layer — the Spark-first re-expression of the
  * reference's fpdf subsystem (fpdf/descent.go:12 DescentPdf,
  * fpdf/basegrid.go:9 BaseGrid U/V, fpdf/trackprojector.go): the plot is
  * DATA until the last step. Grid projection (linear value→page mapping
  * with optional axis inversion, out-of-bounds flagging) and per-track
  * segment construction (consecutive-point pairs via a lag window, color
  * class per segment) are pure column arithmetic — they run distributed
  * and carry DuckDB oracles like any other query; only the bounded SVG
  * page assembly collects (`Render.descentSvg`).
  *
  * The reference draws per-flight grids of altitude / groundspeed /
  * vertical speed against a distance axis (three semantics —
  * descent.go:335 DistanceFromOrigin, :354 DistanceRemainingAlongPath,
  * :393 DistanceTravelledAlongPath); callers here pick the x expression
  * (anchor distance, cumdist, total-cumdist) and the y expression per
  * grid, so one segment operator serves every grid the reference renders.
  */
object Viz {

  /** Page-space grid — basegrid.go:9's geometry fields: a W x H box at
    * (offU, offV) mapping [minX, maxX] x [minY, maxY]; InvertX mirrors the
    * x axis (descents read right-to-left toward the anchor), y grows UP
    * the page (V flips, basegrid.go:50).
    */
  final case class Grid(offU: Double, offV: Double, w: Double, h: Double,
                        minX: Double, maxX: Double, minY: Double, maxY: Double,
                        invertX: Boolean = false)

  /** basegrid.go:38 U: scale x into [0,1] (optionally inverted), map to
    * page u. Plain double arithmetic — engine-reproducible.
    */
  def u(g: Grid, x: Column): Column = {
    val ratio = (x - lit(g.minX)) / lit(g.maxX - g.minX)
    val r = if (g.invertX) lit(1.0) - ratio else ratio
    lit(g.offU) + r * lit(g.w)
  }

  /** basegrid.go:50 V: y scales into [0,1] and flips (page v grows down,
    * plot y grows up).
    */
  def v(g: Grid, y: Column): Column = {
    val ratio = (y - lit(g.minY)) / lit(g.maxY - g.minY)
    lit(g.offV) + (lit(g.h) - ratio * lit(g.h))
  }

  /** Out-of-bounds test for one (x, y) — basegrid.go's per-coordinate
    * ratio<0 || ratio>1 checks OR'd (MoveTo/LineTo skip oob points).
    */
  def oob(g: Grid, x: Column, y: Column): Column = {
    val rx = (x - lit(g.minX)) / lit(g.maxX - g.minX)
    val ry = (y - lit(g.minY)) / lit(g.maxY - g.minY)
    rx < 0.0 || rx > 1.0 || ry < 0.0 || ry > 1.0
  }

  /** Per-track plotted line segments for one grid —
    * descent.go:278 DrawTrackWithDistFunc's loop over consecutive
    * trackpoint pairs, relationally: a lag window pairs each point with
    * its predecessor; both endpoints project through the grid; `band` is
    * the segment's color class (reference ColorScheme — by-altitude band
    * of the newer endpoint); `oob` marks segments the renderer must skip
    * (either endpoint outside the grid). Output per row:
    * (key, seg (= ordinal), x1, y1, x2, y2, u1, v1, u2, v2, band, oob).
    *
    * Scale: one shuffle on the track key for the lag window; projection is
    * stateless arithmetic on top — the same plan family as q_kinematics.
    */
  /** Truncate (round toward -inf) to `k` decimals: floor on identical
    * IEEE doubles is bit-identical across engines, where round()'s tie
    * rule is NOT — sqrt-derived coordinates land on .xxx5 boundaries
    * often enough that half-up-vs-binary disagreement showed up within
    * 100k rows at sf0.1.
    */
  private def trunc(c: Column, k: Int): Column = {
    val p = math.pow(10.0, k)
    floor(c * lit(p)) / lit(p)
  }

  def segments(df: DataFrame, key: String, time: String, tie: String,
               x: Column, y: Column, grid: Grid, bandSize: Double,
               roundTo: Int = 3): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(time), col(tie))
    df.select(col(key), col(time), col(tie), x.as("_x"), y.as("_y"))
      .withColumn("seg",
        (row_number().over(w) - lit(1)).cast("long"))
      .withColumn("_px", lag(col("_x"), 1).over(w))
      .withColumn("_py", lag(col("_y"), 1).over(w))
      .where(col("_px").isNotNull)
      .select(
        col(key), col("seg"),
        trunc(col("_px"), roundTo).as("x1"),
        trunc(col("_py"), roundTo).as("y1"),
        trunc(col("_x"), roundTo).as("x2"),
        trunc(col("_y"), roundTo).as("y2"),
        trunc(u(grid, col("_px")), roundTo).as("u1"),
        trunc(v(grid, col("_py")), roundTo).as("v1"),
        trunc(u(grid, col("_x")), roundTo).as("u2"),
        trunc(v(grid, col("_y")), roundTo).as("v2"),
        floor(col("_y") / lit(bandSize)).cast("int").as("band"),
        (oob(grid, col("_px"), col("_py")) ||
          oob(grid, col("_x"), col("_y"))).as("oob"))
  }
}
