package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial restrictors, re-expressed as codegen-friendly column predicates.
  *
  * flightdb filters flights through geo.Restrictor implementations
  * (georestrictorset.go: SquareBoxRestriction, PolygonRestriction,
  * VerticalPlaneRestriction, combined with All/Any logic) by walking each
  * track in Go. Here every restrictor is a pure `Column` predicate, so
  * Catalyst pushes what it can into the scan and the rest stays inside
  * whole-stage codegen — no UDFs, no per-row callbacks.
  */
object Geo {

  /** Axis-aligned box with optional exclusion — SquareBoxRestriction
    * (georestrictorset.go:122). Altitude-band analog: add a range predicate
    * on the band column with `&&`.
    */
  def inBox(x: Column, y: Column, xMin: Double, xMax: Double,
            yMin: Double, yMax: Double): Column =
    x >= xMin && x <= xMax && y >= yMin && y <= yMax

  /** Convex-polygon containment via half-plane tests — PolygonRestriction
    * (georestrictorset.go:141). Vertices must be in counter-clockwise order;
    * the point is inside iff it is on the left of every directed edge
    * (cross product >= 0). Pure arithmetic → identical results in any engine
    * and fully codegen'd in Spark.
    */
  def inConvexPolygon(x: Column, y: Column, vertices: Seq[(Double, Double)]): Column =
    vertices.indices.map { i =>
      val (x1, y1) = vertices(i)
      val (x2, y2) = vertices((i + 1) % vertices.length)
      (lit(x2 - x1) * (y - y1) - lit(y2 - y1) * (x - x1)) >= 0.0
    }.reduce(_ && _)

  /** Great-circle distance in KM (haversine) — geo.Latlong.Dist as used
    * throughout track.go (DistKM, PostProcess groundspeed derivation).
    * Pure sin/cos/atan2 built-ins → whole-stage codegen.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val earthRadiusKm = 6371.0088
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * earthRadiusKm) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** Unit conversions from trackpoint.go: 1 knot = 1 NM/hour = 1.852 km/h
    * (RepositionByTime / PostProcess FOIA groundspeed derivation).
    */
  def kmPerHourToKnots(kmh: Column): Column = kmh / 1.852
  def knotsToMetersPerSec(knots: Column): Column = knots * (1852.0 / 3600.0)

  /** Signed smallest angle from h1 to h2 in (-180, 180] — geo.HeadingDelta
    * as used by Track.AsContiguousBoxes (track.go:676): headings are
    * circular, so 350°→10° is +20, not -340.
    */
  def headingDelta(h1: Column, h2: Column): Column =
    pmod(h2 - h1 + 540.0, lit(360.0)) - 180.0

  /** Circular-aware linear interpolation between headings —
    * geo.InterpolateHeading (trackpoint.go:208 InterpolateTo): walk the
    * SHORT way around the compass, normalized to [0, 360).
    */
  def interpolateHeading(h1: Column, h2: Column, ratio: Column): Column =
    pmod(h1 + headingDelta(h1, h2) * ratio, lit(360.0))

  /** Squared distance to a reference point (ClosestTo, track.go:849).
    * Kept squared: monotone for argmin, avoids sqrt precision concerns in
    * cross-engine comparison.
    */
  def distSq(x: Column, y: Column, refX: Double, refY: Double): Column = {
    val dx = x - refX
    val dy = y - refY
    dx * dx + dy * dy
  }

  /** Per-key closest approach to a reference point —
    * ClosestApproachReporter (analysis/closestapproach.go). One shuffle by
    * key, one window pass; ties broken by `tie` for determinism.
    */
  def closestTo(df: DataFrame, key: String, tie: String,
                d2: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(d2.asc, col(tie).asc)
    df.withColumn("_d2", d2)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
      .withColumnRenamed("_d2", "dist_sq")
  }

  /** Consecutive-point crossings of the vertical plane x = c —
    * VerticalPlaneRestriction (georestrictorset.go:131): a crossing is a
    * strict sign change of (x - c) between adjacent points in time order.
    */
  def lineCrossings(df: DataFrame, key: String, time: String, tie: String,
                    x: Column, c: Double): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(time), col(tie))
    df.withColumn("_x", x)
      .withColumn("_px", lag(col("_x"), 1).over(w))
      .where(col("_px").isNotNull && (col("_x") - c) * (col("_px") - c) < 0.0)
  }

  /** Waypoint matching — Track.MatchWaypoints (flightpath.go:26): points
    * within a snap box of any named waypoint; first hit per (key, waypoint).
    * The waypoint dim is tiny → broadcast; the probe side never shuffles for
    * the join itself.
    */
  def waypointMatch(df: DataFrame, key: String, time: String,
                    x: Column, y: Column,
                    waypoints: DataFrame /* name, wx, wy, snap */): DataFrame =
    df.withColumn("_x", x).withColumn("_y", y)
      .join(broadcast(waypoints),
        abs(col("_x") - col("wx")) <= col("snap") &&
        abs(col("_y") - col("wy")) <= col("snap"))
      .groupBy(col(key), col("name"))
      .agg(expr(s"min($time) div 1000").as("first_us"))

  /** Perpendicular ("lateral") displacement of (x, y) from the infinite line
    * through (x1, y1)-(x2, y2) — the geometry of
    * StraightLineDisplacementReporter's line.ClosestDistance
    * (analysis/straightlinedisplacement.go:50): |cross product| / |line|.
    * Pure arithmetic, whole-stage codegen'd, engine-identical (the line
    * length is folded to one double literal so an oracle can embed the same
    * constant).
    */
  def lineDisplacement(x: Column, y: Column, x1: Double, y1: Double,
                       x2: Double, y2: Double): Column = {
    val len = math.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
    abs(lit(x2 - x1) * (y - y1) - lit(y2 - y1) * (x - x1)) / len
  }

  /** Proximity pairs — the "airprox / near-miss" report (the safety
    * analysis a trackpoint database exists for; flightdb indexes by
    * timeslot for exactly this class of query): pairs of events from
    * DIFFERENT keys in the SAME timeslot whose 2-D distance is ≤ `d`,
    * rolled up per unordered key pair (times seen close + closest
    * squared distance, truncated — floor on identical doubles is
    * engine-exact, the Viz.trunc discipline).
    *
    * Scale shape: the naive form is a per-slot all-pairs join (quadratic
    * in slot population — hot slots explode at 100 TB). This plan
    * grid-buckets space into d-sized cells and equi-joins on
    * (slot, cellx, celly): the probe side replicates to its 3×3 cell
    * neighborhood (a bounded 9×, in the scan stage), the build side
    * stays on its home cell, and any pair within d necessarily differs
    * by ≤ 1 cell per axis — so every qualifying pair is found against
    * exactly ONE (probe-emission, home-cell) combination (no
    * found-twice dedup beyond the id ordering) and the join work is
    * density-local, not slot-global. Equi-keys mean a plain shuffle
    * hash join; AQE skew splitting covers dense cells.
    */
  def proximityPairs(df: DataFrame, key: String, id: String,
                     x: Column, y: Column, slot: Column,
                     d: Double): DataFrame = {
    require(d > 0, s"proximityPairs: d must be positive, got $d")
    val pts = df.select(col(key).as("_u"), col(id).as("_eid"),
      x.cast("double").as("_x"), y.cast("double").as("_y"),
      slot.as("_slot"),
      floor(x.cast("double") / d).cast("long").as("_cx"),
      floor(y.cast("double") / d).cast("long").as("_cy"))
    val offs = array((for { i <- -1 to 1; j <- -1 to 1 }
      yield struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"))): _*)
    val probe = pts
      .withColumn("_o", explode(offs))
      .select(col("_u").as("_u1"), col("_eid").as("_e1"),
        col("_x").as("_x1"), col("_y").as("_y1"), col("_slot"),
        (col("_cx") + col("_o.i")).as("_jcx"),
        (col("_cy") + col("_o.j")).as("_jcy"))
    val build = pts.select(col("_u").as("_u2"), col("_eid").as("_e2"),
      col("_x").as("_x2"), col("_y").as("_y2"),
      col("_slot").as("_slot2"), col("_cx"), col("_cy"))
    val dsq = (col("_x1") - col("_x2")) * (col("_x1") - col("_x2")) +
      (col("_y1") - col("_y2")) * (col("_y1") - col("_y2"))
    probe.join(build,
        col("_slot") === col("_slot2") &&
          col("_jcx") === col("_cx") && col("_jcy") === col("_cy") &&
          col("_e1") < col("_e2") && col("_u1") =!= col("_u2"))
      .where(dsq <= d * d)
      .select(least(col("_u1"), col("_u2")).as("u1"),
        greatest(col("_u1"), col("_u2")).as("u2"),
        dsq.as("_dsq"))
      .groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("n_close"),
        (floor(min(col("_dsq")) * 10000.0) / 10000.0).as("min_dsq"))
  }
}
