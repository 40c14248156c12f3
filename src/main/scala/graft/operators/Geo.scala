package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar spatial join: radius-bounded nearest neighbor via grid-cell
  * blocking — "which station/store/depot is closest to each user,
  * within r" without the cross join every naive formulation pays.
  *
  * The blocking argument: with square cells of side r, any candidate
  * within distance r of a probe lies in the probe's cell or one of its
  * 8 neighbors. So the PROBE side explodes to its 3x3 cell
  * neighborhood (x9 — probes are usually the smaller or streaming
  * side) and the CANDIDATE side keeps its single home cell: one
  * equi-join on the cell key replaces the |L| x |R| cross product, and
  * the exact distance filter + per-probe argmin run on the tiny
  * candidate lists. Cell-key skew (a dense downtown) is ordinary key
  * skew — AQE / [[SkewJoin.saltedEquiJoin]] apply unchanged.
  *
  * Coordinates are PLANAR (x, y in one unit system — meters in a local
  * projection, or degrees over extents small enough that curvature is
  * below the radius tolerance). Geographic lat/lon at continental
  * scale needs a projection upstream; trig-based haversine is exactly
  * the kind of cross-engine transcendental the portability rules
  * avoid, and squared Euclidean (two subtractions, two multiplies, one
  * add — IEEE-exact in any engine) keeps the whole operator
  * oracle-replayable.
  *
  * Output: one row per probe that has a candidate within r:
  * (probe columns..., nearest candidate id, dist_sq), ties on distance
  * broken by ascending candidate id (deterministic).
  */
object Geo {

  /** Nearest `cand` point within `radius` of each `probe` point.
    *
    * Rows with a coordinate that cannot survive the cell-id math —
    * NULL, NaN, ±Inf, or a magnitude past Long range in cell units —
    * are EXCLUDED before the cell join: struct join keys treat null
    * fields as EQUAL, so every NULL-coord probe (x9 exploded cells)
    * would meet every NULL-coord candidate on one hot (null, null)
    * cell — an O(nullProbes·9·nullCands) blowup whose rows all
    * evaluate dist_sq NULL and drop AFTER the join paid for them.
    * NaN re-opens the same hole one cell over (`floor(NaN)
    * .cast(long)` is silently 0 — the Z-order rank-collapse class, a
    * hot (0, 0) cell), and an over-range coordinate ABORTS the whole
    * job in the ANSI long cast of the cell id.
    *
    * CONTRACT: `probeId` values must be unique (and non-NULL) — the
    * final per-probe argmin groups on it, so a duplicated id would
    * silently mix two probe points' candidates into one wrong row
    * (the Packing.packByTokenBudget uniqueness convention).
    *
    * @param probes   (probeId, px, py) — column names given
    * @param cands    (candId, cx, cy)
    * @param radius   search radius in coordinate units (> 0)
    */
  def nearestWithinRadius(
      probes: DataFrame, probeId: String, px: String, py: String,
      cands: DataFrame, candId: String, cx: String, cy: String,
      radius: Double): DataFrame = {
    require(radius > 0.0, s"radius must be positive, got $radius")
    // both sides meet in one equi-join: shared names (the common
    // probes(id,x,y)/cands(id,x,y) case) would make every later
    // reference ambiguous — fail fast with an actionable message
    val sharedNames = Seq(probeId, px, py).toSet
      .intersect(Seq(candId, cx, cy).toSet)
    require(sharedNames.isEmpty,
      s"probe and candidate column names must be disjoint (alias one " +
        s"side); shared: ${sharedNames.mkString(", ")}")
    // dist_sq is an OUTPUT column: an input coordinate column named
    // dist_sq would otherwise fail deep in Catalyst with
    // AMBIGUOUS_REFERENCE at the filter — the unactionable failure mode
    // these requires exist to prevent.
    val reserved = Seq("__geo_cell", "__geo_best", "dist_sq")
    Seq(probes -> "probes", cands -> "cands").foreach { case (df, side) =>
      reserved.foreach(c => require(!df.columns.contains(c),
        s"$side already has a column named $c (reserved)"))
    }
    def cellOf(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(floor(x / radius).cast("long").as("gx"),
        floor(y / radius).cast("long").as("gy"))
    // Probe side: 3x3 neighborhood of the home cell.
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    // Coordinates must survive the cell-id cast: NaN would silently
    // cell to (0,0) via floor-cast (hot-cell blowup, the NULL hole one
    // cell over), and any |x/radius| past Long range — ±Inf or a
    // finite corrupt 1e300 — ABORTS the job in the ANSI long cast.
    // The bound is radius-scaled so it tracks the actual cast domain
    // (9e18 ≈ Long.MaxValue with margin); Num.finiteWithin is false
    // for NULL/NaN/over-bound alike.
    def inDomain(c: org.apache.spark.sql.Column) =
      graft.functions.Num.finiteWithin(c, 9.0e18 * radius)
    val probesClean =
      probes.filter(inDomain(col(px)) && inDomain(col(py)))
    // candId NULL-checked like the coordinates: a keyless candidate
    // row would WIN distance ties in min(struct(dist_sq, candId)) —
    // NULL sorts first in struct ordering — and probes would report
    // nearest = NULL while a real candidate sat at the same distance
    val candsClean =
      cands.filter(col(candId).isNotNull &&
        inDomain(col(cx)) && inDomain(col(cy)))
    val p = probesClean.select(
      col(probeId), col(px), col(py),
      explode(array(offsets.map { case (dx, dy) =>
        struct(
          (floor(col(px) / radius).cast("long") + lit(dx.toLong)).as("gx"),
          (floor(col(py) / radius).cast("long") + lit(dy.toLong)).as("gy"))
      }: _*)).as("__geo_cell"))
    // Candidate side: home cell only — the big side never explodes.
    val c = candsClean.select(
      col(candId), col(cx), col(cy), cellOf(col(cx), col(cy)).as("__geo_cell"))
    val dx = col(px) - col(cx)
    val dy = col(py) - col(cy)
    p.join(c, Seq("__geo_cell"))
      .select(col(probeId), col(px), col(py), col(candId),
        (dx * dx + dy * dy).as("dist_sq"))
      .filter(col("dist_sq") <= lit(radius * radius))
      .groupBy(col(probeId))
      .agg(min(struct(col("dist_sq"), col(candId))).as("__geo_best"),
        first(col(px)).as(px), first(col(py)).as(py))
      .select(col(probeId), col(px), col(py),
        col(s"__geo_best.$candId").as(candId),
        col("__geo_best.dist_sq").as("dist_sq"))
  }
}
