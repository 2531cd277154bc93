package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial self-join primitives: distance-bounded pair finding via
  * grid-cell blocking — the geo analog of the dedup family's LSH
  * blocking (reference geography context: `src/enrich/geography.py`,
  * whose bearing classification is q8; this is the "find everything
  * NEAR each point" operator a geocode-cache / incident-clustering
  * pass needs at scale).
  */
object Spatial {

  /** All point pairs within `maxDist` (planar Euclidean on the
    * coordinate units — documented small-extent approximation; for a
    * city-scale extent the curvature error is far below the distance
    * quantum), WITHOUT a cross join: points land in `cellSize`-wide
    * grid cells, each point probes its 3×3 cell neighborhood, pairs
    * verify on the exact distance.
    *
    * Exactness of the blocking: with cellSize STRICTLY greater than
    * maxDist, two points within maxDist differ by < cellSize per
    * axis, so their cells differ by <= 1 per axis — the 3×3 probe
    * covers EVERY qualifying pair (Chebyshev bound), recall 1.0 by
    * construction, which is why the oracle can be
    * mechanism-independent brute force. Strictness matters at the
    * exact boundary: the real-number argument needs delta < cellSize,
    * and with cellSize == maxDist a pair whose per-axis delta equals
    * exactly maxDist can land 2 cells apart through FP rounding of
    * floor(x/cs) — so the default is nextUp(maxDist) (one ulp wider,
    * closing the boundary with no measurable change to cell
    * population) and an explicit cellSize must be > maxDist. Each
    * unordered pair surfaces EXACTLY once without a dedup pass: the
    * probe side explodes into 9 cells, the build side keeps its home
    * cell, so an (a, b) pair matches on exactly one (probe, home)
    * cell per direction and the id1 < id2 filter keeps one direction.
    *
    * Scale shape: cell assignment is map-side; the candidate join is
    * an EQUI-join on the cell key (9× probe-side explode of (id,
    * coords) only); the exact-distance verify is a filter inside the
    * join — no window, no dedup shuffle, no cross product. Density
    * skew (a hot cell) is bounded by cell population, the same knob
    * as LSH bucket width: shrink cellSize toward maxDist to split hot
    * cells. Output: (id1, id2, dist 6dp) with the UNROUNDED distance
    * tested against maxDist.
    */
  def withinDistancePairs(df: DataFrame, idCol: String, latCol: Column,
                          lonCol: Column, maxDist: Double,
                          cellSize: Double = 0.0): DataFrame = {
    require(maxDist > 0.0, s"maxDist must be > 0, got $maxDist")
    val cs = if (cellSize > 0.0) cellSize else Math.nextUp(maxDist)
    require(cs > maxDist,
      s"cellSize ($cs) must be STRICTLY greater than maxDist ($maxDist): " +
        "the 3x3 recall bound needs per-axis delta < cellSize, and an " +
        "exact-boundary pair can land 2 cells apart when they are equal")
    val pts = df.select(col(idCol).as("id"), latCol.as("lat"), lonCol.as("lon"),
      floor(latCol / cs).cast("long").as("cx"),
      floor(lonCol / cs).cast("long").as("cy"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probe = pts.select(col("id"), col("lat"), col("lon"),
        explode(array(offsets.map { case (dx, dy) =>
          struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
        }: _*)).as("cell"))
      .select(col("id").as("id1"), col("lat").as("lat1"), col("lon").as("lon1"),
        col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    val home = pts.select(col("id").as("id2"), col("lat").as("lat2"),
      col("lon").as("lon2"), col("cx"), col("cy"))
    val dx = col("lat1") - col("lat2")
    val dy = col("lon1") - col("lon2")
    val d2 = dx * dx + dy * dy
    probe.join(home, Seq("cx", "cy"))
      .filter(col("id1") < col("id2"))
      .filter(d2 <= lit(maxDist) * lit(maxDist))
      .select(col("id1"), col("id2"),
        graft.functions.num.fround(sqrt(d2), 6).as("dist"))
  }
}
