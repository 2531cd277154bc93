package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geographic enrichment expressed as pure Column math (whole-stage
  * codegen; no UDFs).
  *
  * Mirrors the reference's side-of-town computation
  * (reference `src/enrich/geography.py:21-38`): great-circle initial
  * bearing from a fixed town center, mapped to 8 compass directions.
  * The reference computes this row-at-a-time on the driver with
  * `math.atan2`; here it's a vectorized expression evaluated inside
  * codegen, so it scales with the data instead of the driver.
  */
object geo {
  /** Norman, OK — reference `src/config.py:6`. */
  val TownCenterLat = 35.2226
  val TownCenterLon = -97.4395

  private val Directions = Seq("N", "NE", "E", "SE", "S", "SW", "W", "NW")

  /** Initial great-circle bearing (degrees, [0, 360)) from (lat1,lon1)
    * to (lat2,lon2). Same formula + argument order as the reference
    * (`geography.py:26-33`), so results agree bit-for-bit with the
    * oracle replica.
    */
  def bearingDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val rLat1 = radians(lat1)
    val rLon1 = radians(lon1)
    val rLat2 = radians(lat2)
    val rLon2 = radians(lon2)
    val dLon  = rLon2 - rLon1
    val x = cos(rLat2) * sin(dLon)
    val y = cos(rLat1) * sin(rLat2) - sin(rLat1) * cos(rLat2) * cos(dLon)
    // reference: atan2(x, y) — x is the FIRST argument.
    (degrees(atan2(x, y)) + lit(360.0)) % lit(360.0)
  }

  /** 8-way compass direction for a bearing in degrees.
    *
    * The reference uses `round(bearing/45) % 8` (`geography.py:36-37`,
    * Python banker's rounding). We use the half-open-sector equivalent
    * `floor(((b + 22.5) % 360) / 45)` which is identical except on
    * exact .5 multiples and — unlike round() — has the same semantics
    * in Spark, DuckDB and Python.
    */
  def compass8(bearing: Column): Column = {
    val idx = floor(((bearing + lit(22.5)) % lit(360.0)) / lit(45.0)).cast("int")
    val arr = array(Directions.map(lit): _*)
    element_at(arr, idx + lit(1))
  }

  /** side_of_town from a point, relative to the fixed town center. */
  def sideOfTown(lat: Column, lon: Column): Column =
    compass8(bearingDeg(lit(TownCenterLat), lit(TownCenterLon), lat, lon))
}
