package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Great-circle geometry for track analytics (the reference's GPX
  * route-mapping domain: `PBI Python Scripts/GPX File Conversion for
  * Run Route Data Mapping.ipynb` renders routes; the natural engine
  * counterparts are track length and climb).
  *
  * Haversine on the WGS84 mean radius (6371.0088 km):
  * `d = 2R·asin(min(1, √(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))))`.
  * The chain is several transcendentals, so the two engines differ in
  * the last ulps — callers stabilize each per-step distance to a fixed
  * grid and DECIMAL-sum (the repo-wide discipline for float folds);
  * 1e-6 km = 1 mm, far above the ~1e-13 relative noise.
  */
object Geo {

  val earthRadiusKm = 6371.0088

  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val dphi = radians(lat2 - lat1) / 2
    val dlam = radians(lon2 - lon1) / 2
    val h = sin(dphi) * sin(dphi) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dlam) * sin(dlam)
    lit(2 * earthRadiusKm) * asin(least(lit(1.0), sqrt(h)))
  }

  /** DuckDB mirror of [[haversineKm]] — kept adjacent so the formulas
    * cannot drift. Operands must be DOUBLE expressions.
    */
  def haversineKmSql(lat1: String, lon1: String,
                     lat2: String, lon2: String): String = {
    val dphi = s"(radians(($lat2) - ($lat1)) / 2)"
    val dlam = s"(radians(($lon2) - ($lon1)) / 2)"
    val h = s"(sin($dphi) * sin($dphi) + cos(radians($lat1)) *" +
      s" cos(radians($lat2)) * sin($dlam) * sin($dlam))"
    s"(2 * $earthRadiusKm * asin(least(1.0, sqrt($h))))"
  }
}
