package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GeoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def km(a: (Double, Double), b: (Double, Double)): Double =
    Seq((a._1, a._2, b._1, b._2)).toDF("la", "lo", "lb", "lp")
      .select(Geo.haversineKm(col("la"), col("lo"),
        col("lb"), col("lp")).as("d"))
      .head().getDouble(0)

  test("haversine matches known distances") {
    // one degree of longitude at the equator ≈ 2πR/360
    val oneDeg = 2 * math.Pi * Geo.earthRadiusKm / 360
    assert(math.abs(km((0, 0), (0, 1)) - oneDeg) < 1e-9)
    // antipodal points: half the circumference
    assert(math.abs(km((0, 0), (0, 180)) - math.Pi * Geo.earthRadiusKm)
      < 1e-9)
    // zero distance, symmetry
    assert(km((51.5, -0.12), (51.5, -0.12)) == 0.0)
    assert(km((51.5, -0.12), (48.85, 2.35)) ==
      km((48.85, 2.35), (51.5, -0.12)))
    // London–Paris ≈ 344 km (mean-radius haversine)
    val lp = km((51.5007, -0.1246), (48.8584, 2.2945))
    assert(lp > 333 && lp < 355, s"london-paris $lp")
  }

  test("haversine is clamped: rounding can never push asin past 1") {
    // near-antipodal pairs can produce h = 1 + ulp without the clamp
    val d = km((0.0, 0.0), (0.0, 179.9999999))
    assert(!d.isNaN && d <= math.Pi * Geo.earthRadiusKm + 1e-9)
  }
}
