package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Albers

/** EPSG:4326 → 3005 fixtures from FIXTURES.md §5 (computed independently
  * from the Snyder formula set) + projection invariants over a BC-domain
  * grid (deterministic — no RNG, reproducible failures).
  */
class AlbersSpec extends AnyFunSuite {

  test("false origin maps exactly to (FE, FN)") {
    val (e, n) = Albers.forwardScala(-126.0, 45.0)
    assert(math.abs(e - 1000000.0) < 1e-6, s"easting $e")
    assert(math.abs(n - 0.0) < 1e-6, s"northing $n")
  }

  test("Vancouver fixture") {
    val (e, n) = Albers.forwardScala(-123.1207, 49.2827)
    assert(math.abs(e - 1209619.21) < 0.01)
    assert(math.abs(n - 478302.92) < 0.01)
  }

  test("Victoria fixture") {
    val (e, n) = Albers.forwardScala(-123.3656, 48.4284)
    assert(math.abs(e - 1195327.90) < 0.01)
    assert(math.abs(n - 382812.07) < 0.01)
  }

  private val grid = for {
    lon <- BigDecimal(-139.0) to BigDecimal(-114.0) by 2.5
    lat <- BigDecimal(48.0) to BigDecimal(60.0) by 1.5
  } yield (lon.toDouble, lat.toDouble)

  test("projection stays in the EPSG:3005 meter range over the BC domain") {
    grid.foreach { case (lo, la) =>
      val (e, n) = Albers.forwardScala(lo, la)
      assert(e > 0 && e < 2.2e6, s"easting $e out of range for ($lo,$la)")
      assert(n > -2e5 && n < 2e6, s"northing $n out of range for ($lo,$la)")
      // ~1 degree of latitude ≈ 111 km: a 0.01° nudge moves ~1.1 km
      val (_, n2) = Albers.forwardScala(lo, la + 0.01)
      val d = math.abs(n2 - n)
      assert(d > 500 && d < 2000, s"0.01 deg lat moved $d m at ($lo,$la)")
    }
  }

  test("equal-area property: ~100 m squares keep area under projection (±1%)") {
    grid.foreach { case (lo, la) =>
      val h = 0.001
      val corners = Seq((lo, la), (lo + h, la), (lo + h, la + h), (lo, la + h))
        .map { case (x, y) => Albers.forwardScala(x, y) }
      val area = math.abs(
        corners.zip(corners.tail :+ corners.head)
          .map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum / 2)
      val latR      = math.toRadians(la)
      val e2        = Albers.e2
      val sin2      = math.sin(latR) * math.sin(latR)
      val rm        = Albers.aEll * (1 - e2) / math.pow(1 - e2 * sin2, 1.5)
      val rn        = Albers.aEll / math.sqrt(1 - e2 * sin2)
      val patchArea = (rm * math.toRadians(h)) * (rn * math.cos(latR) * math.toRadians(h))
      assert(math.abs(area / patchArea - 1) < 0.01,
        s"area distortion ${area / patchArea} at ($lo,$la)")
    }
  }
}
