package graft.operators

import graft.SparkTestBase

/** Two-phase 2-D frontier vs a brute-force dominance check. */
class SkylineSpec extends SparkTestBase {

  import spark.implicits._

  // compare on the snapped-cent grid — double re-division is not the
  // identity under test
  private def brute(pts: Seq[(Long, Int)]): Set[(Long, Int)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (x2, y2) =>
        (x2 <= x && y2 >= y) && (x2 < x || y2 > y)
      }
    }.toSet

  test("matches brute-force dominance on a deterministic cloud") {
    // spread across MANY buckets (bucketWidth=100 snapped units = $1)
    val pts = (0 until 300).map { i =>
      (900.0 + (i * 7 % 200) / 10.0, (i * 13 % 50) + 1)
    }
    val got = Skyline.frontier2d(pts.toDF("price", "size"), "price", "size",
        100.0, 100L)
      .collect().map(r => (math.round(r.getDouble(0) * 100), r.getInt(1)))
      .toSet
    val snapped = pts.map { case (x, y) => (math.floor(x * 100 + 0.5).toLong, y) }
    assert(got == brute(snapped.distinct))
  }

  test("same-x dominance keeps only the max y; duplicates collapse") {
    val pts = Seq((1.0, 5), (1.0, 9), (2.0, 9), (2.0, 10), (3.0, 1))
    val got = Skyline.frontier2d(pts.toDF("x0", "y0"), "x0", "y0", 100.0, 50L)
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
    // (1.0,9) survives; (2.0,10) beats its prefix max 9; (3.0,1) dominated
    assert(got == Set((1.0, 9), (2.0, 10)))
  }

  test("bucket boundary: strictly-cheaper max in a PRIOR bucket dominates") {
    // bucketWidth 100: x=0.99 (snapped 99, bucket 0) vs x=1.00 (bucket 1)
    val pts = Seq((0.99, 7), (1.00, 7), (1.00, 8))
    val got = Skyline.frontier2d(pts.toDF("x0", "y0"), "x0", "y0", 100.0, 100L)
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
    assert(got == Set((0.99, 7), (1.00, 8)))
  }
}
