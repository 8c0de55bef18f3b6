package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class S2Spec extends AnyFunSuite {

  val rnd = new scala.util.Random(42)
  def randLat(): Double = rnd.nextDouble() * 179.8 - 89.9
  def randLon(): Double = rnd.nextDouble() * 359.8 - 179.9

  test("axis points land on the right faces") {
    def faceOf(lat: Double, lon: Double): Int =
      (S2.fromLatLngDegrees(lat, lon) >>> 61).toInt
    assert(faceOf(0, 0) === 0)     // +x
    assert(faceOf(0, 90) === 1)    // +y
    assert(faceOf(90, 0) === 2)    // +z
    assert(faceOf(0, 180) === 3)   // -x
    assert(faceOf(0, -90) === 4)   // -y
    assert(faceOf(-90, 0) === 5)   // -z
  }

  test("published face-cell tokens: the six level-0 cells are 1,3,5,7,9,b") {
    // External golden: the S2 docs publish the level-0 cell ids as
    // (face << 61) | (1 << 60), whose tokens (hex, trailing zeros
    // stripped) are exactly "1","3","5","7","9","b". Asserted through the
    // full latlng → leaf → parent(0) → token pipeline, not on constants.
    val cases = Seq(
      (0.0, 0.0, "1"), (0.0, 90.0, "3"), (90.0, 0.0, "5"),
      (0.0, 180.0, "7"), (0.0, -90.0, "9"), (-90.0, 0.0, "b"))
    cases.foreach { case (lat, lon, want) =>
      assert(S2.token(S2.parent(S2.fromLatLngDegrees(lat, lon), 0)) === want,
        s"face token for ($lat, $lon)")
    }
  }

  test("city coordinates land on the documented faces") {
    // The face layout is published: face 0 centered (0E,0N), 1 (90E), 2
    // (north pole), 3 (180E), 4 (90W), 5 (south pole). Spot-check with
    // city coordinates whose dominant axis is unambiguous.
    def face(lat: Double, lon: Double): Int =
      (S2.fromLatLngDegrees(lat, lon) >>> 61).toInt
    assert(face(5.6037, -0.1870) === 0)    // Accra: +x dominant
    assert(face(1.3521, 103.8198) === 1)   // Singapore: +y dominant
    assert(face(82.5, -62.3) === 2)        // Alert, Nunavut: +z dominant
    assert(face(-36.8485, 174.7633) === 3) // Auckland: -x dominant
    assert(face(40.7128, -74.0060) === 4)  // New York: -y dominant
    assert(face(-77.85, 166.67) === 5)     // McMurdo Station: -z dominant
  }

  test("face centers encode to centered i/j") {
    val id = S2.fromLatLngDegrees(0, 0)
    val (f, i, j) = S2.toFaceIJ(id)
    assert(f === 0)
    assert(math.abs(i - (1 << 29)) <= 1)
    assert(math.abs(j - (1 << 29)) <= 1)
  }

  test("fromFaceIJ/toFaceIJ round-trip (1000 random cells)") {
    for (_ <- 1 to 1000) {
      val f = rnd.nextInt(6)
      val i = rnd.nextInt(1 << 30)
      val j = rnd.nextInt(1 << 30)
      assert(S2.toFaceIJ(S2.fromFaceIJ(f, i, j)) === ((f, i, j)))
    }
  }

  test("Hilbert curve continuity: consecutive leaf positions are adjacent cells") {
    // strong structural check of the traversal tables: walking the curve
    // moves exactly one step in i or j
    val start = S2.fromFaceIJ(2, 12345, 67890)
    var prev = S2.toFaceIJ(start)
    for (step <- 1 to 4096) {
      val id = start + 2L * step // next leaf position on the curve
      val (f, i, j) = S2.toFaceIJ(id)
      if (f == prev._1) {
        val di = math.abs(i - prev._2)
        val dj = math.abs(j - prev._3)
        assert(di + dj === 1, s"step $step jumped by ($di,$dj)")
      }
      prev = (f, i, j)
    }
  }

  test("parent is hierarchical and level() is consistent (1000 random points)") {
    for (_ <- 1 to 1000) {
      val (lat, lon, lvl) = (randLat(), randLon(), rnd.nextInt(30))
      val leaf = S2.fromLatLngDegrees(lat, lon)
      assert(S2.level(leaf) === 30)
      val p = S2.parent(leaf, lvl)
      assert(S2.level(p) === lvl)
      assert(S2.parent(p, lvl) === p) // idempotent
      // high bits (face + position above the level) agree between leaf and parent
      val lsb = S2.lsbForLevel(lvl)
      assert((leaf & -(lsb << 1)) === (p & -(lsb << 1)))
    }
  }

  test("token round-trips (1000 random cells)") {
    for (_ <- 1 to 1000) {
      val id = S2.parent(S2.fromLatLngDegrees(randLat(), randLon()), rnd.nextInt(31))
      assert(S2.fromToken(S2.token(id)) === id)
    }
  }

  test("leaf center round-trip: re-encoding a leaf's center yields the same leaf") {
    for (_ <- 1 to 1000) {
      val (lat, lon) = (randLat(), randLon())
      val leaf = S2.fromLatLngDegrees(lat, lon)
      val (clat, clon) = S2.centerLatLngDegrees(leaf)
      assert(math.abs(clat - lat) < 1e-3, s"center lat $clat vs $lat")
      assert(S2.fromLatLngDegrees(clat, clon) === leaf)
    }
  }

  test("center round-trip at coarse levels stays inside the cell") {
    for (_ <- 1 to 1000) {
      val lvl = 4 + rnd.nextInt(17)
      val cell = S2.parent(S2.fromLatLngDegrees(randLat(), randLon()), lvl)
      val (clat, clon) = S2.centerLatLngDegrees(cell)
      assert(S2.parent(S2.fromLatLngDegrees(clat, clon), lvl) === cell)
    }
  }

  test("level-0 tokens match the published S2 cell-id layout") {
    // face cell ids are (face << 61) | 2^60 → tokens 1,3,5,7,9,b
    // (s2geometry.io cell-id layout; verifiable against the real library)
    def tok(lat: Double, lon: Double): String =
      S2.token(S2.parent(S2.fromLatLngDegrees(lat, lon), 0))
    assert(tok(0, 0) === "1")
    assert(tok(0, 90) === "3")
    assert(tok(90, 0) === "5")
    assert(tok(0, 180) === "7")
    assert(tok(0, -90) === "9")
    assert(tok(-90, 0) === "b")
  }

  test("face ties prefer z then y, like S2 largestAbsComponent") {
    assert(S2.face(1, 1, 1) === 2)    // three-way tie → z
    assert(S2.face(1, 0, 1) === 2)    // x/z tie → z
    assert(S2.face(0, 1, 1) === 2)    // y/z tie → z
    assert(S2.face(1, 1, 0) === 1)    // x/y tie → y
    assert(S2.face(-1, 1, 0) === 1)   // |x|/|y| tie → y
    assert(S2.face(1, 1, -1) === 5)   // tie with negative z → face 2+3
    assert(S2.face(2, 1, 1) === 0)    // clear x winner unchanged
  }
}
