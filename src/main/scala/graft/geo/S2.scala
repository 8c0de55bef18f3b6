package graft.geo

/** Minimal pure-Scala S2 cell-id math: (lat, lon) → 64-bit cell id at a
  * level ∈ [0, 30] → hex token.
  *
  * Implements the published S2 geometry algorithm (s2geometry.io docs and
  * the open-source S2 library design): unit-sphere point → cube face + (u,v)
  * → quadratic (s,t) → 30-bit (i,j) → Hilbert-curve position with
  * swap/invert orientation lookup tables. Needed because the reference's
  * `com.google.common.geometry:s2-geometry` dependency (reference
  * project/Dependency.scala:18) is not available offline; only the cell-id
  * surface used by `S2CellTransformer` (reference S2CellTransformer.scala:58-61)
  * is provided: fromLatLng, parent(level), token, plus the inverse for
  * round-trip testing.
  */
object S2 {

  final val MaxLevel = 30
  final val FaceBits = 3
  final val PosBits = 2 * MaxLevel + 1 // 61

  private final val SwapMask = 0x01
  private final val InvertMask = 0x02

  // Hilbert curve sub-cell traversal orders and orientation changes for the
  // four orientations (canonical, swap, invert, swap+invert): pos → (i,j)
  // quadrant, its inverse, and the orientation XOR applied when descending.
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2),
    Array(0, 2, 3, 1),
    Array(3, 2, 0, 1),
    Array(3, 1, 0, 2))

  private val ijToPos: Array[Array[Int]] = {
    val inv = Array.fill(4)(new Array[Int](4))
    for (o <- 0 until 4; p <- 0 until 4) inv(o)(posToIJ(o)(p)) = p
    inv
  }

  private val posToOrientation: Array[Int] =
    Array(SwapMask, 0, 0, InvertMask | SwapMask)

  /** Largest-absolute-component face selection: 0..2 for +x/+y/+z, +3 when
    * the component is negative. Comparison order mirrors the S2 library's
    * `largestAbsComponent` exactly (ax>ay then vs az), so exact-|component|
    * ties resolve to z, then y — keeping face-boundary points token-
    * compatible with the genuine library.
    */
  private[geo] def face(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val f =
      if (ax > ay) { if (ax > az) 0 else 2 }
      else { if (ay > az) 1 else 2 }
    val value = f match { case 0 => x; case 1 => y; case 2 => z }
    if (value < 0) f + 3 else f
  }

  /** (face, xyz) → (u, v) gnomonic coordinates on that face. */
  private def validFaceXyzToUv(f: Int, x: Double, y: Double, z: Double): (Double, Double) =
    f match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case 5 => (-y / z, -x / z)
    }

  /** Inverse of [[validFaceXyzToUv]]: face + (u,v) → un-normalized xyz. */
  private def faceUvToXyz(f: Int, u: Double, v: Double): (Double, Double, Double) =
    f match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case 5 => (v, u, -1)
    }

  /** Quadratic projection (the S2 library default): minimizes cell-size
    * variation with a cheap transform.
    */
  private def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  private def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1) else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  private def stToIj(s: Double): Int =
    math.max(0, math.min((1 << MaxLevel) - 1, math.floor(s * (1 << MaxLevel)).toInt))

  /** Hilbert-curve encode: (face, i, j) at level 30 → leaf cell id.
    * Per-level recursion (30 steps) — simple, symmetric with [[toFaceIJ]],
    * and branch-free enough to stay cheap (~tens of ns per point).
    */
  def fromFaceIJ(f: Int, i: Int, j: Int): Long = {
    var orientation = f & SwapMask
    var pos = 0L
    var k = MaxLevel - 1
    while (k >= 0) {
      val ij = (((i >> k) & 1) << 1) + ((j >> k) & 1)
      val p = ijToPos(orientation)(ij)
      pos = (pos << 2) | p
      orientation ^= posToOrientation(p)
      k -= 1
    }
    (f.toLong << PosBits) | (pos << 1) | 1L
  }

  /** Hilbert-curve decode: leaf cell id → (face, i, j). */
  def toFaceIJ(id: Long): (Int, Int, Int) = {
    val f = (id >>> PosBits).toInt
    val pos = (id >> 1) & ((1L << (2 * MaxLevel)) - 1)
    var orientation = f & SwapMask
    var i = 0
    var j = 0
    var k = MaxLevel - 1
    while (k >= 0) {
      val p = ((pos >> (2 * k)) & 3L).toInt
      val ij = posToIJ(orientation)(p)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      orientation ^= posToOrientation(p)
      k -= 1
    }
    (f, i, j)
  }

  /** (lat, lon) degrees → leaf (level 30) cell id. */
  def fromLatLngDegrees(latDeg: Double, lonDeg: Double): Long = {
    val phi = math.toRadians(latDeg)
    val theta = math.toRadians(lonDeg)
    val cosPhi = math.cos(phi)
    val x = math.cos(theta) * cosPhi
    val y = math.sin(theta) * cosPhi
    val z = math.sin(phi)
    val f = face(x, y, z)
    val (u, v) = validFaceXyzToUv(f, x, y, z)
    fromFaceIJ(f, stToIj(uvToSt(u)), stToIj(uvToSt(v)))
  }

  /** Lowest-set-bit for a level: level 30 → 1, level 0 → 2^60. */
  def lsbForLevel(level: Int): Long = 1L << (2 * (MaxLevel - level))

  /** Ancestor cell id at the given level (id must be at a level ≥ level). */
  def parent(id: Long, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of [0, 30]")
    val lsb = lsbForLevel(level)
    (id & -lsb) | lsb
  }

  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  /** Hex token: 16 hex digits with trailing zeros stripped ("X" for 0). */
  def token(id: Long): String = {
    if (id == 0) return "X"
    val hex = f"$id%016x"
    var end = hex.length
    while (end > 1 && hex(end - 1) == '0') end -= 1
    hex.substring(0, end)
  }

  def fromToken(tok: String): Long =
    if (tok == "X") 0L
    else java.lang.Long.parseUnsignedLong(tok.padTo(16, '0'), 16)

  /** Center of a cell id, as (lat, lon) degrees — used for round-trip tests. */
  def centerLatLngDegrees(id: Long): (Double, Double) = {
    val lvl = level(id)
    val (f, i, j) = toFaceIJ(id | (lsbForLevel(MaxLevel))) // leaf-align
    // center of the cell at lvl: midpoint of its ij range
    val cellSize = 1 << (MaxLevel - lvl)
    val iC = (i & ~(cellSize - 1)) + cellSize / 2
    val jC = (j & ~(cellSize - 1)) + cellSize / 2
    val s = (if (lvl == MaxLevel) i + 0.5 else iC.toDouble) / (1 << MaxLevel)
    val t = (if (lvl == MaxLevel) j + 0.5 else jC.toDouble) / (1 << MaxLevel)
    val (x, y, z) = faceUvToXyz(f, stToUv(s), stToUv(t))
    val lat = math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))
    val lon = math.toDegrees(math.atan2(y, x))
    (lat, lon)
  }
}
