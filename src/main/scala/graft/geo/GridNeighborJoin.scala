package graft.geo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact ε-neighbor spatial self-join via grid blocking: all point pairs
  * within Euclidean distance `eps` in a 2-D coordinate space, found by an
  * equi-join on ε-sized grid cells — never the O(n²) cross join.
  *
  * Completeness: with cell side = eps, two points within eps differ by at
  * most one cell index per axis, so the pair is guaranteed to meet where
  * the left point's HOME cell appears among the right point's 3×3 cell
  * neighborhood. Each unordered pair is emitted exactly once: the home
  * cell is unique (one role assignment survives the `id_a < id_b` filter)
  * and the 3×3 explode contains any given cell at most once.
  *
  * Determinism: the distance is pure arithmetic ((dx² + dy²) ≤ eps²) — no
  * libm calls — so the boundary decision is bit-identical across engines
  * and the SQL oracle replays it exactly (q139). For geographic
  * coordinates this is degree-space distance (a deliberate contract: use
  * a projected/scaled coordinate pair when metric distance matters;
  * [[S2CellTransformer]] covers the spherical-cell use case).
  *
  * Scale: one 9× row-local explode of one side, ONE cell-keyed equi-join,
  * row-local verification. Pair work is Σ over cells of |cell|·|3×3
  * neighborhood| — bounded by the grid resolution (= eps), the standard
  * density knob: a hot cell costs its own neighborhood product, nothing
  * global. Self-pairs and duplicate coordinates are handled by the strict
  * id ordering.
  */
class GridNeighborJoin(
    eps: Double,
    idCol: String = "id",
    xCol: String = "x",
    yCol: String = "y") {
  require(eps > 0 && !eps.isNaN && !eps.isInfinite, s"eps ($eps) must be a positive finite number")

  /** (id_a, id_b, dist2): all pairs with (xa−xb)² + (ya−yb)² ≤ eps², each
    * once with id_a < id_b. */
  def pairs(points: DataFrame): DataFrame = {
    val p = points.select(col(idCol), col(xCol).cast("double").as("__x"),
      col(yCol).cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val cx = floor(col("__x") / lit(eps)).cast("long")
    val cy = floor(col("__y") / lit(eps)).cast("long")
    val home = p.select(col(idCol).as("id_a"), col("__x").as("__xa"),
      col("__y").as("__ya"), cx.as("__cx"), cy.as("__cy"))
    val neigh = p
      .select(col(idCol).as("id_b"), col("__x").as("__xb"), col("__y").as("__yb"),
        cx.as("__bx"), cy.as("__by"))
      .select(col("id_b"), col("__xb"), col("__yb"),
        explode(sequence(col("__bx") - 1, col("__bx") + 1)).as("__cx"), col("__by"))
      .select(col("id_b"), col("__xb"), col("__yb"), col("__cx"),
        explode(sequence(col("__by") - 1, col("__by") + 1)).as("__cy"))
    val d2 = (col("__xa") - col("__xb")) * (col("__xa") - col("__xb")) +
      (col("__ya") - col("__yb")) * (col("__ya") - col("__yb"))
    home.join(neigh, Seq("__cx", "__cy"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist2", d2)
      .where(col("dist2") <= lit(eps * eps))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
