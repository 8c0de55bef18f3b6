package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction: for every NON-adjacent node pair
  * sharing at least one neighbor, the three classic locality indices —
  * common-neighbor count, the resource-allocation index RA = Σ_w
  * 1/deg(w) (Zhou, Lü, Zhang 2009 — the top performer of the
  * transcendental-free family; Adamic-Adar's 1/ln(deg) variant ranks
  * identically on most graphs but costs a per-engine log whose last ulp
  * drifts across libms, so RA is the deterministic choice), and the
  * neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)|. On a near-dup pair
  * graph these are "which documents are one template-step from
  * duplicating each other" — the predictive complement to the
  * descriptive [[Coreness]]/[[LabelPropagation]] family.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Deterministic contract ==
  *
  * Degrees and counts are integers; RA sums identical rational doubles
  * (1/deg) whose cross-engine sum-order drift is ~1e-16 — round at the
  * caller. Jaccard is a single division of exact integers.
  *
  * == Scale shape ==
  *
  * One wedge enumeration — the self-join of the adjacency list on the
  * middle node, Σ_w deg(w)² rows, the same budget [[TriangleCount]]
  * pays — then one map-side-combinable aggregation per candidate pair,
  * one anti-join against the edge list, two degree lookups. A hub's
  * deg² blowup is intrinsic to common-neighbor scores (every pair it
  * connects IS a candidate); cap hub degrees upstream if the graph has
  * them (the near-dup and sparse co-purchase graphs here do not).
  */
object LinkPrediction {

  /** (id_a, id_b, cn, ra, jaccard) with id_a < id_b, for every
    * non-adjacent pair with cn >= 1. Edges are treated as undirected:
    * self-loops dropped, duplicates and orientation collapsed (the
    * [[KCore]] contract).
    */
  def scores(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .where(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
      .distinct()
    val sym = und.select(col("a").as("s"), col("b").as("d"))
      .union(und.select(col("b").as("s"), col("a").as("d")))
    val deg = sym.groupBy(col("s")).agg(count(lit(1)).as("dg"))
      .select(col("s").as("node"), col("dg"))
    // adjacency with the middle node's degree riding along; one side's
    // columns renamed BEFORE the self-join (the ts-slope discipline)
    val nbr = sym.join(deg, sym("s") === deg("node"))
      .select(sym("s").as("w"), sym("d").as("n"), deg("dg").as("dgw"))
    val rhs = nbr.select(col("w").as("w2"), col("n").as("n2"))
    val cand = nbr
      .join(rhs, col("w") === col("w2") && col("n") < col("n2"))
      .groupBy(col("n").as("id_a"), col("n2").as("id_b"))
      .agg(count(lit(1)).as("cn"), sum(lit(1.0) / col("dgw")).as("ra"))
    val nonEdges = cand.join(
      und.select(col("a").as("id_a"), col("b").as("id_b")),
      Seq("id_a", "id_b"), "left_anti")
    nonEdges
      .join(deg.select(col("node").as("id_a"), col("dg").as("dga")), "id_a")
      .join(deg.select(col("node").as("id_b"), col("dg").as("dgb")), "id_b")
      .select(col("id_a"), col("id_b"), col("cn"), col("ra"),
        (col("cn").cast("double") / (col("dga") + col("dgb") - col("cn")))
          .as("jaccard"))
  }
}
