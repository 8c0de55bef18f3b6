package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.PageRank

/** Graph-centrality queries: the crawl-curation authority-scoring shape
  * (PageRank over a link graph) run on the deterministic part–supplier
  * bipartite graph from lineitem.
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // 3-iteration PageRank over the symmetrized part–supplier graph.
    // Node encoding keeps the two id spaces disjoint: part → 2k,
    // supplier → 2k+1. Ranks rounded to the 1e-9 grid (values ~1/N):
    // float-sum order across engines drifts ~1e-16, far inside the grid.
    "q110_pagerank" -> ((s, dir) => {
      val ed = Tables.lineitem(s, dir)
        .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val sym = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      new PageRank(iterations = 3).run(sym)
        .select(col("node"), round(col("rank"), 9).as("rank"))
    })
  )

  val oracles: Map[String, String] = Map(
    // unrolled 3-iteration replay; damping constants written EXACTLY as
    // the operator computes them ((1.0 - 0.85), not 0.15 — they differ in
    // the last ulp)
    "q110_pagerank" ->
      """WITH ed AS (
        |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed
        |), nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
        |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |r0 AS (SELECT node, 1.0 / n AS rank FROM nodes, nn),
        |c1 AS (
        |  SELECT e.dst, sum(r0.rank / deg.d) AS s
        |  FROM r0 JOIN deg ON deg.src = r0.node JOIN e ON e.src = r0.node
        |  GROUP BY 1
        |), r1 AS (
        |  SELECT node, (1.0 - 0.85) / n + 0.85 * coalesce(s, 0.0) AS rank
        |  FROM nodes LEFT JOIN c1 ON c1.dst = node, nn
        |), c2 AS (
        |  SELECT e.dst, sum(r1.rank / deg.d) AS s
        |  FROM r1 JOIN deg ON deg.src = r1.node JOIN e ON e.src = r1.node
        |  GROUP BY 1
        |), r2 AS (
        |  SELECT node, (1.0 - 0.85) / n + 0.85 * coalesce(s, 0.0) AS rank
        |  FROM nodes LEFT JOIN c2 ON c2.dst = node, nn
        |), c3 AS (
        |  SELECT e.dst, sum(r2.rank / deg.d) AS s
        |  FROM r2 JOIN deg ON deg.src = r2.node JOIN e ON e.src = r2.node
        |  GROUP BY 1
        |), r3 AS (
        |  SELECT node, (1.0 - 0.85) / n + 0.85 * coalesce(s, 0.0) AS rank
        |  FROM nodes LEFT JOIN c3 ON c3.dst = node, nn
        |)
        |SELECT node, round(rank, 9) AS rank FROM r3""".stripMargin
  )
}
