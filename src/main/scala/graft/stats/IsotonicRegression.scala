package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Isotonic regression via distributed pool-adjacent-violators (PAV) —
  * the weighted least-squares fit constrained to be NON-DECREASING in x.
  * The classifier-calibration workhorse (Zadrozny & Elkan KDD'02): map
  * raw scores to empirical probabilities without assuming a parametric
  * shape, the step up from [[graft.evaluation.ScoreCalibration]]'s fixed
  * binning. Solution characterized by the minimax theorem (Robertson,
  * Wright, Dykstra 1988): f(i) = max_{j<=i} min_{k>=i} mean(y_j..y_k) —
  * which is what the DuckDB oracle replays, so engine and oracle agree
  * through entirely different algorithms (the strongest oracle form
  * short of exact identity).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Algorithm (the Spark MLlib shape, reimplemented) ==
  *
  * 1. Pool exact x-ties: groupBy(x) -> (Σy, n) — PAV is defined on the
  *    distinct-x sequence.
  * 2. Range-partition by x, sort within partitions, run the classic
  *    stack PAV per partition — each partition compresses its monotone
  *    violations into blocks independently (correct because PAV block
  *    merges are local: a partition's interior solution can only be
  *    COARSENED by cross-boundary merges, never split).
  * 3. One final stack PAV over the concatenated per-partition blocks in
  *    a single range partition — input is already block-compressed, so
  *    this pass touches #blocks rows, not #points.
  * 4. Expand blocks back to per-distinct-x fitted values with a
  *    broadcast range lookup (blocks are sorted; binary search per x).
  *
  * == Deterministic contract ==
  *
  * Violation tests use cross-multiplied sums (sy_a * w_b >= sy_b * w_a),
  * never divided means: with integer-valued y (binary labels — the
  * calibration case) and counts < 2^53 every comparison is EXACT, so the
  * block structure is partition-count-proof and the fitted values are
  * exact rationals; float enters only at the final division. Real-valued
  * y keeps the same code path with ~1-ulp comparison fuzz (document
  * rounding accordingly).
  *
  * == Scale shape ==
  *
  * One keyed aggregation (tie pooling), one range shuffle, per-partition
  * linear scans, then a single-task scan over pre-compressed blocks —
  * the unavoidable sequential tail of PAV, bounded by the block count,
  * which step-1 pooling bounds by the distinct-x count (a quantized
  * score grid at the caller keeps it in the thousands). The expansion
  * broadcast carries one row per FINAL block.
  */
class IsotonicRegression(partitions: Int = 32) {

  require(partitions >= 1, s"partitions ($partitions) must be >= 1")

  private val blockSchema = StructType(Seq(
    StructField("xlo", DoubleType, nullable = false),
    StructField("xhi", DoubleType, nullable = false),
    StructField("sy", DoubleType, nullable = false),
    StructField("w", DoubleType, nullable = false)))

  /** (x, fitted, w): the isotonic fit at every distinct x (w = pooled
    * weight at that x). `fitted` is non-decreasing in x.
    */
  def fit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import IsotonicRegression.{pav, Block}
    val spark = df.sparkSession
    val pooled = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).cast("double").as("w"))
    val pass1 = spark.createDataFrame(
      pooled
        .repartitionByRange(partitions, col("x"))
        .sortWithinPartitions(col("x"))
        .queryExecution.toRdd.mapPartitions { it =>
          pav(it.map(r => Block(r.getDouble(0), r.getDouble(0),
            r.getDouble(1), r.getDouble(2)))).map(_.toRow)
        },
      blockSchema)
    // the sequential tail: all (pre-compressed) blocks through one more
    // stack pass in a single range partition
    val finalBlocks = spark.createDataFrame(
      pass1
        .repartitionByRange(1, col("xlo"))
        .sortWithinPartitions(col("xlo"))
        .queryExecution.toRdd.mapPartitions { it =>
          pav(it.map(r => Block(r.getDouble(0), r.getDouble(1),
            r.getDouble(2), r.getDouble(3)))).map(_.toRow)
        },
      blockSchema)
    val lookup = broadcast(finalBlocks
      .select(col("xlo"), col("xhi"), (col("sy") / col("w")).as("fitted")))
    pooled
      .join(lookup, pooled("x") >= lookup("xlo") && pooled("x") <= lookup("xhi"))
      .select(col("x"), col("fitted"), col("w"))
  }
}

object IsotonicRegression {

  private case class Block(xlo: Double, xhi: Double, sy: Double, w: Double) {
    def toRow: Row = Row(xlo, xhi, sy, w)
  }

  /** Classic stack PAV over an x-sorted block iterator: push each block,
    * pool while the top two violate monotonicity (mean_prev >= mean_cur,
    * compared by exact cross-multiplication — merging EQUAL means too,
    * which never changes fitted values but keeps blocks canonical).
    */
  private def pav(it: Iterator[Block]): Iterator[Block] = {
    val stack = ArrayBuffer.empty[Block]
    for (b <- it) {
      var cur = b
      while (stack.nonEmpty &&
          stack.last.sy * cur.w >= cur.sy * stack.last.w) {
        val p = stack.remove(stack.size - 1)
        cur = Block(p.xlo, cur.xhi, p.sy + cur.sy, p.w + cur.w)
      }
      stack += cur
    }
    stack.iterator
  }
}
