package graft.feature

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two snapshots of a table — the
  * Population Stability Index (PSI) gate a pipeline runs before promoting
  * a new ingest: PSI = Σ_b (p_b − q_b)·ln(p_b / q_b) over buckets b,
  * with the conventional reading <0.1 stable / 0.1-0.25 drifting / >0.25
  * broken.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build
  * brief): corpus monitoring (source mix, document-length profile, token
  * distributions) between crawl snapshots.
  *
  * Deterministic contract: bucket shares are smoothed as
  * `(count + 0.5) / (n + 0.5·B)` (Laplace half-count over the observed
  * bucket set), so empty buckets never produce ln(0) and the whole
  * computation is closed-form replayable; numeric bucket bounds come
  * from the BEFORE snapshot's min/max (equal-width), so the reference
  * frame is fixed while `after` moves.
  *
  * Scale: two partial-aggregated groupBys (one per side), a broadcast
  * stats row, and a bucket-keyed full-outer join over ≤B (or
  * distinct-category) rows. Neither snapshot is ever shuffled whole.
  */
class DriftMonitor(numBuckets: Int = 10) {
  require(numBuckets > 1, s"numBuckets ($numBuckets) must be > 1")

  /** PSI terms per (groupCols*, bucketCol): counts joined full-outer on
    * the bucket (within each group), per-GROUP totals broadcast back. An
    * empty `groupCols` monitors the whole table as one distribution.
    */
  private def psiTerms(
      before: DataFrame, after: DataFrame,
      bucketCol: String, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols :+ bucketCol
    val b = before.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_before"))
    val a = after.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_after"))
    // NULL-SAFE key match (<=>), not a USING join: a NULL category present
    // in both snapshots must be ONE matched row, not a spurious
    // (p, 0) + (0, q) vanished/appeared pair that inflates PSI past the
    // broken threshold on identical distributions (and double-counts the
    // bucket count nb used for smoothing)
    def bk(k: String) = col(s"__b.`$k`")
    def ak(k: String) = col(s"__a.`$k`")
    val cond = keys.map(k => bk(k) <=> ak(k)).reduce(_ && _)
    val joined = b.as("__b").join(a.as("__a"), cond, "full_outer")
      .select(keys.map(k => coalesce(bk(k), ak(k)).as(k)) ++ Seq(
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after")): _*)
    val totAgg = joined.groupBy(groupCols.map(col): _*).agg(
      sum(col("n_before")).cast("double").as("tb"),
      sum(col("n_after")).cast("double").as("ta"),
      count(lit(1)).cast("double").as("nb"))
    val withTot =
      if (groupCols.isEmpty) joined.crossJoin(broadcast(totAgg))
      else joined.join(broadcast(totAgg), groupCols)
    withTot
      .select(keys.map(col) ++ Seq(col("n_before"), col("n_after"),
        ((col("n_before") + 0.5) / (col("tb") + lit(0.5) * col("nb"))).as("p"),
        ((col("n_after") + 0.5) / (col("ta") + lit(0.5) * col("nb"))).as("q")): _*)
      .select(keys.map(col) ++ Seq(col("n_before"), col("n_after"),
        ((col("p") - col("q")) * log(col("p") / col("q"))).as("psi_term")): _*)
  }

  /** Per-category drift terms (category, n_before, n_after, psi_term) for
    * a categorical column; total PSI = sum of terms.
    */
  def categorical(before: DataFrame, after: DataFrame, keyCol: String): DataFrame =
    psiTerms(before.select(col(keyCol)), after.select(col(keyCol)), keyCol, Nil)

  /** Per-group categorical drift: one distribution per value of
    * `groupCol` (e.g. the source mix per language) — each group's PSI is
    * the sum of its terms. Group cardinality must be broadcast-small.
    */
  def categoricalBy(
      before: DataFrame, after: DataFrame,
      groupCol: String, keyCol: String): DataFrame =
    psiTerms(before.select(col(groupCol), col(keyCol)),
      after.select(col(groupCol), col(keyCol)), keyCol, Seq(groupCol))

  /** Per-bucket drift terms over `numBuckets` equal-width buckets of a
    * numeric column, bounds fixed by the BEFORE snapshot (values outside
    * clamp into the edge buckets).
    *
    * NULL values are EXCLUDED from both snapshots — a missing value has
    * no position on the value axis, and the unguarded arithmetic would
    * silently bucket every NULL as a max-range observation (floor(NULL)
    * is NULL, least skips it, greatest returns numBuckets-1), reading a
    * NULL-rate change as top-bucket drift. Monitor the missing-rate
    * separately: `categorical(before, after, isnull-flag)`. If the BEFORE
    * snapshot has no non-null values there is no reference frame: zero
    * term rows (PSI 0.0, no signal — the cellDrift convention).
    */
  def numeric(before: DataFrame, after: DataFrame, valCol: String): DataFrame = {
    val stats = broadcast(before.agg(
      min(col(valCol)).cast("double").as("__mn"),
      max(col(valCol)).cast("double").as("__mx")))
    def bucketed(df: DataFrame): DataFrame =
      df.select(col(valCol)).where(col(valCol).isNotNull).crossJoin(stats)
        .where(col("__mn").isNotNull) // empty baseline -> no reference frame
        .select(when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(greatest(lit(0L), least(lit(numBuckets - 1L),
            floor((col(valCol) - col("__mn")) / (col("__mx") - col("__mn")) * numBuckets)
              .cast("long"))))
          .as("bucket"))
    psiTerms(bucketed(before), bucketed(after), "bucket", Nil)
  }
}
