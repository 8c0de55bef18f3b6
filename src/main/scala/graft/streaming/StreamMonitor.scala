package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed data-quality monitor: per (tumbling window, group) row counts,
  * null counts, and value min/avg/max — the freshness/drift dashboard a
  * production ingest pipeline keeps over its event stream.
  *
  * Beyond-reference operator (LLM-pipeline extension). One code path serves
  * batch frames and `readStream` sources unchanged (the watermark is a
  * no-op in batch; in streaming it bounds the aggregation state to the
  * late-data horizon). All aggregates are algebraic partials — the only
  * shuffle keys on (window, group), which scales with time × group
  * cardinality, not data size.
  */
object StreamMonitor {

  /** (window_start, group, n_events, n_nulls, avg_value, min_value,
    * max_value) per tumbling window.
    */
  def stats(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "2 hours",
      tsCol: String = "ts",
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(groupCol))
      .agg(
        count(lit(1)).as("n_events"),
        (count(lit(1)) - count(col(valueCol))).as("n_nulls"),
        avg(col(valueCol)).as("avg_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(col("window.start").as("window_start"), col(groupCol),
        col("n_events"), col("n_nulls"),
        col("avg_value"), col("min_value"), col("max_value"))

  /** [[stats]] plus a per-window distinct-entity estimate from the HLL
    * sketch aggregate — "how many distinct users/sessions/documents did
    * this window actually see", the monitor question an exact
    * count(DISTINCT) cannot answer under streaming state bounds. The
    * sketch's partial/merge cycle is exactly what streaming aggregation
    * state does between micro-batches, so the estimate is identical to
    * the batch run over the same data (parity spec); state per (window,
    * group) stays 2^p ints regardless of entity cardinality.
    */
  def statsWithDistinct(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "2 hours",
      tsCol: String = "ts",
      groupCol: String = "event_type",
      valueCol: String = "value",
      entityCol: String = "user_id",
      p: Int = 10): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(groupCol))
      .agg(
        count(lit(1)).as("n_events"),
        (count(lit(1)) - count(col(valueCol))).as("n_nulls"),
        avg(col(valueCol)).as("avg_value"),
        graft.sql.functions.hllSketch(col(entityCol).cast("string"), p)
          .as("__regs"))
      .select(col("window.start").as("window_start"), col(groupCol),
        col("n_events"), col("n_nulls"), col("avg_value"),
        round(graft.sql.functions.hllEstimate(col("__regs"), p), 6)
          .as("est_entities"))
}
