package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series resampling onto a regular grid with
  * last-observation-carried-forward (LOCF) gap fill — the prepass that
  * turns an irregular event stream into the fixed-step feature matrix a
  * training pipeline actually consumes (one row per key per tick, no
  * holes), and the batch twin of a windowed stream aggregation.
  *
  * Semantics per key:
  *   - tick(t) = floor(t / step); the grid spans [min tick, max tick] of
  *     the key's own observations (no global span — a key active for one
  *     day contributes one day of rows);
  *   - each tick's raw value is the TERMINAL observation inside it (max
  *     (time, tiebreakCol)) — the "closing price" convention, made
  *     deterministic under duplicate timestamps by the tiebreak column;
  *   - empty ticks inherit the most recent earlier tick's value (LOCF).
  *     The first tick is never empty by construction, so the fill is
  *     total.
  *
  * Beyond-reference operator (LLM-pipeline extension, temporal family).
  *
  * Scale shape: everything is keyed by the (high-cardinality) series key —
  * one partial-aggregated groupBy per (key, tick) for terminal values, one
  * tiny per-key span row, one `sequence` explode bounded by span/step (a
  * design parameter, not data-dependent blow-up), and one per-key ordered
  * window for the fill. No global sort, no low-cardinality window
  * partition; a hot key costs its own span/step rows, nothing more. The
  * span explode means a single key observed across the whole corpus
  * lifetime emits lifetime/step rows — choose `step` so that number is
  * sane (the same contract as any resample).
  */
class Resampler(
    stepMicros: Long,
    keyCol: String = "user_id",
    timeCol: String = "ts_us",
    valueCol: String = "value",
    tiebreakCol: String = "event_id") {
  require(stepMicros > 0, s"stepMicros ($stepMicros) must be positive")

  /** (keyCol, tick, value): dense per-key grid, LOCF-filled. `tick` is the
    * grid index (floor(time/step)); multiply by `stepMicros` to recover the
    * epoch-µs bucket start.
    */
  def resample(df: DataFrame): DataFrame = {
    // exact integer floor-div: (t - t mod step) is a multiple of step, and
    // dividing an exactly-representable multiple is exact in DOUBLE — a
    // plain floor(t / step) can land one off when the quotient rounds up
    // across an integer boundary at epoch-µs magnitudes
    val t = col(timeCol).cast("long")
    val tick = ((t - pmod(t, lit(stepMicros))) / lit(stepMicros)).cast("long")
    // terminal observation per (key, tick): max_by over the (time, tiebreak)
    // tuple — a partial-aggregated argmax, not a window
    val terminal = df
      .select(col(keyCol), tick.as("tick"),
        col(valueCol).as("__v"), col(timeCol).as("__t"), col(tiebreakCol).as("__tb"))
      .groupBy(col(keyCol), col("tick"))
      .agg(max_by(col("__v"), struct(col("__t"), col("__tb"))).as("__v"))
    val span = terminal.groupBy(col(keyCol))
      .agg(min(col("tick")).as("__t0"), max(col("tick")).as("__t1"))
    val grid = span
      .select(col(keyCol), explode(sequence(col("__t0"), col("__t1"))).as("tick"))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(terminal, Seq(keyCol, "tick"), "left")
      .withColumn(valueCol, last(col("__v"), ignoreNulls = true).over(fill))
      .drop("__v")
  }
}
