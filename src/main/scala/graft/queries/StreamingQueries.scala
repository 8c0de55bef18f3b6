package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{Sessionize, StreamMonitor}

/** Event-stream queries (batch replay of the streaming operators over the
  * events table, so the DuckDB oracle can verify the session semantics).
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // gap-based sessionization (4h gap) + per-session rollup. The events
    // table stores µs timestamps (NTZ); both engines share the integer
    // epoch-µs axis (session zone UTC) so the time axis is bit-identical.
    "q28_sessionize" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
      Sessionize.batch(ev, tsCol = "ts_us",
        gap = 14400L * 1000000L, toTicks = identity)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"),
          min(col("ts_us")).as("session_start_us"),
          max(col("ts_us")).as("session_end_us"))
    }),

    // tumbling 1h event-type rollup through the SAME helper the streaming
    // path uses (watermark is a no-op in batch); window starts emitted as
    // epoch µs so the time axis is engine-portable.
    "q43_window_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_t", expr("cast(ts as timestamp)"))
      Sessionize.windowedEventCounts(ev, windowLength = "1 hour",
        watermark = "2 hours", tsCol = "ts_t", typeCol = "event_type")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"),
          round(col("total_value"), 2).as("total_value"))
    }),

    // windowed data-quality monitor (batch replay of the streaming path):
    // per-hour, per-type counts, null counts, and value min/avg/max
    "q91_stream_monitor" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_t", expr("cast(ts as timestamp)"))
        // plant deterministic nulls so the null-rate column is exercised
        .withColumn("value", when(col("event_id") % 97 === 0, lit(null)).otherwise(col("value")))
      StreamMonitor.stats(ev, windowLength = "1 hour", watermark = "2 hours",
        tsCol = "ts_t", groupCol = "event_type", valueCol = "value")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"), col("n_nulls"),
          round(col("avg_value"), 6).as("avg_value"),
          col("min_value"), col("max_value"))
    }),

    // monitor + distinct-entity estimate: the HLL sketch aggregate runs
    // INSIDE the windowed (streaming-capable) aggregation — per-window
    // distinct users under bounded state; batch replay here, streaming
    // parity pinned by StreamMonitorSpec
    "q141_monitor_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_t", expr("cast(ts as timestamp)"))
      StreamMonitor.statsWithDistinct(ev, windowLength = "1 hour",
        watermark = "2 hours", tsCol = "ts_t", groupCol = "event_type",
        valueCol = "value", entityCol = "user_id", p = 10)
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"), col("n_nulls"),
          round(col("avg_value"), 6).as("avg_value"),
          col("est_entities"))
    }),

    // streaming heavy hitters, batch-gated (the q177 pattern): monitor()
    // on a batch frame is the EXACT per-group top-k (err = 0) — the
    // backfill half of the live SpaceSaving monitor, whose sketch bounds
    // StreamingTopKSpec pins against these same exact counts. Top-5
    // users per event type; ties by item ascending.
    "q179_topk_stream" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("event_type").as("group"),
          col("user_id").cast("string").as("item"),
          col("ts").cast("timestamp").as("ts"))
        .as[graft.streaming.StreamingTopK.ItemEvent]
      graft.streaming.StreamingTopK.monitor(ev, capacity = 64, k = 5)
    }),

    // windowed PSI drift monitor (batch replay of the one-aggregation
    // streaming path): per (hour, event_type), the value distribution
    // vs a fixed skewed reference (probs ∝ bin index + 1) over 16 bins
    // of [0, 200) — width 12.5 exactly representable, smoothing and
    // term order replayed by the oracle, ln rounded at 6dp (the q111
    // discipline for cross-engine libm)
    "q182_drift_stream" -> ((s, dir) => {
      graft.streaming.DriftStream.psi(
        Tables.events(s, dir).withColumn("ts_t", expr("cast(ts as timestamp)")),
        refProbs = DRIFT_REF, lo = 0.0, hi = 200.0,
        windowLength = "1 hour", watermark = "2 hours",
        tsCol = "ts_t", groupCol = "event_type", valueCol = "value")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"),
          round(col("psi"), 6).as("psi"))
    }),

    // windowed quantile monitor (batch replay of the one-aggregation
    // streaming path): per (hour, event_type), interpolated histogram
    // p50/p90/p99 of value over 32 bins of [0, 200) — width 6.25 exactly
    // representable, the rank-target/interpolation arithmetic replayed by
    // the oracle in the identical +,·,/ order, outputs rounded at 6dp
    "q185_quantile_stream" -> ((s, dir) => {
      graft.streaming.QuantileStream.quantiles(
        Tables.events(s, dir).withColumn("ts_t", expr("cast(ts as timestamp)")),
        qs = Seq(0.5, 0.9, 0.99), lo = 0.0, hi = 200.0, numBins = 32,
        windowLength = "1 hour", watermark = "2 hours",
        tsCol = "ts_t", groupCol = "event_type", valueCol = "value")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"),
          round(col("q_50"), 6).as("q_50"),
          round(col("q_90"), 6).as("q_90"),
          round(col("q_99"), 6).as("q_99"))
    }),

    // tail-precision variant (r15 verdict #7): LOG-SPACED bins over 4.7
    // decades — p99.9 reads at ~25% relative error where q185's uniform
    // grid is one coarse absolute bin wide at the tail. Bin assignment
    // is integer threshold compares against the 49 shared edge literals
    // (Q191_EDGES; no per-engine floor(log) — the Bootstrap discipline),
    // interpolation linear inside the chosen bin
    "q191_log_quantiles" -> ((s, dir) => {
      graft.streaming.QuantileStream.logQuantiles(
        Tables.events(s, dir).withColumn("ts_t", expr("cast(ts as timestamp)")),
        qs = Seq(0.5, 0.99, 0.999), lo = 0.01, hi = 512.0, numBins = 48,
        windowLength = "1 hour", watermark = "2 hours",
        tsCol = "ts_t", groupCol = "event_type", valueCol = "value")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"),
          round(col("q_50"), 6).as("q_50"),
          round(col("q_99"), 6).as("q_99"),
          round(col("q_99_9"), 6).as("q_99_9"))
    })
  )

  /** q182's reference: probs ∝ (bin + 1) over 16 bins — deliberately
    * skewed so PSI is non-trivial on the events table. The exact doubles
    * (i+1)/136.0 are replayed by the oracle as CAST-double divisions.
    */
  private val DRIFT_REF: Seq[Double] = (1 to 16).map(_ / 136.0)

  /** q191's bin grid: 48 log-spaced edges over [0.01, 512) — 4.7 decades,
    * ~25% relative error cap per bin at ANY quantile depth. Computed once
    * here; the Spark plan takes the doubles as lit()s and the oracle as
    * CAST(<shortest-roundtrip rendering> AS DOUBLE) literals, so both
    * engines compare against bit-identical thresholds.
    */
  private val Q191_EDGES: Seq[Double] =
    graft.streaming.QuantileStream.logEdges(0.01, 512.0, 48)

  val oracles: Map[String, String] = Map(
    "q28_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts_us, value,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 14400000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sess AS (
        |  SELECT user_id, ts_us, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged
        |)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       round(sum(value), 2) AS total_value,
        |       min(ts_us) AS session_start_us,
        |       max(ts_us) AS session_end_us
        |FROM sess GROUP BY 1, 2""".stripMargin,
    "q43_window_agg" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |       event_type,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q91_stream_monitor" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) AS ts_us, event_type,
        |    CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS value
        |  FROM events
        |)
        |SELECT (ts_us // 3600000000) * 3600000000 AS window_start_us,
        |  event_type,
        |  count(*) AS n_events,
        |  count(*) - count(value) AS n_nulls,
        |  round(avg(value), 6) AS avg_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM ev GROUP BY 1, 2""".stripMargin,
    // per-(window, type) HLL registers replayed directly from the rows
    // (q137/q140 scheme)
    "q141_monitor_distinct" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w,
        |    event_type, value, CAST(user_id AS VARCHAR) AS u
        |  FROM events
        |), agg AS (
        |  SELECT w AS window_start_us, event_type, count(*) AS n_events,
        |    count(*) - count(value) AS n_nulls,
        |    round(avg(value), 6) AS avg_value
        |  FROM e GROUP BY 1, 2
        |), hd AS (
        |  SELECT DISTINCT w, event_type,
        |    ('0x' || substr(md5(u), 1, 14))::BIGINT AS hv
        |  FROM e
        |), rr AS (
        |  SELECT w, event_type, hv >> 46 AS reg,
        |    CASE WHEN (hv & ((1::BIGINT << 46) - 1)) = 0 THEN 47
        |         ELSE 47 - length(format('{:b}', hv & ((1::BIGINT << 46) - 1)))
        |         END AS rho
        |  FROM hd
        |), regs AS (
        |  SELECT w, event_type, reg, max(rho) AS mj FROM rr GROUP BY 1, 2, 3
        |), st AS (
        |  SELECT w, event_type,
        |    sum(pow(2.0, -mj)) + (1024 - count(*)) AS harm,
        |    1024 - count(*) AS zero_regs
        |  FROM regs GROUP BY 1, 2
        |), est AS (
        |  SELECT w AS window_start_us, event_type,
        |    round(CASE WHEN 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 / harm
        |                <= 2560.0 AND zero_regs > 0
        |      THEN 1024.0 * ln(1024.0 / zero_regs)
        |      ELSE 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 / harm
        |      END, 6) AS est_entities
        |  FROM st
        |)
        |SELECT window_start_us, event_type, n_events, n_nulls, avg_value,
        |  est_entities
        |FROM agg JOIN est USING (window_start_us, event_type)""".stripMargin,

    // q179: the batch path is exact counts — rank by (count desc, item
    // asc), top 5, err pinned at 0, n_group = total events per group,
    // as_of = the group's event-time frontier in epoch ms
    "q179_topk_stream" ->
      """WITH c AS (
        |  SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS item,
        |    count(*) AS est
        |  FROM events GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type AS grp, count(*) AS n_group,
        |    CAST(max(epoch_us(ts) // 1000) AS BIGINT) AS as_of
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT grp, item, est,
        |    row_number() OVER (PARTITION BY grp ORDER BY est DESC, item) AS rnk
        |  FROM c
        |)
        |SELECT r.grp AS "group", r.item, r.est, CAST(0 AS BIGINT) AS err,
        |  CAST(rnk AS INT) AS rank, g.n_group, g.as_of
        |FROM r JOIN g USING (grp) WHERE rnk <= 5""".stripMargin,

    // q182: per-(hour, type) bin counts via FILTERed counts, then the
    // engine's exact smoothing and FIXED-bin-order PSI sum, generated
    // programmatically so the 16 terms chain left-to-right like the
    // operator's reduce. The (window, group) key set comes from the
    // UNFILTERED events table (b is NULL for a null/NaN value, and a
    // FILTERed count skips NULL-b rows on its own): a bucket whose values
    // are ALL null/NaN still surfaces with n_events=0 / psi NULL — the
    // operator's "row still surfaces" monitor contract (r14 ADVICE; the
    // old WHERE value IS NOT NULL form dropped such buckets from the
    // oracle entirely). NaN is excluded WITH null, mirroring the
    // operator's isnan branch.
    "q182_drift_stream" -> {
      val binCols = (0 until 16).map(i =>
        s"count(*) FILTER (b = $i) AS c$i").mkString(",\n        |    ")
      // CAST-double everything: a bare `(c0 + 0.5)` is DECIMAL arithmetic
      // in the oracle engine, whose division rounds differently from the
      // engine's IEEE doubles
      val terms = (0 until 16).map { i =>
        val p = s"((CAST(c$i AS DOUBLE) + 0.5) / (CAST(n AS DOUBLE) + 8.0))"
        val q = s"(CAST(${i + 1} AS DOUBLE) / CAST(136 AS DOUBLE))"
        s"($p - $q) * ln($p / $q)"
      }.reduce((a, b) => s"($a + $b)")
      s"""WITH ev AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w, event_type,
        |    CASE WHEN value IS NULL OR isnan(value) THEN NULL
        |         ELSE greatest(0, least(15, CAST(floor((value - 0.0) / 12.5) AS INT)))
        |         END AS b
        |  FROM events
        |), c AS (
        |  SELECT w, event_type,
        |    $binCols,
        |    count(b) AS n
        |  FROM ev GROUP BY 1, 2
        |)
        |SELECT w AS window_start_us, event_type, CAST(n AS BIGINT) AS n_events,
        |  CASE WHEN n > 0 THEN round($terms, 6) END AS psi
        |FROM c""".stripMargin
    },

    // q185: bins-as-rows replay of the quantile walk. The engine's
    // estimator is replayed term-for-term: t = ceil(q · n) on doubles,
    // pick = LEAST bin whose cumulative count reaches t, est = lo +
    // width·(b + (t − cumBefore)/cnt) — +,·,/ only, same order, width
    // 6.25 exact. The (window, group) key set comes from the unfiltered
    // table (all-null buckets surface with n_events=0 / NULL quantiles,
    // the monitor contract), and NaN is excluded with null.
    "q185_quantile_stream" ->
      """WITH ev AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w, event_type,
        |    CASE WHEN value IS NULL OR isnan(value) THEN NULL
        |         ELSE greatest(0, least(31, CAST(floor((value - 0.0) / 6.25) AS INT)))
        |         END AS b
        |  FROM events
        |), g AS (
        |  SELECT w, event_type, count(b) AS n FROM ev GROUP BY 1, 2
        |), bins AS (
        |  SELECT w, event_type, b, count(*) AS cnt
        |  FROM ev WHERE b IS NOT NULL GROUP BY 1, 2, 3
        |), cum AS (
        |  SELECT w, event_type, b, cnt,
        |    sum(cnt) OVER (PARTITION BY w, event_type ORDER BY b) AS cum
        |  FROM bins
        |), qs AS (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) t(q)),
        |tgt AS (
        |  SELECT g.w, g.event_type, qs.q,
        |    ceil(qs.q * CAST(g.n AS DOUBLE)) AS t
        |  FROM g CROSS JOIN qs WHERE g.n > 0
        |), pick AS (
        |  SELECT tgt.w, tgt.event_type, tgt.q, tgt.t, min(c.b) AS b
        |  FROM tgt JOIN cum c ON c.w = tgt.w AND c.event_type = tgt.event_type
        |    AND CAST(c.cum AS DOUBLE) >= tgt.t
        |  GROUP BY 1, 2, 3, 4
        |), vals AS (
        |  SELECT p.w, p.event_type, p.q,
        |    0.0 + 6.25 * (CAST(p.b AS DOUBLE)
        |      + (p.t - CAST(c.cum - c.cnt AS DOUBLE)) / CAST(c.cnt AS DOUBLE)) AS est
        |  FROM pick p JOIN cum c
        |    ON c.w = p.w AND c.event_type = p.event_type AND c.b = p.b
        |)
        |SELECT g.w AS window_start_us, g.event_type, CAST(g.n AS BIGINT) AS n_events,
        |  round(v50.est, 6) AS q_50, round(v90.est, 6) AS q_90, round(v99.est, 6) AS q_99
        |FROM g
        |LEFT JOIN vals v50 ON v50.w = g.w AND v50.event_type = g.event_type AND v50.q = 0.5
        |LEFT JOIN vals v90 ON v90.w = g.w AND v90.event_type = g.event_type AND v90.q = 0.9
        |LEFT JOIN vals v99 ON v99.w = g.w AND v99.event_type = g.event_type AND v99.q = 0.99""".stripMargin,

    // q191: the q185 replay with the bin grid swapped for the shared
    // log-edge literals — bin = (#edges <= v) - 1 clamped (integer
    // compares, same as the engine), interpolation e_b + w_b·frac with
    // e_b/w_b from the SAME Scala doubles the plan embeds
    "q191_log_quantiles" -> {
      def dlit(e: Double) = s"CAST($e AS DOUBLE)"
      val binExpr = Q191_EDGES
        .map(e => s"(CASE WHEN value >= ${dlit(e)} THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val edgeRows = (0 until 48)
        .map(i => s"($i, ${dlit(Q191_EDGES(i))}, ${dlit(Q191_EDGES(i + 1) - Q191_EDGES(i))})")
        .mkString(", ")
      s"""WITH ev AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w, event_type,
        |    CASE WHEN value IS NULL OR isnan(value) THEN NULL
        |         ELSE greatest(0, least(47, ($binExpr) - 1))
        |         END AS b
        |  FROM events
        |), edges AS (SELECT * FROM (VALUES $edgeRows) t(b, elo, ew)),
        |g AS (SELECT w, event_type, count(b) AS n FROM ev GROUP BY 1, 2),
        |bins AS (
        |  SELECT w, event_type, b, count(*) AS cnt
        |  FROM ev WHERE b IS NOT NULL GROUP BY 1, 2, 3
        |), cum AS (
        |  SELECT w, event_type, b, cnt,
        |    sum(cnt) OVER (PARTITION BY w, event_type ORDER BY b) AS cum
        |  FROM bins
        |), qs AS (SELECT * FROM (VALUES (0.5), (0.99), (0.999)) t(q)),
        |tgt AS (
        |  SELECT g.w, g.event_type, qs.q,
        |    ceil(qs.q * CAST(g.n AS DOUBLE)) AS t
        |  FROM g CROSS JOIN qs WHERE g.n > 0
        |), pick AS (
        |  SELECT tgt.w, tgt.event_type, tgt.q, tgt.t, min(c.b) AS b
        |  FROM tgt JOIN cum c ON c.w = tgt.w AND c.event_type = tgt.event_type
        |    AND CAST(c.cum AS DOUBLE) >= tgt.t
        |  GROUP BY 1, 2, 3, 4
        |), vals AS (
        |  SELECT p.w, p.event_type, p.q,
        |    e.elo + e.ew * ((p.t - CAST(c.cum - c.cnt AS DOUBLE)) / CAST(c.cnt AS DOUBLE)) AS est
        |  FROM pick p JOIN cum c
        |    ON c.w = p.w AND c.event_type = p.event_type AND c.b = p.b
        |  JOIN edges e ON e.b = p.b
        |)
        |SELECT g.w AS window_start_us, g.event_type, CAST(g.n AS BIGINT) AS n_events,
        |  round(v50.est, 6) AS q_50, round(v99.est, 6) AS q_99, round(v999.est, 6) AS q_99_9
        |FROM g
        |LEFT JOIN vals v50 ON v50.w = g.w AND v50.event_type = g.event_type AND v50.q = 0.5
        |LEFT JOIN vals v99 ON v99.w = g.w AND v99.event_type = g.event_type AND v99.q = 0.99
        |LEFT JOIN vals v999 ON v999.w = g.w AND v999.event_type = g.event_type AND v999.q = 0.999""".stripMargin
    }
  )
}
