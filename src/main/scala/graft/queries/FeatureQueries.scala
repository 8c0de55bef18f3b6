package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.feature.{Binning, Gather, GatherEncoder, StringToShortIndexer}
import graft.sampling.Downsampling

/** ML-feature operator queries (Gather/GatherEncoder family) decoded back to
  * flat rows so a DuckDB oracle can replay the semantics.
  */
object FeatureQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // GatherEncoder end-to-end: gather orders by priority, learn top keys at
    // cover=80% (deterministic order: count desc, key asc), encode with
    // all-other, then decode the vector back to (custkey, slot, value)
    // triplets. Exercises fit (explode+groupBy+driver scan) and the encode
    // UDF distributed.
    "q09_gather_encoder_top" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val gathered = new Gather()
        .setPrimaryKeyCols("o_custkey")
        .setKeyCol("o_orderpriority")
        .setValueCol("o_totalprice")
        .setValueAgg("sum")
        .setOutputCol("prio")
        .transform(o)
      val model = new GatherEncoder()
        .setInputCol("prio").setOutputCol("features")
        .setKeyCol("o_orderpriority").setValueCol("o_totalprice")
        .setTransformation("top").setCover(80.0).setAllOther(true)
        .fit(gathered)
      val labels = model.modelKeys.map(String.valueOf) :+ "all other"
      val labelDf = s.createDataFrame(
        labels.zipWithIndex.map { case (l, i) => (i, l) }.toSeq).toDF("pos", "slot")
      model.transform(gathered)
        .select(col("o_custkey"),
          posexplode(org.apache.spark.ml.functions.vector_to_array(col("features"))))
        .join(broadcast(labelDf), "pos")
        .filter(col("col") =!= 0.0)
        .select(col("o_custkey"), col("slot"), round(col("col"), 2).as("value"))
    }),

    // Same encoder via the index (min-support) transformation, no all-other:
    // keys below 15% frequency are dropped entirely.
    "q10_gather_encoder_index" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val gathered = new Gather()
        .setPrimaryKeyCols("l_suppkey")
        .setKeyCol("l_returnflag")
        .setValueCol("l_quantity")
        .setValueAgg("sum")
        .setOutputCol("flags")
        .transform(li)
      val model = new GatherEncoder()
        .setInputCol("flags").setOutputCol("features")
        .setKeyCol("l_returnflag").setValueCol("l_quantity")
        .setTransformation("index").setSupport(15.0).setAllOther(false)
        .fit(gathered)
      val labels = model.modelKeys.map(String.valueOf)
      val labelDf = s.createDataFrame(
        labels.zipWithIndex.map { case (l, i) => (i, l) }.toSeq).toDF("pos", "slot")
      model.transform(gathered)
        .select(col("l_suppkey"),
          posexplode(org.apache.spark.ml.functions.vector_to_array(col("features"))))
        .join(broadcast(labelDf), "pos")
        .filter(col("col") =!= 0.0)
        .select(col("l_suppkey"), col("slot"), round(col("col"), 2).as("value"))
    }),

    // Binning model with fixed splits: one-hot vector decoded back to the
    // bin index. Row-local binary search — map-only plan, no shuffle.
    "q11_binning" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val model = new Binning()
        .setInputCol("o_totalprice").setOutputCol("price_bin")
        .setSplits(Array(Double.NegativeInfinity, 150000.0, 300000.0, 450000.0,
          Double.PositiveInfinity))
      model.transform(o)
        .select(col("o_orderkey"),
          posexplode(org.apache.spark.ml.functions.vector_to_array(col("price_bin"))))
        .filter(col("col") === 1.0)
        .select(col("o_orderkey"), col("pos").cast("int").as("bin"))
    }),

    // StringToShortIndexer: frequency-descending label dictionary with
    // deterministic tie-break (the sf data has an exact count tie).
    "q12_string_indexer" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val model = new StringToShortIndexer()
        .setInputCol("o_orderpriority").setOutputCol("idx")
        .fit(o)
      model.transform(o).select(col("o_orderkey"), col("o_orderpriority"), col("idx"))
    }),

    // Downsampling no-op path: class ratio ~2 is under maxClassRatio=30 so
    // the model appends constant weight 1.0 (the deterministic branch; the
    // sampling branch is covered by DownsamplingSpec's range assertions).
    "q13_downsampling_noop" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("label", when(col("o_orderstatus") === "F", 1.0).otherwise(0.0))
      val model = new Downsampling().setLabelCol("label").setOutputCol("w").fit(o)
      model.transform(o).select(col("o_orderkey"), col("label"), col("w"))
    }),

    // OptimalBinning.fit through the exact interpolating-percentile path
    // (matches DuckDB quantile_cont bit-for-bit when quantile indices hit
    // data points), then the fitted one-hot model applied and decoded to
    // per-bin row counts — pins both the learned splits and the [lo, hi)
    // bucket semantics.
    "q24_optimal_binning" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val model = new graft.feature.OptimalBinning()
        .setInputCol("l_extendedprice").setOutputCol("price_bin")
        .setNumBins(5).setMethod("exact")
        .fit(li)
      model.transform(li)
        .select(posexplode(org.apache.spark.ml.functions.vector_to_array(col("price_bin"))))
        .filter(col("col") === 1.0)
        .groupBy(col("pos").cast("int").as("bin"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // Downsampling SAMPLED branch (reference Downsampling.scala:120-130
    // semantics: sample secondary + weight 1/fraction + recombine), made
    // oracle-replayable via deterministic md5 membership. maxClassRatio=0.5
    // forces sampling (class ratio ~1.06): fraction = primary*0.5/secondary.
    "q71_downsampling_sampled" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("label", when(col("o_orderstatus") === "F", 1.0).otherwise(0.0))
      val model = new Downsampling().setLabelCol("label").setOutputCol("w")
        .setMaxClassRatio(0.5).setDeterministicIdCol("o_orderkey").fit(o)
      model.transform(o)
        .select(col("o_orderkey"), col("label"), round(col("w"), 6).as("w"))
    }),

    // percentile winsorization: per-event-type [p05, p95] clamp of value
    // (robust-scaling prepass). Bounds learned as one tiny aggregate row
    // per group, broadcast back, clamp row-local — the 100 TB input is
    // scanned, never shuffled.
    "q82_winsorize" -> ((s, dir) => {
      new graft.feature.Winsorizer(0.05, 0.95)
        .transform(Tables.events(s, dir), "event_type", "value")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(first(col("lo")), 6).as("lo"),
          round(first(col("hi")), 6).as("hi"),
          round(avg(col("value")), 6).as("mean_raw"),
          round(avg(col("value_wins")), 6).as("mean_wins"))
    }),

    // S2 cell tokens over synthetic-but-deterministic lat/lon derived from
    // customer keys; grouped per cell. Cell math is not expressible in
    // DuckDB, so the oracle is a COMMITTED GOLDEN (fingerprinted per SF by
    // customer row count, regenerated via graft.tools.MakeGoldens); the
    // algorithm itself is pinned by S2Spec/S2CellTransformerSpec published-
    // token and round-trip property tests.
    "q14_s2_cell" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .withColumn("lat", (col("c_custkey") % 160).cast("double") - 80.0
          + col("c_acctbal") / 100000.0)
        .withColumn("lon", (col("c_custkey") % 340).cast("double") - 170.0
          + col("c_nationkey").cast("double") / 100.0)
      new graft.feature.S2CellTransformer()
        .setLatCol("lat").setLonCol("lon").setCellCol("cell").setLevel(4)
        .transform(c)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // leave-one-out smoothed target encoding of a high-cardinality key
    // (l_partkey, ~30 rows/key): per-key stats from ONE partial-aggregated
    // groupBy, prior as a broadcast scalar, the LOO correction row-local —
    // every sum is integer-valued so the encoding replays bit-exactly
    "q129_target_encode" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      new graft.feature.TargetEncoder(20.0)
        .transformLoo(li, "l_partkey", "y")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey_cnt").as("cnt"),
          round(col("l_partkey_enc"), 9).as("enc"))
    }),

    // exact ε-neighbor spatial self-join over the q14 synthetic lat/lon:
    // grid-cell equi-join (cell side = ε, 3×3 neighborhood explode) +
    // row-local verify — never a cross join; the distance is pure
    // arithmetic so the boundary decision replays bit-exactly
    "q139_spatial_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("id"),
          ((col("c_custkey") % 160).cast("double") - 80.0
            + col("c_acctbal") / 100000.0).as("x"),
          ((col("c_custkey") % 340).cast("double") - 170.0
            + col("c_nationkey").cast("double") / 100.0).as("y"))
      new graft.geo.GridNeighborJoin(0.5).pairs(c)
        .select(col("id_a"), col("id_b"), round(col("dist2"), 9).as("dist2"))
    }),

    // snapshot drift gate: PSI over 10 equal-width n_chars buckets (bounds
    // fixed by the BEFORE snapshot); v2 drops every 5th doc and shifts
    // every 7th doc's length — the q98 mutation pattern read as a
    // distribution instead of a diff
    "q117_drift_psi" -> ((s, dir) => {
      val v1 = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val v2 = v1.where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, col("n_chars") + 200)
            .otherwise(col("n_chars")).as("n_chars"))
      new graft.feature.DriftMonitor(numBuckets = 10).numeric(v1, v2, "n_chars")
        .select(col("bucket"), col("n_before"), col("n_after"),
          round(col("psi_term"), 9).as("psi_term"))
    })
  )

  val oracles: Map[String, String] = Map(
    // identical grid blocking + arithmetic distance; each pair meets once
    // (home cell unique, id_a < id_b)
    "q139_spatial_join" ->
      """WITH c AS (
        |  SELECT c_custkey AS id,
        |    CAST(c_custkey % 160 AS DOUBLE) - 80.0 + c_acctbal / 100000.0 AS x,
        |    CAST(c_custkey % 340 AS DOUBLE) - 170.0
        |      + CAST(c_nationkey AS DOUBLE) / 100.0 AS y
        |  FROM customer
        |), g AS (
        |  SELECT id, x, y,
        |    CAST(floor(x / 0.5) AS BIGINT) AS cx,
        |    CAST(floor(y / 0.5) AS BIGINT) AS cy
        |  FROM c
        |), n AS (
        |  SELECT id AS id_b, x AS xb, y AS yb,
        |    cx + dx.o AS cx, cy + dy.o AS cy
        |  FROM g, range(-1, 2) dx(o), range(-1, 2) dy(o)
        |)
        |SELECT a.id AS id_a, n.id_b,
        |  round((a.x - xb) * (a.x - xb) + (a.y - yb) * (a.y - yb), 9) AS dist2
        |FROM g a JOIN n ON a.cx = n.cx AND a.cy = n.cy
        |WHERE a.id < n.id_b
        |  AND (a.x - xb) * (a.x - xb) + (a.y - yb) * (a.y - yb) <= 0.25""".stripMargin,
    // prior and per-key sums are integer-valued (0/1 labels), so the LOO
    // arithmetic is deterministic double math on both engines
    "q129_target_encode" ->
      """WITH lab AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |    CASE WHEN l_returnflag = 'R' THEN CAST(1.0 AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END AS y
        |  FROM lineitem
        |), p AS (SELECT avg(y) AS prior FROM lab),
        |s AS (
        |  -- n_y (observed labels) for the mean, cnt for the count encoding:
        |  -- sum(y) skips NULL labels, so dividing by count(*) would treat
        |  -- missing labels as 0s (mirrors TargetEncoder.encodings)
        |  SELECT l_partkey, count(*) AS cnt, count(y) AS n_y,
        |    coalesce(sum(y), 0.0) AS sum_y
        |  FROM lab GROUP BY 1
        |)
        |SELECT l_orderkey, l_linenumber, cnt,
        |  round(CASE WHEN CAST(n_y - (CASE WHEN y IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) + 20.0 > 0
        |    THEN (sum_y - coalesce(y, 0.0) + 20.0 * prior)
        |      / (CAST(n_y - (CASE WHEN y IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) + 20.0)
        |    ELSE prior END, 9) AS enc
        |FROM lab JOIN s USING (l_partkey), p""".stripMargin,
    // replays bounds-from-before bucketing and the half-count-smoothed
    // PSI terms; p/q recomputed inline (deterministic double exprs)
    "q117_drift_psi" ->
      """WITH v1 AS (SELECT doc_id, n_chars FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 200 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 5 != 0
        |), st AS (
        |  SELECT CAST(min(n_chars) AS DOUBLE) AS mn, CAST(max(n_chars) AS DOUBLE) AS mx
        |  FROM v1
        |), b1 AS (
        |  SELECT CASE WHEN mx = mn THEN 0
        |    ELSE greatest(0, least(9, CAST(floor((n_chars - mn) / (mx - mn) * 10) AS BIGINT)))
        |    END AS bucket
        |  FROM v1, st
        |), b2 AS (
        |  SELECT CASE WHEN mx = mn THEN 0
        |    ELSE greatest(0, least(9, CAST(floor((n_chars - mn) / (mx - mn) * 10) AS BIGINT)))
        |    END AS bucket
        |  FROM v2, st
        |), cb AS (SELECT bucket, count(*) AS n_before FROM b1 GROUP BY 1),
        |ca AS (SELECT bucket, count(*) AS n_after FROM b2 GROUP BY 1),
        |j AS (
        |  SELECT bucket, coalesce(n_before, 0) AS n_before, coalesce(n_after, 0) AS n_after
        |  FROM cb FULL JOIN ca USING (bucket)
        |), t AS (
        |  SELECT CAST(sum(n_before) AS DOUBLE) AS tb, CAST(sum(n_after) AS DOUBLE) AS ta,
        |    CAST(count(*) AS DOUBLE) AS nb
        |  FROM j
        |)
        |SELECT bucket, n_before, n_after,
        |  round(((n_before + 0.5) / (tb + 0.5 * nb) - (n_after + 0.5) / (ta + 0.5 * nb))
        |    * ln(((n_before + 0.5) / (tb + 0.5 * nb)) / ((n_after + 0.5) / (ta + 0.5 * nb))), 9)
        |    AS psi_term
        |FROM j, t""".stripMargin,
    "q09_gather_encoder_top" ->
      """WITH gathered AS (
        |  SELECT o_custkey, o_orderpriority AS key,
        |         CAST(sum(o_totalprice) AS DOUBLE) AS value
        |  FROM orders GROUP BY 1, 2
        |), counts AS (
        |  SELECT key, count(*) AS cnt FROM gathered GROUP BY key
        |), ordered AS (
        |  SELECT key, cnt,
        |         coalesce(sum(cnt) OVER (ORDER BY cnt DESC, key
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM counts
        |), selected AS (
        |  SELECT key FROM ordered
        |  WHERE cum_before < 0.8 * (SELECT sum(cnt) FROM counts)
        |)
        |SELECT o_custkey,
        |       CASE WHEN key IN (SELECT key FROM selected) THEN key
        |            ELSE 'all other' END AS slot,
        |       round(sum(value), 2) AS value
        |FROM gathered GROUP BY 1, 2""".stripMargin,
    "q10_gather_encoder_index" ->
      """WITH gathered AS (
        |  SELECT l_suppkey, l_returnflag AS key,
        |         CAST(sum(l_quantity) AS DOUBLE) AS value
        |  FROM lineitem GROUP BY 1, 2
        |), counts AS (
        |  SELECT key, count(*) AS cnt FROM gathered GROUP BY key
        |), selected AS (
        |  SELECT key FROM counts
        |  WHERE cnt >= 0.15 * (SELECT sum(cnt) FROM counts)
        |)
        |SELECT l_suppkey, key AS slot, round(value, 2) AS value
        |FROM gathered WHERE key IN (SELECT key FROM selected)""".stripMargin,
    "q11_binning" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 150000.0 THEN 0
        |       WHEN o_totalprice < 300000.0 THEN 1
        |       WHEN o_totalprice < 450000.0 THEN 2
        |       ELSE 3 END AS bin
        |FROM orders""".stripMargin,
    "q12_string_indexer" ->
      """WITH counts AS (
        |  SELECT o_orderpriority AS label, count(*) AS cnt FROM orders GROUP BY 1
        |), ranked AS (
        |  SELECT label,
        |         CAST(row_number() OVER (ORDER BY cnt DESC, label) - 1 AS SMALLINT) AS idx
        |  FROM counts
        |)
        |SELECT o_orderkey, o_orderpriority, idx
        |FROM orders JOIN ranked ON o_orderpriority = label""".stripMargin,
    "q13_downsampling_noop" ->
      """SELECT o_orderkey,
        |  CAST(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS label,
        |  CAST(1.0 AS DOUBLE) AS w
        |FROM orders""".stripMargin,
    "q71_downsampling_sampled" ->
      """WITH lab AS (
        |  SELECT o_orderkey,
        |    CAST(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS label
        |  FROM orders
        |), c AS (
        |  SELECT count(*) FILTER (WHERE label = 1.0) AS p,
        |         count(*) FILTER (WHERE label <> 1.0) AS s
        |  FROM lab
        |), f AS (
        |  SELECT CAST(p AS DOUBLE) * CAST(0.5 AS DOUBLE) / CAST(s AS DOUBLE) AS fraction
        |  FROM c
        |)
        |SELECT o_orderkey, label, CAST(1.0 AS DOUBLE) AS w FROM lab WHERE label = 1.0
        |UNION ALL
        |SELECT o_orderkey, label, round(CAST(1.0 AS DOUBLE) / fraction, 6) AS w
        |FROM lab, f
        |WHERE label <> 1.0
        |  AND ('0x' || substring(md5('ds:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
        |      < fraction * CAST(4294967296.0 AS DOUBLE)""".stripMargin,
    "q82_winsorize" ->
      """WITH b AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1
        |)
        |SELECT event_type, count(*) AS n,
        |  round(max(lo), 6) AS lo, round(max(hi), 6) AS hi,
        |  round(avg(value), 6) AS mean_raw,
        |  -- NULL-preserving clamp, mirroring Winsorizer.clamp (least/
        |  -- greatest in BOTH engines skip nulls, fabricating lo otherwise)
        |  round(avg(CASE WHEN value IS NULL THEN NULL
        |    ELSE least(greatest(value, lo), hi) END), 6) AS mean_wins
        |FROM events JOIN b USING (event_type)
        |GROUP BY event_type""".stripMargin,
    "q24_optimal_binning" ->
      """WITH q AS (
        |  SELECT quantile_cont(l_extendedprice, [0.2, 0.4, 0.6, 0.8]) AS qs
        |  FROM lineitem
        |)
        |SELECT CAST(len(list_filter(q.qs, s -> l_extendedprice >= s)) AS INT) AS bin,
        |       count(*) AS cnt
        |FROM lineitem, q GROUP BY 1""".stripMargin,
    // committed golden (see the q14 query comment): the per-SF rows are
    // selected by the customer-count fingerprint; the guard row makes a
    // missing fingerprint (new SF without regenerated goldens) read as an
    // explicit marker mismatch instead of a silent empty result
    "q14_s2_cell" ->
      s"""WITH g AS (
        |  SELECT * FROM read_parquet('${Goldens.path("q14_s2")}/*.parquet')
        |), n AS (SELECT count(*) AS nc FROM customer)
        |SELECT cell, n_customers FROM g, n WHERE g.n_customer = n.nc
        |UNION ALL
        |SELECT 'MISSING_GOLDEN_FINGERPRINT_RERUN_MakeGoldens', -1
        |WHERE NOT EXISTS (SELECT 1 FROM g, n WHERE g.n_customer = n.nc)""".stripMargin
  )
}
