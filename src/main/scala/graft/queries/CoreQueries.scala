package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sql.functions._
import graft.feature.Gather

/** Core relational + collectArray/Gather queries with DuckDB oracles.
  *
  * Conventions (driver compare contract):
  *  - every computed column is aliased IDENTICALLY in Spark and oracle SQL
  *  - double aggregates are rounded (fp-accumulation order differs between
  *    Spark's partial aggregation and DuckDB's serial sum)
  *  - arrays are element-sorted before emission so results are deterministic
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-style scan + hash aggregate. Filter + 6-column projection
    // push into the parquet scan; two-phase (partial/final) agg, shuffle on
    // the 2 low-cardinality grouping keys only.
    "q01_agg_pricing" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Join pipeline: fact (orders) joined to two dims; both dims are tiny at
    // any SF (nation=25, region=5) → explicit broadcast, no shuffle on the
    // dim side; single shuffle for the final group-by.
    "q02_join_orders_by_nation" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
    }),

    // collectArray (the reference's one SQL aggregate) — element-sorted then
    // joined to a string so the driver's pandas compare can hash the column
    // (raw ARRAY output crashed its sort in round 1). ObjectHashAggregate
    // with automatic partial/final.
    "q03_collect_array" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy(col("l_orderkey"))
        .agg(
          concat_ws(",", collectArraySorted(col("l_linenumber"))).as("lines"),
          size(collectArray(col("l_linenumber"))).as("n_lines"))
    }),

    // Gather round-trip: long→wide (array<struct>) then exploded back to
    // flat rows, proving the collected structure is exactly the group-sum.
    "q04_gather" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val gathered = new Gather()
        .setPrimaryKeyCols("l_orderkey")
        .setKeyCol("l_returnflag")
        .setValueCol("l_quantity")
        .setValueAgg("sum")
        .setOutputCol("flags")
        .transform(li)
      gathered
        .select(col("l_orderkey"), explode(col("flags")).as("g"))
        .select(
          col("l_orderkey"),
          col("g.l_returnflag").as("key"),
          col("g.l_quantity").as("value"))
    }),

    // Gather with count aggregation (the reference's other valueAgg mode).
    "q05_gather_count" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val gathered = new Gather()
        .setPrimaryKeyCols("l_suppkey")
        .setKeyCol("l_returnflag")
        .setValueCol("l_quantity")
        .setValueAgg("count")
        .setOutputCol("flags")
        .transform(li)
      gathered
        .select(col("l_suppkey"), explode(col("flags")).as("g"))
        .select(
          col("l_suppkey"),
          col("g.l_returnflag").as("key"),
          col("g.l_quantity").as("value"))
    }),

    // Window functions: per-customer order sequence + running revenue.
    "q06_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(
        col("o_orderkey"),
        col("o_custkey"),
        row_number().over(w).as("rn"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"))
    }),

    // Semi/anti join + set op coverage: customers with orders above the
    // global average price, minus those in a named region.
    "q07_semi_anti" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val bigOrders = o.filter(col("o_totalprice") > lit(100000.0))
      val withBig = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
      val nation0 = n.filter(col("n_regionkey") === 0)
      val excluded = c
        .join(broadcast(nation0), c("c_nationkey") === nation0("n_nationkey"), "left_semi")
      withBig.select(col("c_custkey"))
        .except(excluded.select(col("c_custkey")))
    }),

    // Top-k pattern: 10 highest-revenue orders (global sort is a single
    // TakeOrderedAndProject at any scale — no full sort materialized).
    "q08_topk" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // rollup + grouping id: subtotal hierarchy in one pass (partial-agg
    // expand — the multi-level aggregate surface)
    "q52_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("cnt"), grouping_id().as("gid"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("cnt"), col("gid"))
    }),

    // SCD Type-2 merge: timestamped attribute updates versioned into a
    // [valid_from, valid_to) dimension — closed history passes through
    // unshuffled, open rows + updates take ONE keyed window; consecutive
    // duplicates suppressed so idempotent re-ingest can't bloat versions
    "q146_scd2_merge" -> ((s, dir) => {
      val dim = Tables.customer(s, dir).select(col("c_custkey"),
        col("c_mktsegment").as("segment"), lit(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
      val ups = Tables.orders(s, dir)
        .select(col("o_custkey").as("c_custkey"),
          col("o_orderpriority").as("segment"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("ts"))
        .groupBy(col("c_custkey"), col("ts"))
        .agg(min(col("segment")).as("segment"))
      new graft.sql.Scd2Merge("c_custkey").apply(dim, ups, "segment", "ts")
    }),

    // join-size estimation from two CMS sketches (row-wise inner product,
    // min over depths — an upper bound on Σ_k cnt_a(k)·cnt_b(k) = the
    // equi-join cardinality): predict the explosion BEFORE running the
    // join, from two fixed-size sketches, no second scan of either side
    "q144_join_size_sketch" -> ((s, dir) => {
      val d = 4; val w = 2048
      val skL = Tables.lineitem(s, dir).agg(
        graft.sql.functions.countMinSketch(
          col("l_orderkey").cast("string"), d, w).as("ska"))
      val skO = Tables.orders(s, dir).agg(
        graft.sql.functions.countMinSketch(
          col("o_orderkey").cast("string"), d, w).as("skb"))
      val exact = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("exact_n"))
      exact.crossJoin(broadcast(skL)).crossJoin(broadcast(skO))
        .select(col("exact_n"),
          graft.sql.functions.cmsJoinSize(col("ska"), col("skb"), d, w)
            .as("est_n"))
    }),

    // incremental stats maintenance: sketch "history" and "delta" slices
    // separately (counts + sums + HLL users + value histogram, one
    // mergeable state row per event_type), MERGE the state frames, report
    // — the oracle recomputes every statistic directly from the full
    // table, so the hash pins merged-state == recomputed-from-scratch
    "q140_incremental_stats" -> ((s, dir) => {
      val hs = new graft.sql.HistogramSketch(0.0, 640.0, 32)
      val ms = new graft.sql.MergeableStats("value", "user_id", 10, hs)
      val ev = Tables.events(s, dir)
        .withColumn("day",
          expr("(unix_micros(cast(ts as timestamp))) div 86400000000"))
      val history = ms.sketch(ev.where(col("day") % 3 =!= 0), "event_type")
      val delta = ms.sketch(ev.where(col("day") % 3 === 0), "event_type")
      ms.report(ms.merge(history.unionByName(delta), "event_type"),
        "event_type")
    }),

    // salted skew join: lineitem (big, salted by orderkey hash) x orders
    // (small, replicated per salt) on orderkey — same rows as the plain
    // join, hot keys spread over 8 salt partitions
    "q55_skew_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val o = Tables.orders(s, dir)
        .where(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.sql.SkewJoin.salted(li, o, Seq("l_orderkey"), "l_orderkey", 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("total_price"))
    }),

    // per-group top-k: 3 highest-value orders per priority class. The
    // group key has ~5 distinct values, so a plain rank window would sort
    // each priority's ENTIRE slice in one task — instead rank two-phase
    // over totalprice-range buckets (GroupedNtile.rankByValue): parallel
    // within every group, identical rank values.
    "q56_group_topk" -> ((s, dir) => {
      graft.sql.GroupedNtile.rankByValue(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
          descending = true, tieCols = Seq(col("o_orderkey")), rankName = "rnk")
        .where(col("rnk") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"),
          col("rnk").as("rnk"))
    }),

    // exact per-group percentiles (interpolating PERCENTILE matches DuckDB
    // quantile_cont bit-for-bit)
    "q64_group_percentiles" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.9)"), 6).as("p90"),
          round(expr("percentile(n_chars, 0.99)"), 6).as("p99"))
    }),

    // hourly bars over the event stream: open/close via min_by/max_by on
    // the (unique) event time — partial-aggregated, no per-bucket sort
    "q65_time_bars" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(expr("(unix_micros(cast(ts as timestamp))) div 3600000000").as("hour"),
          expr("unix_micros(cast(ts as timestamp))").as("tu"), col("value"))
        .groupBy(col("hour"))
        .agg(count(lit(1)).as("n"),
          min_by(col("value"), col("tu")).as("open"),
          max_by(col("value"), col("tu")).as("close"),
          round(min(col("value")), 2).as("vmin"),
          round(max(col("value")), 2).as("vmax"),
          round(sum(col("value")), 2).as("vsum"))
    }),

    // market-basket co-occurrence: part pairs bought in the same order,
    // top 20. ONE groupBy shuffle collects each order's distinct parts
    // into a sorted basket array (capped at the 64 lowest part ids — pair
    // fan-out is quadratic in basket size, and on a real event log one
    // pathological 10k-item basket would put 5·10⁷ pairs on a single
    // order key; TPC-H baskets max out at 7 so the cap drops nothing, and
    // the oracle applies the identical cap). Pairs are then generated
    // ROW-LOCALLY from the array — no self-join, no windowed re-shuffle;
    // the round-4 self-join-on-windowed-items shape cost two extra
    // exchanges plus a per-order sort on both join sides.
    "q66_copurchase" -> ((s, dir) => {
      val maxBasket = 64
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(slice(array_sort(collect_set(col("l_partkey"))), 1, maxBasket)
          .as("basket"))
        .select(explode_outer(expr(
          // i<j over the sorted basket: flatten keeps it one generator row
          """flatten(transform(basket, (pa, i) ->
            |  transform(slice(basket, i + 2, size(basket)),
            |    pb -> struct(pa AS part_a, pb AS part_b))))""".stripMargin))
          .as("p"))
        // outer explode emits a null row for single-item baskets (empty
        // pair array) — drop those, keeping the generator outer so the
        // flatten/transform chain never clones into a pre-explode filter
        .where(col("p").isNotNull)
        .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("part_a"), col("part_b"))
        .limit(20)
    }),

    // pivot reshape (the RelationalGroupedDataset.pivot surface — Gather's
    // fixed-column cousin): order counts per status, one column per
    // priority class
    "q70_pivot" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("p_urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("p_high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("p_medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("p_notspec"),
          coalesce(col("5-LOW"), lit(0L)).as("p_low"))
    }),

    // key-skew diagnostics for join planning (feeds SkewJoin's salt-factor
    // choice): per-key row counts reduced to max/avg/p99 and the skew ratio
    "q69_skew_stats" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("max_cnt"),
          round(avg(col("c")), 6).as("avg_cnt"),
          round(expr("percentile(c, 0.99)"), 6).as("p99_cnt"),
          round(max(col("c")) / avg(col("c")), 6).as("skew_ratio"))
    }),

    // full outer join: customers (every 3rd) vs per-customer order counts —
    // both dangling sides surfaced, null keys coalesced for the compare
    "q53_full_outer" -> ((s, dir) => {
      val c = Tables.customer(s, dir).where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), lit(-1L)).as("ckey"),
          coalesce(col("o_custkey"), lit(-1L)).as("okey"),
          coalesce(round(col("c_acctbal"), 2), lit(0.0)).as("acctbal"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),

    // runtime-filter semi-join: Bloom filter over the selective order-key
    // set prunes the lineitem scan before the exact left_semi verify —
    // result is EXACTLY the semi-join (the filter only changes cost)
    "q73_bloom_join" -> ((s, dir) => {
      val bigOrders = Tables.orders(s, dir)
        .where(col("o_totalprice") > 400000.0)
      graft.sql.BloomJoin.semiJoin(
        Tables.lineitem(s, dir), col("l_orderkey"),
        bigOrders, col("o_orderkey"),
        numBits = 1 << 16, numHashes = 5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // layout-optimized write + scan: cluster part by zorder(p_size,
    // floor(p_retailprice)) into range-partitioned sorted parquet, then
    // read the clustered copy back under a selective predicate. The
    // round-trip must be lossless (oracle = same query on the original
    // table); LayoutWriterSpec proves the files carry disjoint key ranges
    // (what row-group/file stats prune on at 100 TB).
    "q83_layout_write" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_layout_${Integer.toHexString(dir.hashCode)}"
      new graft.sql.LayoutWriter(maxRecordsPerFile = 4096).write(
        Tables.part(s, dir),
        graft.sql.functions.zorder(
          col("p_size").cast("long"),
          floor(col("p_retailprice")).cast("long"), 11),
        numRanges = 8, path = path)
      s.read.parquet(path)
        .where(col("p_size").between(10, 15))
        .groupBy(col("p_size"))
        .agg(count(lit(1)).as("n"), round(sum(col("p_retailprice")), 6).as("sum_price"))
    }),

    // single-pass column profiler over lineitem (nulls / distinct / min /
    // max in ONE aggregation job, long-format output)
    "q87_profile" -> ((s, dir) => {
      new graft.sql.TableProfiler().profile(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount",
          "l_returnflag", "l_linestatus"))
    }),

    // CUBE over two dims with a distinct aggregate — the grouping-sets +
    // multi-distinct surface (Expand-based plan; grouping_id disambiguates
    // the null rows that CUBE itself introduces)
    "q93_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping_id(col("o_orderstatus"), col("o_orderpriority")).cast("long").as("gid"),
          count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("gid"), col("n"), col("n_cust"), col("total"))
    }),

    // event-time RANGE-frame window: trailing 1-hour per-user value sum —
    // the time-based (not row-count) sliding aggregation; user-partitioned,
    // never a global window
    "q94_range_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, org.apache.spark.sql.expressions.Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("value"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_trailing"),
          round(sum(col("value")).over(w), 6).as("sum_trailing"))
    }),

    // corpus snapshot diff: v2 drops every 5th doc, rewrites every 7th,
    // and adds new ids for every 11th — the full-outer fingerprint
    // classification every ingest promotion runs
    "q98_corpus_diff" -> ((s, dir) => {
      val v1 = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val v2 = v1.where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"))
        .unionByName(v1.where(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
      graft.sql.SnapshotDiff.byKey(v1, v2, "doc_id", "text")
        .select(col("doc_id"), col("status"),
          coalesce(col("fp_old"), lit("")).as("fp_old"),
          coalesce(col("fp_new"), lit("")).as("fp_new"))
    }),

    // robust per-group outliers (modified z-score on median/MAD) over the
    // event value stream; emits only the flagged rows
    "q89_outliers" -> ((s, dir) => {
      new graft.feature.RobustOutliers(cutoff = 3.5)
        .flag(Tables.events(s, dir), "event_type", "value")
        .where(col("is_outlier"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
          round(col("robust_z"), 6).as("robust_z"))
    }),

    // Benford leading-digit audit of order totals — the classic
    // fabricated-data / unit-mixing detector: observed first-digit
    // distribution vs log10(1 + 1/d) expecteds (Scala-computed literals
    // consumed by BOTH engines — no per-engine log10) plus the chi^2
    // statistic. The leading digit comes from integer-cents string form
    // (floor + BIGINT + substring — CAST(double AS BIGINT) rounds in
    // DuckDB but truncates in Spark, so floor() is explicit).
    "q207_benford" -> ((s, dir) => {
      val probs = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
      val digits = Tables.orders(s, dir)
        .where(col("o_totalprice") >= 0.01)
        .select(substring(floor(col("o_totalprice") * 100).cast("string"), 1, 1)
          .cast("int").as("digit"))
      val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).cast("double").as("tn"))
      val terms = counts.crossJoin(broadcast(tot))
        .withColumn("expected",
          col("tn") * element_at(array(probs.map(lit): _*), col("digit")))
        .withColumn("chi_part",
          (col("n") - col("expected")) * (col("n") - col("expected"))
            / col("expected"))
      val chi = terms.agg(round(sum(col("chi_part")), 6).as("chi2"))
      terms.select(col("digit"), col("n"),
          round(col("n") / col("tn"), 6).as("share"),
          round(col("expected"), 6).as("expected"))
        .crossJoin(broadcast(chi))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_orders_by_nation" ->
      """SELECT n_name,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q03_collect_array" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
        |  count(l_linenumber) AS n_lines
        |FROM lineitem
        |GROUP BY l_orderkey""".stripMargin,
    "q04_gather" ->
      """SELECT l_orderkey, l_returnflag AS key,
        |  CAST(sum(l_quantity) AS DOUBLE) AS value
        |FROM lineitem
        |GROUP BY l_orderkey, l_returnflag""".stripMargin,
    "q05_gather_count" ->
      """SELECT l_suppkey, l_returnflag AS key,
        |  CAST(count(l_quantity) AS DOUBLE) AS value
        |FROM lineitem
        |GROUP BY l_suppkey, l_returnflag""".stripMargin,
    "q06_window_running" ->
      """SELECT o_orderkey, o_custkey,
        |  row_number() OVER w AS rn,
        |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q07_semi_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
        |EXCEPT
        |SELECT c_custkey FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)""".stripMargin,
    "q08_topk" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q52_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS cnt,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q55_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0
        |GROUP BY o_orderpriority""".stripMargin,
    // the same version-chain window over the stacked dim+updates rows
    "q146_scd2_merge" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_mktsegment AS segment, CAST(0 AS BIGINT) AS t
        |  FROM customer
        |), ups AS (
        |  SELECT o_custkey AS c_custkey, min(o_orderpriority) AS segment,
        |    epoch_us(o_orderdate) AS t
        |  FROM orders GROUP BY o_custkey, epoch_us(o_orderdate)
        |), chain AS (
        |  SELECT c_custkey, segment, t,
        |    lag(segment) OVER (PARTITION BY c_custkey ORDER BY t) AS prev
        |  FROM (SELECT * FROM dim UNION ALL SELECT * FROM ups)
        |), keep AS (
        |  SELECT c_custkey, segment, t FROM chain
        |  WHERE prev IS NULL OR segment IS DISTINCT FROM prev
        |)
        |SELECT c_custkey, segment, t AS valid_from,
        |  lead(t) OVER (PARTITION BY c_custkey ORDER BY t) AS valid_to
        |FROM keep""".stripMargin,
    // both sides' sketches replayed with the shared md5 bucket scheme;
    // the bucket join only covers co-occupied buckets — empty ones
    // contribute 0 to the inner product either way
    "q144_join_size_sketch" ->
      """WITH la AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
        |ob AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
        |ba AS (
        |  SELECT j,
        |    ('0x' || substr(md5(j::VARCHAR || ':' || k), 1, 14))::BIGINT % 2048 AS b,
        |    count(*) AS c
        |  FROM la CROSS JOIN range(0, 4) t(j) GROUP BY 1, 2
        |), bb AS (
        |  SELECT j,
        |    ('0x' || substr(md5(j::VARCHAR || ':' || k), 1, 14))::BIGINT % 2048 AS b,
        |    count(*) AS c
        |  FROM ob CROSS JOIN range(0, 4) t(j) GROUP BY 1, 2
        |), prod AS (
        |  -- every row j appears even when the two sketches co-occupy NO
        |  -- bucket in that row (true inner product 0): an inner join would
        |  -- silently drop such rows and min(ip) would overestimate, while
        |  -- the Spark cmsJoinSize correctly reports 0 on disjoint keys
        |  SELECT tj.j, CAST(coalesce(sum(ba.c * bb.c), 0) AS BIGINT) AS ip
        |  FROM range(0, 4) tj(j)
        |  LEFT JOIN ba ON ba.j = tj.j
        |  LEFT JOIN bb ON bb.j = ba.j AND bb.b = ba.b
        |  GROUP BY 1
        |), ex AS (
        |  SELECT count(*) AS exact_n
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |)
        |SELECT exact_n, (SELECT min(ip) FROM prod) AS est_n FROM ex""".stripMargin,
    // every statistic recomputed DIRECTLY from the full table (HLL
    // registers and histogram interpolation replayed as in q137/q133) —
    // equality with the merged history+delta state pins the maintenance
    // identity
    "q140_incremental_stats" ->
      """WITH base AS (
        |  SELECT event_type, value, CAST(user_id AS VARCHAR) AS u FROM events
        |), agg AS (
        |  SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_v
        |  FROM base GROUP BY 1
        |), hd AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(u), 1, 14))::BIGINT AS hv
        |  FROM base
        |), rr AS (
        |  SELECT event_type, hv >> 46 AS reg,
        |    CASE WHEN (hv & ((1::BIGINT << 46) - 1)) = 0 THEN 47
        |         ELSE 47 - length(format('{:b}', hv & ((1::BIGINT << 46) - 1)))
        |         END AS rho
        |  FROM hd
        |), regs AS (
        |  SELECT event_type, reg, max(rho) AS mj FROM rr GROUP BY 1, 2
        |), est AS (
        |  SELECT event_type,
        |    round(CASE WHEN 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024
        |        / (sum(pow(2.0, -mj)) + (1024 - count(*))) <= 2560.0
        |        AND (1024 - count(*)) > 0
        |      THEN 1024.0 * ln(1024.0 / (1024 - count(*)))
        |      ELSE 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024
        |        / (sum(pow(2.0, -mj)) + (1024 - count(*)))
        |      END, 6) AS est_entities
        |  FROM regs GROUP BY 1
        |), d AS (
        |  SELECT event_type,
        |    greatest(0, least(31, CAST(floor(value / 20.0) AS INT))) AS b
        |  FROM base
        |), bc AS (
        |  SELECT event_type, b, count(*) AS c FROM d GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, b, CAST(c AS DOUBLE) AS c,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b) AS DOUBLE)
        |      AS cum_incl,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b) - c AS DOUBLE)
        |      AS cum_b,
        |    CAST(sum(c) OVER (PARTITION BY event_type) AS DOUBLE) AS total
        |  FROM bc
        |), q AS (
        |  SELECT event_type,
        |    round(min_by((b + greatest(0.0, 0.5 * total - cum_b) / c) * 20.0, b)
        |      FILTER (WHERE cum_incl >= 0.5 * total), 9) AS p50,
        |    round(min_by((b + greatest(0.0, 0.9 * total - cum_b) / c) * 20.0, b)
        |      FILTER (WHERE cum_incl >= 0.9 * total), 9) AS p90
        |  FROM cum GROUP BY 1
        |)
        |SELECT event_type, n, sum_v, est_entities, p50, p90
        |FROM agg JOIN est USING (event_type) JOIN q USING (event_type)""".stripMargin,
    "q56_group_topk" ->
      """SELECT o_orderpriority, o_orderkey,
        |  round(o_totalprice, 2) AS totalprice,
        |  CAST(rnk AS BIGINT) AS rnk
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3""".stripMargin,
    "q64_group_percentiles" ->
      """SELECT source, count(*) AS n,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  round(quantile_cont(n_chars, 0.9), 6) AS p90,
        |  round(quantile_cont(n_chars, 0.99), 6) AS p99
        |FROM documents GROUP BY source""".stripMargin,
    "q65_time_bars" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hour, epoch_us(ts) AS tu, value
        |  FROM events
        |)
        |SELECT hour, count(*) AS n,
        |  arg_min(value, tu) AS open,
        |  arg_max(value, tu) AS close,
        |  round(min(value), 2) AS vmin,
        |  round(max(value), 2) AS vmax,
        |  round(sum(value), 2) AS vsum
        |FROM e GROUP BY hour""".stripMargin,
    "q66_copurchase" ->
      """WITH dist AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), items AS (
        |  SELECT l_orderkey, l_partkey FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) <= 64
        |)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n
        |FROM items a JOIN items b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n DESC, part_a, part_b
        |LIMIT 20""".stripMargin,
    "q70_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS p_urgent,
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS p_high,
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p_medium,
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS p_low
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q69_skew_stats" ->
      """WITH k AS (
        |  SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1
        |)
        |SELECT CAST(max(c) AS BIGINT) AS max_cnt,
        |  round(avg(c), 6) AS avg_cnt,
        |  round(quantile_cont(c, 0.99), 6) AS p99_cnt,
        |  round(max(c) / avg(c), 6) AS skew_ratio
        |FROM k""".stripMargin,
    "q53_full_outer" ->
      """WITH c AS (
        |  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0
        |), o AS (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
        |)
        |SELECT coalesce(c_custkey, -1) AS ckey,
        |  coalesce(o_custkey, -1) AS okey,
        |  coalesce(round(c_acctbal, 2), 0) AS acctbal,
        |  coalesce(n_orders, 0) AS n_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey""".stripMargin,
    "q73_bloom_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0
        |)""".stripMargin,
    "q83_layout_write" ->
      """SELECT p_size, count(*) AS n, round(sum(p_retailprice), 6) AS sum_price
        |FROM part
        |WHERE p_size BETWEEN 10 AND 15
        |GROUP BY p_size""".stripMargin,
    "q87_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  min($c) AS min_str, max($c) AS max_str
           |FROM lineitem""".stripMargin
      Seq(num("l_quantity"), num("l_extendedprice"), num("l_discount"),
        str("l_returnflag"), str("l_linestatus")).mkString("\nUNION ALL\n")
    },
    "q93_cube" ->
      """SELECT coalesce(o_orderstatus, '<all>') AS status,
        |  coalesce(o_orderpriority, '<all>') AS priority,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q94_range_window" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
        |)
        |SELECT event_id, user_id, ts_us,
        |  count(*) OVER w AS n_trailing,
        |  round(sum(value) OVER w, 6) AS sum_trailing
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q98_corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, text FROM documents
        |), v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text
        |  FROM v1 WHERE doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM v1 WHERE doc_id % 11 = 0
        |), o AS (
        |  SELECT doc_id AS old_key, sha256(text) AS fp_old FROM v1
        |), n AS (
        |  SELECT doc_id AS new_key, sha256(text) AS fp_new FROM v2
        |)
        |SELECT coalesce(old_key, new_key) AS doc_id,
        |  CASE WHEN old_key IS NULL THEN 'added'
        |       WHEN new_key IS NULL THEN 'removed'
        |       WHEN fp_old <> fp_new THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  coalesce(fp_old, '') AS fp_old,
        |  coalesce(fp_new, '') AS fp_new
        |FROM o FULL OUTER JOIN n ON old_key = new_key""".stripMargin,
    "q89_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1
        |), mad AS (
        |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY 1
        |)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(m.med, 6) AS med, round(d.mad, 6) AS mad,
        |  round(abs(e.value - m.med) / d.mad, 6) AS robust_z
        |FROM events e
        |JOIN med m USING (event_type)
        |JOIN mad d USING (event_type)
        |WHERE d.mad > 0 AND abs(e.value - m.med) / d.mad > 3.5""".stripMargin,

    // q207: identical integer-cents digit derivation and the SAME
    // interpolated probability literals; chi^2 folded exactly as the
    // engine writes it ((n - e)^2 / e summed, rounded at 1e-6)
    "q207_benford" -> {
      val pCase = (1 to 9)
        .map(d => s"WHEN $d THEN ${math.log10(1.0 + 1.0 / d)}")
        .mkString(" ")
      s"""WITH src AS (
        |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders WHERE o_totalprice >= 0.01
        |), counts AS (
        |  SELECT digit, count(*) AS n FROM src GROUP BY 1
        |), tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tn FROM counts),
        |terms AS (
        |  SELECT digit, n, tn,
        |    tn * (CASE digit $pCase END) AS expected
        |  FROM counts, tot
        |), chi AS (
        |  SELECT round(sum((n - expected) * (n - expected) / expected), 6) AS chi2
        |  FROM terms
        |)
        |SELECT digit, n, round(n / tn, 6) AS share,
        |  round(expected, 6) AS expected, chi2
        |FROM terms, chi""".stripMargin
    }
  )
}
