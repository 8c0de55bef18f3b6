package graft

/** Plan-quality regression guard over EVERY query in SparkEntry: no
  * cartesian products, no unpartitioned (single-task) window sorts, and no
  * expensive expressions (regexp / split / higher-order lambdas / UDFs)
  * landing in a scan's DataFilters — the classic 100TB scale-killers.
  * (BroadcastNestedLoopJoin is allowed: it appears only for intentionally
  * broadcast one-row totals and broadcast probe sets.)
  *
  * The DataFilters audit catches the InferFiltersFromGenerate trap: a
  * non-outer `explode(expensiveExpr)` gets a `size(expensiveExpr) > 0`
  * filter cloned into the scan, re-evaluating the whole expression chain
  * per row on the interpreted path (measured up to 50× on the tokenizer
  * chain; fixed in TfIdf by `explode_outer`, which the rule skips).
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Expression signatures that must never appear inside an INFERRED
    * `size(...) > 0` scan filter (the InferFiltersFromGenerate clone).
    * Intentional expensive predicates pushed to the scan are allowed —
    * e.g. QualityFilter's keep-condition, whose entire design is killing
    * rows at the scan before anything shuffles; those compare against
    * thresholds (`>= 40`, `<= 0.2`), never the clone's `> 0`.
    *
    * Each FileScan prints as ONE line of the plan tree with its
    * DataFilters bracket inline, so a line-level check is exact up to
    * Spark's field truncation — and a truncated filter list only ever
    * hides MORE of the same expressions, never creates a false hit.
    */
  private val expensiveInScan =
    Seq("regexp_replace(", "regexp_extract(", "rlike", "split(",
      "lambdafunction(", "zip_with(", "UDF(", "pythonUDF", "shingles(",
      "minhashsignature(", "hyperplanesignature(", "simhash")

  private def hasInferredGenerateClone(filters: String): Boolean =
    filters.contains("size(") && filters.contains("> 0") &&
      expensiveInScan.exists(filters.contains)

  /** Test-table columns (and their common aliases) with ~tens of distinct
    * values. A window PARTITIONED solely by these sorts the dominant
    * group's entire slice in ONE task — the q56/q58/q96 class, which
    * shipped twice while this audit was green. A window is fine as soon as
    * any partition column is NOT in this set (a real key or a bucket).
    */
  private val lowCardCols = Set(
    "o_orderpriority", "o_orderstatus", "l_returnflag", "l_linestatus",
    "l_shipmode", "l_shipinstruct", "r_name", "n_name", "p_brand",
    "p_container", "p_mfgr", "c_mktsegment", "lang", "source",
    "media_type", "event_type", "etype", "priority", "label", "tier")

  // physical Window prints `Window [funcs], [partSpec], [orderSpec]`; the
  // last two bracket groups never nest, so anchor on the line's tail
  private val windowSpecs = """ Window \[.*\], \[([^\[\]]*)\], \[[^\[\]]*\]""".r.unanchored

  private def lowCardWindows(plan: String): Seq[String] =
    plan.linesIterator.filter(_.contains(" Window [")).flatMap {
      case l @ windowSpecs(part) =>
        val cols = part.split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.takeWhile(_ != '#'))
        if (cols.nonEmpty && cols.forall(lowCardCols)) Some(l.trim) else None
      case _ => None
    }.toSeq

  /** The three audit assertions, callable on any plan string (the
    * per-query loop below, plus targeted audits of plans the queries hide
    * behind lineage-truncating pins).
    */
  private def auditPlan(name: String, plan: String): Unit = {
      assert(!plan.contains("CartesianProduct"),
        s"cartesian product in $name:\n$plan")
      // physical Window prints [exprs], [partitionSpec], [orderSpec]; an
      // empty partition spec ("], [], [") means a single-task global sort.
      // Plan lines carry tree art ("+- Window [..."), so match the node
      // name inline — startsWith after trim never fires (round-6 fix: the
      // original filter made this check vacuous)
      val unpartitioned = plan.linesIterator
        .filter(_.contains(" Window ["))
        .filter(_.contains("], [], ["))
      assert(unpartitioned.isEmpty,
        s"unpartitioned window in $name: ${unpartitioned.mkString("; ")}")
      // a window partitioned ONLY by low-cardinality columns is a
      // one-task-per-group sort at scale — use GroupedNtile instead
      val lowCard = lowCardWindows(plan)
      assert(lowCard.isEmpty,
        s"low-cardinality-partition window in $name (one task per group " +
          s"at scale; rank two-phase via GroupedNtile): ${lowCard.mkString("; ")}")
      // scan-filter audit: DataFilters rides inline on the FileScan line,
      // between "DataFilters: [" and the next "], " field separator
      val dirtyScans = plan.linesIterator
        .filter(_.contains("FileScan"))
        .flatMap { l =>
          val i = l.indexOf("DataFilters: [")
          if (i < 0) None
          else {
            val rest = l.substring(i)
            val end = rest.indexOf("], ")
            Some(if (end < 0) rest else rest.take(end + 1))
          }
        }
        .filter(hasInferredGenerateClone)
        .toSeq
      assert(dirtyScans.isEmpty,
        s"InferFiltersFromGenerate clone in scan DataFilters of $name:\n${dirtyScans.mkString("\n")}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no cartesian, no unpartitioned window, clean scan filters") {
      auditPlan(name, fn(spark, dir).queryExecution.executedPlan.toString)
    }
  }

  test("q180 legs audit clean UNPINNED (the fusion pin truncates lineage)") {
    // q180's executed plan starts at the eager localCheckpoint, so the
    // per-query audit above only ever sees the fusion tail; this audits
    // the SAME legs through fuse's pin = false door — a regression in the
    // leg wiring (cartesian, unpartitioned window) must fail here
    val plan = graft.similarity.HybridRetriever.fuse(
      graft.queries.TextQueries.hybridLegs(spark, dir),
      rrfK = 60, topK = 10, pin = false)
      .queryExecution.executedPlan.toString
    auditPlan("q180_hybrid_rrf(unpinned)", plan)
  }

  test("low-card window detector fires on the one-task-per-group pattern") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the exact pre-fix q58 shape: rank window partitioned by `lang`
    val bad = docs.withColumn("rn", row_number().over(
      Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
    assert(lowCardWindows(bad.queryExecution.executedPlan.toString).nonEmpty,
      "detector must flag a window partitioned only by a low-card column")
    // ...and stays silent once a bucket column joins the partition spec
    // (the GroupedNtile shape)
    val good = docs.withColumn("b", col("doc_id") % 64)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"), col("b")).orderBy(col("doc_id"))))
    assert(lowCardWindows(good.queryExecution.executedPlan.toString).isEmpty)
  }

  test("q161 per-group cumulative reads orders ONCE (grouped prefix sum)") {
    // round 8 looped the 5 priority slices on the driver — 5 unioned
    // plans, each rescanning orders (5 scans no reuse could merge: the
    // per-slice filters differ). PrefixSum.exclusiveBy expresses all
    // groups in one plan whose diamond references are IDENTICAL subtrees,
    // so runtime exchange reuse collapses them: the FINAL (post-execution
    // AQE) plan must read orders through one live scan, every other
    // reference a ReusedExchange. Checked after count() because reuse is
    // applied during adaptive execution, not in the initial plan.
    val df = SparkEntry.queries("q161_grouped_auc")(spark, dir)
    // collect() (5-row result) executes df's OWN plan — count() would wrap
    // it in a new aggregate and leave this one un-finalized
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // every InMemoryTableScan REPRINTS the cached child plan, so the scan
    // line appears many times — but all copies of the one materialized
    // scan are byte-identical (same expr ids). Independent uncached scans
    // print column-pruning-specialized schemas with fresh expr ids, so
    // "one distinct scan signature" is exactly "orders read once".
    val scanSigs = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("orders.parquet"))
      .map(l => l.substring(l.indexOf("FileScan")))
      .toSet
    assert(scanSigs.size === 1,
      s"q161 should scan orders exactly once (one cached materialization), " +
        s"found ${scanSigs.size} distinct scans:\n${scanSigs.mkString("\n")}")
  }

  test("q127's gather is segmented — no whole-history-per-key collect_list") {
    // the r13 scale fix: EwmaFeatures must gather per (key, bucket),
    // never per key alone — a key-only gather is the row-size cap the
    // segmented plan removed. The carry chain's per-key aggregation over
    // SUMMARIES (window collect_list of three-double structs) is fine;
    // what must not exist is a collect_list of the event struct keyed by
    // __k without __bkt.
    val plan = SparkEntry.queries("q127_ewma")(spark, dir)
      .queryExecution.executedPlan.toString
    val eventGathers = plan.linesIterator
      .filter(l => l.contains("collect_list(named_struct(o, "))
      .toSeq
    assert(eventGathers.nonEmpty, s"expected the segment gather in:\n$plan")
    eventGathers.foreach { l =>
      assert(l.contains("__bkt"),
        s"event gather not segmented (keyed without __bkt): $l")
    }
  }

  test("flagship entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle normalize-chain replica carries the engine's whitespace map") {
    // TextNormalizer.normalize and its ~20 DuckDB replicas must move in
    // LOCKSTEP: an oracle still on RE2's ASCII [[:space:]] (or \s) would
    // agree with the engine on the test corpus and silently diverge on
    // the first NBSP. Any oracle that replays the strip stage must embed
    // the exact translate() fragment — interpolated from the one
    // constant, so this can only fail if someone hand-writes a new chain.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("[^a-z0-9 ]', '', 'g'), ' +'") &&
        !sql.contains(graft.dedup.TextNormalizer.sqlTranslateArgs) => name
    }
    assert(offenders.isEmpty,
      s"oracles replaying normalize without the shared whitespace translate: " +
        offenders.toSeq.sorted.mkString(", "))
    val ascii = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("[[:space:]]") => name
    }
    assert(ascii.isEmpty,
      s"oracles still on ASCII [[:space:]]: ${ascii.toSeq.sorted.mkString(", ")}")
  }
}
