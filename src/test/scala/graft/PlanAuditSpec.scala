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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no cartesian, no unpartitioned window, clean scan filters") {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
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
  }

  test("flagship entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
