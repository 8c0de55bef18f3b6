package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins BenchDiff's dependency-free JSON extraction against both the
  * machine-written (no-space) and pretty-printed (spaced) shapes, and the
  * nested-object traversal that round-8's flat indexOf approach got wrong.
  */
class BenchDiffSpec extends AnyFunSuite {

  private val compact =
    """{"metric":"total","value":1.0,"unit":"sec",""" +
      """"queries":{"q01_a":0.50,"q02_b":1.25},""" +
      """"errors":{},"gc_s":0.1,"spill_mb":0,""" +
      """"telemetry":{"q01_a":{"t1":0.5,"t2":0.6,"gc_ms":12,"plan":"aabbccdd"},""" +
      """"q02_b":{"t1":1.3,"t2":1.25,"gc_ms":7,"plan":"11223344"}},"sf":"x"}"""

  private val spaced = compact
    .replace("\":", "\" : ").replace(",\"", ", \"")

  test("section extracts the queries object, compact and spaced") {
    for (j <- Seq(compact, spaced)) {
      val s = BenchDiff.section(j, "queries")
      assert(s.contains("q01_a") && s.contains("q02_b"))
      assert(!s.contains("telemetry"), "must stop at the queries object")
    }
  }

  test("teleField reads nested per-query fields, compact and spaced") {
    for (j <- Seq(compact, spaced)) {
      assert(BenchDiff.teleField(j, "q01_a", "plan") === Some("aabbccdd"))
      assert(BenchDiff.teleField(j, "q02_b", "gc_ms") === Some("7"))
      assert(BenchDiff.teleField(j, "q03_missing", "plan") === None)
      assert(BenchDiff.teleField(j, "q01_a", "nope") === None)
    }
  }

  test("missing sections degrade to empty, not exceptions") {
    assert(BenchDiff.section("""{"a":1}""", "queries") === "{}")
    assert(BenchDiff.teleField("""{"a":1}""", "q01", "plan") === None)
  }

  test("normalize leaves bench_out.json alone even if it contains 'tail'") {
    // pre-r11 the whole-file unescape fired on the SUBSTRING "tail" and
    // corrupted legitimately escaped quotes elsewhere in the artifact
    val benchOut = """{"metric":"total","value":1.0,"unit":"sec",""" +
      """"queries":{"q01_tail_stats":0.50},""" +
      """"errors":{"q02_x":"detail: \"tail\" of log"},"sf":"x"}"""
    assert(BenchDiff.normalize(benchOut) === benchOut)
  }

  test("planHash is invariant to expr ids AND session-global lambda counters") {
    // the r11 lesson: `lambda x_15#55`'s _15 comes from a session-global
    // counter — two identical plans analyzed at different points of a
    // suite MUST hash equal, or every suite-composition change reads as a
    // mass plan flip
    val a = "Project [size(filter(split(text#1), lambdafunction((length(lambda x_1#11) > 0), lambda x_1#11, false)))]"
    val b = "Project [size(filter(split(text#45), lambdafunction((length(lambda x_15#55) > 0), lambda x_15#55, false)))]"
    assert(graft.Bench.planHash(a) === graft.Bench.planHash(b))
    // genuinely different plans still differ
    val c = a.replace("Project", "Filter")
    assert(graft.Bench.planHash(a) !== graft.Bench.planHash(c))
    // typed-path closures print JVM object identity — per-instance @hash,
    // per-JVM Lambda id/address (the q54 flip class)
    val d = "MapPartitions graft.multimodal.MediaDecoder$$Lambda$2721/0x00007faf80d99690@1616f27b, obj#15"
    val e = "MapPartitions graft.multimodal.MediaDecoder$$Lambda$3104/0x00007fb081d99691@5afd267e, obj#58"
    assert(graft.Bench.planHash(d) === graft.Bench.planHash(e))
    // tmp-dir FileScan locations are ephemeral (q164 bakes the PID into
    // its artifact dir — the r12 flip class); the path remainder is
    // stripped but the file:/tmp/ marker survives, so a move to a real
    // layout still flips
    val f = "FileScan parquet [cid#] Location: InMemoryFileIndex(1 paths)[file:/tmp/graft_q164_artifacts_21777/ivf/centroids]"
    val g = "FileScan parquet [cid#] Location: InMemoryFileIndex(1 paths)[file:/tmp/graft_q164_artifacts_22793/ivf/centroids]"
    assert(graft.Bench.planHash(f) === graft.Bench.planHash(g))
    val h = f.replace("file:/tmp/graft_q164_artifacts_21777/ivf/centroids", "file:/data/ivf/centroids")
    assert(graft.Bench.planHash(f) !== graft.Bench.planHash(h))
  }

  test("gid#-bearing plan lines canonicalize order-insensitively (the q87 distinct-agg rewrite)") {
    // RewriteDistinctAggregates permutes group keys, Expand rows,
    // hashpartitioning args and the gid NUMBERING itself with per-JVM
    // ExprId order — the same semantic plan, different text every
    // full-suite run (the r12 KNOWN-UNSTABLE carve-out, closed in r13)
    val a = "Expand [[null, null, 0, l_quantity#, l_returnflag#], " +
      "[l_returnflag#, null, 2, null, null], [null, l_quantity#, 4, null, null]], " +
      "[l_returnflag#, l_quantity#, gid#, l_quantity#, l_returnflag#]"
    val b = "Expand [[null, null, 0, l_quantity#, l_returnflag#], " +
      "[l_quantity#, null, 2, null, null], [null, l_returnflag#, 4, null, null]], " +
      "[l_quantity#, l_returnflag#, gid#, l_quantity#, l_returnflag#]"
    assert(graft.Bench.planHash(a) === graft.Bench.planHash(b))
    val c = "SortAggregate(key=[l_returnflag#, l_quantity#, gid#], " +
      "functions=[partial_count(l_quantity#) FILTER (WHERE (gid# = 4))])"
    val d = "SortAggregate(key=[l_quantity#, l_returnflag#, gid#], " +
      "functions=[partial_count(l_quantity#) FILTER (WHERE (gid# = 2))])"
    assert(graft.Bench.planHash(c) === graft.Bench.planHash(d))
    // a different aggregate on a gid line still flips
    val e = c.replace("partial_count", "partial_max")
    assert(graft.Bench.planHash(c) !== graft.Bench.planHash(e))
    // lines WITHOUT gid# keep order-sensitive hashing: a real sort-key
    // reorder elsewhere must stay visible
    val f = "Sort [a# ASC NULLS FIRST, b# ASC NULLS FIRST], false, 0"
    val g = "Sort [b# ASC NULLS FIRST, a# ASC NULLS FIRST], false, 0"
    assert(graft.Bench.planHash(f) !== graft.Bench.planHash(g))
  }

  test("truncated DataFilters lists hash independent of the ellipsis cut point") {
    // the metadata renderer cuts at a CHARACTER budget over raw text
    // that still carries expr ids, so the surviving partial element
    // varies with how many expr-id digits earlier queries consumed
    // (q47/q134/q159 full-suite vs focused, r13)
    val a = "FileScan parquet [ts#] DataFilters: [isnotnull(event_type#), " +
      "(event_type# = click), isnotnull(unix_micros(cast(ts# as timestamp)))..., " +
      "Format: Parquet"
    val b = "FileScan parquet [ts#] DataFilters: [isnotnull(event_type#), " +
      "(event_type# = click), isnotnull(unix_micros(cast(ts# as timest..., " +
      "Format: Parquet"
    assert(graft.Bench.planHash(a) === graft.Bench.planHash(b))
    // a difference in a COMPLETE (surviving) element still flips
    val c = a.replace("= click", "= view")
    assert(graft.Bench.planHash(a) !== graft.Bench.planHash(c))
    // untruncated DataFilters lists are untouched
    val d = "FileScan parquet [a#] DataFilters: [isnotnull(a#)], Format: Parquet"
    assert(graft.Bench.normalizePlan(d).contains("[isnotnull(a#)]"))
    // a single filter too wide for the budget (no complete element
    // before the ellipsis — q37's shape): the partial text is dropped
    // entirely, since its cut point is id-width-dependent too
    val e1 = "FileScan parquet [text#] DataFilters: [element_at(transform(array(CASE WHEN (length(text#) > 0..., Format: Parquet"
    val e2 = "FileScan parquet [text#] DataFilters: [element_at(transform(array(CASE WHEN (length(te..., Format: Parquet"
    assert(graft.Bench.planHash(e1) === graft.Bench.planHash(e2))
    assert(graft.Bench.normalizePlan(e1).contains("DataFilters: [ ..."))
    // commas NESTED inside the partial last element (IN-lists, multi-arg
    // functions) are on the cut-offset-dependent side — the trim must
    // land at the last TOP-LEVEL comma, or the hash still varies with
    // where the budget cut fell (the r13 review find)
    val g1 = "FileScan parquet [t#] DataFilters: [isnotnull(t#), t# IN (click,view,purch..., Format: Parquet"
    val g2 = "FileScan parquet [t#] DataFilters: [isnotnull(t#), t# IN (cli..., Format: Parquet"
    assert(graft.Bench.planHash(g1) === graft.Bench.planHash(g2))
    assert(graft.Bench.normalizePlan(g1).contains("[isnotnull(t#), ..."))
  }

  test("normalize extracts and unescapes ONLY the driver artifact's tail value") {
    val driver = """{"n":10,"rc":0,"note":"outer \"escaped\" stays",""" +
      """"tail":"{\"metric\":\"total\",\"queries\":{\"q01\":0.5,\"q02\":1.2}}",""" +
      """"parsed":null}"""
    val n = BenchDiff.normalize(driver)
    assert(n === """{"metric":"total","queries":{"q01":0.5,"q02":1.2}}""")
  }
}
