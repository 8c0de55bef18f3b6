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

  test("queryTimes decodes the r14 positional qt array (ds and sec, -1 skipped)") {
    // the r14 printed line: qt[i] is q(i+1)'s time in qprec units, -1 =
    // no time (errored / filtered / id gap)
    val ds = """{"metric":"total","value":3.1,"unit":"sec","qprec":"ds",""" +
      """"qt":[5,12,-1,0,103],"errors":{},"gc_s":0.1,"spill_mb":0,"sf":"sf0.1"}"""
    val t = BenchDiff.queryTimes(ds)
    assert(t === Map("q01" -> 0.5, "q02" -> 1.2, "q04" -> 0.0, "q05" -> 10.3))
    // the whole-second degrade fallback keeps the same positional shape
    val sec = ds.replace("\"qprec\":\"ds\"", "\"qprec\":\"sec\"")
    assert(BenchDiff.queryTimes(sec)("q05") === 103.0)
    // keyed shapes (bench_out.json, pre-r14 driver artifacts) still decode
    val keyed = """{"metric":"total","value":1.0,"unit":"sec",""" +
      """"queries":{"q01_a":0.50,"q02_b":1.25},"errors":{},"sf":"x"}"""
    assert(BenchDiff.queryTimes(keyed) === Map("q01_a" -> 0.5, "q02_b" -> 1.25))
  }

  test("truncated DataFilters with ']' inside elements still normalizes (r13 ADVICE)") {
    // the r13 regex used [^\]]* so a GetArrayItem rendering (x#[0]) in the
    // surviving text silently skipped the trim — the cut-offset hash
    // instability came back exactly for array-syntax filters
    val a = "FileScan parquet [x#] DataFilters: [(x#[0] = 7), isnotnull(y#[2]), (y#[2] > someco..., Format: Parquet"
    val b = "FileScan parquet [x#] DataFilters: [(x#[0] = 7), isnotnull(y#[2]), (y#..., Format: Parquet"
    assert(graft.Bench.planHash(a) === graft.Bench.planHash(b))
    assert(graft.Bench.normalizePlan(a).contains("isnotnull(y#[2]), ..."))
    // a change in a COMPLETE bracket-bearing element still flips
    val c = a.replace("(x#[0] = 7)", "(x#[1] = 7)")
    assert(graft.Bench.planHash(a) !== graft.Bench.planHash(c))
    // a comma nested inside BRACKETS in the partial tail is not a trim
    // point (the paren-only depth scan missed this)
    val d = "FileScan parquet [x#] DataFilters: [isnotnull(x#), x# IN sort_array(array(a#[1,..., Format: Parquet"
    assert(graft.Bench.normalizePlan(d).contains("[isnotnull(x#), ..."))
    // untruncated bracket-bearing lists stay untouched
    val e = "FileScan parquet [x#] DataFilters: [(x#[0] = 7)], Format: Parquet"
    assert(graft.Bench.normalizePlan(e).contains("[(x#[0] = 7)]"))
  }

  test("gid canonicalization only arms on the distinct-agg rewrite signature (r13 ADVICE)") {
    // q52/q93 merely alias grouping_id() AS gid — their plans carry gid#
    // on aggregate-output lines but no `FILTER (WHERE (gid#` and no
    // Expand line that emits gid# (rollup Expands emit
    // spark_grouping_id#). Integer literals and element order on those
    // lines must keep full-fidelity hashing.
    val aliased = "HashAggregate(keys=[n_name#, spark_grouping_id#], " +
      "functions=[sum((x# + 1))], output=[n_name#, gid#, sum_x#])\n" +
      "Expand [[n_name#, 0], [null, 1]], [n_name#, spark_grouping_id#]"
    val intChanged = aliased.replace("(x# + 1)", "(x# + 2)")
    val reordered = aliased.replace("output=[n_name#, gid#, sum_x#]",
      "output=[gid#, n_name#, sum_x#]")
    assert(graft.Bench.planHash(aliased) !== graft.Bench.planHash(intChanged))
    assert(graft.Bench.planHash(aliased) !== graft.Bench.planHash(reordered))
    // with the rewrite signature present, gid# lines canonicalize as before
    val rewrite = "HashAggregate(keys=[k#, gid#], functions=[partial_count(v#) " +
      "FILTER (WHERE (gid# = 4))])\nExchange hashpartitioning(k#, gid#, 32)"
    val permuted = "HashAggregate(keys=[k#, gid#], functions=[partial_count(v#) " +
      "FILTER (WHERE (gid# = 2))])\nExchange hashpartitioning(gid#, k#, 32)"
    assert(graft.Bench.planHash(rewrite) === graft.Bench.planHash(permuted))
  }

  test("teleField reads negative values (the load:-1.00 JMX-unavailable sentinel)") {
    val j = """{"telemetry":{"q01_a":{"task_ms":100,"load":-1.00,"plan":"aa"}}}"""
    assert(BenchDiff.teleField(j, "q01_a", "load") === Some("-1.00"))
  }

  test("classify: flat task_ms + elevated load + equal hash reads CONTENTION") {
    def tele(plan: String, taskMs: Long, load: Double) =
      s"""{"metric":"total","value":1.0,"unit":"sec","queries":{"q01_a":0.5},""" +
        s""""telemetry":{"q01_a":{"t1":0.5,"t2":0.5,"gc_ms":1,"task_ms":$taskMs,""" +
        s""""plan":"$plan","load":${graft.Bench.jsonNum(load, 2)}}},"sf":"x"}"""
    // same plan, same work, host went from idle to loaded: contention
    assert(BenchDiff.classify(tele("aa", 1000, 1.0), tele("aa", 1050, 7.5),
      "q01_a", "q01_a").startsWith("CONTENTION"))
    // same plan but the task time itself grew: a real slowdown, not queueing
    // (2-char test hashes => the r16 annotation states the prefix width)
    assert(BenchDiff.classify(tele("aa", 1000, 1.0), tele("aa", 2400, 7.5),
      "q01_a", "q01_a") === "ENVIRONMENTAL(same plan to 2-hex prefix)")
    // same plan, flat work, but the host was NOT loaded: unexplained env
    assert(BenchDiff.classify(tele("aa", 1000, 1.0), tele("aa", 1050, 2.0),
      "q01_a", "q01_a") === "ENVIRONMENTAL(same plan to 2-hex prefix)")
    // plan changed: always a flip, whatever the load says
    assert(BenchDiff.classify(tele("aa", 1000, 1.0), tele("bb", 1050, 7.5),
      "q01_a", "q01_a") === "PLAN-FLIP")
    // no telemetry (driver artifacts): NO-HASH, as before
    assert(BenchDiff.classify("""{"queries":{"q01":0.5}}""",
      tele("aa", 1000, 7.5), "q01", "q01_a") === "NO-HASH")
  }

  test("positional driver-line decoders: ph, tt, load, rm (r15 attribution channels)") {
    val line = """{"metric":"total","value":9.9,"unit":"sec","qprec":"ds",""" +
      """"qt":[5,-1,2708],"errors":{},"load":27.50,"tt":[1,-1,271],""" +
      """"ph":"a7c---f01","rm":{"q03":61},"gc_s":1.0,"spill_mb":0,"sf":"sf0.1"}"""
    assert(BenchDiff.positionalPlans(line) === Map("q01" -> "a7c", "q03" -> "f01"))
    assert(BenchDiff.positionalTaskMs(line) === Map("q01" -> 1000L, "q03" -> 271000L))
    assert(BenchDiff.scalarLoad(line) === Some(27.5))
    assert(BenchDiff.remeasures(line) === Map("q03" -> 6.1))
    // a failed re-measure (-1) is dropped, not read as -0.1 s
    val failedRm = line.replace(""""rm":{"q03":61}""", """"rm":{"q03":-1}""")
    assert(BenchDiff.remeasures(failedRm) === Map.empty)
    // bench_out.json (has a telemetry section): the scalar-load decoder
    // must NOT grab some query's per-window sample
    val benchOut = """{"metric":"total","telemetry":{"q01_a":{"load":3.10}}}"""
    assert(BenchDiff.scalarLoad(benchOut) === None)
  }

  test("classify runs on the driver line itself (the r14 q120 incident shape)") {
    // old = a committed bench_out snapshot (full 8-char hash, telemetry);
    // new = the driver's printed line (3-char prefix, positional channels)
    val snapshot =
      """{"metric":"total","value":6.1,"unit":"sec","queries":{"q03_setsim":6.1},""" +
        """"telemetry":{"q03_setsim":{"t1":9.5,"t2":6.1,"gc_ms":689,""" +
        """"task_ms":195000,"plan":"a7c7693d","load":9.92}},"sf":"x"}"""
    def driver(ph: String, rm: String) =
      s"""{"metric":"total","value":270.8,"unit":"sec","qprec":"ds",""" +
        s""""qt":[-1,-1,2708],"errors":{},"load":31.40,"tt":[-1,-1,3890],""" +
        s""""ph":"------$ph"$rm,"gc_s":107.9,"spill_mb":0,"sf":"sf0.1"}"""
    // same plan prefix + the in-run re-measure returned to the committed
    // time: the artifact itself says CONTENTION — no manual re-run needed
    assert(BenchDiff.classify(snapshot, driver("a7c", ""","rm":{"q03":63}"""),
      "q03_setsim", "q03").startsWith("CONTENTION"))
    // same plan prefix, no re-measure, task time GREW with the wall time:
    // not provably queueing — stays ENVIRONMENTAL
    assert(BenchDiff.classify(snapshot, driver("a7c", ""),
      "q03_setsim", "q03") === "ENVIRONMENTAL(same plan to 3-hex prefix)")
    // different prefix: a real plan flip, whatever the load says
    assert(BenchDiff.classify(snapshot, driver("b12", ""),
      "q03_setsim", "q03") === "PLAN-FLIP")
  }

  test("Bench.loadBaseline reads the committed snapshot resource") {
    val b = graft.Bench.loadBaseline()
    assert(b.nonEmpty, "bench_baseline.json resource missing from classpath")
    // the q120 incident query must be present with its snapshot-scale time
    assert(b.get("q120_setsim_join").exists(t => t > 1.0 && t < 60.0))
    // r16 rich shape: the resource carries its own sf and per-query plan
    // hashes (the vd channel's comparison side)
    val full = graft.Bench.loadBaselineFull()
    assert(full.sf === Some("sf0.1"))
    assert(full.plans.get("q120_setsim_join").exists(_.length === 8))
    assert(full.plans.size === full.times.size)
  }

  test("Bench.loadBaselineFull parses both rich and legacy baseline shapes") {
    // exercised via the regexes directly against literal text (the
    // resource on the classpath is always the rich shape now)
    val legacy = """{"q01_a": 0.5, "q02_b": 1.25}"""
    val legacyTimes = """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r
      .findAllMatchIn(legacy).map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(legacyTimes === Map("q01_a" -> 0.5, "q02_b" -> 1.25))
    val rich = """{"_sf": "sf0.1","q01_a": {"t": 0.5, "ph": "aabbccdd"}}"""
    val m = """"([A-Za-z0-9_]+)"\s*:\s*\{\s*"t"\s*:\s*([0-9.]+)\s*,\s*"ph"\s*:\s*"([0-9a-f]*)"\s*\}""".r
      .findAllMatchIn(rich).toSeq
    assert(m.map(x => (x.group(1), x.group(2).toDouble, x.group(3))) ===
      Seq(("q01_a", 0.5, "aabbccdd")))
  }

  test("Bench.verdictChar adjudicates the 2x-gate breakers (r16 vd channel)") {
    import graft.Bench.verdictChar
    // plan flipped vs the committed snapshot: the regression is real code
    assert(verdictChar(Some("aabbccdd"), "11223344", 5.0, None) === "p")
    // same plan + re-measure returned to baseline: demonstrated transient
    assert(verdictChar(Some("aabbccdd"), "aabbccdd", 5.0, Some(6.0)) === "E")
    // same plan but the re-measure ALSO read high: sustained — human needed
    assert(verdictChar(Some("aabbccdd"), "aabbccdd", 5.0, Some(40.0)) === "r")
    // a failed re-measure (-1 sentinel) is no evidence either way
    assert(verdictChar(Some("aabbccdd"), "aabbccdd", 5.0, Some(-1.0)) === "e")
    // same plan, rm never fired (2x < t < 3x): weaker environmental
    assert(verdictChar(Some("aabbccdd"), "aabbccdd", 5.0, None) === "e")
    // no committed hash to compare against
    assert(verdictChar(None, "aabbccdd", 5.0, None) === "x")
  }

  test("normalize extracts and unescapes ONLY the driver artifact's tail value") {
    val driver = """{"n":10,"rc":0,"note":"outer \"escaped\" stays",""" +
      """"tail":"{\"metric\":\"total\",\"queries\":{\"q01\":0.5,\"q02\":1.2}}",""" +
      """"parsed":null}"""
    val n = BenchDiff.normalize(driver)
    assert(n === """{"metric":"total","queries":{"q01":0.5,"q02":1.2}}""")
  }
}
