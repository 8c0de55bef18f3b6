package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** The empirical leg of the spill-not-OOM claim: fork a fresh JVM with a
  * deliberately SMALL heap (1.5 GB — the top queries peak at 2.6-7.5 GB
  * of pool usage when given 8 GB) and run the engine's five most
  * expensive queries at sf0.01 end-to-end. Completion under that cap is
  * the evidence that the aggregation/join paths degrade to GC + spill
  * instead of dying — the failure mode a 100 TB run hits on its worst
  * partition, exercised deterministically here.
  *
  * The round-8 driver bench recorded one of these queries at 16× its
  * reproducible cost with no attribution possible; this spec plus the
  * Bench telemetry (gc_ms/spill_mb/plan hash per query) is the pair that
  * makes any future such outlier explainable from artifacts alone.
  *
  * sf0.01 + 8 threads keeps the spec inside the test-time budget (~40 s);
  * the same harness at sf0.1/-Xmx3g/32 threads was run by hand in round 9:
  * all five complete, q120 7.9 s vs 5.6 s unconstrained with the SAME
  * final plan hash (a7c7693d) — pressure costs GC time, not the plan.
  *
  * Round-15 by-hand tier (the q120 incident follow-up, BENCHDIFF_r15 §1):
  * q120 alone at sf0.1/32 threads under -Xmx3g → 26.6 s cold / 12.6 s
  * warm, and under -Xmx2g (≈⅓ of its unconstrained 6.3 GB pool peak) →
  * 32.1 s cold / 11.3 s warm — completion with bounded GC even at a third
  * of its preferred heap. Pressure sensitivity for q120 is a MEASURED
  * ≤2× warm envelope, not a cliff.
  */
class HeapConstrainedSpec extends AnyFunSuite {

  private val queries = Seq(
    "q120_setsim_join", "q88_edit_join", "q145_record_linkage",
    "q126_triangles", "q116_ivfpq_search",
    // round-10 addition: the artifact-serving path (train + parquet write
    // + reopen + search) joined the bench top tier — its writer buffers
    // and load-side scans must degrade like the pure-compute queries
    "q164_ivfpq_artifact_search",
    // round-11 addition: the OPQ serving path (fixture load + broadcast
    // matvec rotate + encode + full ADC) — the rotation literal and the
    // per-query distance tables are the broadcast-side memory to bound
    "q167_opq_adc_search",
    // round-13 addition: the segmented EWMA — its per-(key, bucket)
    // gathers and the carry-chain window are the new array-bearing
    // memory shape; must degrade like the others under the cap
    "q127_ewma",
    // round-14 (continued) addition: the anomaly composition — TWO
    // segmented smoothers plus (key, tie) joins plus the lag/count
    // scoring window live in one plan; the doubled gather/window state
    // must spill, not OOM
    "q178_anomaly",
    // round-16 additions (r15 verdict #6): q184's full maintain cycle —
    // bootstrap + six appends + TWO in-place compactions + reopen +
    // search — is the round's biggest bench-tier query and its writer
    // buffers/compaction read-backs are the newest memory shape; q183's
    // band-signature self-join holds the per-band candidate pairs; the
    // k-core peel's per-round localCheckpoints must not pin more than a
    // bounded lineage under the cap
    "q184_ivf_maintained_search", "q183_streaming_neardup", "q187_kcore")

  test("top expensive queries complete under a 1.5g heap cap") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin, "-Xmx1536m", "-cp", sys.props("java.class.path")) ++
      addOpens ++
      Seq("-Dspark.ui.enabled=false", "graft.tools.HeapSmoke",
        sfDir, queries.mkString(","))
    val out = new StringBuilder
    val rc = Process(cmd, None, "SPARK_GRAFT_CPUS" -> "8")
      .!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    val lines = out.toString.linesIterator.filter(_.startsWith("HEAPSMOKE")).toSeq
    assert(rc === 0, s"forked heap-capped run failed:\n${lines.mkString("\n")}")
    val ok = lines.filter(_.startsWith("HEAPSMOKE OK"))
    assert(ok.size === queries.size,
      s"expected ${queries.size} OK lines, got:\n${lines.mkString("\n")}")
    // every query returned rows — completed, not degenerately empty
    ok.foreach { l =>
      val rows = l.split(" ").find(_.startsWith("rows=")).get.drop(5).toLong
      assert(rows > 0, s"zero rows under heap cap: $l")
    }
    info(lines.mkString("\n"))
  }
}
