package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs per-round at sf0.1 and records the ONE JSON
  * line this prints. A warmup pass runs every query untimed first so the
  * timed pass measures query execution, not session/JIT/parquet-footer
  * warmup (round-1's first query absorbed ~8s of warmup). Failures are
  * reported in an `errors` field instead of masquerading as wall time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated query-name filter for focused profiling runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // warmup: one untimed execution of each query
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    var errors = List.empty[(String, String)]
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
        // from a settled heap, like its isolated run does.
        // SPARK_GRAFT_NO_SETTLE=1 skips the collection for A/B-ing the
        // harness itself.
        if (!sys.env.contains("SPARK_GRAFT_NO_SETTLE")) {
          System.gc()
          Thread.sleep(50)
        }
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        Some(name -> times.min)
      } catch {
        case e: Throwable =>
          errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          None
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // millisecond precision halves the line (raw doubles print ~18 chars);
    // round-3's full-precision line outgrew the driver's log-tail window
    // and dropped `total` + the first queries
    def num(v: Double): String = f"$v%.3f"
    // round-4's full-name line (~3.5 KB) still outgrew the driver's
    // log-tail window and its head was clipped, so the driver parsed
    // nothing. The PRINTED line uses the short `qNN` key prefix
    // (~1 KB, fits the window); bench_out.json keeps full names.
    def short(k: String): String = k.takeWhile(_ != '_')
    // duplicate short keys would silently overwrite each other in the
    // driver's parsed JSON — fail loudly at bench time instead
    require(results.map(r => short(r._1)).distinct.size == results.size,
      "duplicate qNN prefixes across query names; printed JSON keys would collide")
    // the PRINTED per-query map uses centisecond precision: at 158 queries
    // the line sits near the observed ~2.4 KB log-tail window (the r7
    // clipping), and 10 ms resolution is ample for round-over-round
    // comparison; bench_out.json keeps millisecond precision + full names
    def num2(v: Double): String = f"$v%.2f"
    val qJson = results.map { case (k, v) => jstr(short(k)) + ":" + num2(v) }.mkString("{", ",", "}")
    val qJsonFull = results.map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
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
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qJson,"errors":$eJsonShort,"sf":${jstr(sfDir)}}"""
    val lineFull =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qJsonFull,"errors":$eJson,"sf":${jstr(sfDir)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), lineFull + "\n")
    println(line)
    spark.stop()
  }
}
