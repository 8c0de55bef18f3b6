package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Regenerates the committed golden fixtures that back the three queries
  * whose semantics are not SQL-replayable: q14 S2 tokens and q27 LR
  * training (not SQL-expressible) and q162 JPEG decode (lossy codec —
  * arithmetic replay impossible). Each golden row carries a scale-factor
  * FINGERPRINT column (the source table's row count), so one committed
  * file serves every SF: the DuckDB oracle selects the rows whose
  * fingerprint equals `(SELECT count(*) FROM <table>)` on the fixture
  * under test.
  *
  * The operators themselves are pinned independently of these files —
  * S2 by published city/face tokens + round-trip property specs, the LR
  * by R/glmnet coefficient goldens, the JPEG coder by JpegCodecSpec's
  * committed byte-determinism fixture — so the fixtures freeze an
  * already-verified implementation against regressions rather than
  * defining it.
  *
  * Also writes the q167 OPQ artifact FIXTURE (rotation + codebook trained
  * once on sf0.001) — unlike the goldens above it is an INPUT the query
  * loads and the oracle independently replays with `read_parquet`, so the
  * oracle-side computation (rotate → encode → ADC) stays a real
  * independent derivation; only the SVD-trained rotation itself (not
  * SQL-expressible) is frozen.
  *
  * Usage: `sbt "runMain graft.tools.MakeGoldens"` (writes
  * `src/test/resources/golden/{q14_s2,q27_lr,q162_jpeg,q167_opq}`), then
  * review and commit the directories. Pass golden names as args to
  * regenerate a subset (e.g. `runMain graft.tools.MakeGoldens q167` —
  * avoids binary churn on untouched goldens).
  */
object MakeGoldens {

  def main(args: Array[String]): Unit = {
    val known = Set("q14", "q27", "q162", "q167", "q168")
    val which: Set[String] = if (args.isEmpty) known else args.toSet
    // an unknown name (typo, or the golden DIRECTORY name like q167_opq)
    // would otherwise write nothing and still print success — a user
    // would commit believing the fixture was refreshed
    val unknown = which -- known
    require(unknown.isEmpty,
      s"unknown golden name(s) ${unknown.mkString(",")}; valid: ${known.toSeq.sorted.mkString(",")}")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val testdata = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"$testdata/$s")

    if (which("q14")) {
    val q14 = sfDirs.map { dir =>
      val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
      SparkEntry.queries("q14_s2_cell")(spark, dir)
        .withColumn("n_customer", lit(nCust))
    }.reduce(_ unionByName _)
    // graft.queries.Goldens is the single path definition the oracle SQL
    // also uses, so the two halves can never disagree about where goldens
    // live — and neither hardcodes the checkout location
    q14.coalesce(1).write.mode("overwrite")
      .parquet(graft.queries.Goldens.path("q14_s2"))
    }

    if (which("q27")) {
    val q27 = sfDirs.map { dir =>
      val nOrd = spark.read.parquet(s"$dir/orders.parquet").count()
      SparkEntry.queries("q27_local_lr")(spark, dir)
        .withColumn("n_orders", lit(nOrd))
    }.reduce(_ unionByName _)
    q27.coalesce(1).write.mode("overwrite")
      .parquet(graft.queries.Goldens.path("q27_lr"))
    }

    // q162: JPEG decode stats — lossy, so not arithmetic-replayable like
    // the PNG/WAV queries; the decode itself is pinned by JpegCodecSpec's
    // committed fixture, this golden freezes the per-doc stats per SF
    // sf0.001 and sf0.01 share the SAME 500-row documents table (verified:
    // identical doc_id sets), so the count fingerprint collides — the
    // results are row-identical too, and dropDuplicates collapses the
    // colliding fingerprint to one copy instead of doubling the oracle rows
    if (which("q162")) {
    val q162 = sfDirs.map { dir =>
      val nDoc = spark.read.parquet(s"$dir/documents.parquet").count()
      SparkEntry.queries("q162_jpeg_decode")(spark, dir)
        .withColumn("n_documents", lit(nDoc))
    }.reduce(_ unionByName _).dropDuplicates()
    q162.coalesce(1).write.mode("overwrite")
      .parquet(graft.queries.Goldens.path("q162_jpeg"))
    }

    // q167: OPQ artifact fixture — rotation (SVD-trained, not
    // SQL-expressible) + the PQ codebook trained in the rotated space,
    // fit ONCE on the sf0.001 corpus. The fixture is an INPUT at every SF
    // (the query loads it; the oracle read_parquet's it), so no per-SF
    // fingerprint is needed — unlike q14/q27/q162 this is not an expected-
    // output golden.
    if (which("q167")) {
      val e = spark.read.parquet(s"$testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val opq = new graft.similarity.OpqRotation(
        numSubspaces = 8, codebookSize = 16, dim = 64, iters = 2)
      opq.fit(e).save(graft.queries.Goldens.path("q167_opq"))
    }

    // q168: BPE merge-table fixture — the tokenizer a production packing
    // job would budget against, trained ONCE (64 merges, sf0.001 corpus;
    // 64 > BpeTrainer.segmentExprMerges so q168 exercises the broadcast
    // rank-priority encoder, the vocabulary-scale serving path). Like
    // q167 it is an INPUT at every SF: the query loads it and the oracle
    // read_parquet's it, replaying segmentation independently — training
    // itself is already oracle-verified by q97's unrolled-CTE replay.
    if (which("q168")) {
      val docs = spark.read.parquet(s"$testdata/sf0.001/documents.parquet")
      new graft.text.BpeTrainer(numMerges = 64).fit(docs)
        .coalesce(1).write.mode("overwrite")
        .parquet(graft.queries.Goldens.path("q168_bpe") + "/merges")
    }

    println(s"goldens written to src/test/resources/golden for: ${which.toSeq.sorted.mkString(",")}")
    spark.stop()
  }
}
