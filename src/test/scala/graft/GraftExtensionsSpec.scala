package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension-registered SQL function must agree bit-for-bit with the
  * operator-internal Column path (same HyperplaneSignature expression).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("hyperplane_signature is callable from SQL via GraftExtensions") {
    // getOrCreate only applies extensions when it CREATES a session — clear
    // the suite-shared one first and restore it afterwards
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      // the spark.sql.extensions STATIC conf only applies when the
      // SparkContext itself is created; withExtensions works over the
      // suite's existing context too
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val df = Seq((1L, Array(1.0, 0.0, -1.0)), (2L, Array(0.5, 0.25, 2.0)))
        .toDF("id", "v")
      df.createOrReplaceTempView("vecs")
      val viaSql = spark.sql(
        "SELECT id, hyperplane_signature(v, 16) AS sig FROM vecs")
        .as[(Long, String)].collect().toMap
      assert(viaSql.values.forall(s => s.length == 16 && s.forall(c => c == '0' || c == '1')))
      // same bits as the direct expression path used by RandomHyperplaneLSH
      val direct = df.select($"id",
        org.apache.spark.sql.GraftBridge.column(
          graft.sql.expressions.HyperplaneSignature(
            org.apache.spark.sql.GraftBridge.expression($"v"), 16)).as("sig"))
        .as[(Long, String)].collect().toMap
      assert(viaSql === direct)

      // the KMV sketch aggregate registers too, and matches the Column path
      val toks = Seq.tabulate(50)(i => ("g", s"tok${i % 20}")).toDF("g", "tok")
      toks.createOrReplaceTempView("toks")
      val sqlKmv = spark.sql(
        "SELECT g, kmin_values(tok, 8) AS kmv FROM toks GROUP BY g")
        .as[(String, Seq[Long])].collect().head._2
      val directKmv = toks.groupBy($"g")
        .agg(graft.sql.functions.kMinValues($"tok", 8).as("kmv"))
        .as[(String, Seq[Long])].collect().head._2
      assert(sqlKmv === directKmv && sqlKmv.length === 8)

      // cosine_similarity: one fused codegen loop, same bits as Column path
      val sqlCos = spark.sql(
        """SELECT a.id AS ia, b.id AS ib, cosine_similarity(a.v, b.v) AS c
          |FROM vecs a JOIN vecs b ON a.id < b.id""".stripMargin)
        .as[(Long, Long, Double)].collect().toSet
      val directCos = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
        .select($"a.id", $"b.id",
          graft.sql.functions.cosineSimilarity($"a.v", $"b.v"))
        .as[(Long, Long, Double)].collect().toSet
      assert(sqlCos === directCos && sqlCos.nonEmpty)

      // squared_l2: the PQ distance kernel, same bits as Column path
      val sqlL2 = spark.sql(
        """SELECT a.id AS ia, b.id AS ib, squared_l2(a.v, b.v) AS d
          |FROM vecs a JOIN vecs b ON a.id < b.id""".stripMargin)
        .as[(Long, Long, Double)].collect().toSet
      val directL2 = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
        .select($"a.id", $"b.id",
          graft.sql.functions.squaredL2($"a.v", $"b.v"))
        .as[(Long, Long, Double)].collect().toSet
      assert(sqlL2 === directL2 && sqlL2.nonEmpty)
    } finally {
      spark.catalog.dropTempView("vecs")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  test("sketch constructors/merges/estimates and session_stats are reachable from SQL text") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-sketch-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      import graft.sql.{functions => gf}
      import org.apache.spark.sql.functions._

      // fine scopes: (source, lang, token) — sketch per (source, lang),
      // merge up to source level, compare against the Scala Column path
      val toks = Seq.tabulate(300)(i =>
        (s"src${i % 2}", s"lang${i % 3}", s"tok${i % 40}"))
        .toDF("source", "lang", "tok")
      toks.createOrReplaceTempView("sk_toks")

      // --- HLL: sketch + merge + estimate, SQL text vs Scala path ---
      val hllSql = spark.sql(
        """SELECT source, hll_merge(regs, 4) AS m,
          |       round(hll_estimate(hll_merge(regs, 4), 4), 6) AS est
          |FROM (SELECT source, lang, hll_sketch(tok, 4) AS regs
          |      FROM sk_toks GROUP BY 1, 2)
          |GROUP BY source""".stripMargin)
        .as[(String, Seq[Int], Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val hllScala = toks.groupBy($"source", $"lang")
        .agg(gf.hllSketch($"tok", 4).as("regs"))
        .groupBy($"source")
        .agg(gf.hllMerge($"regs", 4).as("m"))
        .select($"source", $"m", round(gf.hllEstimate($"m", 4), 6).as("est"))
        .as[(String, Seq[Int], Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(hllSql === hllScala && hllSql.size === 2)

      // --- CMS: sketch + merge + point estimate ---
      val cmsSql = spark.sql(
        """SELECT source,
          |  cms_estimate(cms_merge(sk, 3, 16), 'tok7', 3, 16) AS est7
          |FROM (SELECT source, lang, cms_sketch(tok, 3, 16) AS sk
          |      FROM sk_toks GROUP BY 1, 2)
          |GROUP BY source""".stripMargin)
        .as[(String, Long)].collect().toMap
      val cmsScala = toks.groupBy($"source", $"lang")
        .agg(gf.countMinSketch($"tok", 3, 16).as("sk"))
        .groupBy($"source")
        .agg(gf.cmsMerge($"sk", 3, 16).as("m"))
        .select($"source", gf.cmsEstimate($"m", lit("tok7"), 3, 16).as("est7"))
        .as[(String, Long)].collect().toMap
      assert(cmsSql === cmsScala && cmsSql.size === 2)
      // CMS estimates upper-bound the true count (tok7 appears in both
      // sources; true per-source count of tok7 is 300/40/2 rounded)
      assert(cmsSql.values.forall(_ >= 3L))

      // --- MinHash: signature (already-registered constructor) + merge ---
      // merged per-source signature == signing the union (min is
      // associative), the same identity the Scala spec pins
      val mhSql = spark.sql(
        """SELECT source, minhash_merge(sig, 8) AS msig
          |FROM (SELECT source, lang,
          |        minhash_signature(collect_set(tok), 8) AS sig
          |      FROM sk_toks GROUP BY 1, 2)
          |GROUP BY source""".stripMargin)
        .as[(String, Seq[Long])].collect().toMap
      val mhDirect = spark.sql(
        """SELECT source, minhash_signature(collect_set(tok), 8) AS sig
          |FROM sk_toks GROUP BY source""".stripMargin)
        .as[(String, Seq[Long])].collect().toMap
      assert(mhSql === mhDirect && mhSql.size === 2)

      // --- KMV estimate reader + CMS join-size, SQL vs Scala ---
      val kmvSql = spark.sql(
        "SELECT g, round(kmv_estimate(kmin_values(tok, 8), 8), 6) AS est " +
          "FROM (SELECT 'g' AS g, tok FROM sk_toks) GROUP BY g")
        .as[(String, Double)].collect().head._2
      val kmvScala = toks.select(lit("g").as("g"), $"tok").groupBy($"g")
        .agg(round(gf.kmvEstimate(gf.kMinValues($"tok", 8), 8), 6).as("est"))
        .as[(String, Double)].collect().head._2
      assert(kmvSql === kmvScala)

      val jsSql = spark.sql(
        """SELECT cms_join_size(a.sk, b.sk, 3, 16) AS js FROM
          |  (SELECT cms_sketch(tok, 3, 16) AS sk FROM sk_toks WHERE source = 'src0') a,
          |  (SELECT cms_sketch(tok, 3, 16) AS sk FROM sk_toks WHERE source = 'src1') b""".stripMargin)
        .as[Long].collect().head
      val skA = toks.where($"source" === "src0").agg(gf.countMinSketch($"tok", 3, 16).as("sk"))
      val skB = toks.where($"source" === "src1").agg(gf.countMinSketch($"tok", 3, 16).as("sk"))
      val jsScala = skA.crossJoin(skB.select($"sk".as("skb")))
        .select(gf.cmsJoinSize($"sk", $"skb", 3, 16).as("js"))
        .as[Long].collect().head
      assert(jsSql === jsScala && jsSql > 0L)

      // --- Bloom constructor + probe, SQL vs Scala ---
      val bloomSql = spark.sql(
        """SELECT bloom_might_contain(w, 'tok7', 4) AS hit,
          |       bloom_might_contain(w, 'definitely-absent', 4) AS miss
          |FROM (SELECT bloom_filter(tok, 256, 4) AS w FROM sk_toks)""".stripMargin)
        .as[(Boolean, Boolean)].collect().head
      val bloomScala = toks.agg(gf.bloomFilter($"tok", 256, 4).as("w"))
        .select(gf.bloomMightContain($"w", lit("tok7"), 4).as("hit"),
          gf.bloomMightContain($"w", lit("definitely-absent"), 4).as("miss"))
        .as[(Boolean, Boolean)].collect().head
      assert(bloomSql === bloomScala && bloomSql._1)

      // --- bottom-k sample + merge: merged == sampling the union ---
      val bkSql = spark.sql(
        """SELECT bottom_k_merge(s, 5) AS m
          |FROM (SELECT source, bottom_k_sample(tok, 5) AS s
          |      FROM sk_toks GROUP BY source)""".stripMargin)
        .as[Seq[String]].collect().head
      val bkUnion = spark.sql("SELECT bottom_k_sample(tok, 5) AS s FROM sk_toks")
        .as[Seq[String]].collect().head
      assert(bkSql === bkUnion && bkSql.length === 5)

      // --- weighted bottom-k + merge over disjoint scopes ---
      val wbkSql = spark.sql(
        """SELECT weighted_bottom_k_merge(s, 4) AS m
          |FROM (SELECT source, weighted_bottom_k(tok, CAST(length(tok) AS DOUBLE), 4) AS s
          |      FROM (SELECT DISTINCT source, tok FROM sk_toks) GROUP BY source)""".stripMargin)
        .collect().head.toString
      val wbkScala = toks.dropDuplicates("source", "tok")
        .groupBy($"source")
        .agg(gf.weightedBottomK($"tok", length($"tok").cast("double"), 4).as("s"))
        .agg(gf.weightedBottomKMerge($"s", 4).as("m"))
        .collect().head.toString
      assert(wbkSql === wbkScala)

      // --- session_stats TVF vs Sessionize.sessionAgg ---
      val ev = Seq(
        ("u1", "2024-01-01 00:00:00", 1.0),
        ("u1", "2024-01-01 00:30:00", 2.0),
        ("u1", "2024-01-01 03:00:00", 4.0), // > 1h gap: new session
        ("u2", "2024-01-01 01:00:00", 8.0))
        .toDF("user_id", "tss", "value")
        .select($"user_id", $"tss".cast("timestamp").as("ts"), $"value")
      ev.createOrReplaceTempView("sess_ev")
      val viaTvf = spark.sql("SELECT * FROM session_stats('sess_ev', 3600)")
      val viaScala = graft.streaming.Sessionize.sessionAgg(ev, gapSeconds = 3600)
      assert(viaTvf.columns.toSeq === viaScala.columns.toSeq)
      assert(viaTvf.collect().map(_.toString).sorted.toSeq ===
        viaScala.collect().map(_.toString).sorted.toSeq)
      assert(viaTvf.count() === 3) // u1 twice, u2 once

      // explicit column-name variant
      val viaTvf5 = spark.sql(
        "SELECT * FROM session_stats('sess_ev', 3600, 'user_id', 'ts', 'value')")
      assert(viaTvf5.collect().map(_.toString).sorted.toSeq ===
        viaScala.collect().map(_.toString).sorted.toSeq)

      // loud rejection of non-identifier args (injection guard)
      val bad = intercept[Exception] {
        spark.sql("SELECT * FROM session_stats('sess_ev; DROP', 3600)").collect()
      }
      assert(bad.getMessage.contains("identifier"), bad.getMessage)

      // --- asof_join/range_join register through the EXTENSION path too
      // (AsOfJoinSqlSpec covers semantics via ensureTemporalJoins; this
      // pins that a withExtensions-built session gets them injected) ---
      Seq((1L, "u1", 100L)).toDF("pid", "k", "pt")
        .createOrReplaceTempView("ext_pts")
      Seq(("u1", 10L, 90L, 120L)).toDF("k", "iid", "s", "e")
        .createOrReplaceTempView("ext_ivs")
      assert(spark.sql(
        "SELECT * FROM range_join('ext_pts', 'ext_ivs', 'k', 'pt', 's', 'e', 50)")
        .count() === 1)
      Seq(("u1", 90L, 1.5)).toDF("k", "qt", "px")
        .createOrReplaceTempView("ext_quotes")
      val asof = spark.sql(
        "SELECT * FROM asof_join('ext_pts', 'ext_quotes', 'k', 'pt', 'qt')")
        .collect()
      assert(asof.length === 1 && asof.head.getAs[Double]("px") === 1.5)
    } finally {
      spark.catalog.dropTempView("sk_toks")
      spark.catalog.dropTempView("sess_ev")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  test("PlanGuard rejects single-task global windows at planning time, opt-in") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-guard-test")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
      // a Dataset memoizes its optimized plan, so each phase builds the
      // frame fresh — what a pipeline does anyway
      def global() = df.withColumn("r", row_number().over(Window.orderBy($"v")))
      def keyed() = df.withColumn("r",
        row_number().over(Window.partitionBy($"k").orderBy($"v")))

      // default off: the global window plans (small-data behavior unchanged)
      assert(global().collect().length === 3)

      spark.conf.set(graft.plans.PlanGuard.Key, "true")
      val e = intercept[Exception] { global().collect() }
      assert(e.getMessage.contains("plan guard"), e.getMessage)
      // keyed windows are untouched by the guard
      assert(keyed().collect().length === 3)

      spark.conf.set(graft.plans.PlanGuard.Key, "false")
      assert(global().collect().length === 3)

      // --- low-cardinality partition check (conf-declared blocklist) ---
      def lowCard() = df.withColumn("r",
        row_number().over(Window.partitionBy($"k").orderBy($"v")))
      def bucketed() = df.withColumn("b", $"v" % 4)
        .withColumn("r",
          row_number().over(Window.partitionBy($"k", $"b").orderBy($"v")))
      spark.conf.set(graft.plans.PlanGuard.Key, "true")
      // without a declared list the keyed window still passes
      assert(lowCard().collect().length === 3)
      spark.conf.set(graft.plans.PlanGuard.LowCardKey, "k, lang")
      val e2 = intercept[Exception] { lowCard().collect() }
      assert(e2.getMessage.contains("low-cardinality"), e2.getMessage)
      // case-insensitive like Spark's column resolution: a declared "K"
      // must still arm against column k — a silently-disarmed guard is
      // the failure mode the rule exists for
      spark.conf.set(graft.plans.PlanGuard.LowCardKey, "K, LANG")
      val e3 = intercept[Exception] { lowCard().collect() }
      assert(e3.getMessage.contains("low-cardinality"), e3.getMessage)
      // a derived bucket column alongside the low-card key defuses it —
      // the GroupedNtile/PrefixSum shape must never need enumerating
      assert(bucketed().collect().length === 3)
      spark.conf.unset(graft.plans.PlanGuard.LowCardKey)
      spark.conf.set(graft.plans.PlanGuard.Key, "false")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
