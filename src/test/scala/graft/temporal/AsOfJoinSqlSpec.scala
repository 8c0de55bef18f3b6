package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The SQL table-function front-end (GraftExtensions.asof_join /
  * range_join) must return row-identical results to the Scala operators
  * on every direction/tolerance surface — the two front-ends generate the
  * same union+window / bucket-explode shapes, and this spec pins it.
  * Registered via ensureTemporalJoins (the EXISTING-session path the
  * driver's Verify/Bench sessions use — extensions can't apply there).
  */
class AsOfJoinSqlSpec extends SparkTestBase {
  import spark.implicits._

  graft.GraftExtensions.ensureTemporalJoins(spark)

  private lazy val trades = Seq(
    (1L, "A", 100L),
    (2L, "A", 205L),
    (3L, "A", 300L),
    (4L, "B", 50L),
    (5L, "B", 500L))
    .toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", 90L, 1.0),
    ("A", 200L, 2.0),
    ("A", 200L, 2.5), // duplicate (key, time): greatest payload must win in BOTH paths
    ("A", 300L, 3.0),
    ("B", 100L, 4.0))
    .toDF("sym", "qt", "px")

  private def rows(df: DataFrame): Set[(Long, Option[Long], Option[Double])] =
    df.select(col("trade_id"), col("qt"), col("px"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet

  private def viaSql(direction: String, tol: Option[Long]): Set[(Long, Option[Long], Option[Double])] = {
    trades.createOrReplaceTempView("__sql_trades")
    quotes.createOrReplaceTempView("__sql_quotes")
    val tail = (Seq(s"'$direction'") ++ tol.map(_.toString)).mkString(", ", ", ", "")
    rows(spark.sql(
      s"SELECT * FROM asof_join('__sql_trades', '__sql_quotes', 'sym', 't', 'qt'$tail)"))
  }

  private def viaScala(direction: String, tol: Option[Long]): Set[(Long, Option[Long], Option[Double])] =
    rows(new AsOfJoin(Seq("sym"), "t", "qt", direction, tol).join(trades, quotes))

  for (direction <- Seq("backward", "forward", "nearest");
       tol <- Seq(None, Some(60L)))
    test(s"asof_join SQL == AsOfJoin.join ($direction, tol=$tol)") {
      val sql = viaSql(direction, tol)
      assert(sql === viaScala(direction, tol))
      assert(sql.size === 5, "left-outer: one row per left row")
    }

  test("asof_join SQL: null right times never match, null left times stay unmatched (forward)") {
    val l = Seq((1L, "A", Some(100L)), (2L, "A", Option.empty[Long]))
      .toDF("trade_id", "sym", "t")
    val r = Seq(("A", Option.empty[Long], 9.0), ("A", Some(150L), 1.5))
      .toDF("sym", "qt", "px")
    l.createOrReplaceTempView("__sql_l")
    r.createOrReplaceTempView("__sql_r")
    val got = spark.sql(
      "SELECT * FROM asof_join('__sql_l', '__sql_r', 'sym', 't', 'qt', 'forward')")
      .select(col("trade_id"), col("qt"), col("px"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    val want = rows(new AsOfJoin(Seq("sym"), "t", "qt", "forward").join(l, r))
    assert(got === want)
    assert(got === Set((1L, Some(150L), Some(1.5)), (2L, None, None)))
  }

  test("range_join SQL == RangeJoin.join, inverted intervals dropped") {
    val points = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 100L))
      .toDF("pid", "k", "pt")
    val ivals = Seq(
      ("u1", 10L, 90L, 120L),   // covers point 1
      ("u1", 11L, 240L, 260L),  // covers point 2
      ("u1", 12L, 500L, 100L),  // INVERTED: must be dropped, not exploded
      ("u2", 13L, 90L, 300L))   // covers point 3
      .toDF("k", "iid", "s", "e")
    points.createOrReplaceTempView("__sql_pts")
    ivals.createOrReplaceTempView("__sql_ivs")
    val got = spark.sql(
      "SELECT * FROM range_join('__sql_pts', '__sql_ivs', 'k', 'pt', 's', 'e', 50)")
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    val want = new RangeJoin(Seq("k"), "pt", "s", "e", 50L).join(points, ivals)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(got === Set((1L, 10L), (2L, 11L), (3L, 13L)))
  }

  test("identifier validation fails loudly on non-identifier arguments") {
    val bad = Seq(
      "asof_join('t; DROP', 'r', 'k', 'lt', 'rt')",
      "asof_join('t', 'r', 'k`x', 'lt', 'rt')",
      "asof_join('t', 'r', 'k', 'lt', 'rt', 'sideways')",
      "range_join('p', 'i', 'k', 't', 's', 'e', 0)")
    bad.foreach { q =>
      intercept[Exception] { spark.sql(s"SELECT * FROM $q").collect() }
    }
  }

  test("NULL keys are a real group in BOTH paths (the TargetEncoder convention)") {
    val l = Seq((Option("A"), 1L, 100L), (Option.empty[String], 2L, 100L))
      .toDF("sym", "trade_id", "t")
    val r = Seq((Option("A"), 90L, 1.0), (Option.empty[String], 95L, 9.5))
      .toDF("sym", "qt", "px")
    l.createOrReplaceTempView("__sql_nl")
    r.createOrReplaceTempView("__sql_nr")
    val got = spark.sql(
      "SELECT * FROM asof_join('__sql_nl', '__sql_nr', 'sym', 't', 'qt')")
      .select(col("trade_id"), col("px")).as[(Long, Option[Double])].collect().toMap
    val want = rows(new AsOfJoin(Seq("sym"), "t", "qt").join(l, r))
      .map(t => (t._1, t._3)).toMap
    assert(got === want)
    assert(got(2L) === Some(9.5), "the null-key trade must match the null-key quote")
  }

  test("asof_join SQL multi-key == AsOfJoin.join on a (sym, venue) composite key") {
    // the r13 verdict's missing-surface #3: '<k1>,<k2>' key lists match
    // the Scala API's keyCols
    val l = Seq(
      (1L, "A", "x", 100L), (2L, "A", "y", 100L), (3L, "B", "x", 300L))
      .toDF("trade_id", "sym", "venue", "t")
    val r = Seq(
      ("A", "x", 90L, 1.0), ("A", "y", 95L, 2.0), ("A", "x", 99L, 1.5),
      ("B", "x", 290L, 3.0), ("B", "y", 299L, 9.9)) // same sym, other venue
      .toDF("sym", "venue", "qt", "px")
    l.createOrReplaceTempView("__sql_mkl")
    r.createOrReplaceTempView("__sql_mkr")
    for (direction <- Seq("backward", "forward", "nearest")) {
      val got = rows(spark.sql("SELECT * FROM asof_join('__sql_mkl', " +
        s"'__sql_mkr', 'sym,venue', 't', 'qt', '$direction')"))
      val want = rows(new AsOfJoin(Seq("sym", "venue"), "t", "qt", direction)
        .join(l, r))
      assert(got === want, s"direction=$direction")
    }
    // spot: trade 1 (A, x) matches the venue-x quote at 99, never the
    // closer-in-time venue-y quote at 95 — the second key column binds
    val back = rows(spark.sql("SELECT * FROM asof_join('__sql_mkl', " +
      "'__sql_mkr', 'sym,venue', 't', 'qt')"))
    assert(back.contains((1L, Some(99L), Some(1.5))))
    assert(back.contains((3L, Some(290L), Some(3.0))), "B/x must skip the B/y quote at 299")
  }

  test("range_join SQL multi-key == RangeJoin.join on a two-column key") {
    val points = Seq((1L, "u1", "a", 100L), (2L, "u1", "b", 100L))
      .toDF("pid", "k1", "k2", "pt")
    val ivals = Seq(
      ("u1", "a", 10L, 90L, 120L),  // covers point 1 only (k2 binds)
      ("u1", "b", 11L, 50L, 99L))   // point 2 at 100 is OUTSIDE [50,99]
      .toDF("k1", "k2", "iid", "s", "e")
    points.createOrReplaceTempView("__sql_mkpts")
    ivals.createOrReplaceTempView("__sql_mkivs")
    val got = spark.sql("SELECT * FROM range_join('__sql_mkpts', " +
      "'__sql_mkivs', 'k1,k2', 'pt', 's', 'e', 50)")
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    val want = new RangeJoin(Seq("k1", "k2"), "pt", "s", "e", 50L)
      .join(points, ivals)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(got === Set((1L, 10L)))
  }

  test("key lists with duplicates or empty elements are refused") {
    // 'sym,' included: plain split drops trailing empties, so the r14
    // review found it silently passing as a single key
    Seq("'sym,sym'", "'sym,,venue'", "''", "'sym, ven ue'", "'sym,'", "',sym'").foreach { ks =>
      intercept[Exception] {
        spark.sql(s"SELECT * FROM asof_join('__sql_trades', '__sql_quotes', $ks, 't', 'qt')").collect()
      }
    }
  }

  test("ensureTemporalJoins is idempotent") {
    graft.GraftExtensions.ensureTemporalJoins(spark)
    graft.GraftExtensions.ensureTemporalJoins(spark)
    assert(viaSql("backward", None) === viaScala("backward", None))
  }
}
