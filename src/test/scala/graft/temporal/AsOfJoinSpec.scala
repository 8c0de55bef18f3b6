package graft.temporal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  // trades (left) and quotes (right), the classic as-of pairing
  lazy val trades = Seq(
    (1L, "A", 100L),
    (2L, "A", 205L),
    (3L, "A", 300L), // equal-time quote at 300 must match (inclusive)
    (4L, "B", 50L),  // before any B quote -> unmatched
    (5L, "B", 500L))
    .toDF("trade_id", "sym", "t")

  lazy val quotes = Seq(
    ("A", 90L, 1.0),
    ("A", 200L, 2.0),
    ("A", 300L, 3.0),
    ("B", 100L, 4.0))
    .toDF("sym", "qt", "px")

  private def asOf(direction: String = "backward", tol: Option[Long] = None) =
    new AsOfJoin(Seq("sym"), "t", "qt", direction, tol)
      .join(trades, quotes)
      .select($"trade_id", $"qt", $"px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("backward as-of picks the latest quote at-or-before each trade") {
    val m = asOf()
    assert(m(1L) === ((Some(90L), Some(1.0))))
    assert(m(2L) === ((Some(200L), Some(2.0))))
    assert(m(3L) === ((Some(300L), Some(3.0)))) // inclusive at equal time
    assert(m(4L) === ((None, None)))            // no quote yet -> left outer
    assert(m(5L) === ((Some(100L), Some(4.0))))
  }

  test("forward as-of picks the earliest quote at-or-after each trade") {
    val m = asOf(direction = "forward")
    assert(m(1L) === ((Some(200L), Some(2.0))))
    assert(m(2L) === ((Some(300L), Some(3.0))))
    assert(m(3L) === ((Some(300L), Some(3.0)))) // inclusive
    assert(m(4L) === ((Some(100L), Some(4.0))))
    assert(m(5L) === ((None, None)))            // nothing after 500
  }

  test("tolerance nulls out matches farther than the bound") {
    val m = asOf(tol = Some(10L))
    assert(m(1L) === ((Some(90L), Some(1.0))))  // gap 10 -> kept (inclusive)
    assert(m(2L) === ((Some(200L), Some(2.0)))) // gap 5 -> kept
    assert(m(3L) === ((Some(300L), Some(3.0)))) // gap 0 -> kept
    assert(m(5L) === ((None, None)))            // gap 400 -> nulled
  }

  test("left row count is preserved (never a fan-out)") {
    val out = new AsOfJoin(Seq("sym"), "t", "qt").join(trades, quotes)
    assert(out.count() === trades.count())
    assert(out.columns.toSeq ===
      Seq("trade_id", "sym", "t", "qt", "px"))
  }

  test("null-time right rows are ignored, not matched") {
    val withNull = quotes.unionByName(
      Seq(("B", Option.empty[Long], 99.0)).toDF("sym", "qt", "px"))
    val m = new AsOfJoin(Seq("sym"), "t", "qt").join(trades, withNull)
      .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(m(4L) === None)        // still unmatched, not the null-time quote
    assert(m(5L) === Some(4.0))   // unchanged best match
  }

  test("null-time LEFT rows never match, in every direction") {
    // plain desc ordering put null-time left rows at the END of the
    // forward scan, where "last right seen" is the earliest quote — a
    // tolerance-less forward join silently matched rows that have no
    // time at all (merge_asof never matches NaT); backward/forward/
    // nearest must agree: no time, no match
    val withNullTrade = trades.unionByName(
      Seq((6L, "A", Option.empty[Long])).toDF("trade_id", "sym", "t"))
    Seq("backward", "forward", "nearest").foreach { dir =>
      val m = new AsOfJoin(Seq("sym"), "t", "qt", dir)
        .join(withNullTrade, quotes)
        .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
      assert(m(6L) === None, s"direction=$dir matched a null-time left row")
      assert(m(5L) === (if (dir == "forward") None else Some(4.0)),
        s"direction=$dir disturbed a real match")
    }
  }

  test("duplicate (key, time) right rows: greatest payload wins, deterministically") {
    // without the payload tiebreak the winner depended on partitioning /
    // task order — retries and speculation could flip results between
    // runs. The greatest (qt, px) struct must win in EVERY direction.
    val dup = quotes.unionByName(Seq(
      ("A", 200L, 1.5), ("A", 200L, 2.5)).toDF("sym", "qt", "px"))
    def px(dir: String): Map[Long, Option[Double]] =
      new AsOfJoin(Seq("sym"), "t", "qt", dir).join(trades, dup)
        .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    // the qt=200 trio (px 2.0, 1.5, 2.5) is trade 2's backward/nearest
    // answer and trade 1's forward answer — max struct (200, 2.5) must
    // win everywhere
    assert(px("backward")(2L) === Some(2.5))
    assert(px("nearest")(2L) === Some(2.5)) // gap 5 backward beats 95 forward
    assert(px("forward")(1L) === Some(2.5))
  }

  test("clashing right payload columns are rejected") {
    val bad = quotes.withColumnRenamed("px", "t")
    intercept[IllegalArgumentException] {
      new AsOfJoin(Seq("sym"), "t", "qt").join(trades, bad)
    }
  }

  test("plan is one keyed window, no join node, no unpartitioned window") {
    val plan = new AsOfJoin(Seq("sym"), "t", "qt").join(trades, quotes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join node in:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  // extra trades exercising the nearest-specific cases: 145 is equidistant
  // from quotes 90/200 (gap 55 both -> tie goes backward), 195 is much
  // closer to the next quote than the prior one
  lazy val tradesN = trades.unionByName(Seq(
    (6L, "A", 145L), (7L, "A", 195L)).toDF("trade_id", "sym", "t"))

  private def nearest(tol: Option[Long]) =
    new AsOfJoin(Seq("sym"), "t", "qt", "nearest", tol)
      .join(tradesN, quotes)
      .select($"trade_id", $"qt", $"px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("nearest picks the closer side, either direction") {
    val m = nearest(None)
    assert(m(1L) === ((Some(90L), Some(1.0))))   // gap 10 back vs 100 fwd
    assert(m(2L) === ((Some(200L), Some(2.0))))  // gap 5 back vs 95 fwd
    assert(m(4L) === ((Some(100L), Some(4.0))))  // no backward -> forward
    assert(m(5L) === ((Some(100L), Some(4.0))))  // no forward -> backward
    assert(m(7L) === ((Some(200L), Some(2.0))))  // gap 105 back vs 5 fwd
  }

  test("nearest tie goes backward (merge_asof convention)") {
    assert(nearest(None)(6L) === ((Some(90L), Some(1.0))))
  }

  test("nearest tolerance disqualifies per side, not globally") {
    val m = nearest(Some(50L))
    assert(m(7L) === ((Some(200L), Some(2.0))))  // backward out, forward in
    assert(m(4L) === ((Some(100L), Some(4.0))))  // gap 50 inclusive
    assert(m(5L) === ((None, None)))             // both sides out/absent
    assert(m(6L) === ((None, None)))             // 55 > 50 on both sides
  }

  // --- unorderable payloads (maps): no deterministic duplicate winner ---

  private lazy val mapQuotes = Seq(
    ("A", 90L, Map("px" -> 1.0)),
    ("A", 200L, Map("px" -> 2.0)),
    ("A", 200L, Map("px" -> 2.5))) // duplicate (key, time)
    .toDF("sym", "qt", "attrs")

  test("unorderable payload + duplicate (key, time) right rows fails loudly") {
    // pre-r13 this silently matched whichever duplicate the partitioning
    // happened to order last — a nondeterminism footgun
    val ex = intercept[Exception] {
      new AsOfJoin(Seq("sym"), "t", "qt").join(trades, mapQuotes).collect()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("UNORDERABLE") || msg.contains("duplicate"), msg)
  }

  test("unorderable payload WITHOUT duplicates joins fine") {
    val dedup = mapQuotes.where($"attrs"("px") =!= 2.5)
    val m = new AsOfJoin(Seq("sym"), "t", "qt").join(trades, dedup)
      .select($"trade_id", $"qt").as[(Long, Option[Long])].collect().toMap
    assert(m(2L) === Some(200L))
    assert(m(4L) === None)
  }

  test("allowUnorderableDuplicates opts back into any-winner behavior") {
    val m = new AsOfJoin(Seq("sym"), "t", "qt",
      allowUnorderableDuplicates = true).join(trades, mapQuotes)
      .select($"trade_id", $"qt").as[(Long, Option[Long])].collect().toMap
    assert(m(2L) === Some(200L)) // matched; WHICH duplicate is undefined
  }
}
