package graft.temporal

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  // u1 completes the whole funnel in order; u2 clicks BEFORE viewing (the
  // click can't count, and there is no later click); u3 only signs up;
  // u4 never signs up (excluded entirely)
  lazy val events = Seq(
    (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L), (1L, "purchase", 40L),
    (2L, "signup", 10L), (2L, "click", 15L), (2L, "view", 20L), (2L, "purchase", 50L),
    (3L, "signup", 5L),
    (4L, "view", 1L), (4L, "click", 2L))
    .toDF("user_id", "event_type", "ts_us")

  private val funnel = new Funnel(Seq("signup", "view", "click", "purchase"))

  test("stage times require strictly increasing order") {
    val t = funnel.stageTimes(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(t.keySet === Set(1L, 2L, 3L))
    assert(t(1L).getAs[Long]("t_purchase") === 40L)
    assert(t(2L).getAs[Long]("t_view") === 20L)
    assert(t(2L).isNullAt(t(2L).fieldIndex("t_click"))) // click was too early
    assert(t(3L).isNullAt(t(3L).fieldIndex("t_view")))
  }

  test("counts report per-stage reach") {
    val c = funnel.counts(events).collect().head
    assert(c.getAs[Long]("n_signup") === 3L)
    assert(c.getAs[Long]("n_view") === 2L)
    assert(c.getAs[Long]("n_click") === 1L)
    assert(c.getAs[Long]("n_purchase") === 1L)
  }

  test("same-timestamp events do not satisfy the strict order") {
    val ev = Seq((1L, "signup", 10L), (1L, "view", 10L)).toDF("user_id", "event_type", "ts_us")
    val t = new Funnel(Seq("signup", "view")).stageTimes(ev).collect().head
    assert(t.isNullAt(t.fieldIndex("t_view")))
  }
}
