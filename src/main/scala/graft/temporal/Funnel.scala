package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion-funnel analysis over an event log: for each entity,
  * the earliest time it completes stage k strictly after its stage-k-1
  * time — "signup → view → click → purchase" style sequential matching,
  * the staple of product/event analytics.
  *
  * Beyond-reference operator (events-analytics extension). Each stage is
  * one keyed conditional-min aggregation joined to the previous stage's
  * times: `stages.length` shuffles on the entity key, no windows, no
  * per-entity event collection — scales like a chain of groupBys
  * regardless of per-entity event counts.
  */
class Funnel(
    stages: Seq[String],
    idCol: String = "user_id",
    typeCol: String = "event_type",
    timeCol: String = "ts_us") {

  require(stages.size >= 2, "a funnel needs at least two stages")
  require(stages.distinct.size == stages.size, "stages must be distinct")

  /** (id, t_<stage1>, …, t_<stageN>): per entity, the stage completion
    * times (null once the sequence breaks). Entities appear iff they have
    * any stage-1 event.
    */
  def stageTimes(events: DataFrame): DataFrame = {
    val e = events.select(col(idCol), col(typeCol), col(timeCol))
    val first = e.groupBy(col(idCol))
      .agg(min(when(col(typeCol) === stages.head, col(timeCol)))
        .as(s"t_${stages.head}"))
      .where(col(s"t_${stages.head}").isNotNull)
    stages.sliding(2).foldLeft(first) { case (acc, Seq(prev, cur)) =>
      // carry all previously computed stage times (constant per id)
      val aggCols = stages.takeWhile(_ != cur).map(s =>
        min(col(s"t_$s")).as(s"t_$s")) :+
        min(when(col(typeCol) === cur && col(timeCol) > col(s"t_$prev"),
          col(timeCol))).as(s"t_$cur")
      e.join(acc, idCol)
        .groupBy(col(idCol))
        .agg(aggCols.head, aggCols.tail: _*)
    }
  }

  /** One row of funnel totals: `n_<stage>` = entities whose sequence
    * reaches that stage.
    */
  def counts(events: DataFrame): DataFrame = {
    val aggCols = stages.map(s => count(col(s"t_$s")).as(s"n_$s"))
    stageTimes(events).agg(aggCols.head, aggCols.tail: _*)
  }
}
