package graft.feature

import org.apache.spark.ml.param.{Param, Params}

/** Shared key/value column params — the reference's `HasKeyCol` /
  * `HasValueCol` traits (reference: sparkext-mllib/src/main/scala/org/
  * apache/spark/ml/feature/sharedParams.scala:8-37), mixed into the
  * gather-family stages.
  */
private[feature] trait HasKeyCol extends Params {

  final val keyCol: Param[String] = new Param[String](this, "keyCol",
    "Key column name")

  def getKeyCol: String = $(keyCol)
}

private[feature] trait HasValueCol extends Params {

  final val valueCol: Param[String] = new Param[String](this, "valueCol",
    "Value column name")

  def getValueCol: String = $(valueCol)
}
