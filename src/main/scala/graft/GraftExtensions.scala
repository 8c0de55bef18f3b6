package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.sql.expressions.{CosineSimilarity, HyperplaneSignature, KMinValues, MinHashSignature, Shingles, SimHash64, SquaredL2}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * callable from SQL in any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`):
  *
  * {{{
  * SELECT hyperplane_signature(CAST(embedding AS ARRAY<DOUBLE>), 64) FROM t
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_signature"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "hyperplane_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "hyperplane_signature(vector ARRAY<DOUBLE>, numPlanes INT)")
        val numPlanes = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"numPlanes must be an integer literal, got $other")
        }
        HyperplaneSignature(children.head, numPlanes)
      }))

    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64(tokens ARRAY<STRING>)")
        SimHash64(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "shingles(text STRING | tokens ARRAY<STRING>, k INT)")
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"k must be an integer literal, got $other")
        }
        Shingles(children.head, k)
      }))

    ext.injectFunction((
      new FunctionIdentifier("kmin_values"),
      new ExpressionInfo(classOf[KMinValues].getName, "kmin_values"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "kmin_values(value STRING, k INT)")
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"k must be an integer literal, got $other")
        }
        KMinValues(children.head, k).toAggregateExpression()
      }))

    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "cosine_similarity(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)")
        CosineSimilarity(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("squared_l2"),
      new ExpressionInfo(classOf[SquaredL2].getName, "squared_l2"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "squared_l2(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)")
        SquaredL2(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "minhash_signature(shingles ARRAY<STRING>, numHashes INT)")
        val numHashes = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"numHashes must be an integer literal, got $other")
        }
        MinHashSignature(children.head, numHashes)
      }))

    // plan-time structural guard (opt-in via spark.graft.planGuard): fail
    // at optimization when a window would plan as a single-task global
    // sort — the injectOptimizerRule tier for whole-plan concerns
    ext.injectOptimizerRule(graft.plans.PlanGuard)
  }
}
