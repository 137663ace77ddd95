package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DamerauLevenshtein}

/** Library entry point for Spark's extension mechanism: deploying with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * installs graft's native SQL functions into EVERY session on the
  * cluster — including SQL-only clients that never touch the Scala API —
  * without code changes. This is the standard distribution channel for
  * third-party Spark libraries; `VectorFunctions.register` remains the
  * per-session programmatic alternative. Must stay a zero-arg public
  * class (Spark instantiates it reflectively from the conf string).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        // a SQL-only client can call cosine_sim with any arity; without
        // this check exprs(1) dies with IndexOutOfBoundsException instead
        // of an analysis-time error naming the function
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName,
        "damerau_levenshtein"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"damerau_levenshtein requires exactly 2 arguments, got ${exprs.length}")
        DamerauLevenshtein(exprs(0), exprs(1))
      }))
    // the edit-distance length-prefilter (see the rule's doc for the
    // soundness argument): installed cluster-wide alongside the
    // functions whose predicates it strengthens
    extensions.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
  }
}
