package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two double-array
  * columns, with whole-stage codegen (`doGenCode` emits a call into a tight
  * primitive loop over the underlying `ArrayData`).
  *
  * This replaces the composable-but-interpreted formulation
  * `aggregate(zip_with(a, b, ..), ..)` used as the baseline in
  * SimilarityOps: higher-order functions allocate a lambda frame per
  * element; this stays in codegen. VectorFunctionsSpec pins numeric
  * equivalence to the HOF version (both are strict sequential folds, so
  * results are bit-identical).
  *
  * Null/edge semantics: NULL if either side is NULL; 0.0 when either
  * vector has zero norm (never NaN); mismatched lengths use the common
  * prefix (inputs here are fixed-width embeddings).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

object VectorFunctions {
  /** Column API for the native cosine expression (expects array<double>). */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.toColumn(CosineSimilarity(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** SQL registration: makes `cosine_sim(a, b)` usable in spark.sql text. */
  def register(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
}
