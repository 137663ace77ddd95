package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D Hilbert curve index (the
  * xy→d transform of Hilbert 1891, iterative form per Warren's
  * Hacker's Delight / the standard public xy2d formulation): maps the
  * low `bits` bits of (x, y) to the cell's position along the curve.
  *
  * Why native rather than the Column-chain used for the Morton curve
  * (LayoutOps.zValue): z-order is a data-independent bit interleave —
  * a flat OR-chain — but Hilbert is a SEQUENTIAL fold (each round
  * rotates/reflects the quadrant frame for the next), so an unrolled
  * Column formulation references the previous round's x and y twice
  * per round and the expression tree doubles per bit — 2³² nodes at
  * 16 bits. The native expression keeps it a 16-iteration primitive
  * loop inside whole-stage codegen. The DuckDB oracle unrolls the same
  * rounds as a MATERIALIZED CTE chain (each round named once, no
  * doubling) generated from one Scala loop, so the two texts cannot
  * drift ([[graft.ops.LayoutOps.hilbertRoundsSql]]).
  *
  * Why Hilbert at all when z-order ships (q124/q276): the curve never
  * jumps — every consecutive pair of cells is grid-adjacent (Manhattan
  * distance 1), where Morton takes power-of-two-sized jumps at quadrant
  * seams — so range-clustered files carry tighter per-file bounding
  * boxes on BOTH dimensions (Moon et al. 2001, "Analysis of the
  * clustering properties of the Hilbert space-filling curve"), and a
  * 2-D zone map prunes strictly better on the same box workload.
  * LayoutSpec pins both facts.
  *
  * Null semantics: NULL if either input is NULL (nullSafeEval). Inputs
  * are masked to the low `bits` bits inside compute, mirroring the
  * oracle's `& mask`.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertIndex.compute($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Shared by interpreted eval and generated code. The flip uses the
    * FULL grid extent (2^bits − 1), not the round's s — the s-relative
    * variant goes negative on high coordinates (caught by the 4×4
    * fixture in LayoutSpec).
    */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = mask - x
          y = mask - y
        }
        val t = x
        x = y
        y = t
      }
      s >>= 1
    }
    d
  }
}

object HilbertFunctions {
  /** Column API for the native Hilbert expression. Inputs are cast to
    * long here (the expression takes raw longs; Spark's `/` and other
    * arithmetic widen to double silently).
    */
  def hilbertIndex(x: Column, y: Column, bits: Int = 16): Column =
    GraftBridge.toColumn(HilbertIndex(
      GraftBridge.toExpression(x.cast("long")),
      GraftBridge.toExpression(y.cast("long")), bits))

  /** SQL registration: `hilbert_index(x, y)` at the default 16 bits. */
  def register(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "hilbert_index",
      exprs => HilbertIndex(exprs(0), exprs(1), 16))
}
