package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path: a
  * sequential-fold dot product  ((0 + a₀b₀) + a₁b₁) + …  as ONE
  * codegen'd tight loop over ArrayData — no per-element boxing, no
  * lambda interpretation, no intermediate arrays.
  *
  * Why not alternatives:
  *  - `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — higher-order
  *    functions are interpreted (lambda per element, boxed Doubles,
  *    an allocated product array per row): ~10–30 µs per 64-dim pair,
  *    which dominates any all-pairs or top-k scoring join.
  *  - unrolling `element_at` chains — the resulting 100+-node Add tree
  *    makes Catalyst optimization and codegen cost explode at plan
  *    time.
  *  - a Scala UDF — pays SerDe (ArrayData → Seq[Double]) per call.
  *
  * The accumulation order is exactly the sequential left fold, so
  * results are bit-identical to the DuckDB oracle's list_reduce
  * formulation (and to the previous higher-order formulation).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee array<double> inputs (Similarity normalizes/casts first)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for VecDot: sequential-fold dot product of two
    * array<double> columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))
}
