package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_dot(a, b)`: dot product of two `array<double>` columns as a
  * native Catalyst expression WITH whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) ->
  * acc+x)`? Higher-order functions are CodegenFallback — every pair
  * evaluation goes through interpreted lambda dispatch and allocates
  * an intermediate array. In the LSH/brute pair-mining loops that is
  * millions of evaluations; this expression compiles to a tight
  * primitive `double` loop over the unsafe array data, no
  * allocations.
  *
  * Semantics match the HOF formulation bit-for-bit on null-free
  * arrays (sequential index-order accumulation, so the IEEE rounding
  * path is identical — the DuckDB oracle's `list_sum` comprehension
  * stays exact). Inputs with null ELEMENTS are not supported (the
  * embedding fixture guarantees none; null ARRAYS yield null).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // both children must already be array<double> (callers cast; see
  // Similarity.toDouble) — no implicit coercion is registered
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // ignore containsNull: encoders produce containsNull=false arrays,
    // parquet scans containsNull=true — both are fine
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration for the graft native functions. */
object GraftFunctions {
  val DotName = "graft_dot"

  private def info = new ExpressionInfo(classOf[DotProduct].getName, DotName)

  private def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$DotName expects 2 arguments")
    DotProduct(exprs.head, exprs(1))
  }

  /** Idempotent per-session registration (works without any
    * spark.sql.extensions config — callers invoke this before
    * `call_function`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(DotName), info, builder _)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * native functions into every session built from that config. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (FunctionIdentifier(GraftFunctions.DotName),
        new ExpressionInfo(classOf[DotProduct].getName, GraftFunctions.DotName),
        (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
}
