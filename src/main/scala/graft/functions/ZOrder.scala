package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_zorder(a, b)`: 64-bit Morton (Z-order) interleave of the low
  * 32 bits of two LONG columns — `a` takes the even bit positions, `b`
  * the odd. The standard multi-dimensional clustering key: sorting or
  * range-bucketing by the Z-value keeps rows close in BOTH key
  * dimensions, so a 100 TB table laid out by Z-ranges serves 2-D
  * predicate scans (part × supplier, lat × lon, time × tenant) with
  * bounded file touch counts — what Delta/Iceberg `OPTIMIZE ZORDER BY`
  * does at the layout layer, here as a first-class expression.
  *
  * Native Catalyst expression with whole-stage codegen: the
  * interleave is 10 shift/mask ops per side (the classic
  * bit-spreading sequence), branch-free and allocation-free. A
  * `transform`/HOF formulation would be CodegenFallback; a UDF would
  * box both longs per row.
  *
  * The bit-spread is the textbook magic-number sequence (public
  * domain, "Interleave bits by Binary Magic Numbers" — Stanford
  * bit-twiddling hacks); identical math generates the DuckDB oracle
  * as a 64-term Σ of shifted bit tests ([[graft.pipelines.ExtSql]]).
  */
case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two BIGINT arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder2.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrder2.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

/** `graft_zordern(c1, …, cn)`: the n-column generalization of
  * [[ZOrder2]] (2 ≤ n ≤ 8) — the low ⌊64/n⌋ bits of each LONG column
  * interleave at stride n (column i owns bit positions i, i+n,
  * i+2n, …), matching the Delta `OPTIMIZE ZORDER BY (c1, …, cn)`
  * surface where real tables cluster on more than two dimensions.
  * For n = 2 the value is bit-identical to [[ZOrder2]] (pinned in
  * Round18OpsSpec). Null-in → null-out, like every arithmetic
  * expression; [[graft.sources.TxnLog.optimizeZorder]] routes null
  * z-values to bucket 0 so a re-cluster never loses rows.
  *
  * Native Catalyst expression with whole-stage codegen: each column
  * is one static `spreadN` call (a bits-wide shift/mask loop) plus a
  * shift-or — branch-free, allocation-free, no boxing. */
case class ZOrderN(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.length < 2 || children.length > 8)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects 2 to 8 arguments, got ${children.length}")
    else if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zordern"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.length
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderN.interleaveN(vs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val n = children.length
    val cls = ZOrderN.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val terms = evals.zipWithIndex.map { case (e, i) =>
      s"($cls.spreadN(${e.value}, $n) << $i)"
    }.mkString(" | ")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        ${ev.value} = $terms;
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderN =
    copy(children = newChildren)
}

object ZOrderN {
  /** Place the low ⌊64/n⌋ bits of `v` at stride-n positions (bit i of
    * `v` → bit i·n of the result). The loop form of [[ZOrder2.spread]]
    * for arbitrary stride; called from generated code. */
  def spreadN(v: Long, n: Int): Long = {
    val bits = 64 / n
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((v >>> i) & 1L) << (i * n)
      i += 1
    }
    r
  }

  /** n-way Morton code: column i on bit positions ≡ i (mod n). */
  def interleaveN(vs: Array[Long]): Long = {
    val n = vs.length
    var r = 0L
    var i = 0
    while (i < n) {
      r |= spreadN(vs(i), n) << i
      i += 1
    }
    r
  }

  val Name = "graft_zordern"

  /** Column-API entry — requires [[register]] on the session first. */
  def zorder(cols: Column*): Column =
    org.apache.spark.sql.functions.call_function(Name, cols: _*)

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[ZOrderN].getName, Name),
      (exprs: Seq[Expression]) => ZOrderN(exprs))
}

object ZOrder2 {
  /** Spread the low 32 bits of `v` to the even bit positions of a
    * 64-bit word (magic-number bit interleave). */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Morton code: `a` on even bits, `b` on odd bits. */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  val Name = "graft_zorder"

  /** Column-API entry — requires [[register]] on the session first
    * (same `call_function` pattern as [[GraftFunctions]]). */
  def zorder(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(Name, a, b)

  /** Idempotent per-session SQL registration (same pattern as
    * [[GraftFunctions.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[ZOrder2].getName, Name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$Name expects 2 arguments")
        ZOrder2(exprs.head, exprs(1))
      })
}
