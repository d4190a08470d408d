package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(s)`: Unicode NFC (canonical composition) normalization
  * of a string column — the text-canonicalization step every public
  * corpus pipeline runs before fingerprinting/dedup (CCNet normalizes
  * before hashing; HF datasets' dedup guidance is NFC-first), since
  * the SAME visible text can arrive as either precomposed codepoints
  * (`é` = U+00E9) or base + combining mark (`e` + U+0301) and the two
  * forms hash differently.
  *
  * Spark ships no Unicode-normalization function, so this is a native
  * Catalyst expression with whole-stage codegen (same pattern as
  * [[DotProduct]]/[[ZOrder2]]): one static JDK call per row, no UDF
  * boxing, no interpreted fallback. The fast path matters at scale —
  * `Normalizer.isNormalized` quick-checks ASCII/already-NFC input
  * without allocating, so the common 100 TB case (overwhelmingly
  * ASCII web text) is a scan, not a rewrite; only rows that actually
  * carry decomposed marks pay for the recompose.
  *
  * The DuckDB oracle is its built-in `nfc_normalize` — two
  * independent implementations of the same public Unicode algorithm
  * (UAX #15), which is exactly what a cross-engine check should pin.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING argument, got ${other.simpleString}")
    }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.nfc($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize one value; returns the INPUT object unchanged on
    * the (dominant) already-normalized path, so no allocation. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  val Name = "graft_nfc"

  /** Column-API entry — requires [[register]] on the session first
    * (same `call_function` pattern as [[GraftFunctions]]). */
  def nfcCol(c: Column): Column =
    org.apache.spark.sql.functions.call_function(Name, c)

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[NfcNormalize].getName, Name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$Name expects 1 argument")
        NfcNormalize(exprs.head)
      })
}
