package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.PiiOps

/** `pii_redact(text)` — typed-placeholder PII redaction as ONE codegen'd
  * call: the four [[graft.pipeline.PiiOps]] patterns (email, card, ipv4,
  * phone) precompiled once per JVM and applied in their documented
  * sequence, instead of four chained `regexp_replace` plan nodes each
  * round-tripping the row through UTF8String→String. Detection COUNTS
  * stay on Spark builtins (`regexp_extract_all`, `luhn_check`) — only
  * the rewrite, which is always all-four-patterns, earns a fused
  * kernel. */
case class PiiRedactExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "pii_redact"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    PiiExprs.redactU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PiiExprs.redactU($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiRedactExpr =
    copy(child = newChild)
}

object PiiExprs {
  /** Static entry point referenced from generated code. */
  def redactU(s: UTF8String): UTF8String =
    UTF8String.fromString(PiiOps.redact(s.toString))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pii_redact", exprs => PiiRedactExpr(exprs.head), "built-in")
  }

  /** Column-API form (requires [[register]] on the active session). */
  def pii_redact(c: Column): Column = call_function("pii_redact", c)
}
