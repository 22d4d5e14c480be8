package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N-gram-profile language ID ([[graft.ops.TextStats.langNgramGuess]]) as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Native-expression rationale (SURVEY.md §2.10, same as decode_bio_spans):
  * the previous `mapPartitions` face forced a typed-object barrier — every
  * column in flight was deserialized into Scala tuples and re-serialized,
  * and the stage split around it. As a generated-code expression the scorer
  * is one static call inside the stage: corpus-wide language ID composes
  * with gates/projections at zero plan cost. The trigram profiles are
  * per-JVM lazy constants, so executors build them once.
  */
case class LangNgramGuess(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_ngram_guess expects string, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "lang_ngram_guess"

  override protected def nullSafeEval(textVal: Any): Any =
    LangNgramGuess.guess(textVal.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LangNgramGuess.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, textRef =>
      code"${ev.value} = ($cls).guess($textRef);".toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangNgramGuess {

  /** Shared by interpreted eval and generated code. */
  def guess(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.ops.TextStats.langNgramGuess(s.toString))

  /** Register `lang_ngram_guess` on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lang_ngram_guess"),
      new ExpressionInfo(classOf[LangNgramGuess].getName, "lang_ngram_guess"),
      (children: Seq[Expression]) => LangNgramGuess(children.head))
  }
}
