package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructField, StructType}

/** D1 (`get_indices_from_lable`, utils/evaluate_funcs.py:79-95) as a native
  * Catalyst expression with whole-stage codegen: decodes a BIO tag row into
  * `array<struct<start:int,end:int>>` spans for a given B-tag id.
  *
  * Native-expression rationale (SURVEY.md §2.10): the Scala/UDF twin
  * ([[Spans.indicesFromLabel]]) black-boxes the eval path out of codegen;
  * this version stays inside the generated stage — no serialization, no
  * boxing of the tag array — which matters when span decode runs over every
  * (sample × question) row of a corpus-scale eval.
  */
case class DecodeBioSpans(tags: Expression, bId: Expression)
    extends BinaryExpression {

  override def left: Expression = tags
  override def right: Expression = bId

  override def checkInputDataTypes(): TypeCheckResult =
    (tags.dataType, bId.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (t, b) => TypeCheckResult.TypeCheckFailure(
        s"decode_bio_spans expects (array<int>, int), got ($t, $b)")
    }

  override def dataType: DataType = DecodeBioSpans.spanArrayType

  override def prettyName: String = "decode_bio_spans"

  override protected def nullSafeEval(tagsVal: Any, bIdVal: Any): Any = {
    val arr = tagsVal.asInstanceOf[ArrayData]
    val b = bIdVal.asInstanceOf[Int]
    DecodeBioSpans.decode(arr, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DecodeBioSpans.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (tagsRef, bRef) =>
      code"${ev.value} = ($cls).decode($tagsRef, $bRef);".toString)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(tags = newLeft, bId = newRight)
}

object DecodeBioSpans {

  val spanArrayType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))))

  /** Shared by interpreted eval and generated code (static call, no boxing
    * beyond the result rows). Faithful to the reference scan: adjacent B
    * restarts, I-run consumption, end-exclusive spans. */
  def decode(tags: ArrayData, bId: Int): ArrayData = {
    val n = tags.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (!tags.isNullAt(i) && tags.getInt(i) == bId) {
        var end = i + 1
        while (end < n && !tags.isNullAt(end) && tags.getInt(end) == bId + 1) end += 1
        out += InternalRow(i, end)
        i = end
      } else {
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Register `decode_bio_spans` on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("decode_bio_spans"),
      new ExpressionInfo(classOf[DecodeBioSpans].getName, "decode_bio_spans"),
      (children: Seq[Expression]) => DecodeBioSpans(children(0), children(1)))
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * engine's native functions at session build time. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("decode_bio_spans"),
      new ExpressionInfo(classOf[DecodeBioSpans].getName, "decode_bio_spans"),
      (children: Seq[Expression]) => DecodeBioSpans(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("lang_ngram_guess"),
      new ExpressionInfo(classOf[LangNgramGuess].getName, "lang_ngram_guess"),
      (children: Seq[Expression]) => LangNgramGuess(children.head)))
  }
}
