package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Catalyst expressions for the reference's scalar surface. Each one
  * delegates to a static kernel in [[SeqOps]], both in interpreted eval
  * and in generated code, so they stay inside whole-stage codegen
  * (no Scala-UDF serialization, no InternalRow boxing at the call site).
  */
private[graft] trait SeqOpsCall { self: Expression =>
  /** Fully-qualified static call target in graft.functions.SeqOps. */
  def kernel: String
}

abstract class UnaryStringExpression extends UnaryExpression with SeqOpsCall {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input, got ${child.dataType}")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SeqOps.$kernel($c)")
}

case class Complement(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "complement"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = SeqOps.complement(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): Complement = copy(child = c)
  override def prettyName: String = "complement"
}

case class Transcribe(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "transcribe"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = SeqOps.transcribe(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): Transcribe = copy(child = c)
  override def prettyName: String = "transcribe"
}

case class ReverseTranscribe(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "reverseTranscribe"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = SeqOps.reverseTranscribe(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): ReverseTranscribe = copy(child = c)
  override def prettyName: String = "reverse_transcribe"
}

case class ReverseComplement(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "reverseComplement"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = SeqOps.reverseComplement(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): ReverseComplement = copy(child = c)
  override def prettyName: String = "reverse_complement"
}

case class GcContent(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "gcContent"
  override def dataType: DataType = FloatType
  override def nullSafeEval(v: Any): Any = SeqOps.gcContent(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): GcContent = copy(child = c)
  override def prettyName: String = "gc_content"
}

case class TranslateDnaToAa(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "translateDnaToAa"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = SeqOps.translateDnaToAa(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): TranslateDnaToAa = copy(child = c)
  override def prettyName: String = "translate_dna_to_aa"
}

case class TranslateDnaToAaLenient(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "translateDnaToAaLenient"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = SeqOps.translateDnaToAaLenient(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): TranslateDnaToAaLenient = copy(child = c)
  override def prettyName: String = "translate_dna_to_aa_lenient"
}

case class ParseCigar(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "parseCigar"
  override def dataType: DataType = ParseCigar.outputType
  override def nullSafeEval(v: Any): Any = SeqOps.parseCigar(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): ParseCigar = copy(child = c)
  override def prettyName: String = "parse_cigar"
}

object ParseCigar {
  val outputType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("op", StringType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)
}

case class ExtractFromCigar(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (STRING, STRING) inputs")
  override def dataType: DataType = StructType(Seq(
    StructField("sequence_start", IntegerType, nullable = false),
    StructField("sequence_end", IntegerType, nullable = false),
    StructField("sequence", StringType, nullable = false)))
  override def nullSafeEval(s: Any, c: Any): Any =
    SeqOps.extractFromCigar(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      c.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, c) => s"graft.functions.SeqOps.extractFromCigar($s, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ExtractFromCigar =
    copy(left = l, right = r)
  override def prettyName: String = "extract_from_cigar"
}

case class QualityScoreStringToList(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "qualityScoreStringToList"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any = SeqOps.qualityScoreStringToList(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): QualityScoreStringToList = copy(child = c)
  override def prettyName: String = "quality_score_string_to_list"
}

case class GffParseAttributes(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "gffParseAttributes"
  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def nullSafeEval(v: Any): Any = SeqOps.gffParseAttributes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): GffParseAttributes = copy(child = c)
  override def prettyName: String = "gff_parse_attributes"
}
