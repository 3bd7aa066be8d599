package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** alignment_string / alignment_score (+ _wfa_gap_affine aliases),
  * arities per the reference (alignment_functions/module.cpp):
  *   (a, b)
  *   (a, b, mismatch, gap_open, gap_ext, memory_model)
  *   (a, b, match, mismatch, gap_open, gap_ext, memory_model)
  * Options are bind-time constants (the reference evaluates them once
  * into FunctionData); here the builder folds the literal args into the
  * expression's Penalties. memory_model only selects WFA's memory
  * strategy upstream — accepted and ignored. match > 0 throws at bind.
  */
case class Alignment(left: Expression, right: Expression,
                     pen: Aligner.Penalties, returnScore: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = if (returnScore) FloatType else StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (STRING, STRING)")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val p = a.asInstanceOf[UTF8String].toString
    val t = b.asInstanceOf[UTF8String].toString
    if (returnScore) Aligner.score(p, t, pen)
    else UTF8String.fromString(Aligner.cigar(p, t, pen))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Alignment =
    copy(left = l, right = r)
  override def prettyName: String =
    if (returnScore) "alignment_score" else "alignment_string"
}

object AlignmentFunctions {

  private def lit(e: Expression): Int = e.eval(null) match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(s"expected a numeric literal, got $other")
  }

  private def build(args: Seq[Expression], returnScore: Boolean): Expression = {
    val pen = args.length match {
      case 2 => Aligner.Penalties()
      case 6 => Aligner.Penalties(0, lit(args(2)), lit(args(3)), lit(args(4)))
      case 7 => Aligner.Penalties(lit(args(2)), lit(args(3)), lit(args(4)), lit(args(5)))
      case n => throw new IllegalArgumentException(
        s"alignment function takes 2, 6 or 7 arguments, got $n")
    }
    Alignment(args(0), args(1), pen, returnScore)
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq("alignment_string", "alignment_string_wfa_gap_affine").foreach { n =>
      reg.createOrReplaceTempFunction(n, build(_, returnScore = false), "scala_udf")
    }
    Seq("alignment_score", "alignment_score_wfa_gap_affine").foreach { n =>
      reg.createOrReplaceTempFunction(n, build(_, returnScore = true), "scala_udf")
    }
  }
}
