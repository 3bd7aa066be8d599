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

/** Aligned M/=/X spans of a CIGAR from a 1-based start — the linear
  * kernel the pileup walk explodes (see [[SeqOps.cigarSpans]]); a
  * codegen'd static call like the rest of the scalar surface. */
case class CigarSpans(cigar: Expression, start: Expression)
    extends BinaryExpression {
  override def left: Expression = cigar
  override def right: Expression = start
  override def checkInputDataTypes(): TypeCheckResult =
    if (cigar.dataType.isInstanceOf[StringType] && start.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, BIGINT) inputs, got " +
        s"(${cigar.dataType}, ${start.dataType})")
  override def dataType: DataType = CigarSpans.outputType
  override def nullSafeEval(c: Any, p: Any): Any =
    SeqOps.cigarSpans(c.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      p.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, p) => s"graft.functions.SeqOps.cigarSpans($c, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CigarSpans =
    copy(cigar = l, start = r)
  override def prettyName: String = "cigar_spans"
}

object CigarSpans {
  val outputType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("qi", IntegerType, nullable = false),
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

/** Parsimony normalization of a (pos, ref, alt) triple — the
  * reference-free half of `bcftools norm`: shared-suffix then
  * shared-prefix trimming with a 1bp anchor, symbolic/breakend alts
  * untouched. Struct-returning like [[ExtractFromCigar]], and
  * codegen'd through the same static-kernel call, so it runs inside
  * whole-stage codegen over a billion-row callset. */
case class NormVariant(pos: Expression, ref: Expression, alt: Expression)
    extends TernaryExpression {
  override def first: Expression = pos
  override def second: Expression = ref
  override def third: Expression = alt
  override def checkInputDataTypes(): TypeCheckResult =
    if (pos.dataType == LongType && ref.dataType.isInstanceOf[StringType] &&
        alt.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, STRING, STRING) inputs, got " +
        s"(${pos.dataType}, ${ref.dataType}, ${alt.dataType})")
  override def dataType: DataType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("ref", StringType, nullable = false),
    StructField("alt", StringType, nullable = false)))
  override def nullSafeEval(p: Any, r: Any, a: Any): Any =
    SeqOps.normVariant(p.asInstanceOf[Long],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, r, a) => s"graft.functions.SeqOps.normVariant($p, $r, $a)")
  override protected def withNewChildrenInternal(p: Expression, r: Expression, a: Expression): NormVariant =
    copy(pos = p, ref = r, alt = a)
  override def prettyName: String = "norm_variant"
}

/** GT remap for the biallelic records a multiallelic split produces
  * (`bcftools norm -m-` coding): allele == idx -> '1', other called
  * alleles -> '0', '.' stays, separators and trailing FORMAT fields
  * untouched. Codegen'd static-kernel call like the rest of the
  * scalar surface. */
case class SplitGenotype(gt: Expression, alleleIdx: Expression)
    extends BinaryExpression {
  override def left: Expression = gt
  override def right: Expression = alleleIdx
  override def checkInputDataTypes(): TypeCheckResult =
    if (gt.dataType.isInstanceOf[StringType] && alleleIdx.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, INT) inputs, got (${gt.dataType}, ${alleleIdx.dataType})")
  override def dataType: DataType = StringType
  override def nullSafeEval(g: Any, i: Any): Any =
    SeqOps.splitGenotype(g.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      i.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, i) => s"graft.functions.SeqOps.splitGenotype($g, $i)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SplitGenotype =
    copy(gt = l, alleleIdx = r)
  override def prettyName: String = "split_genotype"
}

/** Kept-length of a Phred+33 read under Trimmomatic-style
  * SLIDINGWINDOW:w:q trimming — see [[SeqOps.qualityTrimLength]]. */
case class QualityTrimLength(qual: Expression, window: Expression, minMean: Expression)
    extends TernaryExpression {
  override def first: Expression = qual
  override def second: Expression = window
  override def third: Expression = minMean
  override def checkInputDataTypes(): TypeCheckResult =
    if (qual.dataType.isInstanceOf[StringType] &&
        window.dataType == IntegerType && minMean.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, INT, INT) inputs")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(q: Any, w: Any, m: Any): Any =
    SeqOps.qualityTrimLength(q.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      w.asInstanceOf[Int], m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, w, m) => s"graft.functions.SeqOps.qualityTrimLength($q, $w, $m)")
  override protected def withNewChildrenInternal(q: Expression, w: Expression, m: Expression): QualityTrimLength =
    copy(qual = q, window = w, minMean = m)
  override def prettyName: String = "quality_trim_length"
}

/** Diploid trio Mendelian-violation predicate — TRUE iff the child's
  * alleles cannot come one-from-each-parent; NULL on missing or
  * non-diploid calls. See [[SeqOps.mendelViolation]]. */
case class MendelViolation(child: Expression, father: Expression, mother: Expression)
    extends TernaryExpression {
  override def first: Expression = child
  override def second: Expression = father
  override def third: Expression = mother
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(child, father, mother).forall(_.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, STRING, STRING) inputs")
  override def dataType: DataType = BooleanType
  // the kernel returns NULL for missing/non-diploid calls even when
  // all three inputs are non-null
  override def nullable: Boolean = true
  override def nullSafeEval(c: Any, f: Any, m: Any): Any =
    SeqOps.mendelViolation(
      c.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      f.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      m.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, f, m) => {
      s"""
        Object r = graft.functions.SeqOps.mendelViolation($c, $f, $m);
        if (r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((java.lang.Boolean) r).booleanValue(); }
      """
    })
  override protected def withNewChildrenInternal(c: Expression, f: Expression, m: Expression): MendelViolation =
    copy(child = c, father = f, mother = m)
  override def prettyName: String = "mendel_violation"
}

/** Newick tree -> array of (node, name, parent, branch_length, depth,
  * is_leaf) structs in preorder allocation order — see
  * [[SeqOps.parseNewick]]. Explode it for the relational tree view. */
case class ParseNewick(child: Expression) extends UnaryStringExpression {
  override def kernel: String = "parseNewick"
  override def dataType: DataType = ParseNewick.outputType
  override def nullSafeEval(v: Any): Any =
    SeqOps.parseNewick(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): ParseNewick = copy(child = c)
  override def prettyName: String = "parse_newick"
}

object ParseNewick {
  val outputType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("node", IntegerType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("parent", IntegerType, nullable = false),
      StructField("branch_length", DoubleType, nullable = true),
      StructField("depth", IntegerType, nullable = false),
      StructField("is_leaf", BooleanType, nullable = false))),
    containsNull = false)
}
