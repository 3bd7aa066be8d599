package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

import graft.sources.core.RecordFormatter

/** Writers' record renderers (reference §2.B: the commented COPY tests
  * document FASTA/FASTQ/GFF writing; recreated here for round-trips). */

object FastaFormatter extends RecordFormatter {
  override def fileExtension = ".fasta"
  override def format(row: InternalRow, schema: StructType): String = {
    val id = row.getUTF8String(0)
    val desc = if (row.isNullAt(1)) null else row.getUTF8String(1)
    val seq = row.getUTF8String(2)
    val sb = new java.lang.StringBuilder(">").append(id)
    if (desc != null) sb.append(' ').append(desc)
    sb.append('\n').append(seq).append('\n').toString
  }
}

object FastqFormatter extends RecordFormatter {
  override def fileExtension = ".fastq"
  override def format(row: InternalRow, schema: StructType): String = {
    val sb = new java.lang.StringBuilder("@").append(row.getUTF8String(0))
    if (!row.isNullAt(1)) sb.append(' ').append(row.getUTF8String(1))
    sb.append('\n').append(row.getUTF8String(2)).append("\n+\n")
      .append(row.getUTF8String(3)).append('\n')
    sb.toString
  }
}

/** SAM rendering — the inverse of SamFormat's parser for the columns
  * the read schema KEEPS: QNAME..CIGAR, RNEXT (already
  * '='-resolved on read, re-rendered as the explicit name), SEQ, QUAL.
  * PNEXT/TLEN and optional tags are not part of the read schema and
  * render as their null placeholders (0/0, none) — a documented loss;
  * `end` is CIGAR-derived and re-derives identically on read-back.
  * NULLs render as the SAM spec placeholders the reader maps back
  * ('*', 0, 255), so parse ∘ write = id on the modeled columns. */
object SamFormatter extends RecordFormatter {
  override def fileExtension = ".sam"

  override def fileHeader(firstRow: Option[InternalRow],
                          schema: StructType): Option[String] =
    Some("@HD\tVN:1.6\tSO:unknown\n")

  override def format(row: InternalRow, schema: StructType): String = {
    def s(i: Int, nul: String): String =
      if (row.isNullAt(i)) nul else row.getUTF8String(i).toString
    val pos = if (row.isNullAt(3)) 0L else row.getLong(3)
    val mapq = s(5, "255")
    s"${s(0, "*")}\t${row.getInt(1)}\t${s(2, "*")}\t$pos\t$mapq\t" +
      s"${s(6, "*")}\t${s(7, "*")}\t0\t0\t${s(8, "*")}\t${s(9, "*")}\n"
  }
}

/** GTF rendering — GFF columns with `key "value"; key2 "v";`
  * attributes; a multi-valued key re-renders as repeated `key "v"`
  * segments, exactly what the reader groups back into an array, so
  * parse ∘ write = id at the record level. */
object GtfFormatter extends graft.sources.core.GenomicRecordFormatter {
  override def fileExtension = ".gtf"

  override def coordsOf(row: InternalRow, schema: StructType): (String, Long, Long) =
    (row.getUTF8String(0).toString, row.getLong(3) - 1, row.getLong(4))

  /** Generic preset over (seqname, start, end) — `tabix -p gff` works
    * for GTF too (same 1-based inclusive columns). */
  override def tabixConfig: (Int, Int, Int, Int, Char) = (0, 1, 4, 5, '#')

  override def format(row: InternalRow, schema: StructType): String = {
    def s(i: Int): String = if (row.isNullAt(i)) "." else row.getUTF8String(i).toString
    val score = if (row.isNullAt(5)) "." else row.getFloat(5).toString
    val attrs =
      if (row.isNullAt(8)) "."
      else {
        val m = row.getMap(8)
        val keys = m.keyArray()
        val vals = m.valueArray()
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i < m.numElements()) {
          val k = keys.getUTF8String(i).toString
          val vs = vals.getArray(i)
          var j = 0
          while (j < vs.numElements()) {
            if (sb.length() > 0) sb.append(' ')
            sb.append(k).append(" \"").append(vs.getUTF8String(j)).append("\";")
            j += 1
          }
          i += 1
        }
        if (sb.length() == 0) "." else sb.toString
      }
    s"${s(0)}\t${s(1)}\t${s(2)}\t${row.getLong(3)}\t${row.getLong(4)}\t$score\t${s(6)}\t${s(7)}\t$attrs\n"
  }
}

/** BED rendering — the inverse of BedFormat's parser at the record
  * level: internal 1-based starts shift back to the file's 0-based
  * convention, trailing all-null columns are omitted (BED is
  * positional), interior nulls render as the spec's placeholders
  * ('.' for text fields, '0' for score/color — exactly the values the
  * reader maps back to NULL, so parse ∘ write = id holds). */
object BedFormatter extends graft.sources.core.GenomicRecordFormatter {
  override def fileExtension = ".bed"

  /** UCSC preset (0-based half-open coordinates on columns 1,2,3) —
    * htslib's `tabix -p bed`. */
  override def tabixConfig: (Int, Int, Int, Int, Char) = (0x10000, 1, 2, 3, '#')

  override def coordsOf(row: InternalRow, schema: StructType): (String, Long, Long) =
    (row.getUTF8String(0).toString, row.getLong(1) - 1, row.getLong(2))

  override def format(row: InternalRow, schema: StructType): String = {
    // column -> rendered text (null = absent); starts shift back -1
    val cells: IndexedSeq[String] = IndexedSeq(
      row.getUTF8String(0).toString,
      (row.getLong(1) - 1).toString,
      row.getLong(2).toString,
      if (row.isNullAt(3)) null else row.getUTF8String(3).toString,
      if (row.isNullAt(4)) null else row.getLong(4).toString,
      if (row.isNullAt(5)) null else row.getUTF8String(5).toString,
      if (row.isNullAt(6)) null else (row.getLong(6) - 1).toString,
      if (row.isNullAt(7)) null else row.getLong(7).toString,
      if (row.isNullAt(8)) null else row.getUTF8String(8).toString,
      if (row.isNullAt(9)) null else row.getLong(9).toString,
      if (row.isNullAt(10)) null else row.getUTF8String(10).toString,
      if (row.isNullAt(11)) null else row.getUTF8String(11).toString)
    val last = cells.lastIndexWhere(_ != null)
    val out = (0 to last).map { i =>
      cells(i) match {
        case null if i == 4 || i == 8 => "0" // score / color placeholders
        case null                     => "."
        case v                        => v
      }
    }
    out.mkString("\t") + "\n"
  }
}

/** VCF text rendering — the inverse of VcfFormat's parser at the
  * RECORD level (`parse ∘ write = id` on values; the original byte
  * text is not preserved — '1.0' may re-render as '1.0' vs '1', field
  * case normalizes). The header is RECONSTRUCTED from the Spark
  * schema: ##INFO lines from the info struct's field types (the same
  * Number/Type mapping the reader's schema inference applies, run
  * backwards), ##FORMAT lines from the genotypes_typed element struct
  * when present, and the #CHROM sample list sized from the first
  * record's genotype array (names s1..sN — original sample names are
  * not part of the read schema). `genotypes_typed` is derived data and
  * is never rendered.
  */
object VcfFormatter extends graft.sources.core.GenomicRecordFormatter {
  override def fileExtension = ".vcf"

  /** VCF tabix preset: coordinates on columns (1, 2), record interval
    * [pos-1, pos-1+len(ref)) — htslib's `tabix -p vcf`. */
  override def tabixConfig: (Int, Int, Int, Int, Char) = (2, 1, 2, 0, '#')

  override def coordsOf(row: InternalRow, schema: StructType): (String, Long, Long) = {
    val chrom = row.getUTF8String(schema.fieldIndex("chrom")).toString
    val pos = row.getLong(schema.fieldIndex("pos"))
    val ref = row.getUTF8String(schema.fieldIndex("ref"))
    (chrom, pos - 1, pos - 1 + math.max(ref.numChars(), 1))
  }

  private def numberAndType(dt: org.apache.spark.sql.types.DataType): (String, String) = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType          => ("0", "Flag")
      case IntegerType          => ("1", "Integer")
      case FloatType            => ("1", "Float")
      case StringType           => ("1", "String")
      case ArrayType(IntegerType, _) => (".", "Integer")
      case ArrayType(FloatType, _)   => (".", "Float")
      case _                    => (".", "String")
    }
  }

  override def fileHeader(firstRow: Option[InternalRow],
                          schema: StructType): Option[String] = {
    import org.apache.spark.sql.types._
    val sb = new java.lang.StringBuilder("##fileformat=VCFv4.2\n")
    val infoStruct = schema("info").dataType.asInstanceOf[StructType]
    infoStruct.fields.foreach { f =>
      val (num, tpe) = numberAndType(f.dataType)
      sb.append(s"##INFO=<ID=${f.name.toUpperCase},Number=$num,Type=$tpe,Description=${"\""}${"\""}>\n")
    }
    schema.fields.find(_.name == "genotypes_typed").foreach { tf =>
      tf.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
        .fields.foreach { f =>
          val (num, tpe) = numberAndType(f.dataType)
          sb.append(s"##FORMAT=<ID=${f.name.toUpperCase},Number=$num,Type=$tpe,Description=${"\""}${"\""}>\n")
        }
    }
    sb.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO")
    if (schema.fieldNames.contains("genotypes")) {
      val n = firstRow.map { r =>
        val i = schema.fieldIndex("genotypes")
        if (r.isNullAt(i)) 0 else r.getArray(i).numElements()
      }.getOrElse(0)
      if (n > 0) {
        sb.append("\tFORMAT")
        (1 to n).foreach(i => sb.append(s"\ts$i"))
      }
    }
    sb.append('\n')
    Some(sb.toString)
  }

  override def format(row: InternalRow, schema: StructType): String = {
    import org.apache.spark.sql.types._
    def idx(n: String) = schema.fieldIndex(n)
    val sb = new java.lang.StringBuilder()
    sb.append(row.getUTF8String(idx("chrom"))).append('\t')
      .append(row.getLong(idx("pos"))).append('\t')
    val idI = idx("id")
    sb.append(if (row.isNullAt(idI)) "." else row.getUTF8String(idI)).append('\t')
    sb.append(row.getUTF8String(idx("ref"))).append('\t')
    val altA = row.getArray(idx("alt"))
    if (altA == null || altA.numElements() == 0) sb.append('.')
    else {
      var i = 0
      while (i < altA.numElements()) {
        if (i > 0) sb.append(',')
        sb.append(altA.getUTF8String(i))
        i += 1
      }
    }
    sb.append('\t')
    val qI = idx("qual")
    sb.append(if (row.isNullAt(qI)) "." else row.getFloat(qI).toString).append('\t')
    val fI = idx("filter")
    sb.append(if (row.isNullAt(fI)) "." else row.getUTF8String(fI)).append('\t')

    val infoStruct = schema("info").dataType.asInstanceOf[StructType]
    val info = row.getStruct(idx("info"), infoStruct.length)
    def scalarText(v: Any): String = v match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => other.toString
    }
    val parts = infoStruct.fields.zipWithIndex.flatMap { case (f, i) =>
      if (info.isNullAt(i)) None
      else f.dataType match {
        case BooleanType =>
          if (info.getBoolean(i)) Some(f.name.toUpperCase) else None
        case ArrayType(et, _) =>
          val arr = info.getArray(i)
          val vs = (0 until arr.numElements())
            .map(j => scalarText(arr.get(j, et))).mkString(",")
          Some(s"${f.name.toUpperCase}=$vs")
        case dt => Some(s"${f.name.toUpperCase}=${scalarText(info.get(i, dt))}")
      }
    }
    sb.append(if (parts.isEmpty) "." else parts.mkString(";"))

    if (schema.fieldNames.contains("genotypes")) {
      val gI = idx("genotypes")
      val gts = if (row.isNullAt(gI)) null else row.getArray(gI)
      if (gts != null && gts.numElements() > 0) {
        val fmtI = idx("format")
        sb.append('\t')
          .append(if (row.isNullAt(fmtI)) "." else row.getUTF8String(fmtI))
        var i = 0
        while (i < gts.numElements()) {
          sb.append('\t').append(gts.getUTF8String(i))
          i += 1
        }
      }
    }
    sb.append('\n').toString
  }
}

object GffFormatter extends graft.sources.core.GenomicRecordFormatter {
  override def fileExtension = ".gff"

  /** GFF text is 1-based inclusive; tabix wants 0-based half-open. */
  override def coordsOf(row: InternalRow, schema: StructType): (String, Long, Long) =
    (row.getUTF8String(0).toString, row.getLong(3) - 1, row.getLong(4))

  /** Generic preset over (seqname, start, end) = columns (1, 4, 5),
    * '#' comment lines — the stock `tabix -p gff` configuration. */
  override def tabixConfig: (Int, Int, Int, Int, Char) = (0, 1, 4, 5, '#')

  /** GFF3 reserved characters must be percent-encoded in attribute keys
    * and values, or a value containing ';' / '=' / ',' / tab re-parses as
    * extra separators; the reader percent-decodes, so enc∘dec = id. */
  private def enc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '%'  => sb.append("%25")
      case ';'  => sb.append("%3B")
      case '='  => sb.append("%3D")
      case ','  => sb.append("%2C")
      case '&'  => sb.append("%26")
      case '\t' => sb.append("%09")
      case '\n' => sb.append("%0A")
      case '\r' => sb.append("%0D")
      case c    => sb.append(c)
    }
    sb.toString
  }

  override def format(row: InternalRow, schema: StructType): String = {
    def s(i: Int): String = if (row.isNullAt(i)) "." else row.getUTF8String(i).toString
    val start = row.getLong(3)
    val end = row.getLong(4)
    val score = if (row.isNullAt(5)) "." else row.getFloat(5).toString
    val attrs =
      if (row.isNullAt(8)) "."
      else {
        val m = row.getMap(8)
        val keys = m.keyArray()
        val vals = m.valueArray()
        (0 until m.numElements()).map { i =>
          val vs = vals.getArray(i)
          val joined = (0 until vs.numElements())
            .map(j => enc(vs.getUTF8String(j).toString)).mkString(",")
          s"${enc(keys.getUTF8String(i).toString)}=$joined"
        }.mkString(";")
      }
    s"${s(0)}\t${s(1)}\t${s(2)}\t$start\t$end\t$score\t${s(6)}\t${s(7)}\t$attrs\n"
  }
}
