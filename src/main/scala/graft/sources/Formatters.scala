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

  // ragged genotype arrays would render rows whose sample-column count
  // disagrees with the header's #CHROM line — htslib/bcftools reject
  // such files; the writer holds every record to the first record's
  // count via this invariant (see RecordFormatter.recordInvariant)
  override def recordInvariant(row: InternalRow, schema: StructType,
      options: Map[String, String]): Option[(String, Long)] =
    if (!schema.fieldNames.contains("genotypes")) None
    else {
      val i = schema.fieldIndex("genotypes")
      Some(("sample count",
        if (row.isNullAt(i)) 0L else row.getArray(i).numElements().toLong))
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

/** BAM rendering — the library's first BINARY writer. BGZF container
  * (forced — a .bam IS bgzf, so the codec suffix is suppressed), BAM v1
  * record layout mirroring [[graft.sources.BamFormat]]'s decoder field
  * for field, so parse ∘ write = id holds at the record level for the
  * 10-column schema (tags are not surfaced by the reader and not
  * written). Requires `option("refs", "name:length,...")`: BAM records
  * address the header's reference dictionary BY INDEX, and a
  * distributed writer cannot discover the dictionary without a second
  * pass — the caller states it, every part file carries the same
  * header, and any record naming an undeclared reference fails loudly
  * instead of silently renumbering.
  */
object BamFormatter extends graft.sources.core.RecordFormatter {
  override def fileExtension = ".bam"
  override def writeForcedCodec: Option[String] = Some("bgzf")
  override def suppressCodecSuffix: Boolean = true
  override def format(row: InternalRow, schema: StructType): String =
    throw new UnsupportedOperationException("BAM is binary — formatBytes is the write path")

  private val CigarOps = "MIDNSHP=X"
  private val SeqCode = "=ACMGRSVTWYHKDBN"
  private val seqNibble: Array[Byte] = {
    val t = Array.fill[Byte](256)(15) // unknown bases encode as N
    SeqCode.zipWithIndex.foreach { case (c, i) =>
      t(c.toInt) = i.toByte
      t(c.toLower.toInt) = i.toByte
    }
    t
  }

  private val refCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[(String, Int)], Map[String, Int])]()

  private def refs(options: Map[String, String]): (Array[(String, Int)], Map[String, Int]) = {
    val spec = options.getOrElse("refs", throw new IllegalArgumentException(
      "bam write needs option(\"refs\", \"name:length,...\") — records address " +
        "the header's reference dictionary by index"))
    refCache.computeIfAbsent(spec, s => {
      val arr = s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { p =>
        val i = p.lastIndexOf(':')
        require(i > 0, s"bad refs entry '$p' (want name:length)")
        (p.substring(0, i), p.substring(i + 1).toInt)
      }.toArray
      require(arr.nonEmpty, "option(\"refs\") declared no references")
      (arr, arr.iterator.map(_._1).zipWithIndex.toMap)
    })
  }

  override def fileHeaderBytes(firstRow: Option[InternalRow], schema: StructType,
                               options: Map[String, String]): Option[Array[Byte]] = {
    val (arr, _) = refs(options)
    val text = ("@HD\tVN:1.6\tSO:unknown\n" +
      arr.map { case (n, l) => s"@SQ\tSN:$n\tLN:$l\n" }.mkString)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val size = 4 + 4 + text.length + 4 +
      arr.iterator.map { case (n, _) => 4 + n.length + 1 + 4 }.sum
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('A'.toByte).put('M'.toByte).put(1.toByte)
    bb.putInt(text.length).put(text)
    bb.putInt(arr.length)
    arr.foreach { case (n, l) =>
      bb.putInt(n.length + 1)
      bb.put(n.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).put(0.toByte)
      bb.putInt(l)
    }
    Some(bb.array())
  }

  /** samtools reg2bin over [beg, end) 0-based half-open. */
  private def reg2bin(beg: Int, end0: Int): Int = {
    val end = end0 - 1
    if (beg >> 14 == end >> 14) ((1 << 15) - 1) / 7 + (beg >> 14)
    else if (beg >> 17 == end >> 17) ((1 << 12) - 1) / 7 + (beg >> 17)
    else if (beg >> 20 == end >> 20) ((1 << 9) - 1) / 7 + (beg >> 20)
    else if (beg >> 23 == end >> 23) ((1 << 6) - 1) / 7 + (beg >> 23)
    else if (beg >> 26 == end >> 26) ((1 << 3) - 1) / 7 + (beg >> 26)
    else 0
  }

  override def formatBytes(row: InternalRow, schema: StructType,
                           options: Map[String, String]): Array[Byte] = {
    val (_, idx) = refs(options)
    def str(i: Int): String =
      if (row.isNullAt(i)) null else row.getUTF8String(i).toString
    def ridOf(name: String, what: String): Int =
      if (name == null) -1
      else idx.getOrElse(name, throw new IllegalArgumentException(
        s"$what '$name' is not in option(\"refs\") — declare every reference"))
    val name = { val n = str(0); if (n == null) "*" else n }
    require(name.length <= 254, s"read name too long for BAM (${name.length})")
    val flag = row.getInt(1)
    val refId = ridOf(str(2), "reference")
    val pos0 = if (row.isNullAt(3)) -1 else (row.getLong(3) - 1).toInt
    val mapq = { val m = str(5); if (m == null) 255 else m.toInt }
    val cigar = str(6)
    val nextRefId = ridOf(str(7), "mate_reference")
    val seq = str(8)
    val qual = str(9)
    val lSeq = if (seq == null) 0 else seq.length
    require(qual == null || qual.length == lSeq,
      s"quality length ${if (qual == null) -1 else qual.length} != sequence length $lSeq for '$name'")
    // CIGAR -> packed (len << 4 | op) ops, tracking the reference span
    var ops = Array.empty[Int]
    var refSpan = 0
    if (cigar != null) {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < cigar.length) {
        var len = 0
        val s0 = i
        while (i < cigar.length && cigar.charAt(i).isDigit) {
          len = len * 10 + (cigar.charAt(i) - '0'); i += 1
        }
        require(i > s0 && i < cigar.length, s"invalid CIGAR '$cigar'")
        val op = CigarOps.indexOf(cigar.charAt(i))
        require(op >= 0, s"invalid CIGAR op '${cigar.charAt(i)}' in '$cigar'")
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) refSpan += len
        buf += ((len << 4) | op)
        i += 1
      }
      ops = buf.toArray
    }
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // optional aux tags: an 11th map<string,string> column (tag ->
    // "TYPE:VALUE", the read side's rendering) encodes to spec aux
    // records — round-trips through option("tags", "true") reads
    val auxBytes: Array[Byte] =
      if (schema.length > 10 && schema(10).name == "tags" && !row.isNullAt(10))
        encodeAux(row.getMap(10))
      else Array.emptyByteArray
    val bodyLen = 32 + nameBytes.length + 1 + 4 * ops.length +
      (lSeq + 1) / 2 + lSeq + auxBytes.length
    val bb = java.nio.ByteBuffer.allocate(4 + bodyLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(bodyLen)
    bb.putInt(refId)
    bb.putInt(pos0)
    bb.put((nameBytes.length + 1).toByte)
    bb.put(mapq.toByte)
    bb.putShort(
      (if (pos0 < 0) 0
       else reg2bin(pos0, pos0 + math.max(refSpan, 1))).toShort)
    bb.putShort(ops.length.toShort)
    bb.putShort(flag.toShort)
    bb.putInt(lSeq)
    bb.putInt(nextRefId)
    bb.putInt(-1) // next_pos: not in the 10-column schema
    bb.putInt(0)  // tlen: not in the 10-column schema
    bb.put(nameBytes).put(0.toByte)
    ops.foreach(bb.putInt)
    var i = 0
    while (i < lSeq) {
      val hi = seqNibble(seq.charAt(i).toInt & 0xff)
      val lo = if (i + 1 < lSeq) seqNibble(seq.charAt(i + 1).toInt & 0xff) else 0
      bb.put(((hi << 4) | lo).toByte)
      i += 2
    }
    i = 0
    while (i < lSeq) {
      bb.put(if (qual == null) 0xff.toByte else (qual.charAt(i) - 33).toByte)
      i += 1
    }
    bb.put(auxBytes)
    bb.array()
  }

  /** Encode tag -> "TYPE:VALUE" pairs as BAM aux records. Integer
    * values pick int32 ('i') or uint32 ('I') by range — the SAM text
    * form carries no width, and htslib does the same promotion. */
  private def encodeAux(m: org.apache.spark.sql.catalyst.util.MapData): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    val keys = m.keyArray(); val vals = m.valueArray()
    var k = 0
    while (k < m.numElements()) {
      val tag = keys.getUTF8String(k).toString
      require(tag.length == 2, s"BAM aux tag must be 2 chars: '$tag'")
      val tv = vals.getUTF8String(k).toString
      val c1 = tv.indexOf(':')
      require(c1 > 0, s"BAM aux value must be 'TYPE:VALUE': '$tv'")
      val typ = tv.substring(0, c1)
      val v = tv.substring(c1 + 1)
      out.write(tag.charAt(0)); out.write(tag.charAt(1))
      typ match {
        case "A" =>
          require(v.length == 1, s"aux A value must be one char: '$v'")
          out.write('A'); out.write(v.charAt(0))
        case "i" =>
          val n = java.lang.Long.parseLong(v)
          if (n >= Int.MinValue && n <= Int.MaxValue) {
            out.write('i'); le32(n.toInt)
          } else {
            require(n >= 0 && n <= 0xffffffffL, s"aux integer out of range: $v")
            out.write('I'); le32(n.toInt)
          }
        case "f" =>
          out.write('f'); le32(java.lang.Float.floatToIntBits(v.toFloat))
        case "Z" | "H" =>
          out.write(typ.charAt(0))
          v.foreach(c => out.write(c)); out.write(0)
        case "B" =>
          val parts = v.split(",", -1)
          require(parts.nonEmpty && parts(0).length == 1,
            s"aux B value needs 'subtype,v1,...': '$v'")
          val sub = parts(0).charAt(0)
          out.write('B'); out.write(sub)
          le32(parts.length - 1)
          parts.iterator.drop(1).foreach { e =>
            sub match {
              case 'c' | 'C' => out.write(java.lang.Integer.parseInt(e) & 0xff)
              case 's' | 'S' => le16(java.lang.Integer.parseInt(e) & 0xffff)
              case 'i' | 'I' => le32(java.lang.Long.parseLong(e).toInt)
              case 'f' => le32(java.lang.Float.floatToIntBits(e.toFloat))
              case other => throw new IllegalArgumentException(
                s"unknown aux B subtype '$other'")
            }
          }
        case other => throw new IllegalArgumentException(
          s"unknown aux type '$other' in '$tv'")
      }
      k += 1
    }
    out.toByteArray
  }
}

/** BEDPE rendering: stored 1-based inclusive loci back to the 0-based
  * half-open disk form; a NULL mate renders as '.' with -1 coords (the
  * convention the reader folds back to NULLs — parse ∘ write = id);
  * extras re-append verbatim. */
object BedpeFormatter extends graft.sources.core.RecordFormatter {
  override def fileExtension = ".bedpe"
  override def format(row: InternalRow, schema: StructType): String = {
    def s(i: Int): String = if (row.isNullAt(i)) "." else row.getUTF8String(i).toString
    def locus(ci: Int): String =
      if (row.isNullAt(ci)) ".\t-1\t-1"
      else s"${row.getUTF8String(ci)}\t${row.getLong(ci + 1) - 1}\t${row.getLong(ci + 2)}"
    val extra =
      if (row.isNullAt(10)) ""
      else {
        val arr = row.getArray(10)
        (0 until arr.numElements()).map(i => "\t" + arr.getUTF8String(i)).mkString
      }
    s"${locus(0)}\t${locus(3)}\t${s(6)}\t${s(7)}\t${s(8)}\t${s(9)}$extra\n"
  }
}

/** bedGraph rendering: 1-based inclusive back to 0-based half-open. */
object BedGraphFormatter extends graft.sources.core.RecordFormatter {
  override def fileExtension = ".bedgraph"
  override def format(row: InternalRow, schema: StructType): String =
    s"${row.getUTF8String(0)}\t${row.getLong(1) - 1}\t${row.getLong(2)}" +
      s"\t${row.getDouble(3)}\n"
}

/** BLAST -outfmt 6 rendering: 12 tab-separated fields, doubles in
  * Java's shortest-round-trip form (the VALUES survive parse ∘ write
  * exactly; the text spelling of '1e-5' does not, which is the normal
  * contract for float text formats). */
object Blast6Formatter extends graft.sources.core.RecordFormatter {
  override def fileExtension = ".blast6"
  override def format(row: InternalRow, schema: StructType): String = {
    val sb = new java.lang.StringBuilder
    sb.append(row.getUTF8String(0)).append('\t').append(row.getUTF8String(1))
    sb.append('\t').append(row.getDouble(2))
    var i = 3
    while (i <= 9) { sb.append('\t').append(row.getLong(i)); i += 1 }
    sb.append('\t').append(row.getDouble(10))
    sb.append('\t').append(row.getDouble(11))
    sb.append('\n').toString
  }
}
