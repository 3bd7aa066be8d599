package graft.sources

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.core._

/** BAM: BGZF-compressed binary alignments, decoded natively (no htsjdk
  * in this environment). BGZF is concatenated gzip members, which
  * MultiMemberGzipInputStream already handles; on top of that this
  * decodes the BAM v1 layout (magic, header text, reference dictionary,
  * little-endian records). Output schema matches the SAM source
  * (reference: test_bam_record_scan.test — identical 10 columns).
  *
  * A `region` option gives bam_query semantics: reads overlapping
  * 'chr[:start-end]' (1-based, end from the CIGAR reference span) —
  * served from .bai chunk pruning when the index exists, full
  * scan + filter otherwise.
  */
object BamFormat extends GraftFormat {
  override def name = "bam"
  override def extensions = Seq("bam")
  override def forcedCodec: Option[String] = Some("gzip")

  override def schema(paths: Seq[Path], conf: Configuration,
                      options: Map[String, String]): StructType = SamFormat.recordSchema

  private val SeqCode = "=ACMGRSVTWYHKDBN"
  private val CigarOps = "MIDNSHP=X"

  private def readIntLE(in: DataInputStream): Int = {
    val a = in.read(); val b = in.read(); val c = in.read(); val d = in.read()
    if ((a | b | c | d) < 0) throw new EOFException
    a | (b << 8) | (c << 16) | (d << 24)
  }

  private def readFully(in: DataInputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    in.readFully(buf)
    buf
  }

  /** Parse magic + header text + reference dictionary; stream is left
    * positioned at the first alignment record. */
  private def readHeader(d: DataInputStream): Array[String] = {
    val magic = readFully(d, 4)
    require(magic.sameElements(Array[Byte]('B', 'A', 'M', 1)),
      s"not a BAM stream (magic ${magic.mkString(",")})")
    val lText = readIntLE(d)
    d.skipBytes(lText)
    val nRef = readIntLE(d)
    (0 until nRef).map { _ =>
      val lName = readIntLE(d)
      val nm = new String(readFully(d, lName), StandardCharsets.US_ASCII).takeWhile(_ != 0.toChar)
      readIntLE(d) // l_ref
      nm
    }.toArray
  }

  /** BAI fast path (falls back to scan+filter). rid comes from the BAM
    * header's reference order, read on the driver at plan time. */
  override def regionChunks(path: String, region: String,
                            conf: Configuration): Option[Seq[(Long, Long)]] =
    BaiIndex.load(path, conf).map { idx =>
      val (chr, lo, hi) = VcfFormat.parseRegion(region)
      val raw = GraftFiles.open(path, conf)
      val refs =
        try readHeader(new DataInputStream(Compression.wrap(raw.stream, "gzip")))
        finally raw.in.close()
      idx.queryByRid(refs.indexOf(chr), math.max(lo - 1, 0), math.min(hi, idx.maxPos))
        .map(c => (c.beg, c.end))
    }

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    // `in` is the BGZF-decompressed stream (gzip codec on .bam paths is
    // forced by the data source for the 'bam' format name). For an
    // index chunk the stream starts at a record boundary, so the
    // reference dictionary is re-read from the file head separately.
    val d = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 16))
    val refs =
      if (split.bgzfChunk) {
        val raw = GraftFiles.open(split.path, split.conf)
        try readHeader(new DataInputStream(Compression.wrap(raw.stream, "gzip")))
        finally raw.in.close()
      } else readHeader(d)

    val region = options.get("region").map(VcfFormat.parseRegion)

    new Iterator[Array[Any]] {
      private var nextRow: Array[Any] = _
      private var done = false
      advance()

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && !done) {
          val rec = try decodeRecord(d, refs) catch { case _: EOFException => done = true; null }
          if (rec != null && passes(rec)) nextRow = rec
        }
      }

      private def passes(vals: Array[Any]): Boolean = region match {
        case None => true
        case Some((chr, lo, hi)) =>
          val ref = vals(2)
          val start = vals(3)
          val end = vals(4)
          ref != null && ref.asInstanceOf[UTF8String].toString == chr && start != null && {
            val s = start.asInstanceOf[Long]
            val e = if (end == null) s else end.asInstanceOf[Long]
            s <= hi && e >= lo
          }
      }

      override def hasNext: Boolean = nextRow != null
      override def next(): Array[Any] = { val r = nextRow; advance(); r }
    }
  }

  def decodeRecord(d: DataInputStream, refs: Array[String]): Array[Any] = {
    val blockSize = readIntLE(d)
    val body = readFully(d, blockSize)
    val bb = java.nio.ByteBuffer.wrap(body).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val refId = bb.getInt
    val pos0 = bb.getInt // 0-based
    val lReadName = bb.get() & 0xff
    val mapq = bb.get() & 0xff
    bb.getShort // bin
    val nCigar = bb.getShort & 0xffff
    val flag = bb.getShort & 0xffff
    val lSeq = bb.getInt
    val nextRefId = bb.getInt
    bb.getInt // next_pos
    bb.getInt // tlen
    val nameBytes = new Array[Byte](lReadName)
    bb.get(nameBytes)
    val name = new String(nameBytes, 0, lReadName - 1, StandardCharsets.US_ASCII)
    val cigarSb = new java.lang.StringBuilder
    var refSpan = 0L
    var i = 0
    while (i < nCigar) {
      val u = bb.getInt
      val len = u >>> 4
      val op = CigarOps.charAt(u & 0xf)
      cigarSb.append(len).append(op)
      if (op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X') refSpan += len
      i += 1
    }
    val seqSb = new java.lang.StringBuilder(lSeq)
    i = 0
    while (i < (lSeq + 1) / 2) {
      val b = bb.get() & 0xff
      seqSb.append(SeqCode.charAt(b >>> 4))
      if (seqSb.length() < lSeq) seqSb.append(SeqCode.charAt(b & 0xf))
      i += 1
    }
    val qualSb = new java.lang.StringBuilder(lSeq)
    var missingQual = false
    i = 0
    while (i < lSeq) {
      val q = bb.get() & 0xff
      if (q == 0xff) missingQual = true else qualSb.append((q + 33).toChar)
      i += 1
    }
    // remaining bytes = optional tags; tolerated, not surfaced (parity
    // with the reference's 10-column scan schema)

    val ref = if (refId < 0) null else refs(refId)
    val start: Any = if (pos0 < 0) null else (pos0 + 1).toLong
    val cigar = if (nCigar == 0) null else cigarSb.toString
    val end: Any =
      if (start == null || cigar == null) null
      else start.asInstanceOf[Long] + refSpan - 1
    val mateRef = if (nextRefId < 0) null else refs(nextRefId)
    Array[Any](
      UTF8String.fromString(name),
      flag,
      if (ref == null) null else UTF8String.fromString(ref),
      start, end,
      if (mapq == 255) null else UTF8String.fromString(mapq.toString),
      if (cigar == null) null else UTF8String.fromString(cigar),
      if (mateRef == null) null else UTF8String.fromString(mateRef),
      if (lSeq == 0) null else UTF8String.fromString(seqSb.toString),
      if (missingQual || lSeq == 0) null else UTF8String.fromString(qualSb.toString))
  }
}
