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
  override def formatter: Option[graft.sources.core.RecordFormatter] = Some(BamFormatter)
  /** Not text-splittable, but BGZF-block-splittable: tasks sync to a
    * block header and find the first record boundary with a validated
    * prologue guesser (see guessRecordStart). */
  override def bgzfSplittable: Boolean = true

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
    * header's reference order, read on the driver ONCE at plan time,
    * however many regions the batch carries. */
  override def regionChunks(path: String, regions: Seq[String],
                            conf: Configuration): Option[Seq[(Long, Long)]] =
    BaiIndex.load(path, conf).map { idx =>
      val raw = GraftFiles.open(path, conf)
      val refs =
        try readHeader(new DataInputStream(Compression.wrap(raw.stream, "gzip")))
        finally raw.in.close()
      Regions.mergeChunks(regions.flatMap { region =>
        val (chr, lo, hi) = VcfFormat.parseRegion(region)
        idx.queryByRid(refs.indexOf(chr), math.max(lo - 1, 0), math.min(hi, idx.maxPos))
          .map(c => (c.beg, c.end))
      })
    }

  override def regionColumns: Option[(String, String)] = Some(("reference", "start"))

  private def regionPasses(vals: Array[Any],
                           region: Option[Regions.Matcher]): Boolean = region match {
    case None => true
    case Some(m) =>
      val ref = vals(2)
      val start = vals(3)
      val end = vals(4)
      ref != null && start != null && {
        val s = start.asInstanceOf[Long]
        val e = if (end == null) s else end.asInstanceOf[Long]
        m.overlaps(ref.asInstanceOf[UTF8String].toString, s, e)
      }
  }

  /** Reference dictionary re-read from the file head (for streams that
    * do not start at the BAM header). */
  private def refsFromHead(split: GraftSplit): Array[String] = {
    val raw = GraftFiles.open(split.path, split.conf)
    try readHeader(new DataInputStream(Compression.wrap(raw.stream, "gzip")))
    finally raw.in.close()
  }

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    if (split.bgzfSplit)
      return readBgzfSplit(split, in.asInstanceOf[graft.sources.core.BgzfBlockStream], options)
    // `in` is the BGZF-decompressed stream (gzip codec on .bam paths is
    // forced by the data source for the 'bam' format name). For an
    // index chunk the stream starts at a record boundary, so the
    // reference dictionary is re-read from the file head separately.
    val d = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 16))
    val refs =
      if (split.bgzfChunk) refsFromHead(split)
      else readHeader(d)

    val region = Regions.matcherFromOptions(options)
    val wantSeq = split.needs("sequence")
    val wantQual = split.needs("quality_score")

    new Iterator[Array[Any]] {
      private var nextRow: Array[Any] = _
      private var done = false
      advance()

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && !done) {
          // no EOFException catch: decodeRecord returns null only at a
          // clean record boundary; truncation exceptions must fail the
          // task, not end the iterator
          val rec = decodeRecord(d, refs, wantSeq, wantQual)
          if (rec == null) done = true
          else if (regionPasses(rec, region)) nextRow = rec
        }
      }

      override def hasNext: Boolean = nextRow != null
      override def next(): Array[Any] = { val r = nextRow; advance(); r }
    }
  }

  /** Byte-range split of a BGZF BAM over the shared anchor-ownership
    * driver (core.BgzfRecordSplit) — this format contributes only the
    * framing: 4-byte block_size prefix, the prologue plausibility check,
    * and the record decoder. */
  private def readBgzfSplit(split: GraftSplit,
                            bs: graft.sources.core.BgzfBlockStream,
                            options: Map[String, String]): Iterator[Array[Any]] = {
    val region = Regions.matcherFromOptions(options)
    val wantSeq = split.needs("sequence")
    val wantQual = split.needs("quality_score")
    val refs =
      if (split.start == 0) {
        // stream is at the file head: consume the header in place (exact
        // byte accounting — no read-ahead buffering) so the record
        // window starts right after it
        readHeader(new DataInputStream(bs))
      } else refsFromHead(split)

    graft.sources.core.BgzfRecordSplit.iterator(split, bs,
      minRecordBytes = 37, prefixBytes = 4,
      plausible = (w, k) => plausibleRecord(w, k, refs.length, depth = 2),
      recordLen = (w, c) => 4L + w.i32(c),
      decode = (w, c, len) =>
        decodeBody(w.copy(c + 4, (len - 4).toInt), refs, wantSeq, wantQual))
      .filter(regionPasses(_, region))
  }

  /** Plausibility of a BAM record start at window offset k: validates
    * the fixed 32-byte prologue (reference ids in range, name length,
    * non-negative lengths, payload fits block_size, NUL-terminated read
    * name, legal CIGAR op codes) and requires the implied NEXT record to
    * chain (or land exactly on EOF) — the same heuristic the htslib
    * family uses for index-free BAM splitting; a false positive needs
    * two adjacent forged prologues. Records too large to buffer for
    * chaining (long-read data) are accepted on the prologue alone. */
  private def plausibleRecord(win: graft.sources.core.BgzfWindow, k: Long,
                              nRef: Int, depth: Int): Boolean = {
    if (!win.ensure(k + 36)) return win.atEof && win.end == k // clean chain end at EOF
    val bsz = win.i32(k)
    if (bsz < 32 || bsz > (1 << 28)) return false
    val refId = win.i32(k + 4)
    if (refId < -1 || refId >= nRef) return false
    if (win.i32(k + 8) < -1) return false // pos
    val lName = win.u8(k + 12)
    if (lName < 1) return false
    val nCig = win.u16(k + 16)
    val lSeq = win.i32(k + 20)
    if (lSeq < 0 || lSeq > (1 << 28)) return false
    val nextRef = win.i32(k + 24)
    if (nextRef < -1 || nextRef >= nRef) return false
    if (win.i32(k + 28) < -1) return false // next_pos
    if (32L + lName + 4L * nCig + (lSeq + 1) / 2 + lSeq > bsz) return false
    if (!win.ensure(k + 36 + lName + 4L * math.min(nCig, 4))) return false
    if (win.u8(k + 36 + lName - 1) != 0) return false // read name NUL
    var i = 0
    while (i < math.min(nCig, 4)) {
      if ((win.u8(k + 36 + lName + 4L * i) & 0xf) > 8) return false
      i += 1
    }
    if (depth == 0 ||
        4L + bsz > graft.sources.core.BgzfRecordSplit.MaxChainLookahead) true
    else plausibleRecord(win, k + 4 + bsz, nRef, depth - 1)
  }

  def decodeRecord(d: DataInputStream, refs: Array[String]): Array[Any] =
    decodeRecord(d, refs, wantSeq = true, wantQual = true)

  /** One alignment record, or null at the clean end of the stream.
    *
    * Clean end is EOF exactly at a record boundary — before the first
    * byte of block_size. EOF anywhere else (inside the length, inside
    * the body via readFully, or an inflater EOFException from a
    * truncated gzip stream) propagates and fails the task: a corrupt
    * input must never be reported as a successful scan of fewer rows. */
  def decodeRecord(d: DataInputStream, refs: Array[String],
                   wantSeq: Boolean, wantQual: Boolean): Array[Any] = {
    val a = d.read()
    if (a < 0) return null
    val b = d.read(); val c = d.read(); val e = d.read()
    if ((b | c | e) < 0)
      throw new java.util.zip.ZipException("EOF inside BAM record length")
    val blockSize = a | (b << 8) | (c << 16) | (e << 24)
    val body = readFully(d, blockSize)
    decodeBody(body, refs, wantSeq, wantQual)
  }

  def decodeBody(body: Array[Byte], refs: Array[String]): Array[Any] =
    decodeBody(body, refs, wantSeq = true, wantQual = true)

  /** wantSeq/wantQual: runtime pruning from Catalyst's projection — the
    * 4-bit sequence unpack and quality re-encode dominate decode CPU, so
    * a count(*) or flag-only scan skips them (slots stay, ordinals
    * fixed). */
  def decodeBody(body: Array[Byte], refs: Array[String],
                 wantSeq: Boolean, wantQual: Boolean): Array[Any] = {
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
    val seqSb = new java.lang.StringBuilder(if (wantSeq) lSeq else 0)
    if (wantSeq) {
      i = 0
      while (i < (lSeq + 1) / 2) {
        val b = bb.get() & 0xff
        seqSb.append(SeqCode.charAt(b >>> 4))
        if (seqSb.length() < lSeq) seqSb.append(SeqCode.charAt(b & 0xf))
        i += 1
      }
    } else bb.position(bb.position() + (lSeq + 1) / 2)
    val qualSb = new java.lang.StringBuilder(if (wantQual) lSeq else 0)
    var missingQual = false
    if (wantQual) {
      i = 0
      while (i < lSeq) {
        val q = bb.get() & 0xff
        if (q == 0xff) missingQual = true else qualSb.append((q + 33).toChar)
        i += 1
      }
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
      if (!wantSeq || lSeq == 0) null else UTF8String.fromString(seqSb.toString),
      if (!wantQual || missingQual || lSeq == 0) null else UTF8String.fromString(qualSb.toString))
  }
}
