package graft.sources.core

import java.io.InputStream

/** Byte-range split support for record-oriented XML (mzML): an iterator
  * of complete record elements (`<spectrum …>…</spectrum>` /
  * `<chromatogram …>…</chromatogram>`) whose start-tag offset falls in
  * this split's ownership range.
  *
  * Ownership mirrors the LineReader split protocol: a record whose
  * start tag begins at offset o belongs to the split with
  * `(splitStart == 0 || o > splitStart) && o <= splitEnd` — the record
  * starting exactly at a boundary belongs to the EARLIER split, and a
  * task parses its last record to completion past splitEnd, so
  * consecutive [s, e) ranges partition the records exactly.
  *
  * Resync safety: '<' cannot occur in base64 payloads (the alphabet is
  * A–Za–z0–9+/=) nor raw in XML attribute values or text content (it
  * must be escaped as &lt;), so scanning for `<spectrum` followed by a
  * name-terminating byte finds exactly the record start tags — the same
  * structural argument Hadoop's classic XmlInputFormat relies on. '>'
  * IS legal inside attribute values, so the start-tag scan is
  * quote-aware; self-closing records (`<spectrum …/>`) are handled.
  * Comments and CDATA sections are skipped wholesale when encountered
  * from a clean scan position, both between records (a commented-out
  * `<spectrum` is not a record start) and inside one (a `</spectrum>`
  * inside CDATA does not close the record). Known restriction, shared
  * with Hadoop's XmlInputFormat: a split boundary landing INSIDE a
  * comment/CDATA section cannot be detected from the bytes alone, so
  * record-looking text within could be mis-framed; mzML producers do
  * not emit such content.
  *
  * This is what keeps one large uncompressed .mzML from serializing a
  * cluster into a single task (reference analog: the single-producer
  * Arrow stream, exon/src/exon/arrow_table_function/module.cpp).
  */
final class XmlRecordSlicer(in: InputStream, splitStart: Long, splitEnd: Long,
                            recordNames: Set[String])
    extends Iterator[Array[Byte]] {

  private val buf = new Array[Byte](1 << 16)
  private var bufLen = 0
  private var bufPos = 0
  /** Absolute offset of buf(bufPos). */
  private var pos: Long = splitStart
  private var done = false
  private var nextRecord: Array[Byte] = _

  advance()

  /** -1 at EOF. */
  private def nextByte(): Int = {
    if (bufPos >= bufLen) {
      bufLen = in.read(buf)
      bufPos = 0
      if (bufLen <= 0) return -1
    }
    val b = buf(bufPos) & 0xff
    bufPos += 1
    pos += 1
    b
  }

  private def owned(o: Long): Boolean =
    (splitStart == 0 || o > splitStart) && o <= splitEnd

  private def isNameByte(b: Int): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** After '<' + name, these terminate the element name in a start tag. */
  private def isNameEnd(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '>' || b == '/'

  private def advance(): Unit = {
    nextRecord = null
    if (done) return
    // a pushed-back byte to reprocess in the main loop ('<' terminating
    // a non-matching name)
    var reprocess = -2
    while (nextRecord == null && !done) {
      val b = if (reprocess != -2) { val r = reprocess; reprocess = -2; r }
              else {
                // idle past the ownership bound: any later record start
                // is > splitEnd, so this split is finished
                if (pos > splitEnd) { done = true; return }
                nextByte()
              }
      if (b < 0) { done = true; return }
      if (b == '<') {
        val tagStart = pos - 1
        val name = new java.lang.StringBuilder(16)
        var nb = nextByte()
        while (isNameByte(nb) && name.length < 32) { name.append(nb.toChar); nb = nextByte() }
        if (nb < 0) { done = true; return }
        if (name.length == 0 && nb == '!') skipBangMarkup(null)
        else if (recordNames.contains(name.toString) && isNameEnd(nb)) {
          if (tagStart > splitEnd) { done = true; return }
          if (owned(tagStart)) nextRecord = captureRecord(name.toString, nb)
          else skipRecord(name.toString, nb)
        } else if (nb == '<') reprocess = nb
      }
    }
  }

  private def nextMirrored(out: java.io.ByteArrayOutputStream): Int = {
    val b = nextByte()
    if (out != null && b >= 0) out.write(b)
    b
  }

  /** After "<!" has been consumed: swallow a comment (`<!-- … -->`) or
    * CDATA section (`<![CDATA[ … ]]>`) so their content is never
    * mistaken for record start/close tags. Bytes are mirrored to `out`
    * when capturing (the StAX parser handles them fine — they just must
    * not drive this scanner's tag matching). Any other `<!` markup
    * (DOCTYPE — absent from mzML) falls back to plain scanning after
    * the disambiguating byte. EOF inside a section throws: the section
    * started inside this split's bytes, so its end must be present. */
  private def skipBangMarkup(out: java.io.ByteArrayOutputStream): Unit = {
    val d0 = nextMirrored(out)
    if (d0 == '-') {
      if (nextMirrored(out) != '-') return // not a comment after all
      var dashes = 0
      while (true) {
        val c = nextMirrored(out)
        if (c < 0) throw new java.io.EOFException("unterminated XML comment")
        if (c == '-') dashes += 1
        else if (c == '>' && dashes >= 2) return
        else dashes = 0
      }
    } else if (d0 == '[') {
      val tag = "CDATA["
      var i = 0
      while (i < tag.length) {
        if (nextMirrored(out) != tag.charAt(i)) return // not CDATA
        i += 1
      }
      var brackets = 0
      while (true) {
        val c = nextMirrored(out)
        if (c < 0) throw new java.io.EOFException("unterminated CDATA section")
        if (c == ']') brackets += 1
        else if (c == '>' && brackets >= 2) return
        else brackets = 0
      }
    } // other `<!` markup: resume the caller's scan
  }

  /** Consume one record starting after `<name` with terminator `first`;
    * return its full bytes when capturing, null when skipping. */
  private def consumeRecord(name: String, first: Int, capture: Boolean): Array[Byte] = {
    val out = if (capture) new java.io.ByteArrayOutputStream(4096) else null
    if (capture) {
      out.write('<')
      var i = 0
      while (i < name.length) { out.write(name.charAt(i)); i += 1 }
      out.write(first)
    }
    // phase 1: rest of the start tag (quote-aware; '>' may appear inside
    // attribute values)
    var b = first
    var quote = 0 // 0 = outside quotes, else the active quote char
    var prev = -1
    while (!(quote == 0 && b == '>')) {
      prev = if (quote == 0) b else -1
      b = nextByte()
      if (b < 0) throw new java.io.EOFException(s"unterminated <$name> start tag")
      if (capture) out.write(b)
      if (quote == 0 && (b == '"' || b == '\'')) quote = b
      else if (quote != 0 && b == quote) quote = 0
    }
    if (prev == '/') return if (capture) out.toByteArray else null // self-closing
    // phase 2: content until the matching close tag </name [ws] >
    val close = ("</" + name).getBytes("US-ASCII")
    var m = 0 // matched prefix length of `close`
    var closed = false
    while (!closed) {
      b = nextByte()
      if (b < 0) throw new java.io.EOFException(s"unterminated <$name> element")
      if (capture) out.write(b)
      if (m == close.length) {
        // after `</name`: optional whitespace then '>'
        if (b == '>') closed = true
        else if (!(b == ' ' || b == '\t' || b == '\n' || b == '\r')) m = if (b == '<') 1 else 0
      } else if (b == close(m)) m += 1
      else if (m == 1 && b == '!') { skipBangMarkup(if (capture) out else null); m = 0 }
      else m = if (b == '<') 1 else 0
    }
    if (capture) out.toByteArray else null
  }

  private def captureRecord(name: String, first: Int): Array[Byte] =
    consumeRecord(name, first, capture = true)

  private def skipRecord(name: String, first: Int): Unit = {
    consumeRecord(name, first, capture = false); ()
  }

  override def hasNext: Boolean = nextRecord != null
  override def next(): Array[Byte] = {
    val r = nextRecord
    advance()
    r
  }
}

object XmlRecordSlicer {
  /** One well-formed XML stream over this split's owned records: a
    * synthetic root wrapping the lazily-pulled record slices, so a
    * single streaming parser can run over a mid-file byte range. */
  def asDocumentStream(in: InputStream, splitStart: Long, splitEnd: Long,
                       recordNames: Set[String]): InputStream = {
    val slicer = new XmlRecordSlicer(in, splitStart, splitEnd, recordNames)
    def bais(s: Array[Byte]) = new java.io.ByteArrayInputStream(s)
    val streams = new java.util.Enumeration[InputStream] {
      private var sentOpen = false
      private var sentClose = false
      override def hasMoreElements: Boolean = !sentClose
      override def nextElement(): InputStream =
        if (!sentOpen) { sentOpen = true; bais("<splitRoot>".getBytes("US-ASCII")) }
        else if (slicer.hasNext) bais(slicer.next())
        else { sentClose = true; bais("</splitRoot>".getBytes("US-ASCII")) }
    }
    new java.io.SequenceInputStream(streams)
  }
}
