package graft.sources.core

import java.io.InputStream

/** Byte-offset-tracking line iterator implementing the Hadoop
  * LineRecordReader split protocol:
  *
  *  - a split [start, end) with start != 0 discards the first (possibly
  *    partial) line it sees;
  *  - lines whose start offset is <= end are produced (the straddling
  *    line at the boundary belongs to the earlier split; the later split
  *    discards it as its first line).
  *
  * This is what makes uncompressed line formats (GFF/GTF/BED/SAM/HMM)
  * readable with one task per ~128 MB instead of one per file — the
  * property that keeps a single 1 TB file from serializing a cluster.
  *
  * Offsets are in the raw (uncompressed) byte stream. Handles \n and
  * \r\n; tolerates a missing trailing newline.
  */
final class LineReader(in: InputStream, splitStart: Long, splitEnd: Long)
    extends Iterator[(Long, String)] {

  private val buf = new Array[Byte](1 << 16)
  private var bufLen = 0
  private var bufPos = 0
  /** Absolute offset of buf(bufPos). */
  private var pos: Long = splitStart
  private var nextLine: (Long, String) = _
  private var done = false
  /** per-line byte accumulator, decoded as UTF-8 once per line (a
    * per-byte toChar would mangle multi-byte sequences); declared before
    * the constructor statements below that already read lines. */
  private val lineBuf = new java.io.ByteArrayOutputStream(120)

  if (splitStart != 0) readLine() // discard partial first line
  advance()

  private def fill(): Boolean = {
    bufLen = in.read(buf)
    bufPos = 0
    bufLen > 0
  }

  /** Read one line starting at `pos`; null at EOF. */
  private def readLine(): String = {
    if (bufPos >= bufLen && !fill()) return null
    lineBuf.reset()
    var found = false
    while (!found) {
      if (bufPos >= bufLen && !fill()) {
        found = true // EOF terminates the final line
      } else {
        val b = buf(bufPos)
        bufPos += 1
        pos += 1
        if (b == '\n') found = true
        else if (b != '\r') lineBuf.write(b)
      }
    }
    lineBuf.toString("UTF-8")
  }

  private def advance(): Unit = {
    if (pos > splitEnd) { done = true; nextLine = null; return }
    val lineStart = pos
    val line = readLine()
    if (line == null) { done = true; nextLine = null }
    else nextLine = (lineStart, line)
  }

  override def hasNext: Boolean = !done
  override def next(): (Long, String) = {
    val r = nextLine
    advance()
    r
  }
}
