package graft.sources.core

import java.io.InputStream
import java.util.zip.Inflater

/** BGZF: concatenated gzip members, each with a BSIZE extra field giving
  * the compressed block length, enabling random access via virtual file
  * offsets voff = (compressedBlockOffset << 16) | offsetInUncompressedBlock
  * (the htslib/tabix addressing scheme).
  */
object Bgzf {

  /** Reads one BGZF block at the stream's current position.
    * Returns (compressedLength, uncompressedBytes) or null at EOF. */
  def readBlock(in: InputStream): (Int, Array[Byte]) = {
    val header = new Array[Byte](12)
    var got = 0
    while (got < 12) {
      val n = in.read(header, got, 12 - got)
      if (n < 0) {
        if (got == 0) return null
        throw new java.io.EOFException("truncated BGZF header")
      }
      got += n
    }
    require((header(0) & 0xff) == 0x1f && (header(1) & 0xff) == 0x8b, "not a gzip member")
    val xlen = (header(10) & 0xff) | ((header(11) & 0xff) << 8)
    val extra = readFully(in, xlen)
    // find BSIZE subfield (SI1=66, SI2=67)
    var bsize = -1
    var i = 0
    while (i + 4 <= xlen) {
      val si1 = extra(i) & 0xff
      val si2 = extra(i + 1) & 0xff
      val slen = (extra(i + 2) & 0xff) | ((extra(i + 3) & 0xff) << 8)
      if (si1 == 66 && si2 == 67 && slen == 2)
        bsize = ((extra(i + 4) & 0xff) | ((extra(i + 5) & 0xff) << 8)) + 1
      i += 4 + slen
    }
    require(bsize > 0, "gzip member without BGZF BSIZE field")
    val cdataLen = bsize - 12 - xlen - 8
    val cdata = readFully(in, cdataLen)
    val trailer = readFully(in, 8)
    val isize = (trailer(4) & 0xff) | ((trailer(5) & 0xff) << 8) |
      ((trailer(6) & 0xff) << 16) | ((trailer(7) & 0xff) << 24)
    val out = new Array[Byte](isize)
    if (isize > 0) {
      val inf = new Inflater(true)
      inf.setInput(cdata)
      var off = 0
      while (off < isize && !inf.finished()) off += inf.inflate(out, off, isize - off)
      inf.end()
      require(off == isize, s"BGZF block inflated $off of $isize bytes")
    }
    (bsize, out)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var got = 0
    while (got < n) {
      val r = in.read(buf, got, n - got)
      if (r < 0) throw new java.io.EOFException("truncated BGZF block")
      got += r
    }
    buf
  }

  /** Fully decompress a BGZF byte array (for small payloads like .tbi). */
  def inflateAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.io.ByteArrayInputStream(bytes)
    val out = new java.io.ByteArrayOutputStream()
    var block = readBlock(in)
    while (block != null) {
      out.write(block._2)
      block = readBlock(in)
    }
    out.toByteArray
  }
}

/** An InputStream over the BGZF-decompressed bytes of [startVoff,
  * endVoff): seeks the raw stream to the start block, skips into it, and
  * reports EOF once the virtual offset passes endVoff. This is what lets
  * an executor read ONLY the blocks its index chunk covers — the I/O
  * shape that makes indexed region queries sublinear at 100 TB.
  */
final class BgzfRangeStream(raw: FSDataStream, startVoff: Long, endVoff: Long)
    extends InputStream {

  private var blockCoff: Long = startVoff >>> 16
  private var block: Array[Byte] = _
  private var pos: Int = 0
  private var nextCoff: Long = blockCoff
  private var eof = false

  { // position + first block + intra-block skip
    raw.seek(blockCoff)
    loadBlock()
    pos = (startVoff & 0xffff).toInt
    if (block != null && pos > block.length) pos = block.length
  }

  private def loadBlock(): Unit = {
    blockCoff = nextCoff
    if (blockCoff >= (endVoff >>> 16) && (endVoff & 0xffff) == 0) { eof = true; block = null; return }
    Bgzf.readBlock(raw.stream) match {
      case null => eof = true; block = null
      case (clen, data) =>
        nextCoff = blockCoff + clen
        block = data
        pos = 0
        if (data.length == 0) loadBlock() // EOF marker block
    }
  }

  private def currentVoff: Long = (blockCoff << 16) | pos.toLong

  override def read(): Int = {
    if (eof || currentVoff >= endVoff) return -1
    if (block == null || pos >= block.length) {
      loadBlock()
      if (eof || block == null) return -1
      if (currentVoff >= endVoff) return -1
    }
    val b = block(pos) & 0xff
    pos += 1
    b
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (eof || currentVoff >= endVoff) return -1
    if (block == null || pos >= block.length) {
      loadBlock()
      if (eof || block == null) return -1
    }
    val limit =
      if ((endVoff >>> 16) == blockCoff) math.min(block.length, (endVoff & 0xffff).toInt)
      else block.length
    if (pos >= limit) return -1
    val n = math.min(len, limit - pos)
    System.arraycopy(block, pos, b, off, n)
    pos += n
    n
  }

  override def close(): Unit = raw.in.close()
}
