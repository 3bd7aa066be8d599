package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** UCSC .2bit packed genomes (the format hg38.2bit ships in; spec at
  * genome.ucsc.edu/FAQ/FAQformat.html#format7): a 16-byte header
  * (signature 0x1A412743, version 0, sequence count), a name→offset
  * index, then per-sequence records — dnaSize, N-run blocks, mask
  * (soft-repeat lowercase) blocks, and DNA packed 2 bits/base
  * (T=0 C=1 A=2 G=3, first base in the high bits).
  *
  * The scale surface mirrors [[Faidx]]: `index()` loads only the
  * header + index + per-record block tables (kilobytes for a genome),
  * and `fetch()` seeks straight to `packedOffset + (base-1)/4` and
  * reads ceil(span/4)+1 bytes — so a million loci against a 800 MB
  * .2bit is a distributed point-read workload. Both byte orders are
  * handled (the signature read detects a byte-swapped file).
  */
object TwoBit {

  private val Sig = 0x1A412743

  /** Block lists are 0-based (start, size), the file's own encoding. */
  final case class Entry(name: String, dnaSize: Long, packedOffset: Long,
                         nBlocks: Array[(Long, Long)],
                         maskBlocks: Array[(Long, Long)]) extends Serializable

  private final class Reader(in: org.apache.hadoop.fs.FSDataInputStream,
                             swapped: Boolean) {
    def u32(): Long = {
      val v = in.readInt()
      val x = if (swapped) Integer.reverseBytes(v) else v
      x.toLong & 0xffffffffL
    }
    def u8(): Int = in.readUnsignedByte()
    def bytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); in.readFully(b); b
    }
  }

  /** Parse header + index + every record's block tables (no DNA bytes
    * are read). Driver-side, once per file; the result broadcasts. */
  def index(path: String, conf: Configuration): Seq[Entry] = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      val sigRaw = in.readInt()
      val swapped =
        if (sigRaw == Sig) false
        else if (Integer.reverseBytes(sigRaw) == Sig) true
        else throw new IllegalArgumentException(
          f"$path%s is not a 2bit file (signature 0x$sigRaw%08x)")
      val r = new Reader(in, swapped)
      val version = r.u32()
      require(version == 0, s"$path: unsupported 2bit version $version")
      val count = r.u32()
      require(count <= Int.MaxValue, s"$path: implausible sequence count $count")
      r.u32() // reserved
      val idx = (0 until count.toInt).map { _ =>
        val nameSize = r.u8()
        val name = new String(r.bytes(nameSize), "US-ASCII")
        (name, r.u32())
      }
      idx.map { case (name, off) =>
        in.seek(off)
        val dnaSize = r.u32()
        def blocks(): Array[(Long, Long)] = {
          val n = r.u32()
          require(n <= dnaSize, s"$path: implausible block count $n in '$name'")
          val starts = Array.fill(n.toInt)(r.u32())
          val sizes = Array.fill(n.toInt)(r.u32())
          starts.zip(sizes)
        }
        val nb = blocks()
        val mb = blocks()
        r.u32() // reserved
        Entry(name, dnaSize, in.getPos, nb, mb)
      }
    } finally in.close()
  }

  /** Fetch bases lo1..hi1 (1-based inclusive, caller-clamped) of one
    * sequence: one seek + one ceil(span/4)-byte read, then N-run and
    * (optionally) mask overlays. */
  def fetch(path: String, conf: Configuration, e: Entry, lo1: Long, hi1: Long,
            applyMask: Boolean = true): String = {
    require(lo1 >= 1 && hi1 <= e.dnaSize && lo1 <= hi1,
      s"2bit fetch: bad range $lo1-$hi1 for '${e.name}' (size ${e.dnaSize})")
    // One region = one row = one in-memory string; refuse >2 GiB spans
    // with a message instead of a NegativeArraySizeException (the same
    // guard as Faidx.fetch).
    require(hi1 - lo1 < Int.MaxValue.toLong,
      s"2bit fetch: region $lo1-$hi1 of '${e.name}' spans over 2 GiB — " +
        "fetch smaller windows instead of one giant row")
    val first = lo1 - 1; val last = hi1 - 1
    val startByte = e.packedOffset + first / 4
    val endByte = e.packedOffset + last / 4
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    val buf =
      try {
        in.seek(startByte)
        val b = new Array[Byte]((endByte - startByte + 1).toInt)
        in.readFully(b)
        b
      } finally in.close()
    val out = new Array[Char]((last - first + 1).toInt)
    val bases = "TCAG"
    var pos = first
    while (pos <= last) {
      val b = buf((pos / 4 - first / 4).toInt)
      out((pos - first).toInt) = bases(((b >> (6 - 2 * (pos % 4))) & 3).toInt)
      pos += 1
    }
    def overlay(blks: Array[(Long, Long)])(f: (Int, Char) => Char): Unit =
      blks.foreach { case (s0, sz) =>
        var i = math.max(s0, first); val end = math.min(s0 + sz - 1, last)
        while (i <= end) { val k = (i - first).toInt; out(k) = f(k, out(k)); i += 1 }
      }
    overlay(e.nBlocks)((_, _) => 'N')
    if (applyMask) overlay(e.maskBlocks)((_, c) => c.toLower)
    new String(out)
  }

  /** Write sequences as a version-0 little-endian .2bit: N runs become
    * nBlocks (any of 'Nn'), lowercase runs become maskBlocks, N bases
    * pack as code 0. Driver-side fixture/export writer — the read path
    * is the scale surface. */
  def write(seqs: Seq[(String, String)], path: String, conf: Configuration): Unit = {
    require(seqs.nonEmpty, "2bit write: no sequences")
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def runs(s: String, in: Char => Boolean): Seq[(Long, Long)] = {
      val acc = Seq.newBuilder[(Long, Long)]
      var i = 0
      while (i < s.length) {
        if (in(s(i))) {
          val st = i
          while (i < s.length && in(s(i))) i += 1
          acc += ((st.toLong, (i - st).toLong))
        } else i += 1
      }
      acc.result()
    }
    // record images first (offsets needed in the index)
    val records = seqs.map { case (name, seq) =>
      val rb = new java.io.ByteArrayOutputStream()
      def ru32(v: Long): Unit = {
        rb.write((v & 0xff).toInt); rb.write(((v >> 8) & 0xff).toInt)
        rb.write(((v >> 16) & 0xff).toInt); rb.write(((v >> 24) & 0xff).toInt)
      }
      ru32(seq.length.toLong)
      val nb = runs(seq, c => c == 'N' || c == 'n')
      val mb = runs(seq, _.isLower)
      ru32(nb.size.toLong); nb.foreach(b => ru32(b._1)); nb.foreach(b => ru32(b._2))
      ru32(mb.size.toLong); mb.foreach(b => ru32(b._1)); mb.foreach(b => ru32(b._2))
      ru32(0L)
      var i = 0
      while (i < seq.length) {
        var byte = 0
        var k = 0
        while (k < 4 && i + k < seq.length) {
          val code = seq(i + k).toUpper match {
            case 'T' => 0; case 'C' => 1; case 'A' => 2; case 'G' => 3
            case 'N' => 0
            case other => throw new IllegalArgumentException(
              s"2bit write: base '$other' in '$name' is not in [ACGTNacgtn]")
          }
          byte |= code << (6 - 2 * k)
          k += 1
        }
        rb.write(byte)
        i += 4
      }
      (name, rb.toByteArray)
    }
    u32(Sig.toLong); u32(0L); u32(seqs.size.toLong); u32(0L)
    val indexSize = records.map { case (n, _) => 1 + n.length + 4 }.sum
    var offset = 16L + indexSize
    records.foreach { case (name, img) =>
      require(name.length <= 255, s"2bit write: name '$name' over 255 bytes")
      bb.write(name.length)
      bb.write(name.getBytes("US-ASCII"))
      u32(offset)
      offset += img.length
    }
    records.foreach { case (_, img) => bb.write(img) }
    try { out.write(bb.toByteArray) } finally out.close()
  }
}
