package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** FASTA .fai indexing — samtools-faidx semantics from the published
  * format: one line per sequence,
  * `name<TAB>length<TAB>offset<TAB>linebases<TAB>linewidth`, where
  * `offset` is the BYTE offset of the first sequence base and the two
  * line numbers describe the (required-uniform) wrapping, letting a
  * reader seek straight to any 1-based base range:
  *
  *   byteOf(pos) = offset + (pos-1) / linebases * linewidth
  *                        + (pos-1) % linebases
  *
  * `build` makes the index in one streamed pass (and refuses
  * non-uniform interior line lengths — an index over ragged wrapping
  * would silently return wrong bases); `fetch` reads exactly the bytes
  * a region needs. Compressed FASTA is rejected: gzip members are not
  * seekable (bgzf+.gzi is the standard answer; documented gap).
  */
object Faidx {

  final case class Entry(name: String, length: Long, offset: Long,
                         linebases: Int, linewidth: Int)

  private def isBgzfPath(path: String): Boolean =
    path.toLowerCase.endsWith(".gz")

  /** Build `path`.fai by streaming the FASTA once. Plain files record
    * raw byte offsets; `.gz` files must be BGZF — offsets are then in
    * UNCOMPRESSED space and a `.gzi` block index ([[core.Gzi]], built
    * here when absent) translates them to seekable positions, exactly
    * samtools' `faidx` on bgzipped references. Plain-gzip is refused:
    * one giant member cannot be entered mid-stream. Returns the
    * entries; also writes the sidecar(s). */
  def build(path: String, conf: Configuration): Seq[Entry] = {
    require(!path.toLowerCase.endsWith(".zst"),
      s"faidx: '$path' is zstd — .fai needs raw or BGZF FASTA")
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (isBgzfPath(path)) {
      // bgzf: verify block framing (plain gzip is not seekable) and
      // make sure the .gzi translation table exists
      val head = new Array[Byte](18)
      val probe = fs.open(p)
      try probe.readFully(head) finally probe.close()
      require(core.Bgzf.headerBsize(head, 0, 18) > 0,
        s"faidx: '$path' is gzip but not BGZF — cannot seek; re-compress with bgzf")
      if (core.Gzi.load(path, conf).isEmpty) core.Gzi.build(path, conf)
    }
    val raw: java.io.InputStream =
      if (isBgzfPath(path)) core.Compression.wrap(fs.open(p), "gzip")
      else fs.open(p)
    val in = new java.io.BufferedInputStream(raw, 1 << 16)
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    try {
      var pos = 0L
      var cur: String = null
      var curOffset = 0L
      var curLen = 0L
      var linebases = 0
      var linewidth = 0
      var lastLineLen = -1 // -1 = no sequence line seen yet
      def flush(): Unit = if (cur != null) {
        entries += Entry(cur, curLen, curOffset,
          if (linebases == 0) 1 else linebases,
          if (linewidth == 0) 2 else linewidth)
        cur = null
      }
      val line = new java.lang.StringBuilder()
      var c = in.read()
      while (c >= 0) {
        line.setLength(0)
        val lineStart = pos
        while (c >= 0 && c != '\n') { line.append(c.toChar); pos += 1; c = in.read() }
        if (c == '\n') { pos += 1; c = in.read() }
        val text = line.toString.stripSuffix("\r")
        if (text.startsWith(">")) {
          flush()
          cur = text.drop(1).takeWhile(!_.isWhitespace)
          require(cur.nonEmpty, s"faidx: empty sequence name in $path")
          curOffset = pos
          curLen = 0; linebases = 0; linewidth = 0; lastLineLen = -1
        } else if (cur != null && text.nonEmpty) {
          require(lastLineLen == -1 || lastLineLen == linebases,
            s"faidx: non-uniform line lengths in '$cur' ($path) — " +
              "an index over ragged wrapping would return wrong bases")
          if (linebases == 0) {
            linebases = text.length
            linewidth = (pos - lineStart).toInt
          }
          // A line LONGER than the wrap width is invalid even in final
          // position (samtools faidx rejects it): byteOf() would
          // miscompute every offset past it and fetch would return
          // shifted bases. The uniform-width require above only catches
          // the previous line being short, not this line being long.
          require(text.length <= linebases,
            s"faidx: line longer than wrap width ($linebases) in '$cur' ($path) — " +
              "an index over ragged wrapping would return wrong bases")
          lastLineLen = text.length
          curLen += text.length
        }
        // blank line inside a record: tolerated only at record end —
        // a following sequence line would break the uniform-width rule
        if (cur != null && text.isEmpty && curLen > 0) lastLineLen = 0
      }
      flush()
    } finally in.close()
    val fai = new Path(path + ".fai")
    val out = fs.create(fai, true)
    try out.write(entries.map(e =>
      s"${e.name}\t${e.length}\t${e.offset}\t${e.linebases}\t${e.linewidth}\n")
      .mkString.getBytes("UTF-8"))
    finally out.close()
    entries.toSeq
  }

  def load(path: String, conf: Configuration): Option[Seq[Entry]] = {
    val p = new Path(path + ".fai")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val text = new String(BinnedIndex.readAll(p, conf), "UTF-8")
      Some(text.linesIterator.filter(_.nonEmpty).map { l =>
        val c = l.split("\t")
        Entry(c(0), c(1).toLong, c(2).toLong, c(3).toInt, c(4).toInt)
      }.toSeq)
    } finally in.close()
  }

  /** Fetch bases [lo, hi] (1-based inclusive, clamped to the sequence)
    * by seeking to the region's first byte and reading only its span. */
  def fetch(path: String, conf: Configuration, e: Entry, lo1: Long, hi1: Long): String = {
    val lo = math.max(lo1, 1L)
    val hi = math.min(hi1, e.length)
    if (hi < lo) return ""
    def byteOf(pos1: Long): Long =
      e.offset + (pos1 - 1) / e.linebases * e.linewidth + (pos1 - 1) % e.linebases
    val from = byteOf(lo)
    val until = byteOf(hi) + 1
    // One region = one row = one in-memory array; a >2 GiB span would
    // overflow the Int cast below (and produce an unusable giant row
    // anyway) — refuse it with a message instead of NegativeArraySize.
    require(until - from <= Int.MaxValue,
      s"faidx fetch: region $lo-$hi of '${e.name}' spans ${until - from} bytes " +
        "(> 2 GiB) — fetch smaller windows instead of one giant row")
    val raw: Array[Byte] =
      if (isBgzfPath(path)) {
        val gzi = core.Gzi.load(path, conf).getOrElse(core.Gzi.build(path, conf))
        core.Gzi.readRange(path, conf, gzi, from, until)
      } else {
        val p = new Path(path)
        val in = p.getFileSystem(conf).open(p)
        try {
          in.seek(from)
          val buf = new Array[Byte]((until - from).toInt)
          in.readFully(buf)
          buf
        } finally in.close()
      }
    val sb = new java.lang.StringBuilder((hi - lo + 1).toInt)
    raw.foreach { b => if (b != '\n' && b != '\r') sb.append(b.toChar) }
    sb.toString
  }
}
