package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._

import graft.sources.core.{GraftFormat, GraftSplit}

/** WARC (Web ARChive, ISO 28500) — the container every web-crawl corpus
  * ships in (Common Crawl et al.), and therefore the ingest format a
  * training-data pipeline meets first. Beyond the reference's inventory
  * (exon-duckdb is bio-only); included because the documents-pipeline
  * operators (§ north-star) start from exactly this modality.
  *
  * Record grammar (public spec, ISO 28500 / WARC 1.0-1.1):
  *   version line `WARC/1.x` CRLF, header lines `Name: value` CRLF,
  *   blank CRLF, then exactly Content-Length block bytes, then CRLF CRLF.
  *
  * Splittable on uncompressed files: a ranged task resyncs to the next
  * `WARC/1.` marker and validates the ENTIRE header block (bounded line
  * count/size, a numeric Content-Length, a WARC-Type) before believing
  * it — a marker inside a payload (a crawl of a WARC file) almost never
  * carries a parseable header block immediately behind it, the same
  * validated-guess level as the BAM record-start guesser. Ownership is
  * the FASTA convention: a task owns records whose first byte is in
  * (start, end]; the task before reads its last record past its end.
  *
  * `.warc.gz` (one gzip member per record, the Common Crawl layout)
  * reads through the multi-member gzip path as one stream —
  * single-task per file, the standard Hadoop WARC trade; shard count,
  * not intra-file splitting, is the parallelism lever there (Common
  * Crawl ships ~1 GB shards for exactly this reason).
  *
  * HTTP response/request payloads are unwrapped when their block starts
  * with `HTTP/`: `http_status`, `http_content_type` surface from the
  * message head and `body` is the bytes AFTER the header terminator;
  * for any other block `body` is the raw block and the http columns are
  * null. Column-needs pruning is real work avoidance: a count or a
  * header-only profile skips block materialization entirely.
  */
object WarcFormat extends GraftFormat {
  override def name = "warc"
  override def extensions = Seq("warc")
  override def splittable = true
  // binary frames can't resync through BGZF virtual offsets (and the
  // ecosystem ships per-record-member .warc.gz, not bgzf)
  override def bgzfSplittable = false

  override def schema(paths: Seq[Path], conf: Configuration, options: Map[String, String]): StructType =
    StructType(Seq(
      StructField("record_id", StringType),
      StructField("record_type", StringType),
      StructField("target_uri", StringType),
      StructField("date", StringType),
      StructField("content_type", StringType),
      StructField("content_length", LongType),
      StructField("http_status", IntegerType),
      StructField("http_content_type", StringType),
      StructField("body", BinaryType),
      StructField("headers", MapType(StringType, StringType))))

  private val Marker = "WARC/1.".getBytes("US-ASCII")
  private val MaxHeaderLine = 32 * 1024
  private val MaxHeaderLines = 256
  private val ValidateCap = 64 * 1024

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    // mark-limit covers one full header block during resync validation
    val bin = new BufferedInputStream(in, 256 * 1024)
    val cur = new Cursor(bin, split.start)

    val needBlock = split.needs("body") || split.needs("http_status") ||
      split.needs("http_content_type")

    new Iterator[Array[Any]] {
      private var nextRow: Array[Any] = _
      private var done = false
      if (split.start != 0) resync()
      advance()

      /** Scan to the first marker at a position STRICTLY after
        * split.start whose header block validates. */
      private def resync(): Unit = {
        var matched = 0
        var candidateAt = -1L
        while (candidateAt < 0) {
          val b = cur.read()
          if (b < 0) return
          if (b == Marker(matched)) {
            matched += 1
            if (matched == Marker.length) {
              val at = cur.pos - Marker.length
              matched = 0
              // a record starting exactly AT split.start belongs to the
              // previous task (it reads past its end) — skip, keep going
              if (at > split.start) {
                bin.mark(ValidateCap + MaxHeaderLine)
                val posBefore = cur.pos
                if (validatesAsHeaderBlock(posBefore)) candidateAt = at
                bin.reset()
                cur.pos = posBefore
                if (candidateAt >= 0) cur.markerConsumed = true
              }
            }
          } else matched = if (b == Marker(0)) 1 else 0
        }
      }

      /** After the marker: rest of version line + full header block must
        * parse within bounds, with numeric Content-Length and WARC-Type.
        * Total validated bytes are capped below the mark limit so the
        * reset() after a rejected candidate can never fail. */
      private def validatesAsHeaderBlock(posBefore: Long): Boolean =
        try {
          val rest = cur.lineTo(MaxHeaderLine)
          if (rest.isEmpty || rest.length > 2 || !rest.forall(_.isDigit)) return false
          var sawLen = false; var sawType = false
          var n = 0
          var line = cur.lineTo(MaxHeaderLine)
          while (line.nonEmpty) {
            n += 1
            if (n > MaxHeaderLines || cur.pos - posBefore > ValidateCap) return false
            val colon = line.indexOf(':')
            if (colon <= 0) return false
            val nm = line.substring(0, colon).trim
            if (nm.exists(c => c <= ' ')) return false
            if (nm.equalsIgnoreCase("Content-Length") &&
              line.substring(colon + 1).trim.forall(_.isDigit)) sawLen = true
            if (nm.equalsIgnoreCase("WARC-Type")) sawType = true
            line = cur.lineTo(MaxHeaderLine)
          }
          sawLen && sawType
        } catch { case _: EOFException => false }

      private def advance(): Unit = {
        nextRow = null
        if (done) return
        val recordStart = if (cur.markerConsumed) cur.pos - Marker.length else cur.pos
        if (recordStart > split.end) { done = true; return }
        // version line (marker may already be consumed by resync)
        if (!cur.markerConsumed) {
          val first = cur.read()
          if (first < 0) { done = true; return }
          var matched = if (first == Marker(0)) 1 else 0
          if (matched == 0)
            throw new java.io.IOException(
              s"malformed WARC at byte $recordStart of ${split.path}: expected record marker")
          while (matched < Marker.length) {
            val b = cur.read()
            if (b != Marker(matched))
              throw new java.io.IOException(
                s"malformed WARC at byte $recordStart of ${split.path}: expected record marker")
            matched += 1
          }
        }
        cur.markerConsumed = false
        cur.lineTo(MaxHeaderLine): Unit // version digits
        val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var line = cur.lineTo(MaxHeaderLine)
        var n = 0
        while (line.nonEmpty) {
          n += 1
          require(n <= MaxHeaderLines, s"WARC header block exceeds $MaxHeaderLines lines")
          val colon = line.indexOf(':')
          require(colon > 0, s"malformed WARC header '$line' in ${split.path}")
          headers(line.substring(0, colon).trim) = line.substring(colon + 1).trim
          line = cur.lineTo(MaxHeaderLine)
        }
        def h(name: String): String =
          headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }.orNull
        val clen = Option(h("Content-Length")).map(_.toLong).getOrElse(
          throw new java.io.IOException(s"WARC record without Content-Length in ${split.path}"))

        var status: Integer = null
        var httpCt: String = null
        var body: Array[Byte] = null
        if (needBlock) {
          val block = cur.bytes(clen)
          if (block.length >= 5 && block.startsWith("HTTP/".getBytes("US-ASCII"))) {
            val headEnd = indexOfDoubleCrlf(block)
            val head = new String(block, 0, if (headEnd < 0) block.length else headEnd, "ISO-8859-1")
            val lines = head.split("\r\n")
            val statusParts = lines.head.split(" ")
            if (statusParts.length >= 2 && statusParts(1).forall(_.isDigit))
              status = statusParts(1).toInt
            httpCt = lines.tail.collectFirst {
              case l if l.toLowerCase.startsWith("content-type:") =>
                l.substring(l.indexOf(':') + 1).trim
            }.orNull
            body = if (headEnd < 0) Array.emptyByteArray
              else java.util.Arrays.copyOfRange(block, headEnd + 4, block.length)
          } else body = block
        } else cur.skip(clen)
        // record terminator CRLF CRLF (tolerate EOF at file end)
        cur.consumeTerminator()

        nextRow = Array[Any](
          P.s(h("WARC-Record-ID")), P.s(h("WARC-Type")), P.s(h("WARC-Target-URI")),
          P.s(h("WARC-Date")), P.s(h("Content-Type")), clen,
          status, P.s(httpCt), body,
          ArrayBasedMapData(headers.keys.map(P.s).toArray[Any],
            headers.values.map(P.s).toArray[Any]))
      }

      override def hasNext: Boolean = nextRow != null
      override def next(): Array[Any] = {
        val r = nextRow
        advance()
        r
      }
    }
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Forward byte reader with absolute-position tracking over the
    * (already split-seeked) stream. */
  private final class Cursor(in: BufferedInputStream, startPos: Long) {
    var pos: Long = startPos
    /** resync validated a candidate: the marker bytes are consumed but
      * belong to the CURRENT record, whose start is pos - marker.len. */
    var markerConsumed: Boolean = false

    def read(): Int = {
      val b = in.read()
      if (b >= 0) pos += 1
      b
    }

    /** One CRLF-terminated line (LF tolerated); EOFException on EOF
      * before any terminator. */
    def lineTo(max: Int): String = {
      val sb = new java.lang.StringBuilder(64)
      var b = read()
      if (b < 0) throw new EOFException(s"EOF inside WARC header")
      while (b >= 0 && b != '\n') {
        if (b != '\r') sb.append(b.toChar)
        if (sb.length > max) throw new java.io.IOException("WARC header line too long")
        b = read()
      }
      sb.toString
    }

    def bytes(n: Long): Array[Byte] = {
      require(n <= Int.MaxValue, s"WARC block of $n bytes exceeds the 2 GB row limit")
      val out = new Array[Byte](n.toInt)
      var got = 0
      while (got < n) {
        val r = in.read(out, got, n.toInt - got)
        if (r < 0) throw new EOFException(
          s"EOF inside WARC block ($got of $n bytes)")
        got += r
      }
      pos += n
      out
    }

    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val r = in.skip(left)
        if (r <= 0) {
          if (in.read() < 0) throw new EOFException(
            s"EOF inside WARC block (${n - left} of $n bytes)")
          left -= 1
        } else left -= r
      }
      pos += n
    }

    /** The inter-record CRLF CRLF; EOF is a legal end after a complete
      * record, anything else is corruption worth failing on. */
    def consumeTerminator(): Unit = {
      var i = 0
      while (i < 4) {
        val b = read()
        if (b < 0) {
          if (i == 0) return // clean EOF at record boundary
          throw new EOFException("EOF inside WARC record terminator")
        }
        val want = if (i % 2 == 0) '\r' else '\n'
        if (b != want)
          throw new java.io.IOException(s"malformed WARC record terminator (byte $b at $i)")
        i += 1
      }
    }
  }
}
