package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.core.{Bgzf, GraftFiles}

/** Tabix (.tbi) index decoding + region-to-chunk resolution — the
  * reference's indexed-region fast path (rust vcf_query via noodles
  * tabix; SURVEY.md §3.3), reimplemented from the published htslib
  * format: BGZF payload, magic "TBI\1", R-tree bins (reg2bin scheme,
  * 16 kb leaves) with chunk lists of virtual offsets plus a 16 kb
  * linear index for lower-bound pruning.
  */
object TabixIndex {

  final case class Chunk(beg: Long, end: Long)
  final case class RefIndex(bins: Map[Int, Seq[Chunk]], linear: Array[Long])
  final case class Index(names: IndexedSeq[String], refs: IndexedSeq[RefIndex]) {

    /** Merged chunk ranges overlapping [beg0, end0) on `seq`. */
    def query(seq: String, beg0: Long, end0: Long): Seq[Chunk] = {
      val rid = names.indexOf(seq)
      if (rid < 0) return Seq.empty
      val ref = refs(rid)
      val minVoff = {
        val w = (beg0 >> 14).toInt
        if (ref.linear.isEmpty) 0L
        else ref.linear(math.min(math.max(w, 0), ref.linear.length - 1))
      }
      val chunks = reg2bins(beg0, end0).flatMap(ref.bins.get).flatten
        .filter(_.end > minVoff)
        .sortBy(_.beg)
      // merge adjacent/overlapping ranges so each becomes one partition
      val merged = scala.collection.mutable.ArrayBuffer.empty[Chunk]
      chunks.foreach { c =>
        if (merged.nonEmpty && c.beg <= merged.last.end)
          merged(merged.length - 1) = Chunk(merged.last.beg, math.max(merged.last.end, c.end))
        else merged += c
      }
      merged.toSeq
    }
  }

  /** Standard UCSC binning: bins overlapping [beg, end), 0-based. */
  def reg2bins(beg: Long, end0: Long): Seq[Int] = {
    val end = end0 - 1
    val out = scala.collection.mutable.ArrayBuffer[Int](0)
    out ++= ((1 + (beg >> 26)).toInt to (1 + (end >> 26)).toInt)
    out ++= ((9 + (beg >> 23)).toInt to (9 + (end >> 23)).toInt)
    out ++= ((73 + (beg >> 20)).toInt to (73 + (end >> 20)).toInt)
    out ++= ((585 + (beg >> 17)).toInt to (585 + (end >> 17)).toInt)
    out ++= ((4681 + (beg >> 14)).toInt to (4681 + (end >> 14)).toInt)
    out.toSeq
  }

  def reg2bin(beg: Long, end0: Long): Int = {
    val end = end0 - 1
    if (beg >> 14 == end >> 14) (4681 + (beg >> 14)).toInt
    else if (beg >> 17 == end >> 17) (585 + (beg >> 17)).toInt
    else if (beg >> 20 == end >> 20) (73 + (beg >> 20)).toInt
    else if (beg >> 23 == end >> 23) (9 + (beg >> 23)).toInt
    else if (beg >> 26 == end >> 26) (1 + (beg >> 26)).toInt
    else 0
  }

  /** Load `<path>.tbi` if present. */
  def load(dataPath: String, conf: Configuration): Option[Index] = {
    val p = new Path(dataPath + ".tbi")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val compressed =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](1 << 16)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
    val bb = ByteBuffer.wrap(Bgzf.inflateAll(compressed)).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'T' && bb.get() == 'B' && bb.get() == 'I' && bb.get() == 1,
      s"bad tabix magic in $p")
    val nRef = bb.getInt
    bb.getInt; bb.getInt; bb.getInt; bb.getInt; bb.getInt; bb.getInt // format..skip
    val lNm = bb.getInt
    val nameBytes = new Array[Byte](lNm)
    bb.get(nameBytes)
    val names = new String(nameBytes, StandardCharsets.UTF_8)
      .split('\u0000').toIndexedSeq.filter(_.nonEmpty) // NUL-separated
    val refs = (0 until nRef).map { _ =>
      val nBin = bb.getInt
      val bins = (0 until nBin).map { _ =>
        val bin = bb.getInt
        val nChunk = bb.getInt
        bin -> (0 until nChunk).map(_ => Chunk(bb.getLong, bb.getLong))
      }.toMap
      val nIntv = bb.getInt
      val linear = Array.fill(nIntv)(bb.getLong)
      RefIndex(bins, linear)
    }
    Some(Index(names, refs))
  }
}
