package graft.sources.core

import java.io.OutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** Tabix (.tbi) index construction — the write-side inverse of
  * [[graft.sources.TabixIndex]], from the published htslib format: the
  * classic (min_shift=14, depth=5) bin R-tree plus a 16 kb linear
  * index, BGZF-compressed on disk. Building while WRITING closes the
  * round trip the read side opened: a sink that emits coordinate-sorted
  * BGZF text can ship a sidecar index that this library's own region
  * readers — and stock htslib tooling — can query without scanning.
  *
  * One builder indexes ONE output file. Records must arrive
  * coordinate-sorted (references grouped, starts non-decreasing within
  * a reference) — the same precondition `tabix` the tool enforces — and
  * the builder throws on violation rather than emit an index that
  * silently drops records at query time.
  *
  * Scale note: the builder is O(1) amortized per record and its state
  * is bounded by bins-touched + 16 kb windows per reference, so it adds
  * nothing to the writer's shuffle or memory profile; at cluster scale
  * every part file gets its own sidecar index in the same task that
  * wrote it (index build is embarrassingly parallel, like the write).
  */
final class TabixIndexBuilder {
  import TabixIndexBuilder._

  private final class Ref(val name: String) {
    val bins = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[(Long, Long)]]
    // -1 = unset: voff 0 is a REAL offset (the file's first record), so
    // 0 cannot double as the sentinel — that exact confusion would give
    // window 0 a too-high lower bound and prune the first chunk away
    val linear = mutable.ArrayBuffer.empty[Long]
    var lastBeg = -1L
  }

  private val refs = mutable.ArrayBuffer.empty[Ref]
  private val refByName = mutable.HashMap.empty[String, Int]
  private var finished = false

  /** Register one record occupying [beg0, end0) (0-based half-open) on
    * `name`, stored at BGZF virtual offsets [voffBeg, voffEnd). */
  def add(name: String, beg0: Long, end0: Long, voffBeg: Long, voffEnd: Long): Unit = {
    require(!finished, "TabixIndexBuilder: add after finish")
    require(beg0 >= 0 && end0 > beg0,
      s"TabixIndexBuilder: bad interval [$beg0, $end0) on $name")
    require(end0 <= MaxPos,
      s"TabixIndexBuilder: $name:$end0 exceeds the classic tabix 2^29 limit (use CSI)")
    val ref = refByName.get(name) match {
      case Some(rid) =>
        require(rid == refs.length - 1,
          s"TabixIndexBuilder: input not sorted — reference '$name' reappears " +
            s"after '${refs.last.name}'")
        refs(rid)
      case None =>
        val r = new Ref(name)
        refByName += name -> refs.length
        refs += r
        r
    }
    require(beg0 >= ref.lastBeg,
      s"TabixIndexBuilder: input not sorted — $name:$beg0 after $name:${ref.lastBeg}")
    ref.lastBeg = beg0

    val bin = reg2bin(beg0, end0)
    ref.bins.getOrElseUpdate(bin, mutable.ArrayBuffer.empty) match {
      case chunks if chunks.nonEmpty && chunks.last._2 == voffBeg =>
        // adjacent records in the same bin coalesce into one chunk —
        // htslib's merge, which is what keeps chunk lists small
        chunks(chunks.length - 1) = (chunks.last._1, voffEnd)
      case chunks => chunks += ((voffBeg, voffEnd))
    }

    // linear index: smallest voff of any record overlapping each 16 kb
    // window. Sorted input means first write per window is the minimum.
    val wBeg = (beg0 >> LinearShift).toInt
    val wEnd = ((end0 - 1) >> LinearShift).toInt
    while (ref.linear.length <= wEnd) ref.linear += -1L
    var w = wBeg
    while (w <= wEnd) {
      if (ref.linear(w) == -1L) ref.linear(w) = voffBeg
      w += 1
    }
  }

  /** Serialize the .tbi (BGZF-wrapped) to `out` and close it.
    * `preset`/`colSeq`/`colBeg`/`colEnd`/`meta`/`skip` are the tabix
    * header's coordinate configuration — readers that parse the data
    * text themselves (htslib) need them; this library's own reader gets
    * coordinates from the format parser and ignores them. */
  def finish(out: OutputStream, preset: Int = 0, colSeq: Int = 1,
             colBeg: Int = 4, colEnd: Int = 5, meta: Char = '#',
             skip: Int = 0): Unit = {
    require(!finished, "TabixIndexBuilder: finish called twice")
    finished = true
    // forward-fill unset linear windows with the previous window's
    // offset (htslib's save-time fill): an empty window's lower bound
    // is wherever the previous window started — never 0, which would
    // defeat the prune for queries landing in coverage gaps
    refs.foreach { r =>
      var prev = 0L
      var i = 0
      while (i < r.linear.length) {
        if (r.linear(i) == -1L) r.linear(i) = prev else prev = r.linear(i)
        i += 1
      }
    }
    val names = refs.map(_.name)
    val nameBlob = names.map(_ + "\u0000").mkString.getBytes(StandardCharsets.UTF_8)
    val size = 36 + nameBlob.length + refs.map { r =>
      8 + r.bins.valuesIterator.map(c => 8 + 16 * c.length).sum + 8 * r.linear.length
    }.sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('T'.toByte).put('B'.toByte).put('I'.toByte).put(1.toByte)
    bb.putInt(refs.length)
    bb.putInt(preset).putInt(colSeq).putInt(colBeg).putInt(colEnd)
    bb.putInt(meta.toInt).putInt(skip)
    bb.putInt(nameBlob.length)
    bb.put(nameBlob)
    refs.foreach { r =>
      bb.putInt(r.bins.size)
      r.bins.foreach { case (bin, chunks) =>
        bb.putInt(bin)
        bb.putInt(chunks.length)
        chunks.foreach { case (b, e) => bb.putLong(b); bb.putLong(e) }
      }
      bb.putInt(r.linear.length)
      r.linear.foreach(bb.putLong)
    }
    val bgzf = new BgzfOutputStream(out)
    try bgzf.write(bb.array(), 0, bb.position())
    finally bgzf.close()
  }
}

object TabixIndexBuilder {
  /** Classic tabix/BAI binning: min_shift 14, depth 5. */
  private val LinearShift = 14
  private val MaxPos = 1L << 29

  /** Deepest bin fully containing [beg0, end0) — htslib's reg2bin. */
  def reg2bin(beg0: Long, end0: Long): Int = {
    val end = end0 - 1
    if ((beg0 >> 14) == (end >> 14)) (((1 << 15) - 1) / 7 + (beg0 >> 14)).toInt
    else if ((beg0 >> 17) == (end >> 17)) (((1 << 12) - 1) / 7 + (beg0 >> 17)).toInt
    else if ((beg0 >> 20) == (end >> 20)) (((1 << 9) - 1) / 7 + (beg0 >> 20)).toInt
    else if ((beg0 >> 23) == (end >> 23)) (((1 << 6) - 1) / 7 + (beg0 >> 23)).toInt
    else if ((beg0 >> 26) == (end >> 26)) (((1 << 3) - 1) / 7 + (beg0 >> 26)).toInt
    else 0
  }
}
