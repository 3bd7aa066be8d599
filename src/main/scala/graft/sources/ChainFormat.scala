package graft.sources

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.sources.core._

/** UCSC chain alignment files (the liftOver input; chain spec at
  * genome.ucsc.edu/goldenPath/help/chain.html): a header line
  *
  *   chain score tName tSize tStrand tStart tEnd qName qSize qStrand qStart qEnd [id]
  *
  * followed by `size [dt dq]` gapless-block lines, blank-line
  * terminated. Surfaced at BLOCK granularity — one row per gapless
  * aligned block with its target and query half-open 0-based spans.
  * Query spans stay in STRAND space exactly as the file records them,
  * with q_size carried so consumers can fold '-' strand coordinates to
  * forward (fwd span = [q_size - q_end, q_size - q_start)) — see
  * [[graft.functions.LiftOver]]. tStrand is always '+' per spec and is
  * validated, not surfaced.
  *
  * Splittable: records sync on 'chain '-headed lines the same way
  * GenBank syncs on LOCUS (block lines are numeric, so the header
  * prefix is unambiguous); a split owns chains whose header offset
  * falls within it and reads their block lines past the boundary.
  * Cumulative spans are validated against the header's tEnd/qEnd so a
  * truncated or corrupt chain fails loudly instead of lifting
  * coordinates wrongly. */
object ChainFormat extends GraftFormat {
  override def name = "chain"
  override def extensions = Seq("chain")
  override def splittable = true

  override def schema(paths: Seq[Path], conf: Configuration,
                      options: Map[String, String]): StructType =
    StructType(Seq(
      StructField("chain_id", LongType),
      StructField("score", LongType),
      StructField("t_name", StringType),
      StructField("t_size", LongType),
      StructField("t_start", LongType),
      StructField("t_end", LongType),
      StructField("q_name", StringType),
      StructField("q_size", LongType),
      StructField("q_strand", StringType),
      StructField("q_start", LongType),
      StructField("q_end", LongType)))

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    val tagged = P.linesUnbounded(split, in).buffered
    new Iterator[Array[Any]] {
      private var pending: Iterator[Array[Any]] = Iterator.empty

      private def advance(): Unit =
        while (!pending.hasNext && tagged.hasNext) {
          while (tagged.hasNext && !tagged.head._2.startsWith("chain ")) tagged.next()
          if (tagged.hasNext && tagged.head._1 <= split.end) pending = parseChain()
          else return
        }

      override def hasNext: Boolean = { advance(); pending.hasNext }
      override def next(): Array[Any] = { advance(); pending.next() }

      private def parseChain(): Iterator[Array[Any]] = {
        val (headerPos, headerLine) = tagged.next()
        val header = headerLine.trim
        val h = header.split("\\s+")
        require(h.length >= 12, s"chain header has ${h.length} fields: '$header'")
        require(h(4) == "+", s"chain tStrand must be '+' per spec, got '${h(4)}'")
        val score = h(1).toLong
        val tName = h(2); val tSize = h(3).toLong
        var tCur = h(5).toLong; val tEnd = h(6).toLong
        val qName = h(7); val qSize = h(8).toLong; val qStrand = h(9)
        var qCur = h(10).toLong; val qEnd = h(11).toLong
        require(qStrand == "+" || qStrand == "-", s"bad qStrand '$qStrand'")
        // the id field is optional per spec; synthesize a per-file-unique
        // NEGATIVE id from the header offset when absent, so downstream
        // per-chain grouping (LiftOver) never lumps distinct id-less
        // chains into one pseudo-chain. Negative = distinguishable from
        // any real id; unique within a file (offsets / BGZF voffs are).
        val id: Any = if (h.length > 12) h(12).toLong else -1L - headerPos
        val rows = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
        var done = false
        while (!done && tagged.hasNext) {
          // PEEK for the next header: chains back-to-back without a
          // blank separator must not have their header swallowed here
          if (tagged.head._2.startsWith("chain ")) done = true
          else {
            val line = tagged.next()._2.trim
            if (line.isEmpty) done = true
            else {
              val b = line.split("\\s+")
              val size = b(0).toLong
              rows += Array[Any](id, score, P.s(tName), tSize, tCur, tCur + size,
                P.s(qName), qSize, P.s(qStrand), qCur, qCur + size)
              if (b.length >= 3) { tCur += size + b(1).toLong; qCur += size + b(2).toLong }
              else done = true // terminal size-only line
            }
          }
        }
        require(rows.nonEmpty, s"chain with no blocks: '$header'")
        require(rows.last(5).asInstanceOf[Long] == tEnd &&
            rows.last(10).asInstanceOf[Long] == qEnd,
          s"chain blocks do not sum to header extents (tEnd $tEnd, qEnd $qEnd): '$header'")
        rows.iterator
      }
    }
  }
}
