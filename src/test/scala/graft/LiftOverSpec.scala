package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LiftOver
import graft.sources.GraftIO

/** LiftOver.liftPositions vs a naive plain-Scala block walk on random
  * chains and positions — the fmt_chain_liftover gate entry pins a
  * golden fixture; this spec pins the general arithmetic (bin-join
  * coverage, strand fold, unmapped pass-through) against an
  * independent reimplementation, with a binWidth small enough that
  * blocks straddle many bins. */
class LiftOverSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private case class Block(tName: String, tStart: Long, tEnd: Long,
                           qName: String, qSize: Long, qStrand: String, qStart: Long)

  test("random chains: bin-joined liftover == naive block walk") {
    val rnd = new scala.util.Random(7L)
    // synthesize chains as text (also exercising the parser), with
    // random gaps and strands; chains per chrom don't overlap in t
    val sb = new StringBuilder
    val naive = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (c <- 0 until 3) {
      var t = 0L
      for (i <- 0 until 15) {
        t += rnd.nextInt(50) + 1
        val nBlocks = rnd.nextInt(3) + 1
        val sizes = Seq.fill(nBlocks)(rnd.nextInt(30) + 1L)
        val dts = Seq.fill(nBlocks - 1)(rnd.nextInt(20) + 1L)
        val dqs = Seq.fill(nBlocks - 1)(rnd.nextInt(20) + 1L)
        val tLen = sizes.sum + dts.sum
        val qLen = sizes.sum + dqs.sum
        val qStart = rnd.nextInt(1000).toLong
        val strand = if (rnd.nextBoolean()) "+" else "-"
        sb.append(s"chain 100 chr$c 100000 + $t ${t + tLen} qc$c 50000 $strand $qStart ${qStart + qLen} ${c * 100 + i}\n")
        var (tc, qc) = (t, qStart)
        for (j <- 0 until nBlocks) {
          naive += Block(s"chr$c", tc, tc + sizes(j), s"qc$c", 50000L, strand, qc)
          if (j < nBlocks - 1) {
            sb.append(s"${sizes(j)} ${dts(j)} ${dqs(j)}\n")
            tc += sizes(j) + dts(j); qc += sizes(j) + dqs(j)
          } else sb.append(s"${sizes(j)}\n")
        }
        sb.append("\n")
        t += tLen
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-liftover")
    val path = dir.resolve("rand.chain")
    java.nio.file.Files.writeString(path, sb.toString)

    import spark.implicits._
    val positions = (0 until 600).map { _ =>
      (s"chr${rnd.nextInt(3)}", rnd.nextInt(2500).toLong)
    }.distinct
    val got = LiftOver.liftPositions(positions.toDF("chrom", "pos"),
        GraftIO.read_chain_file(spark, path.toString), binWidth = 64L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    positions.foreach { case (chrom, pos) =>
      val hits = naive.filter(b => b.tName == chrom && pos >= b.tStart && pos < b.tEnd)
        .map { b =>
          val sp = b.qStart + (pos - b.tStart)
          Option(if (b.qStrand == "-") b.qSize - 1 - sp else sp)
        }.toSet
      val want: Set[Option[Long]] = if (hits.isEmpty) Set(None) else hits
      assert(got((chrom, pos)) == want, s"($chrom, $pos)")
    }
  }
}
