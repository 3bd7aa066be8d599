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

  test("corrupt chains fail loudly instead of lifting wrong coordinates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badchain")
    def failsWith(name: String, content: String, msgPart: String): Unit = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p, content)
      val e = intercept[Exception] {
        GraftIO.read_chain_file(spark, p.toString).collect()
      }
      def chainOf(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chainOf(t.getCause)
      assert(chainOf(e).exists(_.contains(msgPart)), s"$name: $e")
    }
    // blocks don't reach the declared tEnd/qEnd (truncated file)
    failsWith("short.chain",
      "chain 10 chr1 1000 + 0 100 q1 1000 + 0 100 1\n20 5 5\n20\n\n",
      "do not sum to header extents")
    // reversed tStrand is out of spec
    failsWith("tstrand.chain",
      "chain 10 chr1 1000 - 0 20 q1 1000 + 0 20 1\n20\n\n",
      "tStrand must be '+'")
    // header too short
    failsWith("header.chain",
      "chain 10 chr1 1000 + 0 20\n20\n\n",
      "header has")
  }

  test("id-less chains stay distinct (synthetic ids), no pseudo-chain lumping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-noid")
    val p = dir.resolve("noid.chain")
    // two OVERLAPPING chains, both without the optional id field; if
    // they lumped into one NULL pseudo-chain, mapped_bp would sum to
    // 50 >= 0.95*30 and the interval would wrongly report 'mapped'
    java.nio.file.Files.writeString(p,
      "chain 100 chr1 1000 + 0 30 qA 1000 + 0 30\n30\n\n" +
      "chain 200 chr1 1000 + 10 40 qB 1000 + 500 530\n30\n\n")
    val blocks = GraftIO.read_chain_file(spark, p.toString)
    assert(blocks.select("chain_id").distinct().count() == 2)
    assert(blocks.collect().forall(_.getLong(0) < 0)) // synthetic = negative
    import spark.implicits._
    val r = LiftOver.liftIntervals(
        Seq(("chr1", 5L, 35L)).toDF("chrom", "start", "end"), blocks)
      .collect().head
    // both chains map 25 bp; the tie resolves by score to qB
    assert(r.getAs[String]("lifted_name") == "qB")
    assert(r.getAs[Long]("mapped_bp") == 25L)
    assert(r.getAs[String]("lift_status") == "partial")
    // inverted interval -> 'invalid', never probes the blocks
    val inv = LiftOver.liftIntervals(
        Seq(("chr1", 35L, 5L)).toDF("chrom", "start", "end"), blocks)
      .collect().head
    assert(inv.getAs[String]("lift_status") == "invalid" && inv.isNullAt(3))
    // a positions frame carrying chain-side column names still works
    val clash = LiftOver.liftPositions(
        Seq(("chr1", 15L, 9L, "x")).toDF("chrom", "pos", "score", "q_name"), blocks)
    assert(clash.count() == 2) // both overlapping chains report
  }

  private case class CBlock(chainId: Long, score: Long, tName: String,
                            tStart: Long, tEnd: Long, qSize: Long,
                            qStrand: String, qStart: Long)

  test("random chains: interval liftover (envelope, mapped_bp, best chain) == naive") {
    val rnd = new scala.util.Random(13L)
    val sb = new StringBuilder
    val naive = scala.collection.mutable.ArrayBuffer.empty[CBlock]
    for (c <- 0 until 2) {
      var t = 0L
      for (i <- 0 until 12) {
        t += rnd.nextInt(40) + 1
        val nBlocks = rnd.nextInt(3) + 1
        val sizes = Seq.fill(nBlocks)(rnd.nextInt(25) + 1L)
        val dts = Seq.fill(nBlocks - 1)(rnd.nextInt(15) + 1L)
        val dqs = Seq.fill(nBlocks - 1)(rnd.nextInt(15) + 1L)
        val (tLen, qLen) = (sizes.sum + dts.sum, sizes.sum + dqs.sum)
        val qStart = rnd.nextInt(800).toLong
        val strand = if (rnd.nextBoolean()) "+" else "-"
        val id = c * 100 + i
        val score = rnd.nextInt(5000) + 1
        sb.append(s"chain $score chr$c 100000 + $t ${t + tLen} qc$c 40000 $strand $qStart ${qStart + qLen} $id\n")
        var (tc, qc) = (t, qStart)
        for (j <- 0 until nBlocks) {
          naive += CBlock(id, score, s"chr$c", tc, tc + sizes(j), 40000L, strand, qc)
          if (j < nBlocks - 1) {
            sb.append(s"${sizes(j)} ${dts(j)} ${dqs(j)}\n")
            tc += sizes(j) + dts(j); qc += sizes(j) + dqs(j)
          } else sb.append(s"${sizes(j)}\n")
        }
        sb.append("\n")
        t += tLen
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-liftiv")
    val path = dir.resolve("rand.chain")
    java.nio.file.Files.writeString(path, sb.toString)

    import spark.implicits._
    val intervals = (0 until 300).map { _ =>
      val s0 = rnd.nextInt(1600).toLong
      (s"chr${rnd.nextInt(2)}", s0, s0 + rnd.nextInt(120) + 1)
    }.distinct
    val got = LiftOver.liftIntervals(intervals.toDF("chrom", "start", "end"),
        GraftIO.read_chain_file(spark, path.toString), binWidth = 32L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (Option(r.getAs[String]("lifted_name")),
         if (r.isNullAt(4)) None else Some(r.getLong(4)),
         if (r.isNullAt(5)) None else Some(r.getLong(5)),
         r.getAs[Long]("mapped_bp"), r.getAs[String]("lift_status")))
      .toMap

    intervals.foreach { case key @ (chrom, s0, e0) =>
      val byChain = naive.filter(b => b.tName == chrom && s0 < b.tEnd && b.tStart < e0)
        .groupBy(b => (b.chainId, b.score))
        .map { case ((_, score), bs) =>
          val pieces = bs.map { b =>
            val (ps, pe) = (math.max(s0, b.tStart), math.min(e0, b.tEnd))
            val (qs, qe) = (ps - b.tStart + b.qStart, pe - b.tStart + b.qStart)
            val (fs, fe) = if (b.qStrand == "-") (b.qSize - qe, b.qSize - qs) else (qs, qe)
            (pe - ps, fs, fe)
          }
          (score.toLong, pieces.map(_._1).sum, pieces.map(_._2).min, pieces.map(_._3).max,
            bs.head.qStrand, s"qc${chrom.last}")
        }
      if (byChain.isEmpty)
        assert(got(key) == ((None, None, None, 0L, "unmapped")), key)
      else {
        val best = byChain.maxBy(c => (c._2, c._1))
        val status = if (best._2 >= 0.95 * (e0 - s0)) "mapped" else "partial"
        assert(got(key) == ((Some(best._6), Some(best._3), Some(best._4), best._2, status)), key)
      }
    }
  }
}
