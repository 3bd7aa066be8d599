package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Faidx, GraftIO}

/** .fai indexing: random regions fetched by seek must equal substrings
  * of the full in-memory sequence; the index layout matches the
  * published samtools format; ragged wrapping is refused. */
class FaidxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private def conf = spark.sessionState.newHadoopConf()

  /** Deterministic multi-contig FASTA wrapped at 60 chars. */
  private def writeFasta(dir: java.nio.file.Path): (String, Map[String, String]) = {
    val rnd = new scala.util.Random(99)
    val seqs = Map(
      "chrA" -> (1 to 1000).map(_ => "ACGT"(rnd.nextInt(4))).mkString,
      "chrB" -> (1 to 259).map(_ => "ACGT"(rnd.nextInt(4))).mkString,
      "chrC" -> "ACG") // shorter than one wrap line
    val sb = new StringBuilder
    for ((n, s) <- seqs.toSeq.sortBy(_._1)) {
      sb.append('>').append(n).append(" desc of ").append(n).append('\n')
      s.grouped(60).foreach(l => sb.append(l).append('\n'))
    }
    val f = dir.resolve("ref.fa")
    java.nio.file.Files.write(f, sb.toString.getBytes("UTF-8"))
    (f.toString, seqs)
  }

  test("random regions by seek == substrings of the full sequence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fai")
    val (path, seqs) = writeFasta(dir)
    val entries = Faidx.build(path, conf)
    assert(entries.map(_.name) == Seq("chrA", "chrB", "chrC"))
    assert(entries.find(_.name == "chrA").get.length == 1000)
    assert(entries.find(_.name == "chrA").get.linebases == 60)
    assert(entries.find(_.name == "chrA").get.linewidth == 61)
    val rnd = new scala.util.Random(7)
    val regions = (1 to 40).map { _ =>
      val (n, len) = Seq(("chrA", 1000), ("chrB", 259), ("chrC", 3))(rnd.nextInt(3))
      val lo = 1 + rnd.nextInt(len)
      val hi = lo + rnd.nextInt(len - lo + 1)
      s"$n:$lo-$hi"
    } ++ Seq("chrB", "chrA:995-2000", "nope:1-5")
    val got = GraftIO.fasta_query(spark, path, regions)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == regions.length - 1) // unknown contig dropped
    got.foreach { case (n, lo, hi, s) =>
      assert(s == seqs(n).substring((lo - 1).toInt, hi.toInt), s"$n:$lo-$hi")
    }
    // .fai sidecar is the published text layout
    val fai = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path + ".fai")), "UTF-8")
    val chrA = fai.linesIterator.next().split("\t")
    assert(chrA(0) == "chrA" && chrA(1) == "1000" && chrA(3) == "60" && chrA(4) == "61")
  }

  test("ragged line wrapping is refused, compressed input is refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fai2")
    val f = dir.resolve("bad.fa")
    java.nio.file.Files.write(f,
      ">x\nACGTACGT\nACG\nACGTACGT\n".getBytes("UTF-8")) // short INTERIOR line
    val e = intercept[IllegalArgumentException] { Faidx.build(f.toString, conf) }
    assert(e.getMessage.contains("non-uniform"))
    val gz = intercept[IllegalArgumentException] { Faidx.build("a.fa.gz", conf) }
    assert(gz.getMessage.contains("compressed"))
  }

  test("existing .fai is reused, not rebuilt") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fai3")
    val (path, _) = writeFasta(dir)
    Faidx.build(path, conf)
    val before = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(path + ".fai"))
    val out = GraftIO.fasta_query(spark, path, Seq("chrC")).collect()
    assert(out.head.getString(3) == "ACG")
    val after = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(path + ".fai"))
    assert(before == after)
  }
}
