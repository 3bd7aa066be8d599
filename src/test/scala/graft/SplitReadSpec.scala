package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftIO

/** Byte-range split correctness: reading a file as many small splits must
  * produce exactly the rows of a single-split read — no loss, no
  * duplication at boundaries. This is the property that lets one large
  * file fan out across a cluster (one task per ~128 MB) at 100 TB.
  */
class SplitReadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def withMaxSplit[T](bytes: Long)(f: => T): T = {
    val k = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(k)
    spark.conf.set(k, bytes.toString)
    try f finally spark.conf.set(k, old)
  }

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft-split")
    val p = d.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("gff: 64-byte splits == single split") {
    val content = (1 to 500).map { i =>
      s"sq${i % 7}\tgraft\tgene\t$i\t${i + 10}\t.\t+\t.\tgene_id=g$i"
    }.mkString("", "\n", "\n")
    val path = tmpFile("big.gff", content)
    val whole = GraftIO.read_gff(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64) {
      val df = GraftIO.read_gff(spark, path)
      assert(df.rdd.getNumPartitions > 5, "expected many input partitions")
      df.collect().map(_.toString).sorted
    }
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 500)
  }

  test("fasta: splits sync to '>' record starts") {
    val content = (1 to 200).map { i =>
      s">rec$i desc$i\n${"ACGT" * (i % 5 + 1)}\nGG\n"
    }.mkString
    val path = tmpFile("big.fasta", content)
    val whole = GraftIO.read_fasta(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64) {
      val df = GraftIO.read_fasta(spark, path)
      assert(df.rdd.getNumPartitions > 5)
      df.collect().map(_.toString).sorted
    }
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 200)
  }

  test("fastq: splits resync on the @/+ structural pattern, incl. '@' quality lines") {
    val content = (1 to 300).map { i =>
      // quality line deliberately starts with '@' every third record
      val q = if (i % 3 == 0) "@" + "I" * 9 else "I" * 10
      s"@read$i desc$i\nACGTACGTAC\n+\n$q\n"
    }.mkString
    val path = tmpFile("big.fastq", content)
    val whole = GraftIO.read_fastq(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64) {
      val df = GraftIO.read_fastq(spark, path)
      assert(df.rdd.getNumPartitions > 5)
      df.collect().map(_.toString).sorted
    }
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 300)
  }

  test("directory of N files plans N partitions (compressed, unsplittable)") {
    val d = Files.createTempDirectory("graft-manyfiles")
    (1 to 6).foreach { i =>
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(d.resolve(s"f$i.fasta.gz")))
      out.write(s">r$i\nACGT\n".getBytes)
      out.close()
    }
    val df = GraftIO.read_fasta(spark, d.toString)
    assert(df.rdd.getNumPartitions == 6)
    assert(df.count() == 6)
  }

  test("sam: ranged splits skip header lines only at file start") {
    val header = "@HD\tVN:1.6\n@SQ\tSN:ref1\tLN:100000\n"
    val body = (1 to 300).map { i =>
      s"r$i\t0\tref1\t$i\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII"
    }.mkString("", "\n", "\n")
    val path = tmpFile("big.sam", header + body)
    val whole = GraftIO.read_sam_file_records(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64)(GraftIO.read_sam_file_records(spark, path).collect().map(_.toString).sorted)
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 300)
  }
}
