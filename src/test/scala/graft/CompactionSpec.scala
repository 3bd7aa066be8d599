package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftMaintenance

/** Small-file compaction + staging vacuum (GraftMaintenance): content
  * preservation, size/partition-layout selection, naming discipline,
  * idempotence, and the age gate that keeps vacuum away from live
  * writers' staging.
  */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def tmp(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def writeFastq(dir: Path, name: String,
                         records: Seq[(String, String, String)]): Unit = {
    val text = records.map { case (n, seq, q) => s"@$n\n$seq\n+\n$q\n" }.mkString
    Files.write(dir.resolve(name), text.getBytes("UTF-8")): Unit
  }

  private def readNames(dir: String): Seq[String] =
    graft.sources.GraftIO.read_fastq(spark, dir)
      .select("name").collect().map(_.getString(0)).sorted.toSeq

  private def dataFiles(dir: Path): Seq[String] = {
    val fs = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
    // hidden sidecars (LocalFileSystem .crc files) are not data
    fs.filter(f => f.isFile && !f.getName.startsWith("."))
      .map(_.getName).sorted.toSeq
  }

  test("many small files compact to one; rows survive byte-for-byte") {
    val dir = tmp("graft-compact-basic")
    (1 to 6).foreach(i => writeFastq(dir, f"part-$i%05d.fastq",
      Seq((s"r$i", "ACGTACGT", "IIIIIIII"))))
    val before = readNames(dir.toString)
    val rep = GraftMaintenance.compact(spark, dir.toString, "fastq",
      targetBytes = 1L << 20)
    assert(rep.groups == 1 && rep.filesBefore == 6 && rep.filesAfter == 1)
    assert(readNames(dir.toString) == before)
    val files = dataFiles(dir)
    assert(files.size == 1 && files.head.matches("compact-[0-9a-f-]{8}-part-00000\\.fastq"), files)
  }

  test("files at or above targetBytes are untouched; small ones merge around them") {
    val dir = tmp("graft-compact-large")
    writeFastq(dir, "big.fastq",
      (1 to 40).map(i => (s"big$i", "A" * 100, "I" * 100)))
    writeFastq(dir, "s1.fastq", Seq(("s1", "ACGT", "IIII")))
    writeFastq(dir, "s2.fastq", Seq(("s2", "ACGT", "IIII")))
    val bigLen = Files.size(dir.resolve("big.fastq"))
    val rep = GraftMaintenance.compact(spark, dir.toString, "fastq",
      targetBytes = bigLen) // big is AT the target: excluded
    assert(rep.filesBefore == 2 && rep.filesAfter == 1)
    val files = dataFiles(dir)
    assert(files.contains("big.fastq"), files)
    assert(files.count(_.startsWith("compact-")) == 1, files)
    assert(readNames(dir.toString).size == 42)
  }

  test("totals above targetBytes split into multiple bounded outputs") {
    val dir = tmp("graft-compact-multi")
    (1 to 8).foreach(i => writeFastq(dir, f"f$i.fastq",
      Seq((s"r$i", "ACGTACGTACGTACGT", "IIIIIIIIIIIIIIII"))))
    val each = Files.size(dir.resolve("f1.fastq"))
    // target = 3 files' bytes -> ceil(8/3) = 3 outputs
    val rep = GraftMaintenance.compact(spark, dir.toString, "fastq",
      targetBytes = each * 3)
    assert(rep.filesAfter == 3, rep)
    assert(readNames(dir.toString).size == 8)
  }

  test("hive-partitioned layout compacts within each leaf, never across") {
    val root = tmp("graft-compact-hive")
    val a = root.resolve("sample=a"); Files.createDirectories(a)
    val b = root.resolve("sample=b"); Files.createDirectories(b)
    (1 to 3).foreach(i => writeFastq(a, s"p$i.fastq", Seq((s"a$i", "ACGT", "IIII"))))
    (1 to 3).foreach(i => writeFastq(b, s"p$i.fastq", Seq((s"b$i", "GGCC", "!!!!"))))
    val rep = GraftMaintenance.compact(spark, root.toString, "fastq",
      targetBytes = 1L << 20)
    assert(rep.groups == 2 && rep.filesBefore == 6 && rep.filesAfter == 2)
    assert(readNames(a.toString) == Seq("a1", "a2", "a3"))
    assert(readNames(b.toString) == Seq("b1", "b2", "b3"))
    assert(readNames(root.toString).size == 6)
  }

  test("compacting twice is a no-op the second time") {
    val dir = tmp("graft-compact-idem")
    (1 to 4).foreach(i => writeFastq(dir, s"f$i.fastq",
      Seq((s"r$i", "ACGT", "IIII"))))
    val r1 = GraftMaintenance.compact(spark, dir.toString, "fastq",
      targetBytes = 1L << 20)
    val r2 = GraftMaintenance.compact(spark, dir.toString, "fastq",
      targetBytes = 1L << 20)
    assert(r1.groups == 1 && r2.groups == 0 && r2.filesBefore == 0)
    assert(readNames(dir.toString).size == 4)
  }

  test("compressed compaction output reads back transparently") {
    val dir = tmp("graft-compact-gz")
    (1 to 4).foreach(i => writeFastq(dir, s"f$i.fastq",
      Seq((s"r$i", "ACGTACGT", "IIIIIIII"))))
    val rep = GraftMaintenance.compact(spark, dir.toString, "fastq",
      targetBytes = 1L << 20, compression = Some("gzip"))
    assert(rep.filesAfter == 1)
    val files = dataFiles(dir)
    assert(files == Seq(files.head) && files.head.endsWith(".fastq.gz"), files)
    assert(readNames(dir.toString).size == 4)
  }

  test("recovery completes a swap that crashed after the marker, before any rename") {
    val dir = tmp("graft-compact-recover1")
    // the "crashed" compactor: staged outputs exist, marker published,
    // zero renames done, sources still in place
    writeFastq(dir, "s1.fastq", Seq(("old1", "ACGT", "IIII")))
    writeFastq(dir, "s2.fastq", Seq(("old2", "GGCC", "!!!!")))
    val staging = dir.resolve(".compact-cafe0001")
    Files.createDirectories(staging)
    writeFastq(staging, "part-00000-xyz.fastq",
      Seq(("old1", "ACGT", "IIII"), ("old2", "GGCC", "!!!!")))
    Files.write(dir.resolve(".compact-cafe0001.plan"),
      ("out\tpart-00000-xyz.fastq\tcompact-cafe0001-part-00000.fastq\n" +
        "src\ts1.fastq\nsrc\ts2.fastq\n").getBytes("UTF-8"))
    val rep = GraftMaintenance.compact(spark, dir.toString, "fastq",
      targetBytes = 1L << 20)
    assert(rep.recoveredSwaps == 1)
    assert(rep.groups == 0, "recovered leaf has one file left; nothing to compact")
    assert(dataFiles(dir) == Seq("compact-cafe0001-part-00000.fastq"))
    assert(!Files.exists(staging) && !Files.exists(dir.resolve(".compact-cafe0001.plan")))
    assert(readNames(dir.toString) == Seq("old1", "old2"))
  }

  test("recovery finishes a swap that crashed mid-rename (partial destinations)") {
    val dir = tmp("graft-compact-recover2")
    writeFastq(dir, "s1.fastq", Seq(("old1", "ACGT", "IIII")))
    writeFastq(dir, "s2.fastq", Seq(("old2", "GGCC", "!!!!")))
    // output 0 already renamed in; output 1 still staged; sources not
    // yet deleted — the worst-case half-swap
    writeFastq(dir, "compact-cafe0002-part-00000.fastq", Seq(("old1", "ACGT", "IIII")))
    val staging = dir.resolve(".compact-cafe0002")
    Files.createDirectories(staging)
    writeFastq(staging, "part-00001-xyz.fastq", Seq(("old2", "GGCC", "!!!!")))
    Files.write(dir.resolve(".compact-cafe0002.plan"),
      ("out\tpart-00000-abc.fastq\tcompact-cafe0002-part-00000.fastq\n" +
        "out\tpart-00001-xyz.fastq\tcompact-cafe0002-part-00001.fastq\n" +
        "src\ts1.fastq\nsrc\ts2.fastq\n").getBytes("UTF-8"))
    // minFiles=3 so the run only repairs: the 2 recovered outputs would
    // otherwise be legitimate candidates for this run's own compaction
    val rep = GraftMaintenance.compact(spark, dir.toString, "fastq",
      targetBytes = 1L << 20, minFiles = 3)
    assert(rep.recoveredSwaps == 1)
    assert(dataFiles(dir) == Seq("compact-cafe0002-part-00000.fastq",
      "compact-cafe0002-part-00001.fastq"))
    assert(readNames(dir.toString) == Seq("old1", "old2"))
  }

  test("recovery fails loudly when a staged output vanished mid-swap; sources survive") {
    val dir = tmp("graft-compact-recover3")
    writeFastq(dir, "s1.fastq", Seq(("old1", "ACGT", "IIII")))
    writeFastq(dir, "s2.fastq", Seq(("old2", "GGCC", "!!!!")))
    // marker promises an output that exists nowhere (staging swept)
    Files.write(dir.resolve(".compact-cafe0003.plan"),
      ("out\tpart-00000-xyz.fastq\tcompact-cafe0003-part-00000.fastq\n" +
        "src\ts1.fastq\nsrc\ts2.fastq\n").getBytes("UTF-8"))
    val e = intercept[java.io.IOException] {
      GraftMaintenance.compact(spark, dir.toString, "fastq", targetBytes = 1L << 20)
    }
    assert(e.getMessage.contains("unrecoverable"))
    assert(readNames(dir.toString) == Seq("old1", "old2"), "sources must survive")
  }

  test("vacuum never sweeps a marker-protected staging, however old") {
    val dir = tmp("graft-vacuum-marker")
    writeFastq(dir, "data.fastq", Seq(("r1", "ACGT", "IIII")))
    val protectedStaging = dir.resolve(".compact-feed0001")
    Files.createDirectories(protectedStaging)
    writeFastq(protectedStaging, "part-00000-xyz.fastq", Seq(("p", "AAAA", "IIII")))
    Files.write(dir.resolve(".compact-feed0001.plan"),
      "out\tpart-00000-xyz.fastq\tcompact-feed0001-part-00000.fastq\nsrc\tdata.fastq\n"
        .getBytes("UTF-8"))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 100000)
    Seq(protectedStaging, protectedStaging.resolve("part-00000-xyz.fastq"))
      .foreach(p => Files.setLastModifiedTime(p, old): Unit)
    val n = GraftMaintenance.vacuum(spark, dir.toString, olderThanMs = 50000)
    assert(n == 0)
    assert(Files.exists(protectedStaging.resolve("part-00000-xyz.fastq")))
  }

  test("vacuum sweeps stale staging but spares fresh staging and data") {
    val dir = tmp("graft-vacuum")
    writeFastq(dir, "data.fastq", Seq(("r1", "ACGT", "IIII")))
    val stale = dir.resolve("_temporary").resolve("dead-writer")
    Files.createDirectories(stale)
    writeFastq(stale, "orphan.fastq", Seq(("x", "AAAA", "IIII")))
    val staleCompact = dir.resolve(".compact-deadbeef")
    Files.createDirectories(staleCompact)
    writeFastq(staleCompact, "orphan2.fastq", Seq(("y", "CCCC", "IIII")))
    val fresh = dir.resolve("_temporary").resolve("live-writer")
    Files.createDirectories(fresh)
    writeFastq(fresh, "inflight.fastq", Seq(("z", "GGGG", "IIII")))
    // age the stale namespaces past the horizon
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 100000)
    Seq(stale, stale.resolve("orphan.fastq"),
        staleCompact, staleCompact.resolve("orphan2.fastq"))
      .foreach(p => Files.setLastModifiedTime(p, old): Unit)
    val n = GraftMaintenance.vacuum(spark, dir.toString, olderThanMs = 50000)
    assert(n == 2)
    assert(!Files.exists(stale) && !Files.exists(staleCompact))
    assert(Files.exists(fresh.resolve("inflight.fastq")))
    assert(readNames(dir.toString) == Seq("r1"))
  }
}
