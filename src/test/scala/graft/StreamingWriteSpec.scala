package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming writes into format directories (DSv2 STREAMING_WRITE):
  * stream-in -> stream-out round trips, per-epoch deterministic file
  * naming, and the staging-invisibility contract for readers.
  */
class StreamingWriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def tmp(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def writeFastq(dir: Path, name: String,
                         records: Seq[(String, String, String)]): Unit = {
    val text = records.map { case (n, seq, q) => s"@$n\n$seq\n+\n$q\n" }.mkString
    Files.write(dir.resolve(name), text.getBytes("UTF-8"))
  }

  test("fastq stream-in to fastq stream-out round-trips exactly") {
    val in = tmp("graft-swrite-in")
    val out = tmp("graft-swrite-out").toString
    val ck = tmp("graft-swrite-ck").toString
    writeFastq(in, "a.fastq", Seq(("r1", "ACGT", "IIII"), ("r2", "GGCC", "!!!!")))
    writeFastq(in, "b.fastq", Seq(("r3", "TTTT", "????")))
    val q = spark.readStream.format("fastq").load(in.toString)
      .writeStream.format("fastq")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = graft.sources.GraftIO.read_fastq(spark, out)
      .select("name", "sequence", "quality_scores").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("r1", "ACGT", "IIII"), ("r2", "GGCC", "!!!!"),
      ("r3", "TTTT", "????")))
    // epoch commit sweeps its emptied staging namespace: a long-lived
    // stream must not park a zombie _temporary dir in its target
    assert(!Files.exists(java.nio.file.Paths.get(out, "_temporary")))
  }

  test("streaming bgzf+tabix GFF sink: arriving sorted files gain queryable indexes") {
    // the live-ingest composition: files stream in, each epoch's output
    // carries its own .tbi built inside the write task, and the
    // accumulated directory answers multi-region queries exactly
    val in = tmp("graft-stbi-in")
    val out = tmp("graft-stbi-out").toString
    val ck = tmp("graft-stbi-ck").toString
    def gffText(ids: Range): String = ids.map { i =>
      val start = i * 100 + 1
      (s"chr${i % 2}", start,
        s"chr${i % 2}\tsynth\tfeature\t$start\t${start + 49}\t.\t+\t.\trid=$i")
    }.sortBy(t => (t._1, t._2)) // NUMERIC start order — the index builder enforces it
      .map(_._3).mkString("", "\n", "\n")
    Files.write(in.resolve("a.gff"), gffText(0 until 40).getBytes("UTF-8"))
    Files.write(in.resolve("b.gff"), gffText(40 until 80).getBytes("UTF-8"))
    val q = spark.readStream.format("gff").load(in.toString)
      .writeStream.format("gff")
      .option("path", out).option("checkpointLocation", ck)
      .option("compression", "bgzf").option("index", "tabix")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val files = new java.io.File(out).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".gff.gz")), files.toSeq)
    assert(files.count(_.endsWith(".gff.gz.tbi")) ==
      files.count(_.endsWith(".gff.gz")), s"every data file needs its .tbi: ${files.toSeq}")
    val full = graft.sources.GraftIO.read_gff(spark, out)
    assert(full.count() == 80)
    val regions = "chr0:1-500;chr1:3000-6000"
    val matcher = graft.sources.core.Regions.matcher(
      graft.sources.core.Regions.split(regions).map(graft.sources.core.Regions.parse))
    val want = full.selectExpr("seqname", "start", "end").collect()
      .filter(r => matcher.overlaps(r.getString(0), r.getLong(1), r.getLong(2)))
      .map(_.toString).sorted.toSeq
    val got = graft.sources.GraftIO.read_gff(spark, out, Map("regions" -> regions))
      .selectExpr("seqname", "start", "end").collect().map(_.toString).sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("epochs append with deterministic names; restart adds new epochs without clobbering") {
    val in = tmp("graft-swrite-epoch-in")
    val out = tmp("graft-swrite-epoch-out")
    val ck = tmp("graft-swrite-epoch-ck").toString
    def run(): Unit = {
      val q = spark.readStream.format("fastq").load(in.toString)
        .writeStream.format("fastq")
        .option("path", out.toString).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeFastq(in, "a.fastq", Seq(("r1", "ACGT", "IIII")))
    run()
    writeFastq(in, "b.fastq", Seq(("r2", "TTTT", "IIII")))
    run()
    val names = graft.sources.GraftIO.read_fastq(spark, out.toString)
      .select("name").collect().map(_.getString(0)).sorted.toSeq
    assert(names == Seq("r1", "r2"))
    val files = Files.list(out).iterator()
    val parts = new scala.collection.mutable.ArrayBuffer[String]
    while (files.hasNext) {
      val f = files.next().getFileName.toString
      if (f.startsWith("part-")) parts += f
    }
    // deterministic part-<epoch>-<partition> names, distinct across epochs
    assert(parts.forall(_.matches("part-\\d{5}-\\d{5}\\.fastq")), parts)
    assert(parts.distinct.size == parts.size)
  }

  test("compressed streaming write: gz part files read back transparently") {
    val in = tmp("graft-swrite-gz-in")
    val out = tmp("graft-swrite-gz-out")
    val ck = tmp("graft-swrite-gz-ck").toString
    writeFastq(in, "a.fastq", Seq(("r1", "ACGTACGT", "IIIIIIII")))
    val q = spark.readStream.format("fastq").load(in.toString)
      .writeStream.format("fastq")
      .option("path", out.toString).option("checkpointLocation", ck)
      .option("compression", "gzip")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val files = Files.list(out).iterator()
    var sawGz = false
    while (files.hasNext) {
      val f = files.next().getFileName.toString
      if (f.startsWith("part-")) { assert(f.endsWith(".fastq.gz"), f); sawGz = true }
    }
    assert(sawGz)
    val got = graft.sources.GraftIO.read_fastq(spark, out.toString)
      .select("name").collect().map(_.getString(0)).toSeq
    assert(got == Seq("r1"))
  }

  test("directory scans never read files under a _temporary staging namespace") {
    val dir = tmp("graft-staging-invisible")
    writeFastq(dir, "real.fastq", Seq(("r1", "ACGT", "IIII")))
    val staging = dir.resolve("_temporary").resolve("abc123")
    Files.createDirectories(staging)
    // a staged file with a PLAIN basename — only its ancestry marks it
    writeFastq(staging, "12345-part-00000.fastq", Seq(("phantom", "AAAA", "IIII")))
    val got = graft.sources.GraftIO.read_fastq(spark, dir.toString)
      .select("name").collect().map(_.getString(0)).toSeq
    assert(got == Seq("r1"))
  }

  test("partitioned streaming write lays out key directories, round-trips") {
    val in = tmp("graft-swrite-part-in")
    val out = tmp("graft-swrite-part-out")
    val ck = tmp("graft-swrite-part-ck").toString
    writeFastq(in, "a.fastq", Seq(("r1", "ACGT", "IIII"), ("r2", "GGCC", "!!!!")))
    val q = spark.readStream.format("fastq").load(in.toString)
      .writeStream.format("fastq")
      .option("path", out.toString).option("checkpointLocation", ck)
      .option("partitionBy", "name")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val leaves = Files.list(out).iterator()
    val dirs = new scala.collection.mutable.ArrayBuffer[String]
    while (leaves.hasNext) {
      val f = leaves.next()
      if (Files.isDirectory(f) && !f.getFileName.toString.startsWith("_"))
        dirs += f.getFileName.toString
    }
    assert(dirs.sorted == Seq("name=r1", "name=r2"), dirs)
    val got = graft.sources.GraftIO.read_fastq(spark, s"$out/name=r1")
      .select("sequence").collect().map(_.getString(0)).toSeq
    assert(got == Seq("ACGT"))
  }

  test("complete output mode is rejected loudly") {
    val in = tmp("graft-swrite-mode-in")
    writeFastq(in, "a.fastq", Seq(("r1", "ACGT", "IIII")))
    val agg = spark.readStream.format("fastq").load(in.toString)
      .groupBy("name").count()
    val e = intercept[Exception] {
      val q = agg.writeStream.format("fastq").outputMode("complete")
        .option("path", tmp("graft-swrite-mode-out").toString)
        .option("checkpointLocation", tmp("graft-swrite-mode-ck").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage).exists(m =>
      m.contains("append output mode only") || m.contains("does not support Complete"))), e)
  }
}
