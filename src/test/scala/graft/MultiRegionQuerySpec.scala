package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftIO
import graft.sources.core.Regions

/** Batched multi-region index queries — the gene-panel form of the
  * reference's single-region `X_query` (vcf_query_reader.rs takes one
  * region per call; real users pass thousands). Checks, in order of
  * load-bearing-ness:
  *   1. union semantics: multi-region == union of single-region reads,
  *      each matching record exactly once even under overlapping regions;
  *   2. scale shape: a 1k-region panel over a written bgzf+tabix tree
  *      plans a COALESCED chunk-partition set (far fewer partitions than
  *      regions), property-checked row-for-row against scan+filter;
  *   3. the Matcher/merge primitives that make the row test O(log R).
  */
class MultiRegionQuerySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val F = "/root/repo/src/test/resources/fixtures"

  // ---- primitives ----

  test("Regions: option parsing, list splitting, delimiter rules") {
    assert(Regions.parse("chr1") == (("chr1", 1L, Long.MaxValue)))
    assert(Regions.parse("chr1:1,000-2,000") == (("chr1", 1000L, 2000L)))
    assert(Regions.parse("chr1:500-") == (("chr1", 500L, Long.MaxValue)))
    assert(Regions.split("1:1-5;2:10-20 3") == Seq("1:1-5", "2:10-20", "3"))
    assert(Regions.fromOptions(Map("region" -> "1:1-5", "regions" -> "2;3")) ==
      Seq("1:1-5", "2", "3"))
    assert(Regions.fromOptions(Map("path" -> "x")) == Seq.empty)
    // malformed positions fail with the grammar, not a bare NumberFormatException
    val e = intercept[IllegalArgumentException] { Regions.parse("chr1:abc-def") }
    assert(e.getMessage.contains("grammar"))
  }

  test("Regions.Matcher: merged intervals, point and overlap semantics") {
    val m = Regions.matcher(Seq(
      ("1", 10L, 20L), ("1", 15L, 30L), ("1", 31L, 40L), // overlap + adjacent -> [10,40]
      ("1", 100L, 200L), ("2", 5L, 5L)))
    assert(m.containsPoint("1", 10) && m.containsPoint("1", 40) && m.containsPoint("1", 25))
    assert(!m.containsPoint("1", 41) && !m.containsPoint("1", 99) && !m.containsPoint("1", 9))
    assert(m.containsPoint("1", 150) && m.containsPoint("2", 5) && !m.containsPoint("3", 5))
    assert(m.overlaps("1", 41, 99) == false) // gap between merged runs
    assert(m.overlaps("1", 1, 10) && m.overlaps("1", 40, 50) && m.overlaps("1", 35, 120))
    assert(!m.overlaps("2", 6, 100) && m.overlaps("2", 1, 5))
    // open-ended region: hi = Long.MaxValue must not overflow the merge
    val open = Regions.matcher(Seq(("1", 100L, Long.MaxValue), ("1", 50L, 60L)))
    assert(open.containsPoint("1", 1000000000L) && !open.containsPoint("1", 70))
  }

  test("Regions.mergeChunks: overlap merge + compressed-gap coalescing") {
    val a = (10L << 16) | 5L
    val b = (12L << 16) | 0L   // 2 bytes compressed after a's block -> coalesce
    val c = (800000L << 16) | 1L // far away -> separate
    val merged = Regions.mergeChunks(Seq((c, c + 100), (a, b), (b - 3, b + 7)))
    assert(merged == Seq((a, b + 7), (c, c + 100)))
    // chunks more than coalesceBytes apart stay separate
    val far = Regions.mergeChunks(Seq((0L, 1L << 16), ((3L << 16 << 16), (4L << 16 << 16))),
      coalesceBytes = 1 << 10)
    assert(far.size == 2)
  }

  // ---- fixture-level union semantics ----

  test("vcf_query with a region list == union of single-region queries, no duplicates") {
    val path = s"$F/vcf/indexed.vcf.gz"
    val regions = Seq("1:100000-500000", "1:400000-800000", "2:1-2000000", "19")
    val single = regions.map(r => GraftIO.vcf_query(spark, path, r)
      .selectExpr("chrom", "pos", "ref").collect().map(_.toString).toSet)
    val want = single.reduce(_ union _)
    val gotRows = GraftIO.vcf_query(spark, path, regions)
      .selectExpr("chrom", "pos", "ref").collect().map(_.toString).toSeq
    assert(gotRows.toSet == want)
    assert(gotRows.size == want.size, "overlapping regions must not duplicate records")
  }

  test("bcf_query and bam_query region lists match their single-region unions") {
    val bcf = s"$F/vcf/indexed.bcf"
    val bcfRegions = Seq("1:2000000-20000000", "2:1-5000000")
    val bcfWant = bcfRegions.map(r => GraftIO.bcf_query(spark, bcf, r)
      .selectExpr("chrom", "pos").collect().map(_.toString).toSet).reduce(_ union _)
    val bcfGot = GraftIO.bcf_query(spark, bcf, bcfRegions)
      .selectExpr("chrom", "pos").collect().map(_.toString)
    assert(bcfGot.toSet == bcfWant && bcfGot.length == bcfWant.size)

    val bam = s"$F/bam/indexed.bam"
    val refs = GraftIO.read_bam_file_records(spark, bam)
      .select("reference").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(refs.nonEmpty)
    val bamRegions = refs.take(2).map(r => s"$r:1-100000") :+ s"${refs.head}:50000-2000000"
    val bamWant = bamRegions.map(r => GraftIO.bam_query(spark, bam, r)
      .selectExpr("name", "start").collect().map(_.toString).toSet).reduce(_ union _)
    val bamGot = GraftIO.bam_query(spark, bam, bamRegions)
      .selectExpr("name", "start").collect().map(_.toString)
    assert(bamGot.toSet == bamWant && bamGot.length == bamWant.size)
  }

  test("SQL TVF vcf_query takes extra region arguments") {
    graft.sources.GraftTableFunctions.registerAll(spark)
    val one = spark.sql(
      s"SELECT chrom, pos FROM vcf_query('$F/vcf/indexed.vcf.gz', '1:100000-500000')")
      .collect().map(_.toString).toSet
    val two = spark.sql(
      s"SELECT chrom, pos FROM vcf_query('$F/vcf/indexed.vcf.gz', '1:100000-500000', '2:1-2000000')")
      .collect().map(_.toString).toSet
    assert(one.subsetOf(two) && two.size > one.size)
  }

  test("BED gains region queries: write bgzf+tabix, single and multi regions == scan+filter") {
    val df = spark.range(3000).selectExpr(
      "concat('chr', id % 3) AS reference_sequence_name",
      "(id * 2654435761L) % 3000000 + 1 AS start",
      "(id * 2654435761L) % 3000000 + 1 + (id * 40503) % 40000 AS end",
      "concat('f', id) AS name", "cast(id % 100 + 1 as long) AS score",
      "'+' AS strand", "cast(null as long) AS thick_start",
      "cast(null as long) AS thick_end", "cast(null as string) AS color",
      "cast(null as long) AS block_count", "cast(null as string) AS block_sizes",
      "cast(null as string) AS block_starts")
    val dir = java.nio.file.Files.createTempDirectory("graft-bedq").toString
    df.repartition(1).sortWithinPartitions("reference_sequence_name", "start")
      .write.mode("overwrite")
      .option("compression", "bgzf").option("index", "tabix")
      .format("bed").save(dir)
    val dataFile = dir + "/" + new java.io.File(dir).listFiles
      .map(_.getName).find(_.endsWith(".bed.gz")).get
    val full = GraftIO.read_bed_file(spark, dataFile)
      .selectExpr("reference_sequence_name AS c", "start", "end", "name").collect()
    assert(full.length == 3000)
    val regions = Seq("chr0:1-50000", "chr1:1000000-1200000", "chr2", "chrX:1-9")
    val matcher = Regions.matcher(regions.map(Regions.parse))
    val want = full.filter(r => matcher.overlaps(r.getString(0), r.getLong(1), r.getLong(2)))
      .map(_.toString).sorted.toSeq
    val got = GraftIO.read_bed_file(spark, dataFile,
        Map("regions" -> regions.mkString(";")))
      .selectExpr("reference_sequence_name AS c", "start", "end", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && want.nonEmpty)
    // index actually pruned: chunk partitions planned for a small region
    val one = GraftIO.read_bed_file(spark, dataFile, Map("region" -> "chr0:1-50000"))
    one.collect()
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val parts = one.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }
      .head.scan.toBatch.planInputPartitions().toSeq
      .map(_.asInstanceOf[graft.sources.core.GraftInputPartition])
    assert(parts.nonEmpty && parts.forall(_.bgzfChunk), parts.take(3).toString)
    // SQL TVF surface
    graft.sources.GraftTableFunctions.registerAll(spark)
    val tvf = spark.sql(
      s"SELECT count(*) AS n FROM bed_query('$dataFile', 'chr0:1-50000', 'chr2')")
      .collect().head.getLong(0)
    val direct = GraftIO.read_bed_file(spark, dataFile,
      Map("regions" -> "chr0:1-50000;chr2")).count()
    assert(tvf == direct && tvf > 0)
  }

  test("multi-part indexed tree: per-file .tbi, regions prune across every part") {
    // a partitioned write (2 part files, each sorted, each with its own
    // sidecar) is what a real ingestion job produces; region queries
    // must prune per file and union across the tree
    val df = spark.range(2000).selectExpr(
      "concat('chr', id % 4) AS seqname", "'synth' AS source", "'feature' AS type",
      "(id * 2654435761L) % 2000000 + 1 AS start",
      "(id * 2654435761L) % 2000000 + 2 + (id * 40503) % 30000 AS end",
      "cast(1.0 as float) AS score", "'+' AS strand",
      "cast(null as string) AS phase",
      "map('rid', array(cast(id as string))) AS attributes")
    val dir = java.nio.file.Files.createTempDirectory("graft-multipart").toString
    df.repartition(2, col("seqname")).sortWithinPartitions("seqname", "start")
      .write.mode("overwrite")
      .option("compression", "bgzf").option("index", "tabix")
      .format("gff").save(dir)
    val files = new java.io.File(dir).listFiles.map(_.getName)
    val dataFiles = files.filter(_.endsWith(".gff.gz"))
    assert(dataFiles.length == 2, files.toSeq)
    assert(files.count(_.endsWith(".tbi")) == 2, files.toSeq)
    val regions = "chr0:1-300000;chr1:500000-800000;chr3:1900000-2000000"
    val matcher = Regions.matcher(Regions.split(regions).map(Regions.parse))
    val full = GraftIO.read_gff(spark, dir)
      .selectExpr("seqname", "start", "end").collect()
    assert(full.length == 2000)
    val want = full.filter(r => matcher.overlaps(r.getString(0), r.getLong(1), r.getLong(2)))
      .map(_.toString).sorted.toSeq
    val multi = GraftIO.read_gff(spark, dir, Map("regions" -> regions))
    val got = multi.selectExpr("seqname", "start", "end")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && want.nonEmpty)
    // both part files contribute chunk partitions (regions hit contigs
    // in each part via the hash layout)
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val sel = multi.selectExpr("seqname")
    sel.collect()
    val parts = sel.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }
      .head.scan.toBatch.planInputPartitions().toSeq
      .map(_.asInstanceOf[graft.sources.core.GraftInputPartition])
    assert(parts.nonEmpty && parts.forall(_.bgzfChunk), parts.take(3).toString)
  }

  // ---- the 1k-region panel over a written, indexed tree ----

  test("1000-region panel over a written bgzf+tabix GFF: exact vs scan+filter, coalesced partitions") {
    // write a sorted+bgzf+tabix tree through our own writer (the
    // write->index->multi-region-read composition the single-region
    // tests never exercised at depth)
    val df = spark.range(4000).select(
      concat(lit("chr"), (col("id") % 4).cast("string")).as("seqname"),
      lit("synth").as("source"),
      lit("feature").as("type"),
      (pmod(col("id") * 2654435761L, lit(8000000L)) + 1).as("start"),
      (pmod(col("id") * 2654435761L, lit(8000000L)) + 2
        + pmod(col("id") * 40503L, lit(50000L))).as("end"),
      (col("id") % 10).cast("float").as("score"),
      lit("+").as("strand"),
      lit(null).cast("string").as("phase"),
      map(lit("rid"), array(col("id").cast("string"))).as("attributes"))
    val dir = java.nio.file.Files.createTempDirectory("graft-multiregion").toString
    df.repartition(1).sortWithinPartitions("seqname", "start")
      .write.mode("overwrite")
      .option("compression", "bgzf").option("index", "tabix")
      .format("gff").save(dir)
    val dataFile = dir + "/" + new java.io.File(dir).listFiles
      .map(_.getName).find(_.endsWith(".gff.gz")).get

    val rnd = new scala.util.Random(42)
    val regions = (1 to 1000).map { _ =>
      val chr = s"chr${rnd.nextInt(5)}" // chr4 never exists: must be silently empty
      val lo = 1 + rnd.nextInt(8000000)
      val hi = lo + rnd.nextInt(60000)
      s"$chr:$lo-$hi"
    }
    val matcher = Regions.matcher(regions.map(Regions.parse))

    val full = GraftIO.read_gff(spark, dataFile)
      .selectExpr("seqname", "start", "end", "attributes['rid'][0] AS rid")
      .collect()
    val want = full.filter(r =>
        matcher.overlaps(r.getString(0), r.getLong(1), r.getLong(2)))
      .map(_.toString).sorted.toSeq

    val multi = GraftIO.read_gff(spark, dataFile,
      Map("regions" -> regions.mkString(";")))
    val got = multi.selectExpr("seqname", "start", "end", "attributes['rid'][0] AS rid")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    assert(want.size > 100, s"panel matched only ${want.size} rows — fixture too sparse to prove anything")

    // scale gate: the planned partition set must be index-chunk reads,
    // COALESCED far below one-partition-per-region
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val sel = multi.selectExpr("seqname", "start")
    sel.collect()
    val parts = sel.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }
      .head.scan.toBatch.planInputPartitions().toSeq
      .map(_.asInstanceOf[graft.sources.core.GraftInputPartition])
    assert(parts.nonEmpty && parts.forall(_.bgzfChunk),
      s"expected index-chunk partitions, got ${parts.take(3)}")
    assert(parts.size < 100,
      s"${parts.size} partitions for 1000 regions — chunk coalescing is not working")
  }
}
