package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, NamedArgumentExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.core.{GraftDataSource, GraftFormat, GraftTable}

/** SQL table-valued functions mirroring the reference's registration
  * surface (exon_extension.cpp:47-77):
  *
  *   SELECT * FROM read_fasta('f.fasta', compression => 'gzip')
  *   SELECT * FROM vcf_query('x.vcf.gz', '1:200-999')
  *   SELECT * FROM read_auto('f.fasta.gz')   -- replacement-scan analog
  *
  * Each builder resolves at analysis time to a DSv2 relation over the
  * same GraftTable the DataFrame API uses — one implementation, two
  * query surfaces.
  */
object GraftTableFunctions {

  private def lit(e: Expression, what: String): String = e.eval(null) match {
    case u: UTF8String => u.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  private def relation(fmt: GraftFormat, opts: Map[String, String]): LogicalPlan = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val files = graft.sources.core.GraftFiles.resolve(opts("path"), conf).map(_.getPath)
    val schema = fmt.schema(files, conf, opts)
    val table = GraftTable(fmt, schema, opts)
    DataSourceV2Relation.create(table, None, None,
      new CaseInsensitiveStringMap(scala.jdk.CollectionConverters.MapHasAsJava(opts).asJava))
  }

  /** (path [, compression]) with named-argument support. */
  private def scanBuilder(fmt: GraftFormat)(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty, s"read_${fmt.name} requires a path argument")
    val opts = scala.collection.mutable.Map("path" -> lit(args.head, "path"))
    args.tail.foreach {
      case NamedArgumentExpression(key, value) => opts(key.toLowerCase) = lit(value, key)
      case e => opts("compression") = lit(e, "compression")
    }
    relation(fmt, opts.toMap)
  }

  /** (path, region [, region...]): one region keeps the reference's
    * exact surface; extra arguments batch into a multi-region query
    * (union semantics, one index load — see [[core.Regions]]). */
  private def queryBuilder(fmt: GraftFormat)(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2, s"${fmt.name}_query requires (path, region...)")
    val regionOpt =
      if (args.length == 2) Map("region" -> lit(args(1), "region"))
      else Map("regions" -> GraftIO.regionSpec(args.tail.map(lit(_, "region"))))
    relation(fmt, Map("path" -> lit(args(0), "path")) ++ regionOpt)
  }

  private def autoBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty, "read_auto requires a path argument")
    val path = lit(args.head, "path")
    relation(Formats.forPath(path, Map.empty), Map("path" -> path))
  }

  /** fasta_query(path, region [, region...]): faidx random-access
    * subsequence fetch — resolves to [[GraftIO.fasta_query]]'s plan. */
  private def fastaQueryBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2, "fasta_query requires (path, region...)")
    val path = lit(args.head, "path")
    val regions = args.tail.map(lit(_, "region"))
    GraftIO.fasta_query(SparkSession.active, path, regions).queryExecution.logical
  }

  /** twobit_query(path, region [, region...]) / read_twobit(path):
    * the .2bit random-access analogs of fasta_query — resolve to
    * [[GraftIO.twobit_query]] / [[GraftIO.read_twobit]]'s plans. */
  private def twobitQueryBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2, "twobit_query requires (path, region...)")
    GraftIO.twobit_query(SparkSession.active, lit(args.head, "path"),
      args.tail.map(lit(_, "region"))).queryExecution.logical
  }

  private def twobitScanBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "read_twobit requires (path)")
    GraftIO.read_twobit(SparkSession.active, lit(args.head, "path"))
      .queryExecution.logical
  }

  /** Numeric literal for the optional pileup thresholds. */
  private def num(e: Expression, what: String): Int = e.eval(null) match {
    case n: java.lang.Number => n.intValue()
    case d: org.apache.spark.sql.types.Decimal => d.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** sam_pileup(readsPath, refFastaPath[, minDepth, minAltTenths]) —
    * resolves to [[graft.functions.Pileup.pileupSites]]'s plan, and
    * sam_consensus(readsPath, refFastaPath) to
    * [[graft.functions.Pileup.consensus]]'s: the mpileup composition
    * from SQL, one implementation under both surfaces. */
  private def pileupBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 4,
      "sam_pileup requires (readsPath, refFastaPath[, minDepth, minAltTenths])")
    val s = SparkSession.active
    graft.functions.Pileup.pileupSites(
        GraftIO.read_sam_file_records(s, lit(args(0), "readsPath")),
        GraftIO.read_fasta(s, lit(args(1), "refFastaPath")),
        if (args.length > 2) num(args(2), "minDepth") else 4,
        if (args.length > 3) num(args(3), "minAltTenths") else 3)
      .queryExecution.logical
  }

  private def consensusBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2,
      "sam_consensus requires (readsPath, refFastaPath)")
    val s = SparkSession.active
    graft.functions.Pileup.consensus(
        GraftIO.read_sam_file_records(s, lit(args(0), "readsPath")),
        GraftIO.read_fasta(s, lit(args(1), "refFastaPath")))
      .queryExecution.logical
  }

  /** TVF name per format, mirroring the reference's function names. */
  val scanNames: Map[String, String] = Map(
    "fasta" -> "read_fasta", "fastq" -> "read_fastq", "gff" -> "read_gff",
    "gtf" -> "read_gtf", "bed" -> "read_bed_file",
    "sam" -> "read_sam_file_records", "bam" -> "read_bam_file_records",
    "vcf" -> "read_vcf_file_records", "bcf" -> "read_bcf_file_records",
    "genbank" -> "read_genbank",
    "mzml" -> "read_mzml", "hmmdomtab" -> "read_hmm_dom_tbl_out",
    "warc" -> "read_warc", "chain" -> "read_chain_file", "wig" -> "read_wig",
    "paf" -> "read_paf", "gfa" -> "read_gfa", "stockholm" -> "read_stockholm",
    "maf" -> "read_maf", "embl" -> "read_embl", "phylip" -> "read_phylip",
    "bedpe" -> "read_bedpe", "blast6" -> "read_blast6", "pdb" -> "read_pdb",
    "fam" -> "read_fam",
    "bedgraph" -> "read_bedgraph")

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    Formats.all.foreach { fmt =>
      scanNames.get(fmt.name).foreach { tvf =>
        reg.createOrReplaceTempFunction(tvf, scanBuilder(fmt), "scala_udf")
      }
    }
    reg.createOrReplaceTempFunction("vcf_query", queryBuilder(VcfFormat), "scala_udf")
    reg.createOrReplaceTempFunction("bam_query", queryBuilder(BamFormat), "scala_udf")
    reg.createOrReplaceTempFunction("bcf_query", queryBuilder(BcfFormat), "scala_udf")
    // beyond the reference's three: the write side emits tabix/CSI for
    // the gff-family, so the read side exposes the matching indexed
    // query surface (same builder, same union semantics)
    reg.createOrReplaceTempFunction("gff_query", queryBuilder(GffFormat), "scala_udf")
    reg.createOrReplaceTempFunction("gtf_query", queryBuilder(GtfFormat), "scala_udf")
    reg.createOrReplaceTempFunction("bed_query", queryBuilder(BedFormat), "scala_udf")
    reg.createOrReplaceTempFunction("read_auto", autoBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("fasta_query", fastaQueryBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("twobit_query", twobitQueryBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("read_twobit", twobitScanBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("sam_pileup", pileupBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("sam_consensus", consensusBuilder, "scala_udf")
  }
}
