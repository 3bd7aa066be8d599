package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under graft.queries contributes a Map[String, Q]; a Q is a
  * (SparkSession, sfDir) => DataFrame plus, when SQL-expressible, the
  * equivalent DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  /** All oracle-checkable queries, grouped by module. */
  def registry: Map[String, Q] =
    Relational.qs ++ ScalarFns.qs ++ FormatScans.qs ++
      Dedup.qs ++ TextOps.qs ++ PipelineOps.qs ++ Similarity.qs ++
      MultimodalQ.qs ++ StreamingQ.qs ++ Sessionize.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("rel_join_star_revenue").fn(spark, "/root/testdata/sf0.001")

  /** Per-commit smoke subset (round-8 verdict ask #8): the full matrix
    * is a round-close artifact — at 360+ entries a 3-pass capture costs
    * ~13 min — so iteration smokes run this core instead:
    * reference-parity staples plus the heaviest scale-path entry of
    * every family. Bench honors SPARK_GRAFT_BENCH_CORE=1.
    * Membership is validated against the registry by GateLintSpec. */
  val coreSet: Set[String] = Set(
    // reference parity staples
    "fmt_fasta_scan", "fmt_fastq_scan", "fmt_gff_scan", "fmt_sam_scan",
    "fmt_bam_scan", "fmt_vcf_scan", "fmt_bcf_scan", "fmt_vcf_query_region",
    "fn_sequence_ops", "fn_alignment", "fmt_writer_roundtrip",
    // one scale-path representative per family
    "rel_join_star_revenue", "rel_interval_merge_scalable",
    "dedup_minhash_lsh", "dedup_components", "ann_ivf_topk",
    "text_bm25_topk", "pipe_decontam_bloom", "mm_real_decode",
    "stream_sessionize", "stream_dedup_exact")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.view.mapValues(_.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
