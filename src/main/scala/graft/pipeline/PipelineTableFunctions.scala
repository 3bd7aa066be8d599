package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** SQL table-valued functions over the pipeline facades — the same
  * one-implementation-two-surfaces discipline the format TVFs follow
  * (graft.sources.GraftTableFunctions): each TVF resolves at analysis
  * time to the LOGICAL PLAN the CorpusOps/Relational facade builds, so
  * SQL users run exactly the oracle-gated code path.
  *
  *   SELECT * FROM near_dup_pairs('docs', 'id', 'body')
  *   SELECT * FROM semantic_dedup('vecs', 'id', 'emb', 1024, 0.9, 2)
  *   SELECT * FROM remove_duplicate_spans('docs', 'id', 'body', 10)
  *   SELECT * FROM closest_features('peaks', 'genes')
  *
  * Table arguments name catalog tables or temp views; trailing
  * arguments are optional and positional.
  */
object PipelineTableFunctions {

  private def str(e: Expression, what: String): String = e.eval(null) match {
    case u: UTF8String => u.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def num(e: Expression, what: String): Double = e.eval(null) match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble // SQL 0.95 parses as Decimal
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def tbl(e: Expression, what: String): DataFrame =
    SparkSession.active.table(str(e, what))

  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  private def nearDupBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 3,
      "near_dup_pairs(table[, idCol, textCol])")
    plan(CorpusOps.nearDupPairs(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "idCol") else "doc_id",
      if (args.length > 2) str(args(2), "textCol") else "text"))
  }

  private def semanticBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 6,
      "semantic_dedup(table[, idCol, vecCol, k, minCosine, probes])")
    plan(CorpusOps.semanticDedup(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "idCol") else "vec_id",
      if (args.length > 2) str(args(2), "vecCol") else "embedding",
      if (args.length > 3) num(args(3), "k").toInt else 8,
      if (args.length > 4) num(args(4), "minCosine") else 0.9,
      if (args.length > 5) num(args(5), "probes").toInt else 1))
  }

  private def spansBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 4,
      "remove_duplicate_spans(table[, idCol, textCol, segWords])")
    plan(CorpusOps.removeDuplicateSpans(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "idCol") else "doc_id",
      if (args.length > 2) str(args(2), "textCol") else "text",
      if (args.length > 3) num(args(3), "segWords").toInt else 10))
  }

  private def closestBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, "closest_features(tableA, tableB)")
    plan(CorpusOps.closestFeatures(tbl(args(0), "tableA"), tbl(args(1), "tableB")))
  }

  private def kmeansIvfBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 7,
      "kmeans_ivf_topk(corpus, queries, k[, cells, nprobe, idCol, vecCol])")
    plan(VectorOps.kmeansIvfTopK(tbl(args(0), "corpus"), tbl(args(1), "queries"),
      num(args(2), "k").toInt,
      if (args.length > 3) num(args(3), "cells").toInt else 8,
      if (args.length > 4) num(args(4), "nprobe").toInt else 1,
      if (args.length > 5) str(args(5), "idCol") else "vec_id",
      if (args.length > 6) str(args(6), "vecCol") else "embedding"))
  }

  private def int8TopKBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 5,
      "int8_topk(corpus, queries, k[, idCol, vecCol])")
    plan(VectorOps.int8TopK(tbl(args(0), "corpus"), tbl(args(1), "queries"),
      num(args(2), "k").toInt,
      if (args.length > 3) str(args(3), "idCol") else "vec_id",
      if (args.length > 4) str(args(4), "vecCol") else "embedding"))
  }

  private def heavyHittersBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 5,
      "heavy_hitters(table, valueCol, threshold[, depth, width])")
    plan(CorpusOps.heavyHitters(tbl(args(0), "table"),
      str(args(1), "valueCol"), num(args(2), "threshold").toLong,
      if (args.length > 3) num(args(3), "depth").toInt else 3,
      if (args.length > 4) num(args(4), "width").toInt else 2048))
  }

  private def leakageSplitBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 5,
      "leakage_safe_split(docs, pairs[, idCol, buckets, valBuckets])")
    plan(CorpusOps.leakageSafeSplit(tbl(args(0), "docs"), tbl(args(1), "pairs"),
      if (args.length > 2) str(args(2), "idCol") else "doc_id",
      if (args.length > 3) num(args(3), "buckets").toInt else 10,
      if (args.length > 4) num(args(4), "valBuckets").toInt else 2))
  }

  private def lshTopKBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 7,
      "lsh_topk(corpus, queries, k[, bits, hamming, idCol, vecCol])")
    plan(VectorOps.lshTopK(tbl(args(0), "corpus"), tbl(args(1), "queries"),
      num(args(2), "k").toInt,
      if (args.length > 3) num(args(3), "bits").toInt else 16,
      if (args.length > 4) num(args(4), "hamming").toInt else 1,
      if (args.length > 5) str(args(5), "idCol") else "vec_id",
      if (args.length > 6) str(args(6), "vecCol") else "embedding"))
  }

  private def bm25Builder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 5,
      "bm25_topk(table, 'terms csv', k[, idCol, textCol])")
    val terms = str(args(1), "terms").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    plan(CorpusOps.bm25TopK(tbl(args(0), "table"), terms,
      num(args(2), "k").toInt,
      if (args.length > 3) str(args(3), "idCol") else "doc_id",
      if (args.length > 4) str(args(4), "textCol") else "text"))
  }

  private def qualityScoreBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 5,
      "quality_score(docs, weights[, idCol, textCol, threshold])")
    plan(CorpusOps.qualityScore(tbl(args(0), "docs"), tbl(args(1), "weights"),
      if (args.length > 2) str(args(2), "idCol") else "doc_id",
      if (args.length > 3) str(args(3), "textCol") else "text",
      if (args.length > 4) num(args(4), "threshold").toLong else 0L))
  }

  private def editPairsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 4,
      "edit_distance_pairs(table[, idCol, textCol, maxPct])")
    plan(CorpusOps.editDistancePairs(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "idCol") else "doc_id",
      if (args.length > 2) str(args(2), "textCol") else "text",
      if (args.length > 3) num(args(3), "maxPct").toInt else 20))
  }

  private def zipfBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 3,
      "zipf_profile(table[, textCol, topK])")
    plan(CorpusOps.zipfProfile(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "textCol") else "text",
      if (args.length > 2) num(args(2), "topK").toInt else 1000))
  }

  private def mrlTopKBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 7,
      "mrl_topk(corpus, queries, k[, prefixDims, candidates, idCol, vecCol])")
    plan(VectorOps.mrlRerankTopK(tbl(args(0), "corpus"), tbl(args(1), "queries"),
      num(args(2), "k").toInt,
      if (args.length > 3) num(args(3), "prefixDims").toInt else 16,
      if (args.length > 4) num(args(4), "candidates").toInt else 50,
      if (args.length > 5) str(args(5), "idCol") else "vec_id",
      if (args.length > 6) str(args(6), "vecCol") else "embedding"))
  }

  private def kmerBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 3,
      "kmer_counts(table[, seqCol, k])")
    plan(graft.functions.SeqAnalysis.kmerCounts(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "seqCol") else "sequence",
      if (args.length > 2) num(args(2), "k").toInt else 4))
  }

  private def orfStatsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 3,
      "orf_stats(table[, idCol, seqCol])")
    plan(graft.functions.SeqAnalysis.orfStats(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "idCol") else "id",
      if (args.length > 2) str(args(2), "seqCol") else "sequence"))
  }

  private def hetHomBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 2,
      "het_hom_counts(table[, gtCol])")
    plan(graft.functions.VariantQC.hetHomCounts(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "gtCol") else "genotypes"))
  }

  private def hweBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 4,
      "hwe_by_site(table[, chromCol, posCol, gtCol])")
    plan(graft.functions.VariantQC.hweBySite(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "chromCol") else "chrom",
      if (args.length > 2) str(args(2), "posCol") else "pos",
      if (args.length > 3) str(args(3), "gtCol") else "genotypes"))
  }

  private def titvBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 3,
      "titv(table[, refCol, altCol])")
    plan(graft.functions.VariantQC.titv(tbl(args(0), "table"),
      if (args.length > 1) str(args(1), "refCol") else "ref",
      if (args.length > 2) str(args(2), "altCol") else "alt"))
  }

  private def liftPositionsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 4,
      "lift_positions(positions, chainPath[, chromCol, posCol])")
    plan(graft.functions.LiftOver.liftPositions(tbl(args(0), "positions"),
      graft.sources.GraftIO.read_chain_file(SparkSession.active, str(args(1), "chainPath")),
      if (args.length > 2) str(args(2), "chromCol") else "chrom",
      if (args.length > 3) str(args(3), "posCol") else "pos"))
  }

  private def liftIntervalsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 6,
      "lift_intervals(intervals, chainPath[, chromCol, startCol, endCol, minMatch])")
    plan(graft.functions.LiftOver.liftIntervals(tbl(args(0), "intervals"),
      graft.sources.GraftIO.read_chain_file(SparkSession.active, str(args(1), "chainPath")),
      if (args.length > 2) str(args(2), "chromCol") else "chrom",
      if (args.length > 3) str(args(3), "startCol") else "start",
      if (args.length > 4) str(args(4), "endCol") else "end",
      if (args.length > 5) num(args(5), "minMatch") else 0.95))
  }

  /** coding_effect(variantsTable, cdsTable, refTable) — SNV
    * consequence classification through VariantQC.codingEffect; the
    * three table arguments carry the documented column contracts
    * (variants: chrom/pos/ref/alt; cds: cchrom/cds_start/cds_end/
    * strand/gene_id; ref: id/sequence). */
  private def codingEffectBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3,
      "coding_effect(variantsTable, cdsTable, refTable)")
    plan(graft.functions.VariantQC.codingEffect(
      tbl(args(0), "variantsTable"), tbl(args(1), "cdsTable"),
      tbl(args(2), "refTable")))
  }

  /** vcf_leftalign(variantsTable, fastaPath[, keyCol, maxShift]) —
    * reference-backed left-alignment via VariantQC.leftAlign (column
    * contract: keyCol/chrom/pos/ref/alt). */
  private def leftAlignBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 4,
      "vcf_leftalign(variantsTable, fastaPath[, keyCol, maxShift])")
    plan(graft.functions.VariantQC.leftAlign(
      tbl(args(0), "variantsTable"), str(args(1), "fastaPath"),
      if (args.length > 2) str(args(2), "keyCol") else "key",
      if (args.length > 3) num(args(3), "maxShift").toInt else 10000))
  }

  /** roh_segments(sitesTable[, minSites]) — homozygosity runs via
    * VariantQC.rohSegments (columns sample_idx/chrom/pos/gt). */
  private def rohBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 2,
      "roh_segments(sitesTable[, minSites])")
    plan(graft.functions.VariantQC.rohSegments(tbl(args(0), "sitesTable"),
      if (args.length > 1) num(args(1), "minSites").toInt else 3))
  }

  /** assembly_stats(lengthsTable[, lengthCol]) — N50/L50/N90 family
    * via SeqAnalysis.assemblyStats. */
  private def assemblyStatsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 1 && args.length <= 2,
      "assembly_stats(lengthsTable[, lengthCol])")
    plan(graft.functions.SeqAnalysis.assemblyStats(tbl(args(0), "lengthsTable"),
      if (args.length > 1) str(args(1), "lengthCol") else "length"))
  }

  /** ld_r2(sitesTable, maxDist) — pairwise LD through VariantQC.ldR2
    * (columns sid/pos/genotypes). */
  private def ldR2Builder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, "ld_r2(sitesTable, maxDist)")
    plan(graft.functions.VariantQC.ldR2(tbl(args(0), "sitesTable"),
      num(args(1), "maxDist").toLong))
  }

  /** hudson_fst(sitesTable, pop1Size) — per-site integer Fst pairs via
    * VariantQC.hudsonFst (columns sid/genotypes; pop 1 = the first
    * pop1Size sample positions). */
  private def fstBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, "hudson_fst(sitesTable, pop1Size)")
    plan(graft.functions.VariantQC.hudsonFst(tbl(args(0), "sitesTable"),
      num(args(1), "pop1Size").toInt))
  }

  /** ibs_counts(sitesTable) — pairwise IBS0/1/2 via
    * VariantQC.ibsCounts (columns sid/genotypes). */
  private def ibsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "ibs_counts(sitesTable)")
    plan(graft.functions.VariantQC.ibsCounts(tbl(args(0), "sitesTable")))
  }

  /** mark_duplicates(readsTable) — clip-aware duplicate marking via
    * SeqAnalysis.markDuplicates (columns qname/flag/chrom/pos/cigar/
    * score). */
  private def markDupBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "mark_duplicates(readsTable)")
    plan(graft.functions.SeqAnalysis.markDuplicates(tbl(args(0), "readsTable")))
  }

  /** triangle_stats(edgesTable) — triangle count + clustering
    * coefficient via GraphOps.triangleStats (columns src/dst). */
  private def triangleBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "triangle_stats(edgesTable)")
    plan(graft.pipeline.GraphOps.triangleStats(tbl(args(0), "edgesTable")))
  }

  /** k_core(edgesTable, k[, maxRounds]) — iterative peeling via
    * GraphOps.kCore. NOTE: peeling runs AT PLAN TIME (the rounds are
    * driver-side loop construction), the same eager contract as
    * semantic_dedup's k-means. */
  private def kCoreBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 3,
      "k_core(edgesTable, k[, maxRounds])")
    plan(graft.pipeline.GraphOps.kCore(tbl(args(0), "edgesTable"),
      num(args(1), "k").toInt,
      if (args.length > 2) num(args(2), "maxRounds").toInt else 30))
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    reg.createOrReplaceTempFunction("ld_r2", ldR2Builder, "scala_udf")
    reg.createOrReplaceTempFunction("hudson_fst", fstBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("ibs_counts", ibsBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("mark_duplicates", markDupBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("triangle_stats", triangleBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("k_core", kCoreBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("vcf_leftalign", leftAlignBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("roh_segments", rohBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("assembly_stats", assemblyStatsBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("coding_effect", codingEffectBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("lift_positions", liftPositionsBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("lift_intervals", liftIntervalsBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("orf_stats", orfStatsBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("het_hom_counts", hetHomBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("hwe_by_site", hweBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("titv", titvBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("edit_distance_pairs", editPairsBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("zipf_profile", zipfBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("mrl_topk", mrlTopKBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("kmer_counts", kmerBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("near_dup_pairs", nearDupBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("semantic_dedup", semanticBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("remove_duplicate_spans", spansBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("closest_features", closestBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("kmeans_ivf_topk", kmeansIvfBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("int8_topk", int8TopKBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("heavy_hitters", heavyHittersBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("leakage_safe_split", leakageSplitBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("bm25_topk", bm25Builder, "scala_udf")
    reg.createOrReplaceTempFunction("quality_score", qualityScoreBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("lsh_topk", lshTopKBuilder, "scala_udf")
  }
}
