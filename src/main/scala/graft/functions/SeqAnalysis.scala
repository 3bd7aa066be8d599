package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-level sequence analytics built by composing codegen'd
  * built-ins — no custom kernels, so the whole pipeline stays inside
  * whole-stage codegen and Catalyst can push/prune around it.
  */
object SeqAnalysis {

  /** Minimizer sketch of a sequence column — the k-mer sampling
    * minimap2-class aligners anchor on: in every window of `window`
    * consecutive k-mers, keep the one with the smallest hash. Any two
    * sequences sharing an exact run of `k + window - 1` bases share a
    * minimizer DETERMINISTICALLY (the winnowing guarantee — same
    * property, genomic alphabet), so shared-minimizer pairs are overlap
    * candidates at ~1/window the index size of all k-mers.
    *
    * Hashes are md5-derived (first 15 hex chars as a positive int64),
    * the same engine-recomputable convention the text winnowing and
    * SimHash entries use — an external system (or the DuckDB oracle)
    * can rebuild identical sketches from the published formula.
    *
    * Scale shape: per-row HOF transform (codegen, no shuffle) then
    * explode+distinct; downstream joins on the minimizer key are
    * posting-list joins bounded like every sketch family here. Output:
    * (`idCol`, minimizer) rows. */
  def minimizers(df: DataFrame, idCol: String = "id",
                 seqCol: String = "sequence", k: Int = 4,
                 window: Int = 3): DataFrame = {
    require(k >= 1 && window >= 1,
      s"SeqAnalysis.minimizers: k ($k) and window ($window) must be >= 1")
    require(df.columns.contains(idCol) && df.columns.contains(seqCol),
      s"SeqAnalysis.minimizers: need columns '$idCol' and '$seqCol'")
    df.where(length(col(seqCol)) >= k + window - 1)
      .withColumn("hs", expr(
        s"""transform(sequence(1, length(`$seqCol`) - ${k - 1}), i ->
              cast(conv(substr(md5(substring(`$seqCol`, i, $k)), 1, 15), 16, 10) as bigint))"""))
      .select(col(idCol), explode(expr(
        s"array_distinct(transform(sequence(0, size(hs) - $window), j -> array_min(slice(hs, j + 1, $window))))"))
        .as("minimizer"))
  }

  /** k-mer spectrum of a sequence column: counts of each length-`k`
    * substring, optionally CANONICAL (a k-mer and its reverse
    * complement are the same molecule read from opposite strands, so
    * counters collapse each onto the lexicographically smaller of the
    * two — the convention every genomics counter defaults to).
    *
    * Scale shape: per-row transform+explode (map-side, codegen) into a
    * single k-mer-keyed groupBy with partial aggregation, so the
    * shuffle carries at most one row per distinct k-mer per task — the
    * result cardinality is bounded by min(4^k, input k-mers), not by
    * corpus size. This is the canonical distributed genomics workload
    * shape: count locally, combine globally.
    *
    * The reverse complement here is the plain translate+reverse of the
    * A/C/G/T alphabet, NOT the reference-bug-replicating
    * `reverse_complement` scalar (see SeqOps.reverseComplement) — a
    * counter must use the mathematically correct strand fold.
    */
  def kmerCounts(df: DataFrame, seqCol: String = "sequence", k: Int = 4,
                 canonical: Boolean = true): DataFrame = {
    require(k >= 1, s"SeqAnalysis.kmerCounts: k ($k) must be >= 1")
    require(df.columns.contains(seqCol),
      s"SeqAnalysis.kmerCounts: no column '$seqCol'")
    val raw = df
      .where(length(col(seqCol)) >= k)
      .select(explode(expr(
        s"transform(sequence(1, length(`$seqCol`) - ${k - 1}), i -> substring(`$seqCol`, i, $k))"))
        .as("kmer"))
    val folded =
      if (canonical)
        raw.select(least(col("kmer"),
          reverse(translate(col("kmer"), "ACGT", "TGCA"))).as("kmer"))
      else raw
    folded.groupBy("kmer").agg(count(lit(1)).as("n"))
  }

  /** Six-frame ORF statistics per record (EMBOSS getorf analog; the
    * fmt_orf_scan entry pins the semantics on a golden fixture): both
    * strands x three frames, where an ORF is a maximal M..* protein
    * span with the stop REQUIRED — open-ended trailing reads don't
    * count, and nested starts fold into the longest span per stop
    * (getorf's default). The minus strand uses the mathematically
    * correct reverse complement (translate+reverse), NOT the
    * reference-bug-replicating reverse_complement scalar — same
    * deliberate split as kmerCounts' canonical fold. Output: one row
    * per (id, strand): n_orfs, longest_aa (residues in the longest
    * ORF, 0 when none).
    *
    * Scale shape: everything up to the final (id, strand)-keyed agg is
    * a codegen'd per-row explode (6 frames per record), so the shuffle
    * carries two rows per record regardless of sequence length. */
  def orfStats(df: DataFrame, idCol: String = "id",
               seqCol: String = "sequence"): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(seqCol),
      s"SeqAnalysis.orfStats: need columns '$idCol' and '$seqCol'")
    GraftFunctions.registerAll(df.sparkSession)
    // upper() + the LENIENT translation (unknown codons -> 'X'): real
    // assemblies carry N runs and soft-masked lowercase, and one such
    // contig must not kill a corpus-wide scan. X is neither M nor *,
    // so it can sit inside an ORF but never start or end one —
    // getorf's treatment.
    df.selectExpr(s"`$idCol` AS __oid", s"upper(`$seqCol`) AS fwd")
      .selectExpr("__oid", "fwd",
        "reverse(translate(fwd, 'ACGT', 'TGCA')) AS rev")
      .select(col("__oid"), explode(array(
        struct(lit("+").as("strand"), col("fwd").as("seq")),
        struct(lit("-").as("strand"), col("rev").as("seq")))).as("sf"))
      .select(col("__oid"), col("sf.strand").as("strand"), col("sf.seq").as("seq"),
        explode(array(lit(0), lit(1), lit(2))).as("f"))
      .selectExpr("__oid", "strand",
        """translate_dna_to_aa_lenient(substr(seq, 1 + f,
             ((length(seq) - f) div 3) * 3)) AS aa""")
      .selectExpr("__oid", "strand",
        "regexp_extract_all(aa, 'M[^*]*\\\\*', 0) AS orfs")
      .groupBy("__oid", "strand")
      .agg(sum(size(col("orfs"))).as("n_orfs"),
        max(coalesce(
          expr("array_max(transform(orfs, o -> length(o) - 1))"),
          lit(0))).as("longest_aa"))
      .selectExpr(s"__oid AS `$idCol`", "strand", "n_orfs", "longest_aa")
  }
}
