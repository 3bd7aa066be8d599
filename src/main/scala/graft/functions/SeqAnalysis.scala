package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-level sequence analytics built by composing codegen'd
  * built-ins — no custom kernels, so the whole pipeline stays inside
  * whole-stage codegen and Catalyst can push/prune around it.
  */
object SeqAnalysis {

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
}
