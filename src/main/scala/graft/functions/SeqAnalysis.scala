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

  /** Assembly contiguity statistics (QUAST-style) over a contig-length
    * column: contig count, total bases, longest contig, and the
    * N50/L50/N90 family — N50 is the length of the contig at which the
    * cumulative sum of lengths, taken longest-first, first reaches
    * half the assembly; L50 its 1-based rank; N90 the 90% analog.
    *
    * All thresholds are computed in INTEGER arithmetic
    * (2*cum >= total, 10*cum >= 9*total) so the oracle can restate
    * them exactly. The global-ordered window is deliberate: the frame
    * reduces to one i64 per contig before sorting, and even a
    * vertebrate assembly is a few million rows — the single-task sort
    * is on a tiny projection, not the sequence data. */
  def assemblyStats(df: DataFrame, lengthCol: String = "length"): DataFrame = {
    require(df.columns.contains(lengthCol),
      s"SeqAnalysis.assemblyStats: no column '$lengthCol'")
    import org.apache.spark.sql.expressions.Window
    val lens = df.select(col(lengthCol).cast("long").as("len")).where(col("len") > 0)
    val tot = lens.agg(sum("len").as("total"), count(lit(1)).as("n_contigs"),
      max("len").as("max_len"))
    val w = Window.orderBy(col("len").desc)
    lens.withColumn("cum", sum("len").over(w))
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(tot))
      .agg(
        first("n_contigs").as("n_contigs"),
        first("total").as("total_bases"),
        first("max_len").as("max_len"),
        max(when(expr("2 * cum >= total"), col("len"))).as("n50"),
        min(when(expr("2 * cum >= total"), col("rk"))).cast("long").as("l50"),
        max(when(expr("10 * cum >= 9 * total"), col("len"))).as("n90"))
  }

  /** Mash-style genome comparison via bottom-k k-mer sketches (Ondov
    * et al. 2016): each sequence reduces to its `sketchSize` smallest
    * distinct k-mer hashes; for every genome pair the Jaccard estimate
    * is |S(A) ∩ S(B) ∩ S(A ∪ B)| / |S(A ∪ B)| over the union's own
    * bottom-k — the unbiased containment trick that lets two fixed-size
    * sketches stand in for full k-mer sets. Hashes follow the engine-
    * recomputable md5 convention the minimizer/winnowing family uses,
    * so the oracle can rebuild identical sketches. Jaccard is reported
    * in integer micro fixed-point.
    *
    * Scale shape: genomes of any length reduce to `sketchSize` i64
    * rows BEFORE any join; the pair fan is over sketches, never
    * sequences — the whole comparison is O(n² · sketchSize) on tiny
    * rows with the pair list broadcast. */
  def mashSketchJaccard(df: DataFrame, idCol: String = "id",
                        seqCol: String = "sequence", k: Int = 8,
                        sketchSize: Int = 16): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(seqCol),
      s"SeqAnalysis.mashSketchJaccard: need columns '$idCol' and '$seqCol'")
    import org.apache.spark.sql.expressions.Window
    val hashes = df.select(col(idCol).as("gid"), col(seqCol).as("seq"))
      .where(length(col("seq")) >= k)
      .select(col("gid"), explode(expr(
        s"""array_distinct(transform(sequence(1, length(seq) - ${k - 1}), i ->
              cast(conv(substr(md5(substring(seq, i, $k)), 1, 15), 16, 10) as bigint)))"""))
        .as("h"))
    val sk = hashes
      .withColumn("rk", row_number().over(Window.partitionBy("gid").orderBy("h")))
      .where(col("rk") <= sketchSize).select("gid", "h")
    // pair frame: ONE genome-count-bounded row (sorted id list), then
    // two generators expand the i<j pairs — no join node of any kind
    // (a crossJoin-with-filter plans as a BroadcastNestedLoopJoin even
    // at G rows, and plan gates ban that node outright)
    val pairKeys = broadcast(sk.select("gid").distinct()
      .agg(sort_array(collect_list(col("gid"))).as("gs"))
      .select(explode(col("gs")).as("ga"), col("gs"))
      .select(col("ga"), explode(expr("filter(gs, g -> g > ga)")).as("gb")))
    // each sketch row lands on the pairs where its genome is the A
    // side and where it is the B side — two broadcast EQUI-joins
    // union'd, not one OR-condition join (an OR key forces a
    // BroadcastNestedLoopJoin that scans every sketch row against all
    // G^2/2 pairs; the equi form hashes on the pair key)
    val sideA = sk.join(pairKeys, col("gid") === col("ga"))
      .select(col("ga"), col("gb"), col("h"), lit(1).as("ina"), lit(0).as("inb"))
    val sideB = sk.join(pairKeys, col("gid") === col("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(0).as("ina"), lit(1).as("inb"))
    sideA.union(sideB)
      .groupBy("ga", "gb", "h")
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
      .withColumn("rk", row_number().over(Window.partitionBy("ga", "gb").orderBy("h")))
      .where(col("rk") <= sketchSize)
      .groupBy("ga", "gb")
      .agg(sum(when(col("ina") + col("inb") === 2, 1L).otherwise(0L)).as("shared"),
        count(lit(1)).as("union_k"))
      .selectExpr("ga", "gb", "shared", "union_k",
        "shared * 1000000 div union_k AS jaccard_micro")
  }

  /** Optical/PCR duplicate marking (the Picard MarkDuplicates /
    * `samtools markdup` core) over SAM-shaped rows: reads sharing a
    * library signature — (chrom, unclipped 5' position, strand) —
    * are one template sequenced repeatedly; the highest-scoring read
    * per signature survives, the rest are flagged. The 5' position is
    * CLIP-AWARE, the detail naive implementations miss: a forward
    * read's 5' end is pos minus its leading soft/hard clips, a
    * reverse read's is pos + reference-consumed length − 1 plus its
    * TRAILING clips — so the same template clipped differently by
    * the aligner still collapses. Winner = (score desc, qname asc),
    * the deterministic tie-break a rerun-stable pipeline needs.
    *
    * Scale shape: one codegen'd per-row CIGAR fold (no explode — the
    * op walk rides an aggregate HOF), then a single window keyed by
    * the signature. Signatures are near-unique across a genome, so
    * the window shuffle is as balanced as the coverage; at 100 TB
    * this is exactly the samtools-markdup-on-a-cluster layout. */
  def markDuplicates(df: DataFrame, qnameCol: String = "qname",
                     flagCol: String = "flag", chromCol: String = "chrom",
                     posCol: String = "pos", cigarCol: String = "cigar",
                     scoreCol: String = "score"): DataFrame = {
    Seq(qnameCol, flagCol, chromCol, posCol, cigarCol, scoreCol).foreach(c =>
      require(df.columns.contains(c), s"SeqAnalysis.markDuplicates: no column '$c'"))
    graft.functions.GraftFunctions.registerAll(df.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("chrom", "u5", "rev")
      .orderBy(col(scoreCol).desc, col(qnameCol).asc)
    df.withColumn("__ops", expr(s"parse_cigar($cigarCol)"))
      .withColumn("__lead", expr(
        """aggregate(__ops, named_struct('n', 0L, 'stop', false),
             (st, o) -> IF(NOT st.stop AND o.op IN ('S', 'H'),
               named_struct('n', st.n + o.len, 'stop', false),
               named_struct('n', st.n, 'stop', true)),
             st -> st.n)"""))
      .withColumn("__trail", expr(
        """aggregate(reverse(__ops), named_struct('n', 0L, 'stop', false),
             (st, o) -> IF(NOT st.stop AND o.op IN ('S', 'H'),
               named_struct('n', st.n + o.len, 'stop', false),
               named_struct('n', st.n, 'stop', true)),
             st -> st.n)"""))
      .withColumn("__reflen", expr(
        """aggregate(filter(__ops, o -> o.op IN ('M', 'D', 'N', '=', 'X')),
             0L, (acc, o) -> acc + o.len)"""))
      .withColumn("rev", (col(flagCol).bitwiseAND(lit(16)) =!= 0))
      .withColumn("u5", when(col("rev"),
          col(posCol) + col("__reflen") - 1 + col("__trail"))
        .otherwise(col(posCol) - col("__lead")))
      .withColumn("is_dup", row_number().over(w) > 1)
      .drop("__ops", "__lead", "__trail", "__reflen")
  }
}
