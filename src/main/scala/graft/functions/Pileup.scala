package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pileup: per-reference-position base accounting over SAM-shaped
  * alignment frames (the shape [[graft.sources.Formats]] SamFormat and
  * BamFormat produce: `reference`, `start`, `cigar`, `sequence`), plus
  * the naive variant-site detector built on it — the samtools
  * `mpileup` composition, re-expressed as Spark relational algebra.
  *
  * Shape at scale: one per-read CIGAR walk (a codegen'd higher-order
  * `aggregate` over the parsed op list — no UDF), a Generate at
  * aligned-base granularity, the reference broadcast onto the base
  * stream (the reference is MBs where the reads are TBs — never the
  * shuffled side), and ONE position-keyed partial aggregation. Nothing
  * exceeds site cardinality after that agg, and the only shuffle is on
  * (reference, pos) — the key a 100 TB alignment store is already
  * sorted/sharded by, so AQE coalesces it cheaply.
  */
object Pileup {

  /** One row per aligned query base: (reference, pos, base).
    *
    * The CIGAR walk follows the SAM spec's consumption table: M/=/X
    * consume query and reference (emitting pairs), D/N consume
    * reference only, I/S consume query only, H/P consume neither — so
    * deletions leave gaps in the pileup and insertions/soft-clips
    * never leak bases into it. Unmapped records (null reference) are
    * dropped.
    *
    * The walk itself is the native [[graft.functions.CigarSpans]]
    * kernel — ONE linear pass per read emitting (pos, qi, len) spans —
    * exploded twice (spans, then offsets within a span). The previous
    * HOF formulation concat-appended per-base pairs inside `aggregate`,
    * copying the growing array once per CIGAR op: quadratic on
    * long-read (ONT/PacBio) CIGARs with thousands of ops. Nothing here
    * ever materializes more than one span's offsets at a time. */
  def baseAlignments(reads: DataFrame): DataFrame = {
    GraftFunctions.registerAll(reads.sparkSession)
    reads
      .where(col("reference").isNotNull && col("cigar").isNotNull &&
        col("sequence").isNotNull)
      .selectExpr("reference", "sequence",
        "explode(cigar_spans(cigar, cast(start as bigint))) AS sp")
      .selectExpr("reference", "sequence", "sp",
        "explode(sequence(0, sp.len - 1)) AS i")
      .select(col("reference"),
        (col("sp.pos") + col("i")).as("pos"),
        expr("substr(sequence, sp.qi + i, 1)").as("base"))
  }

  /** Per-contig 1-based reference bases from a FASTA-shaped frame
    * (`id`, `sequence`): (name, pos, ref). Generate-only — the
    * reference explodes once and broadcasts from there. */
  def refBases(fasta: DataFrame): DataFrame =
    fasta.select(col("id").as("name"),
        posexplode(split(col("sequence"), "")).as(Seq("p0", "ref")))
      .where(col("ref") =!= "")
      .select(col("name"), (col("p0") + 1).cast("long").as("pos"), col("ref"))

  /** Variant-site detection over the pileup: sites with depth >=
    * `minDepth` whose non-reference fraction reaches
    * `minAltTenths`/10 — integer arithmetic, no float threshold
    * hazard. Output: (reference, pos, ref, depth, ref_n, alt_n).
    *
    * The reference side is explicitly broadcast: at any realistic
    * scale the genome (GBs of rows at most) is dwarfed by the read
    * stream, and a shuffled join here would reshuffle the whole
    * corpus on a key it aggregates by one operator later. */
  def pileupSites(reads: DataFrame, refFasta: DataFrame,
                  minDepth: Int = 4, minAltTenths: Int = 3): DataFrame = {
    val aligned = baseAlignments(reads)
    val ref = broadcast(refBases(refFasta))
    aligned
      .join(ref, aligned("reference") === ref("name") &&
        aligned("pos") === ref("pos"))
      .select(aligned("reference"), aligned("pos"), col("ref"), col("base"))
      .groupBy("reference", "pos", "ref")
      .agg(count(lit(1)).as("depth"),
        sum(when(col("base") === col("ref"), 1L).otherwise(0L)).as("ref_n"))
      .withColumn("alt_n", col("depth") - col("ref_n"))
      .where(col("depth") >= minDepth &&
        col("alt_n") * 10 >= col("depth") * minAltTenths)
  }

  /** Majority-rule consensus per contig (samtools consensus analog):
    * at each covered position the most frequent piled base wins (ties
    * break lexicographically — deterministic, the property the oracle
    * needs); uncovered positions keep the reference base. Output:
    * (name, consensus, n_changed).
    *
    * Shape: pileup counts collapse to ONE winner row per position (a
    * window over the ≤5-row per-position base-count groups, bounded by
    * the alphabet, not the depth), then the reference spine LEFT-joins
    * the winners and each contig reassembles with one
    * sort_array∘collect_list at contig granularity — the same
    * row-per-contig granularity FASTA rows already have, so assembly
    * is no worse than reading the output. */
  def consensus(reads: DataFrame, refFasta: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = baseAlignments(reads)
      .groupBy("reference", "pos", "base").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("reference", "pos")
      .orderBy(col("n").desc, col("base").asc)
    val winner = counts
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("reference"), col("pos").as("wpos"), col("base").as("called"))
    val ref = refBases(refFasta)
    ref
      .join(winner, ref("name") === winner("reference") &&
        ref("pos") === winner("wpos"), "left")
      .select(col("name"), ref("pos").as("pos"),
        coalesce(col("called"), col("ref")).as("b"),
        (col("called").isNotNull && col("called") =!= col("ref"))
          .cast("long").as("chg"))
      .groupBy("name")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("b")))),
          x => x.getField("b")), "").as("consensus"),
        sum(col("chg")).as("n_changed"))
  }
}
