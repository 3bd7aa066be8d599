package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coordinate liftover through UCSC chain blocks (the liftOver tool's
  * core operation), over the block-granularity frame
  * [[graft.sources.ChainFormat]] produces.
  *
  * Scale shape: chain files are megabytes while position sets are the
  * 100 TB side, so the blocks BROADCAST — exploded onto a fixed bin
  * grid so the probe is a bin-keyed EQUI-join (hash lookup per
  * position) rather than a nested-loop range scan over every block of
  * the chromosome. Minus-strand chains fold strand-space coordinates
  * to forward at projection time (fwd = q_size - 1 - strandPos).
  *
  * Every chain-side column is renamed under a `__c_` prefix before
  * the join, so input frames may carry any column name the chain
  * schema also uses (score, q_name, ... — routine in BED-derived
  * frames) without ambiguous-reference failures.
  *
  * Positions that no block covers keep their row with NULL lifted
  * columns (liftOver's "unmapped" report). Overlapping chains (rare,
  * but legal — e.g. paralogous regions) each produce a row in
  * liftPositions; liftIntervals resolves them to the best chain. */
object LiftOver {

  /** Chain blocks projected to `__c_*` names and exploded onto the
    * fixed bin grid — shared by both entry points so the bin
    * arithmetic cannot drift between them. */
  private def binnedBlocks(chains: DataFrame, binWidth: Long): DataFrame =
    chains
      .select(col("chain_id").as("__c_id"), col("score").as("__c_score"),
        col("t_name").as("__c_tname"), col("t_start").as("__c_ts"),
        col("t_end").as("__c_te"), col("q_name").as("__c_qname"),
        col("q_size").as("__c_qsize"), col("q_strand").as("__c_strand"),
        col("q_start").as("__c_qs"))
      .withColumn("__c_bin", explode(expr(
        s"sequence(__c_ts div $binWidth, (__c_te - 1) div $binWidth)")))

  def liftPositions(positions: DataFrame, chains: DataFrame,
                    chromCol: String = "chrom", posCol: String = "pos",
                    binWidth: Long = 1L << 16): DataFrame = {
    require(binWidth > 0, s"LiftOver.liftPositions: binWidth ($binWidth) must be > 0")
    require(positions.columns.contains(chromCol) && positions.columns.contains(posCol),
      s"LiftOver.liftPositions: need columns '$chromCol' and '$posCol'")
    positions
      .withColumn("__pbin", expr(s"`$posCol` div $binWidth"))
      .join(broadcast(binnedBlocks(chains, binWidth)),
        col(chromCol) === col("__c_tname") && col("__pbin") === col("__c_bin") &&
          col(posCol) >= col("__c_ts") && col(posCol) < col("__c_te"),
        "left")
      .select(positions.columns.map(col) ++ Seq(
        col("__c_qname").as("lifted_name"),
        expr(s"""CASE WHEN __c_qs IS NULL THEN NULL
                 WHEN __c_strand = '-' THEN __c_qsize - 1 - (__c_qs + (`$posCol` - __c_ts))
                 ELSE __c_qs + (`$posCol` - __c_ts) END""").as("lifted_pos"),
        col("__c_strand").as("lifted_strand"),
        col("__c_score").as("lifted_score")): _*)
  }

  /** Interval liftover with liftOver's minMatch discipline: each
    * half-open input interval maps through every overlapping block,
    * pieces are folded to forward query coordinates, and per CHAIN the
    * lifted interval is the span envelope of its pieces with
    * `mapped_bp` the exactly-aligned base count. One output row per
    * input interval: the best chain by mapped_bp (ties by chain
    * score), with status 'mapped' when mapped_bp/width >= minMatch,
    * 'partial' when something mapped but under the threshold,
    * 'unmapped' (all-NULL lifted columns) when nothing did —
    * liftOver's reject file, kept in-frame — and 'invalid' for
    * degenerate inputs (end <= start), which never probe the blocks.
    *
    * Scale shape: same broadcast bin-grid probe as liftPositions (the
    * interval explodes to its covered bins, blocks likewise, join is
    * equi on (chrom, bin) with the piece dedup on bin ownership), then
    * ONE (interval, chain)-keyed aggregate and a max_by fold to one
    * row per interval — both keyed by the input, nothing pairwise. */
  def liftIntervals(intervals: DataFrame, chains: DataFrame,
                    chromCol: String = "chrom", startCol: String = "start",
                    endCol: String = "end", minMatch: Double = 0.95,
                    binWidth: Long = 1L << 16): DataFrame = {
    require(binWidth > 0, s"LiftOver.liftIntervals: binWidth ($binWidth) must be > 0")
    require(minMatch > 0 && minMatch <= 1,
      s"LiftOver.liftIntervals: minMatch ($minMatch) must be in (0, 1]")
    require(Seq(chromCol, startCol, endCol).forall(intervals.columns.contains),
      s"LiftOver.liftIntervals: need columns '$chromCol', '$startCol', '$endCol'")
    val pieces = intervals
      .select(col(chromCol).as("__i_chrom"), col(startCol).as("__i_s"),
        col(endCol).as("__i_e"))
      .where(col("__i_s") < col("__i_e"))
      .withColumn("__ibin", explode(expr(
        s"sequence(__i_s div $binWidth, (__i_e - 1) div $binWidth)")))
      .join(broadcast(binnedBlocks(chains, binWidth)),
        col("__i_chrom") === col("__c_tname") && col("__ibin") === col("__c_bin") &&
          col("__i_s") < col("__c_te") && col("__c_ts") < col("__i_e"))
      // a piece straddling bins joins in each shared bin — count it
      // once, in the bin that owns the piece's start
      .where(col("__ibin") === expr(s"greatest(__i_s, __c_ts) div $binWidth"))
      .selectExpr("__i_chrom", "__i_s", "__i_e", "__c_id", "__c_score",
        "__c_qname", "__c_strand",
        "greatest(__i_s, __c_ts) - __c_ts + __c_qs AS p_qs",
        "least(__i_e, __c_te) - __c_ts + __c_qs AS p_qe",
        "__c_qsize")
      .selectExpr("__i_chrom", "__i_s", "__i_e", "__c_id", "__c_score",
        "__c_qname", "__c_strand", "p_qe - p_qs AS p_bp",
        "IF(__c_strand = '-', __c_qsize - p_qe, p_qs) AS f_qs",
        "IF(__c_strand = '-', __c_qsize - p_qs, p_qe) AS f_qe")
    val perChain = pieces
      .groupBy(col("__i_chrom"), col("__i_s"), col("__i_e"), col("__c_id"))
      .agg(first(col("__c_qname")).as("q_name"), first(col("__c_strand")).as("q_strand"),
        first(col("__c_score")).as("cscore"), sum(col("p_bp")).as("mapped_bp"),
        min(col("f_qs")).as("lifted_start"), max(col("f_qe")).as("lifted_end"))
    val best = perChain
      .groupBy(col("__i_chrom"), col("__i_s"), col("__i_e"))
      .agg(max_by(
        struct(col("q_name"), col("q_strand"), col("mapped_bp"),
          col("lifted_start"), col("lifted_end")),
        struct(col("mapped_bp"), col("cscore"))).as("__b"))
    intervals
      .join(best,
        col(chromCol) === col("__i_chrom") && col(startCol) === col("__i_s") &&
          col(endCol) === col("__i_e"),
        "left")
      .select(intervals.columns.map(col) ++ Seq(
        col("__b.q_name").as("lifted_name"),
        col("__b.lifted_start").as("lifted_start"),
        col("__b.lifted_end").as("lifted_end"),
        col("__b.q_strand").as("lifted_strand"),
        coalesce(col("__b.mapped_bp"), lit(0L)).as("mapped_bp"),
        expr(s"""CASE
            WHEN `$endCol` <= `$startCol` THEN 'invalid'
            WHEN __b IS NULL THEN 'unmapped'
            WHEN __b.mapped_bp >= $minMatch * (`$endCol` - `$startCol`) THEN 'mapped'
            ELSE 'partial' END""").as("lift_status")): _*)
  }
}
