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
  * Positions that no block covers keep their row with NULL lifted
  * columns (liftOver's "unmapped" report). Overlapping chains (rare,
  * but legal — e.g. paralogous regions) each produce a row; callers
  * disambiguate by score, which rides along as lifted_score. */
object LiftOver {

  def liftPositions(positions: DataFrame, chains: DataFrame,
                    chromCol: String = "chrom", posCol: String = "pos",
                    binWidth: Long = 1L << 16): DataFrame = {
    require(binWidth > 0, s"LiftOver.liftPositions: binWidth ($binWidth) must be > 0")
    require(positions.columns.contains(chromCol) && positions.columns.contains(posCol),
      s"LiftOver.liftPositions: need columns '$chromCol' and '$posCol'")
    val blocks = chains
      .select(col("t_name"), col("t_start"), col("t_end"), col("score"),
        col("q_name"), col("q_size"), col("q_strand"), col("q_start"))
      .withColumn("__bin", explode(expr(
        s"sequence(t_start div $binWidth, (t_end - 1) div $binWidth)")))
    positions
      .withColumn("__pbin", expr(s"`$posCol` div $binWidth"))
      .join(broadcast(blocks),
        col(chromCol) === col("t_name") && col("__pbin") === col("__bin") &&
          col(posCol) >= col("t_start") && col(posCol) < col("t_end"),
        "left")
      .select(positions.columns.map(col) ++ Seq(
        col("q_name").as("lifted_name"),
        expr(s"""CASE WHEN q_start IS NULL THEN NULL
                 WHEN q_strand = '-' THEN q_size - 1 - (q_start + (`$posCol` - t_start))
                 ELSE q_start + (`$posCol` - t_start) END""").as("lifted_pos"),
        col("q_strand").as("lifted_strand"),
        col("score").as("lifted_score")): _*)
  }

  /** Interval liftover with liftOver's minMatch discipline: each
    * half-open input interval maps through every overlapping block,
    * pieces are folded to forward query coordinates, and per CHAIN the
    * lifted interval is the span envelope of its pieces with
    * `mapped_bp` the exactly-aligned base count. One output row per
    * input interval: the best chain by mapped_bp (ties by chain
    * score), with status 'mapped' when mapped_bp/width >= minMatch,
    * 'partial' when something mapped but under the threshold, and an
    * all-NULL 'unmapped' row otherwise — liftOver's reject file,
    * kept in-frame.
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
    val blocks = chains
      .select(col("chain_id"), col("score"), col("t_name"), col("t_start"),
        col("t_end"), col("q_name"), col("q_size"), col("q_strand"), col("q_start"))
      .withColumn("__bin", explode(expr(
        s"sequence(t_start div $binWidth, (t_end - 1) div $binWidth)")))
    val pieces = intervals
      .withColumn("__ibin", explode(expr(
        s"sequence(`$startCol` div $binWidth, (`$endCol` - 1) div $binWidth)")))
      .join(broadcast(blocks),
        col(chromCol) === col("t_name") && col("__ibin") === col("__bin") &&
          col(startCol) < col("t_end") && col("t_start") < col(endCol))
      // a piece straddling bins joins in each shared bin — count it
      // once, in the bin that owns the piece's start
      .where(col("__ibin") === expr(s"greatest(`$startCol`, t_start) div $binWidth"))
      .selectExpr(s"`$chromCol`", s"`$startCol`", s"`$endCol`", "chain_id", "score",
        "q_name", "q_strand",
        s"greatest(`$startCol`, t_start) - t_start + q_start AS p_qs",
        s"least(`$endCol`, t_end) - t_start + q_start AS p_qe",
        "q_size")
      .selectExpr(s"`$chromCol`", s"`$startCol`", s"`$endCol`", "chain_id", "score",
        "q_name", "q_strand", "p_qe - p_qs AS p_bp",
        "IF(q_strand = '-', q_size - p_qe, p_qs) AS f_qs",
        "IF(q_strand = '-', q_size - p_qs, p_qe) AS f_qe")
    val perChain = pieces
      .groupBy(col(chromCol), col(startCol), col(endCol), col("chain_id"))
      .agg(first(col("q_name")).as("q_name"), first(col("q_strand")).as("q_strand"),
        first(col("score")).as("score"), sum(col("p_bp")).as("mapped_bp"),
        min(col("f_qs")).as("lifted_start"), max(col("f_qe")).as("lifted_end"))
    val best = perChain
      .groupBy(col(chromCol), col(startCol), col(endCol))
      .agg(max_by(
        struct(col("q_name"), col("q_strand"), col("mapped_bp"),
          col("lifted_start"), col("lifted_end")),
        struct(col("mapped_bp"), col("score"))).as("b"))
    intervals
      .join(best, Seq(chromCol, startCol, endCol), "left")
      .select(intervals.columns.map(col) ++ Seq(
        col("b.q_name").as("lifted_name"),
        col("b.lifted_start").as("lifted_start"),
        col("b.lifted_end").as("lifted_end"),
        col("b.q_strand").as("lifted_strand"),
        coalesce(col("b.mapped_bp"), lit(0L)).as("mapped_bp"),
        expr(s"""CASE
            WHEN b IS NULL THEN 'unmapped'
            WHEN b.mapped_bp >= $minMatch * (`$endCol` - `$startCol`) THEN 'mapped'
            ELSE 'partial' END""").as("lift_status")): _*)
  }
}
