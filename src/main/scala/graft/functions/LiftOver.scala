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
}
