package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational tree algorithms over parsed-phylogeny node frames (the
  * shape `parse_newick` explodes to): per-tree ancestor closures and
  * the leaf-pair distance matrices built on them.
  *
  * Scale shape: ancestor propagation is POINTER-DOUBLING — each round
  * joins the closure with itself, so a depth-D tree converges in
  * ceil(log2 D) + 1 keyed shuffles, not D — with per-round
  * localCheckpoint lineage truncation and a 1-row convergence action,
  * the same iteration idiom the connected-components operator uses.
  * No driver-side tree walk; forests of millions of small trees ride
  * the `i` key through every join.
  */
object TreeOps {

  /** All (node, ancestor, path-length) triples per tree, the node
    * itself included at distance 0.
    *
    * @param nodes (`i`: tree id, `node`: int, `parent`: int — -1 at
    *              the root, `bl`: double — branch length to parent)
    * @param maxRounds loud upper bound: doubling covers depth
    *                  2^maxRounds, so the default 20 handles any tree
    *                  up to a million levels deep; a deeper input
    *                  throws rather than truncating its closure
    *                  silently (the round-8 fixed 4-hop unroll's
    *                  failure mode).
    */
  def ancestorClosure(nodes: DataFrame, maxRounds: Int = 20): DataFrame = {
    // seed: self at 0 plus the single-hop parent edges
    val self = nodes.selectExpr("i", "node", "node AS anc",
      "cast(0.0 as double) AS d")
    val hop = nodes.where(col("parent") =!= -1)
      .selectExpr("i", "node", "parent AS anc", "bl AS d")
    var anc = self.union(hop).localCheckpoint()
    var converged = false
    var round = 0
    while (!converged) {
      require(round < maxRounds,
        s"ancestorClosure did not converge in $maxRounds doubling rounds " +
          s"(depth > ${BigInt(2).pow(maxRounds)} or a parent cycle) — " +
          "raise maxRounds for a deeper tree, or fix the input")
      val doubled = anc.as("a")
        .join(anc.selectExpr("i", "node AS anc", "anc AS anc2", "d AS d2").as("b"),
          Seq("i", "anc"))
        .selectExpr("i", "node", "anc2 AS anc", "d + d2 AS d")
      val next = anc.union(doubled).groupBy("i", "node", "anc")
        .agg(min(col("d")).as("d"))
        .localCheckpoint() // truncate the doubling lineage per round
      // convergence = no new (node, anc) pairs; paths in a tree are
      // unique so existing pairs cannot improve
      converged = next.count() == anc.count()
      anc = next
      round += 1
    }
    anc
  }

  /** Cophenetic (leaf-to-leaf path) distance per unordered leaf-name
    * pair and tree: leaves meet on common ancestors, min(da+db)
    * selects the LCA path. Output (i, na, nb, dist) with na < nb. */
  def copheneticDistances(nodes: DataFrame): DataFrame = {
    val anc = ancestorClosure(nodes)
    val leaves = nodes.where(col("is_leaf"))
      .select(col("i"), col("node"), col("name"))
    val la = leaves.join(anc, Seq("i", "node"))
      .select(col("i"), col("name").as("na"), col("anc"), col("d").as("da"))
    val lb = leaves.join(anc, Seq("i", "node"))
      .select(col("i"), col("name").as("nb"), col("anc"), col("d").as("db"))
    la.join(lb, Seq("i", "anc")).where(col("na") < col("nb"))
      .groupBy(col("i"), col("na"), col("nb"))
      .agg(min(col("da") + col("db")).as("dist"))
  }
}
