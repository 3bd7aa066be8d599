package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, TreeOps}

/** TreeOps: the pointer-doubling ancestor closure must converge on
  * trees DEEPER than any fixed unroll (the round-8 cophenetic entry
  * hardcoded 4 hops), and fail loudly when its round bound is too
  * small instead of silently truncating paths. */
class TreeOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  /** Depth-6 caterpillar: ((((((A:1,B:2):1,C:3):1,D:4):1,E:5):1,F:6):1,G:7)r; */
  private val caterpillar =
    "((((((A:1.0,B:2.0):1.0,C:3.0):1.0,D:4.0):1.0,E:5.0):1.0,F:6.0):1.0,G:7.0)r;"

  private def nodesOf(newick: String) = {
    GraftFunctions.registerAll(spark)
    spark.sql(s"SELECT 0L AS i, explode(parse_newick('$newick')) AS n")
      .selectExpr("i", "n.node AS node", "n.name AS name", "n.parent AS parent",
        "coalesce(n.branch_length, cast(0.0 as double)) AS bl",
        "n.is_leaf AS is_leaf")
  }

  test("cophenetic distances on a depth-6 tree (past any 4-hop unroll)") {
    val got = TreeOps.copheneticDistances(nodesOf(caterpillar)).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    // leaf depths: A,B hang off the deepest internal node (6 edges down)
    assert(got(("A", "B")) == 3.0)   // 1 + 2
    assert(got(("A", "C")) == 5.0)   // 1 + 1 + 3
    assert(got(("B", "C")) == 6.0)
    assert(got(("A", "G")) == 13.0)  // 1 + five 1.0 internals + 7
    assert(got(("B", "G")) == 14.0)
    assert(got(("C", "F")) == 12.0)  // 3 + three 1.0 internals + 6
    assert(got(("F", "G")) == 14.0)  // 6 + 1 + 7
    assert(got.size == 21)           // C(7,2) unordered leaf pairs
  }

  test("a too-small round bound fails loudly, never truncates silently") {
    val e = intercept[IllegalArgumentException] {
      TreeOps.ancestorClosure(nodesOf(caterpillar), maxRounds = 1).count()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("closure carries the node itself at distance zero and the root for all") {
    val anc = TreeOps.ancestorClosure(nodesOf(caterpillar)).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    val n = nodesOf(caterpillar).count().toInt
    (0 until n).foreach { v => assert(anc((v, v)) == 0.0, s"node $v") }
    // root is node 0 in preorder allocation; every node reaches it
    (0 until n).foreach { v => assert(anc.contains((v, 0)), s"node $v -> root") }
  }
}
