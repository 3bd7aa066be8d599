package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Losslessness property for the exact radius search
  * (Similarity.radiusSearch / ann_radius_prune): on seeded random
  * inputs the pruned search must equal UNPRUNED brute force exactly —
  * same pairs, same rounded cosines — because triangle-inequality cell
  * pruning only discards cells that provably cannot hold a qualifying
  * vector. The generator mixes isotropic noise with tight clusters
  * (so some cells are dense and near the radius boundary, the regime
  * where an unsound bound would drop boundary pairs) and runs several
  * thresholds including one near the data's typical cosine, where the
  * accept boundary cuts straight through cells.
  */
class RadiusSearchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("pruned radius search equals brute force on random clustered inputs") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(19)
    for ((tau, trial) <- Seq(0.15, 0.4, 0.7).zipWithIndex) {
      val dim = 8
      val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian() * 2))
      val data = (0 until 150).map { i =>
        val base =
          if (i % 3 == 0) Array.fill(dim)(rnd.nextGaussian()) // isotropic
          else centers(rnd.nextInt(4)).map(_ + rnd.nextGaussian() * 0.3)
        (i.toLong, base.toSeq)
      }
      val e = data.toDF("vec_id", "v")
      val got = graft.queries.Similarity.radiusSearch(e, qBelow = 10, tau = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val brute = e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          expr("round(graft_cosine_sim(qv, v), 6)").as("cos"))
        .where(col("cos") >= tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute,
        s"trial $trial tau=$tau: pruned search diverged from brute force " +
          s"(missing ${brute.diff(got).size}, extra ${got.diff(brute).size})")
      assert(brute.nonEmpty, s"trial $trial tau=$tau: degenerate test — no pairs")
    }
  }

  test("cell-pair-pruned self-join equals all-pairs brute force") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(23)
    for ((tau, trial) <- Seq(0.2, 0.5).zipWithIndex) {
      val dim = 6
      val centers = Array.fill(5)(Array.fill(dim)(rnd.nextGaussian() * 2))
      val data = (0 until 120).map { i =>
        val base =
          if (i % 4 == 0) Array.fill(dim)(rnd.nextGaussian())
          else centers(rnd.nextInt(5)).map(_ + rnd.nextGaussian() * 0.25)
        (i.toLong, base.toSeq)
      }
      val e = data.toDF("vec_id", "v")
      val got = graft.queries.Similarity.radiusSelfPairs(e, tau = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val a = e.select(col("vec_id").as("id_a"), col("v").as("qv"))
      val brute = e.select(col("vec_id").as("id_b"), col("v").as("v"))
        .crossJoin(a)
        .where(col("id_a") < col("id_b"))
        .selectExpr("id_a", "id_b", "round(graft_cosine_sim(qv, v), 6) AS cos")
        .where(col("cos") >= tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute,
        s"trial $trial tau=$tau: self-pairs diverged (missing ${brute.diff(got).size}, " +
          s"extra ${got.diff(brute).size})")
      assert(brute.nonEmpty, s"trial $trial tau=$tau: degenerate test — no pairs")
    }
  }
}
