package graft

import org.scalatest.funsuite.AnyFunSuite

/** VectorOps facade: same plan shapes the ann_* gate entries prove
  * against the oracle, adapted to user column names. */
class VectorOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def vecsDf = {
    import spark.implicits._
    // 4 unit-ish vectors: 0 and 1 nearly parallel, 2 orthogonal, 3 anti
    Seq(
      (10L, Array(1.0f, 0.0f, 0.0f), "a"),
      (11L, Array(0.9f, 0.1f, 0.0f), "a"),
      (12L, Array(0.0f, 1.0f, 0.0f), "b"),
      (13L, Array(-1.0f, 0.0f, 0.0f), "b"))
      .toDF("id", "emb", "cell")
  }

  test("bruteForceTopK ranks by cosine, excludes self, respects k") {
    val out = graft.pipeline.VectorOps.bruteForceTopK(
      vecsDf, vecsDf.where("id = 10"), k = 2, idCol = "id", vecCol = "emb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((10L, 11L, 1), (10L, 12L, 2)))
  }

  test("ivfTopK searches only the query's cell") {
    val out = graft.pipeline.VectorOps.ivfTopK(
      vecsDf, vecsDf.where("id = 10"), k = 3, cellCol = "cell",
      idCol = "id", vecCol = "emb")
      .collect().map(_.getLong(1))
    // cell "a" holds only {10, 11}: the orthogonal/anti vectors in cell
    // "b" are never touched even with k = 3
    assert(out.toSeq == Seq(11L))
  }
}
