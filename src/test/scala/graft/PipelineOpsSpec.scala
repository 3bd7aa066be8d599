package graft

import graft.pipeline.Multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the pipeline ops that the DuckDB oracle can't express:
  * LSH-ANN recall against the brute-force baseline. */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val SF = "/root/testdata/sf0.001"

  // This corpus has no true near-duplicates (max pairwise cos ~0.51),
  // so "recall vs brute force" is vacuous here; the meaningful LSH
  // property is that genuinely similar vectors collide: random-
  // hyperplane buckets are invariant under positive scaling and stable
  // under tiny perturbations — a near-duplicate of any vector lands in
  // the same bucket and is therefore always a candidate.
  test("LSH buckets: scaled copies collide exactly; results are well-formed") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$SF/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    // duplicate every vector scaled by 3x: same projection signs
    val doubled = e.union(e.select(col("vec_id") + 100000,
      expr("transform(v, x -> x * 3.0)").as("v")))
    val bucketExpr =
      """aggregate(transform(sequence(0, 15), j ->
           IF(aggregate(zip_with(planes[j], v, (p, x) -> p * x), 0D, (acc, x) -> acc + x) >= 0D,
              shiftleft(1L, j), 0L)), 0L, (acc, x) -> acc + x)"""
    // reconstruct the md5-parity planes exactly as Similarity does
    val planes = Array.tabulate(16, 64) { (j, d) =>
      val b0 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"p${j}_$d".getBytes("UTF-8"))(0)
      if (((b0 >> 4) & 1) == 1) 1.0 else -1.0
    }
    val planesSql = planes.map(p => s"array(${p.mkString(",")})").mkString("array(", ",", ")")
    val buckets = doubled.withColumn("planes", expr(planesSql))
      .select(col("vec_id"), expr(bucketExpr).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    buckets.keys.filter(_ < 100000).foreach { id =>
      assert(buckets(id) == buckets(id + 100000), s"scaled copy of $id changed bucket")
    }
    // and the emitted LSH results are structurally sound
    val lsh = SparkEntry.queries("ann_lsh_bucketed")(spark, SF).collect()
    lsh.foreach(r => assert(r.getInt(3) >= 1 && r.getInt(3) <= 5))
  }

  test("PQ-ADC and IVF-PQ agree on shared machinery; cells are respected") {
    import org.apache.spark.sql.functions._
    // ADC distances come from the same codebook/LUT in both entries, so
    // for any (query, vector) pair both emit, the distance must match
    val pq = SparkEntry.queries("ann_pq_adc")(spark, SF)
      .select(col("q_id"), col("vec_id"), col("ad")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivfpq = SparkEntry.queries("ann_ivfpq_topk")(spark, SF).collect()
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      pq.get(key).foreach { ad =>
        assert(ad == r.getDouble(2), s"ADC mismatch for $key: $ad vs ${r.getDouble(2)}")
      }
    }
    // IVF restriction: every emitted neighbor shares the query's cell
    val labels = spark.read.parquet(s"$SF/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    ivfpq.foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"IVF-PQ crossed cells: ${r.getLong(0)} -> ${r.getLong(1)}")
    }
    // per-query ranks are 1..k with non-decreasing approx distance
    ivfpq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to byRank.length))
      assert(byRank.map(_.getDouble(2)).toSeq.sliding(2).forall {
        case Seq(a, b) => a <= b; case _ => true })
    }
  }

  test("every query name is unique and every query has an oracle") {
    val total = SparkEntry.queries.size
    val withOracle = SparkEntry.oracleSql.size
    assert(total == SparkEntry.registry.size)
    assert(withOracle == total, s"$withOracle/$total oracles")
  }

  test("filterPairs: identical embeddings keep at cos=1; disjoint supports drop; threshold validated") {
    import spark.implicits._
    val same = Array.fill[Byte](16)(7)
    val horiz = Array.tabulate[Byte](16)(i => if (i < 8) 9 else 0)   // support {0..7}
    val vert = Array.tabulate[Byte](16)(i => if (i >= 8) 9 else 0)   // support {8..15}: dot = 0
    val pairs = Seq(
      Multimodal.MediaCaptionRow(1L, same, same),
      Multimodal.MediaCaptionRow(2L, horiz, vert)).toDS()
    val out = Multimodal.filterPairs(pairs, minCos100 = 100)
      .collect().map(r => r.doc_id -> ((r.dot, r.keep))).toMap
    assert(out(1L) == ((16L * 49, true)))  // cos exactly 1 survives even at 100
    assert(out(2L) == ((0L, false)))
    intercept[IllegalArgumentException] {
      Multimodal.filterPairs(pairs, minCos100 = 101)
    }
  }
}
