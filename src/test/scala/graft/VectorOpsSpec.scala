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

  test("quantizeInt8: codes bounded, max element hits ±127, dequantize is faithful, zero vector survives") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = ((0L until 20L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))) :+
      (99L, Array.fill(16)(0.0f))).toDF("id", "emb")
    val out = graft.pipeline.VectorOps.quantizeInt8(df, "id", "emb")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2))).toMap
    val in = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out.keySet == in.keySet)
    for ((id, (scale, codes)) <- out) {
      assert(codes.forall(c => c >= -127 && c <= 127), s"codes out of range for $id")
      if (id == 99L) {
        assert(scale == 0.0 && codes.forall(_ == 0))
      } else {
        // the max-|x| element quantizes to exactly ±127 by construction
        assert(codes.exists(c => math.abs(c) == 127), s"no full-scale code for $id")
        val orig = in(id).map(_.toDouble)
        val deq = codes.map(_ * scale)
        val cos = orig.zip(deq).map { case (a, b) => a * b }.sum /
          (math.sqrt(orig.map(x => x * x).sum) * math.sqrt(deq.map(x => x * x).sum))
        assert(cos > 0.999, s"dequantized cosine $cos too low for $id")
      }
    }
  }

  test("radiusSearch equals the brute-force threshold set under renamed columns") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(5)
    val data = (0 until 80).map { i =>
      (i.toLong, Seq.fill(6)(rnd.nextGaussian().toFloat))
    }
    val corpus = data.toDF("item", "feat")
    val queries = data.take(6).toDF("item", "feat")
    val got = graft.pipeline.VectorOps.radiusSearch(corpus, queries, tau = 0.3,
        idCol = "item", vecCol = "feat")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val e = corpus.selectExpr("item AS vec_id", "transform(feat, x -> cast(x as double)) AS v")
    val q = e.where($"vec_id" < 6).select($"vec_id".as("q_id"), $"v".as("qv"))
    val brute = e.crossJoin(org.apache.spark.sql.functions.broadcast(q))
      .where($"vec_id" =!= $"q_id")
      .selectExpr("q_id", "vec_id", "round(graft_cosine_sim(qv, v), 6) AS cos")
      .where($"cos" >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"radiusSearch diverged (missing ${brute.diff(got).size}, " +
      s"extra ${got.diff(brute).size})")
    assert(brute.nonEmpty, "degenerate test: no qualifying pairs")
    intercept[IllegalArgumentException] {
      graft.pipeline.VectorOps.radiusSearch(corpus, queries, tau = 1.5,
        idCol = "item", vecCol = "feat")
    }
  }

  test("bruteForceTopK ranks by cosine, excludes self, respects k") {
    val out = graft.pipeline.VectorOps.bruteForceTopK(
      vecsDf, vecsDf.where("id = 10"), k = 2, idCol = "id", vecCol = "emb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((10L, 11L, 1), (10L, 12L, 2)))
  }

  test("kmeansIvfTopK: nprobe = cells equals brute force; nprobe = 1 is a candidate subset") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val corpus = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
      .toDF("id", "emb")
    val queries = corpus.where("id < 4")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = rows(graft.pipeline.VectorOps.bruteForceTopK(
      corpus, queries, k = 5, idCol = "id", vecCol = "emb"))
    val full = rows(graft.pipeline.VectorOps.kmeansIvfTopK(
      corpus, queries, k = 5, cells = 4, nprobe = 4, idCol = "id", vecCol = "emb"))
    assert(full == brute, "probing every cell must equal brute force exactly")
    val one = graft.pipeline.VectorOps.kmeansIvfTopK(
      corpus, queries, k = 5, cells = 4, nprobe = 1, idCol = "id", vecCol = "emb")
      .collect()
    // single-probe hits are genuine cosines from the query's own cell:
    // every (q, id, cos) also appears in a full-corpus scoring
    assert(one.nonEmpty && one.forall(_.getInt(3) >= 1))
    val bruteAll = rows(graft.pipeline.VectorOps.bruteForceTopK(
      corpus, queries, k = 60, idCol = "id", vecCol = "emb"))
      .map(t => (t._1, t._2, t._3))
    assert(one.forall(r =>
      bruteAll.contains((r.getLong(0), r.getLong(1), r.getDouble(2)))))
  }

  test("lshTopK: an exact duplicate always collides and ranks first; empty corpus is schema-stable") {
    import spark.implicits._
    // buckets are scale-invariant and deterministic, so a duplicated
    // vector is ALWAYS a candidate of its twin regardless of planes
    val out = graft.pipeline.VectorOps.lshTopK(
      vecsDf, vecsDf.where("id = 10"), k = 3, idCol = "id", vecCol = "emb")
      .collect()
    assert(out.nonEmpty && out.forall(_.getLong(0) == 10L))
    // candidate-subset property: every hit re-ranked by true cosine
    assert(out.map(_.getInt(3)).toSeq == (1 to out.length).toSeq)
    val withDup = vecsDf.union(Seq((99L, Array(1.0f, 0.0f, 0.0f), "a")).toDF("id", "emb", "cell"))
    val dupHits = graft.pipeline.VectorOps.lshTopK(
      withDup, withDup.where("id = 99"), k = 1, idCol = "id", vecCol = "emb")
      .collect()
    assert(dupHits.length == 1 && dupHits(0).getLong(1) == 10L &&
      dupHits(0).getDouble(2) == 1.0)
    val empty = graft.pipeline.VectorOps.lshTopK(
      vecsDf.where("id < 0"), vecsDf, k = 3, idCol = "id", vecCol = "emb")
    assert(empty.columns.toSeq == Seq("q_id", "id", "cos", "rn") && empty.count() == 0)
    intercept[IllegalArgumentException] {
      graft.pipeline.VectorOps.lshTopK(vecsDf, vecsDf, k = 3, bits = 64)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.VectorOps.lshTopK(vecsDf, vecsDf, k = 3, hamming = 2)
    }
  }

  test("int8TopK recall vs float brute force on the test embeddings") {
    // fixed data -> deterministic: 24 of 25 top-5 hits agree (96%);
    // the floor leaves margin without losing meaning
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where("vec_id < 5")
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fl = hits(graft.pipeline.VectorOps.bruteForceTopK(e, q, k = 5))
    val i8 = hits(graft.pipeline.VectorOps.int8TopK(e, q, k = 5))
    assert(fl.size == 25 && i8.size == 25)
    val overlap = (fl & i8).size
    assert(overlap >= 22, s"int8 top-5 recall degraded: $overlap/25")
  }

  test("int8TopK ranks on quantized codes and agrees with float ranking") {
    val out = graft.pipeline.VectorOps.int8TopK(
      vecsDf, vecsDf.where("id = 10"), k = 3, idCol = "id", vecCol = "emb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // same order as bruteForceTopK on these well-separated vectors;
    // the anti-parallel vector ranks last
    assert(out.toSeq == Seq((10L, 11L, 1), (10L, 12L, 2), (10L, 13L, 3)))
  }

  test("pqTopK: an exact duplicate of the query always ranks first") {
    // the ADC-minimum theorem: a duplicate's codes are the argmin of the
    // query's own LUT rows, so its LUT-sum is the global minimum —
    // quantization error can never rank anything STRICTLY above it.
    // (Vectors sharing the duplicate's codes tie exactly — ADC sees
    // codes, not vectors — so assert on the distance, not the id.)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
    // 90..92 duplicate 0..2 exactly
    val corpus = (base ++ (0 until 3).map(i => (90L + i, base(i)._2)))
      .toDF("id", "emb")
    val queries = corpus.where("id < 3")
    val rows = graft.pipeline.VectorOps.pqTopK(
      corpus, queries, k = 50, subspaces = 2, centroids = 4,
      idCol = "id", vecCol = "emb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    (0 until 3).foreach { i =>
      val mine = rows.filter(_._1 == i.toLong)
      val top1Ad = mine.find(_._4 == 1).get._3
      val dupAd = mine.find(_._2 == 90L + i).get._3
      assert(dupAd == top1Ad, s"query $i: duplicate ad $dupAd above rank-1 ad $top1Ad")
      assert(top1Ad >= 0.0)
    }
  }

  test("pqTopK rejects a vector length not divisible by the subspace count") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "emb")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.VectorOps.pqTopK(df, df, k = 1, subspaces = 2,
        idCol = "id", vecCol = "emb")
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("excludeSelfIds = false keeps corpus rows sharing a query id; quoted names work") {
    import spark.implicits._
    // query table with its OWN id space overlapping corpus ids, and a
    // column name that needs backtick quoting
    val corpus = Seq((7L, Array(1.0f, 0.0f)), (8L, Array(0.8f, 0.2f)))
      .toDF("id", "my emb")
    val queries = Seq((7L, Array(1.0f, 0.05f))).toDF("id", "my emb")
    val out = graft.pipeline.VectorOps.bruteForceTopK(
      corpus, queries, k = 2, idCol = "id", vecCol = "my emb",
      excludeSelfIds = false)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // corpus row 7 is the true rank-1 neighbor of query 7 and survives
    assert(out.toSeq == Seq((7L, 1), (8L, 2)))
  }

  test("pqTopK: empty corpus yields an empty typed result") {
    import spark.implicits._
    val none = Seq.empty[(Long, Array[Float])].toDF("id", "emb")
    val queries = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "emb")
    val out = graft.pipeline.VectorOps.pqTopK(none, queries, k = 3,
      subspaces = 2, idCol = "id", vecCol = "emb")
    assert(out.columns.toSeq == Seq("q_id", "id", "ad", "rn"))
    assert(out.count() == 0)
  }

  test("pqTopK fails loudly on ragged vector lengths") {
    import spark.implicits._
    val corpus = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(1.0f, 2.0f))).toDF("id", "emb")
    val e = intercept[Exception] {
      graft.pipeline.VectorOps.pqTopK(corpus, corpus.where("id = 1"),
        k = 1, subspaces = 2, idCol = "id", vecCol = "emb").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("vector length mismatch")), e.getMessage)
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

  test("mrlRerankTopK: full-dim rerank fixes prefix-order inversions; wide candidates == brute force") {
    import spark.implicits._
    // prefix = first 2 dims. Vs the query, id 21 wins on the prefix
    // (identical first dims) but id 20 wins on the full vector — the
    // rerank stage must flip them; with candidates >= corpus the result
    // must equal exact brute force.
    val corpus = Seq(
      (20L, Array(1.0f, 0.0f, 0.9f, 0.0f)),
      (21L, Array(1.0f, 0.1f, 0.0f, 0.9f)),
      (22L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (23L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "emb")
    val query = Seq((1L, Array(1.0f, 0.0f, 1.0f, 0.0f))).toDF("id", "emb")
    val mrl = graft.pipeline.VectorOps.mrlRerankTopK(
      corpus, query, k = 2, prefixDims = 2, candidates = 4,
      idCol = "id", vecCol = "emb", excludeSelfIds = false)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(mrl.toSeq == Seq((20L, 1), (21L, 2)))
    val bf = graft.pipeline.VectorOps.bruteForceTopK(
      corpus, query, k = 2, idCol = "id", vecCol = "emb",
      excludeSelfIds = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    val wide = graft.pipeline.VectorOps.mrlRerankTopK(
      corpus, query, k = 2, prefixDims = 2, candidates = 4,
      idCol = "id", vecCol = "emb", excludeSelfIds = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(wide.toSeq == bf.toSeq)
    // a candidate cut below the prefix rank of the full-dim winner is
    // the documented lossiness: with candidates = 1 only the prefix
    // winner (21 — tie on prefix cos broken by lower... ) survives
    val tight = graft.pipeline.VectorOps.mrlRerankTopK(
      corpus, query, k = 1, prefixDims = 2, candidates = 1,
      idCol = "id", vecCol = "emb", excludeSelfIds = false)
      .collect().map(_.getLong(1))
    assert(tight.length == 1)
    intercept[IllegalArgumentException] {
      graft.pipeline.VectorOps.mrlRerankTopK(corpus, query, k = 5,
        candidates = 2, idCol = "id", vecCol = "emb")
    }
  }
}
