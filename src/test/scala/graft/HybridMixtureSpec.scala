package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural properties of the hybrid-retrieval / mixture / diff /
  * outlier entries that complement the DuckDB hash oracle: internal
  * consistency (scores recomputable from emitted ranks), partition
  * completeness, and bound checks.
  */
class HybridMixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val SF = "/root/testdata/sf0.001"

  test("hybrid RRF: fused score is exactly the micro-point reciprocal of the emitted ranks") {
    val rows = SparkEntry.queries("text_hybrid_rrf_topk")(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rBm = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val rVec = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(rBm.isDefined || rVec.isDefined, "a fused row must come from at least one channel")
      val expected =
        rBm.map(x => math.round(1e6 / (60 + x))).getOrElse(0L) +
          rVec.map(x => math.round(1e6 / (60 + x))).getOrElse(0L)
      assert(r.getLong(4) == expected, s"rrf_micro mismatch on $r")
    }
    // per query: rn is 1..n contiguous and rrf_micro non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to sorted.length),
        s"query $q ranks not contiguous")
      val micros = sorted.map(_.getLong(4)).toSeq
      assert(micros == micros.sorted.reverse, s"query $q fused order broken")
    }
  }

  test("hybrid RRF: a doc present in both channels beats a doc with only one equal-or-worse rank") {
    val rows = SparkEntry.queries("text_hybrid_rrf_topk")(spark, SF).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val both = rs.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
      val single = rs.filter(r => r.isNullAt(2) ^ r.isNullAt(3))
      for (b <- both; s <- single) {
        val sRank = if (s.isNullAt(2)) s.getInt(3) else s.getInt(2)
        val bWorst = math.max(b.getInt(2), b.getInt(3))
        if (bWorst <= sRank)
          assert(b.getLong(4) > s.getLong(4),
            "two-channel doc with no-worse ranks must out-score a one-channel doc")
      }
    }
  }

  test("mixture apply: integer rates are exact and the scarcest source keeps everything") {
    val out = SparkEntry.queries("pipe_mixture_apply")(spark, SF).collect()
    assert(out.nonEmpty)
    val minTok = out.map(_.getLong(1)).min
    out.foreach { r =>
      val (srcTok, rate) = (r.getLong(1), r.getLong(2))
      assert(rate == 1000000L * minTok / srcTok, s"rate not integer-exact for $r")
      assert(r.getLong(4) <= srcTok, "kept token mass cannot exceed the source's mass")
    }
    val scarcest = out.filter(_.getLong(1) == minTok)
    assert(scarcest.forall(_.getLong(2) == 1000000L),
      "the min-token source must have acceptance rate 1.0")
    // realized mass should land near the target (md5 buckets are uniform;
    // generous envelope — this is a sanity rail, not a statistical test)
    out.foreach { r =>
      assert(r.getLong(4) <= 2 * minTok && (r.getLong(2) == 1000000L || r.getLong(4) > 0),
        s"realized mass implausibly far from target in $r")
    }
  }

  test("corpus diff: classes partition the union of both versions, recomputed independently") {
    val out = SparkEntry.queries("pipe_corpus_diff")(spark, SF).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val ids = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    def cls(id: Long): Option[String] = {
      val in1 = id % 7 != 0
      val in2 = id % 5 != 0
      if (!in1 && !in2) None
      else if (!in1) Some("added")
      else if (!in2) Some("removed")
      else if (id % 11 == 0) Some("changed") // upper(text) differs unless text has no letters
      else Some("unchanged")
    }
    val expected = ids.flatMap(id => cls(id).map(_ -> id))
      .groupBy(_._1).view.mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    // "changed" assumes every %11 doc's text contains a letter; verify that
    val texts = spark.read.parquet(s"$SF/documents.parquet")
      .where(col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 0 && col("doc_id") % 5 =!= 0)
      .select(col("text")).collect().map(_.getString(0))
    assert(texts.forall(t => t != t.toUpperCase), "fixture assumption: %11 docs change under upper()")
    assert(out == expected, s"diff classes mismatch:\n got $out\n want $expected")
  }

  test("centroid outliers: 5 per label, cosine-ascending, bounded") {
    val rows = SparkEntry.queries("ann_centroid_outliers")(spark, SF).collect()
    val byLabel = rows.groupBy(_.getInt(1))
    assert(byLabel.nonEmpty)
    byLabel.foreach { case (label, rs) =>
      assert(rs.length == 5, s"label $label should surface exactly 5 outliers")
      val cos = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted, s"label $label outliers not ascending")
      cos.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
  }
}
