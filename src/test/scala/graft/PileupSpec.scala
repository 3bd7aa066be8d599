package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pileup

/** CIGAR-consumption semantics of the Pileup core, pinned per-op and
  * on a random fleet of reads against an independent plain-Scala CIGAR
  * walker (no Spark, no HOF aggregate — a different formulation, so a
  * shared bug would need the same mistake twice). The fmt_sam_pileup
  * gate entry pins the end-to-end writer->reader->pileup->call
  * composition against the DuckDB oracle; this spec owns the
  * per-operator consumption table and the call-rule boundaries. */
class PileupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def reads(rows: (String, Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("reference", "start", "cigar", "sequence")
  }

  private def aligned(rows: (String, Long, String, String)*): Set[(Long, String)] =
    Pileup.baseAlignments(reads(rows: _*))
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet

  test("M consumes both: each base lands at start+i") {
    assert(aligned(("c", 10L, "4M", "ACGT")) ===
      Set((10L, "A"), (11L, "C"), (12L, "G"), (13L, "T")))
  }

  test("D leaves a pileup gap; following bases shift right") {
    // 2M2D2M over ACGT: A@5 C@6, gap 7-8, G@9 T@10
    assert(aligned(("c", 5L, "2M2D2M", "ACGT")) ===
      Set((5L, "A"), (6L, "C"), (9L, "G"), (10L, "T")))
  }

  test("N (intron skip) behaves like D for position accounting") {
    assert(aligned(("c", 5L, "2M3N2M", "ACGT")) ===
      Set((5L, "A"), (6L, "C"), (10L, "G"), (11L, "T")))
  }

  test("I never leaks inserted bases; reference position holds") {
    // 2M2I2M over ACGT: A@5 C@6 then G,T are query bases 5,6 -> pos 7,8
    assert(aligned(("c", 5L, "2M2I2M", "ACGTGT")) ===
      Set((5L, "A"), (6L, "C"), (7L, "G"), (8L, "T")))
  }

  test("S skips query bases without moving the reference cursor") {
    // 2S2M: soft-clipped prefix AC skipped, G@5 T@6
    assert(aligned(("c", 5L, "2S2M", "ACGT")) ===
      Set((5L, "G"), (6L, "T")))
  }

  test("H and P consume nothing") {
    assert(aligned(("c", 5L, "2H2M1P", "GT")) === Set((5L, "G"), (6L, "T")))
  }

  test("0M ops emit no span: no fabricated rows at pos-1/qi-1") {
    // '0M' is legal CIGAR padding; a zero-length span would turn the
    // downstream sequence(0, len-1) explode into [0,-1] and fabricate
    // two rows per op. The kernel must skip it entirely.
    assert(aligned(("c", 5L, "0M2M0M", "GT")) === Set((5L, "G"), (6L, "T")))
    assert(aligned(("c", 5L, "0M", "")) === Set())
  }

  test("unmapped (null reference) and null cigar rows are dropped") {
    assert(aligned((null, 5L, "2M", "AC"), ("c", 5L, null, "AC")) === Set())
  }

  test("invalid CIGAR fails loudly through the native span kernel") {
    val e = intercept[org.apache.spark.SparkException] {
      aligned(("c", 5L, "2M3Q", "ACGTT"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cigar_spans")), msgs(e).mkString("|"))
  }

  test("a 10k-op long-read CIGAR pileups in linear time (ONT shape)") {
    // the pre-kernel HOF walk concat-copied the pair list per op —
    // quadratic; 10k alternating 3M1I ops would take minutes there.
    // The native span walk + double explode handles it in one pass.
    val ops = 5000
    val cigar = "3M1I" * ops
    val seq = "ACGTA" * (4 * ops / 5)
    val t0 = System.nanoTime()
    val n = Pileup.baseAlignments(reads(("c", 1L, cigar, seq))).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 3L * ops)
    assert(secs < 30, f"long-read CIGAR walk took $secs%.1f s — quadratic regression?")
  }

  test("random reads: HOF walk matches an independent Scala CIGAR walker") {
    val rnd = new scala.util.Random(41)
    val ops = "MIDNS"
    val fleet = (0 until 120).map { i =>
      val n = 1 + rnd.nextInt(5)
      val cig = new StringBuilder
      var qlen = 0
      (0 until n).foreach { _ =>
        val op = ops(rnd.nextInt(ops.length))
        val len = 1 + rnd.nextInt(4)
        cig.append(len).append(op)
        if ("MIS".contains(op)) qlen += len
      }
      val seq = Seq.fill(math.max(qlen, 1))("ACGT"(rnd.nextInt(4))).mkString
      (s"c${i % 3}", (1 + rnd.nextInt(50)).toLong, cig.toString, seq)
    }
    // independent walker: regex-split the cigar, imperative cursor pair
    val expected = fleet.flatMap { case (ref, start, cig, seq) =>
      val it = "(\\d+)([MIDNSHP=X])".r.findAllMatchIn(cig)
      var r = start; var q = 1
      it.flatMap { m =>
        val len = m.group(1).toInt
        m.group(2) match {
          case "M" | "=" | "X" =>
            val out = (0 until len).map(i => (ref, r + i, seq.substring(q - 1 + i, q + i)))
            r += len; q += len; out
          case "D" | "N" => r += len; Nil
          case "I" | "S" => q += len; Nil
          case _ => Nil
        }
      }.toSeq
    }.groupBy(identity).view.mapValues(_.size).toMap
    val got = Pileup.baseAlignments(reads(fleet: _*))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got === expected)
  }

  test("consensus: majority wins, ties break lexicographically, gaps keep the reference") {
    val s = spark
    import s.implicits._
    // ref 'AAAAA'; pos 1: C majority (2C vs 1A) -> C, changed;
    // pos 2: tie 1C/1G -> lexicographic C, changed; pos 3: A majority
    // holds; pos 4-5: uncovered -> reference fill
    val rs = Seq(
      ("r", 1L, "1M", "C"), ("r", 1L, "1M", "C"), ("r", 1L, "1M", "A"),
      ("r", 2L, "1M", "C"), ("r", 2L, "1M", "G"),
      ("r", 3L, "1M", "A"), ("r", 3L, "1M", "A"), ("r", 3L, "1M", "T"))
      .toDF("reference", "start", "cigar", "sequence")
    val fasta = Seq(("r", "AAAAA")).toDF("id", "sequence")
    val out = Pileup.consensus(rs, fasta).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "r")
    assert(out(0).getString(1) == "CCAAA")
    assert(out(0).getLong(2) == 2L)
  }

  test("real SAM fixture: '*' cigars (unmapped) drop cleanly, insertions skip") {
    // example.sam: r001 10M at 1, r002 5M2I3M at 25, r003 unmapped
    // (reference/cigar/sequence all '*' -> reader nulls -> filtered,
    // never fed to parse_cigar which rejects '*' loudly)
    val got = Pileup.baseAlignments(graft.sources.GraftIO
        .read_sam_file_records(spark, "src/test/resources/fixtures/sam/example.sam"))
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(got.length == 18, got.toSeq)
    val byPos = got.toMap
    assert(byPos(1L) == "C" && byPos(10L) == "T", byPos)     // r001 span
    assert(byPos(29L) == "A" && byPos(30L) == "T", byPos)    // insertion skipped CG
    assert(!byPos.contains(33L))
  }

  test("call rule boundaries: depth and integer alt-fraction are inclusive") {
    val s = spark
    import s.implicits._
    // ref 'AAAA'; pos 1: depth 4, 2 alt (50% >= 30% -> called);
    // pos 2: depth 3 (below minDepth); pos 3: depth 4, 1 alt (25% < 30%)
    val rs = Seq(
      ("r", 1L, "1M", "A"), ("r", 1L, "1M", "C"), ("r", 1L, "1M", "C"),
      ("r", 1L, "1M", "A"),
      ("r", 2L, "1M", "C"), ("r", 2L, "1M", "C"), ("r", 2L, "1M", "C"),
      ("r", 3L, "1M", "A"), ("r", 3L, "1M", "A"), ("r", 3L, "1M", "A"),
      ("r", 3L, "1M", "C"))
      .toDF("reference", "start", "cigar", "sequence")
    val fasta = Seq(("r", "AAAA")).toDF("id", "sequence")
    val sites = Pileup.pileupSites(rs, fasta, minDepth = 4, minAltTenths = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(5))).toSet
    assert(sites === Set((1L, 4L, 2L)))
  }
}
