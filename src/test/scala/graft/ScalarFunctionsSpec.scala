package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Pins the reference's golden scalar-function behavior
  * (reference test/sql/exondb-release-with-deb-info/test_scalar_functions.test,
  * recorded in FIXTURES.md). */
class ScalarFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def one(sql: String): Any = {
    GraftFunctions.registerAll(spark)
    spark.sql(s"SELECT $sql").collect()(0).get(0)
  }
  private def err(sql: String): Unit = {
    GraftFunctions.registerAll(spark)
    assertThrows[Exception](spark.sql(s"SELECT $sql").collect())
  }

  test("gc_content goldens") {
    assert(one("gc_content('ATGC')") == 0.5f)
    assert(one("gc_content('')") == 0.0f)
    assert(one("gc_content(CAST(NULL AS STRING))") == null)
  }

  test("complement goldens") {
    assert(one("complement('ATGC')") == "TACG")
    err("complement('ATCGQ')")
  }

  test("reverse_complement replicates the reference's non-reversing map") {
    assert(one("reverse_complement('ATCG')") == "CGAT")
    // Reference bug enshrined by its golden test: no reversal, shifted map.
    assert(one("reverse_complement('GGGG')") == "TTTT")
  }

  test("transcribe / reverse_transcribe goldens") {
    assert(one("transcribe('ATCG')") == "AUCG")
    err("transcribe('ATNN')")
    assert(one("reverse_transcribe('AUCG')") == "ATCG")
    err("reverse_transcribe('AXCG')")
  }

  test("translate_dna_to_aa goldens") {
    assert(one("translate_dna_to_aa('ATGCGC')") == "MR")
    err("translate_dna_to_aa('ATGC')")   // length % 3 != 0
    err("translate_dna_to_aa('NNN')")    // unknown codon
    // spot-check the full table incl. stops
    assert(one("translate_dna_to_aa('TAATAGTGATGG')") == "***W")
  }

  test("parse_cigar goldens") {
    val rows = spark.sql("SELECT explode(parse_cigar('1M2M123S'))").collect()
    assert(rows.map(_.getStruct(0)).map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("M", 1), ("M", 2), ("S", 123)))
    err("parse_cigar('MMM')")
  }

  test("extract_from_cigar golden") {
    val r = spark.sql("SELECT extract_from_cigar('AACCAA', '2I2M2I')").collect()(0).getStruct(0)
    assert((r.getInt(0), r.getInt(1), r.getString(2)) == ((2, 4, "CC")))
  }

  test("quality_score_string_to_list Phred+33") {
    val got = spark.sql("SELECT quality_score_string_to_list('!+5?')").collect()(0).getSeq[Int](0)
    assert(got == Seq(0, 10, 20, 30))
  }

  test("gff_parse_attributes") {
    val m = spark.sql("SELECT gff_parse_attributes('gene_id=caat1;gene_name=gene0;')")
      .collect()(0).getMap[String, String](0)
    assert(m == Map("gene_id" -> "caat1", "gene_name" -> "gene0"))
    err("gff_parse_attributes('novalue')")
  }

  test("SAM flag predicates (reference golden matrix)") {
    val cases = Seq(
      "is_segmented(1)", "is_unmapped(7)", "is_properly_aligned(7)",
      "is_mate_unmapped(15)", "is_reverse_complemented(31)",
      "is_mate_reverse_complemented(63)", "is_first_segment(127)",
      "is_last_segment(255)", "is_secondary(511)",
      "is_quality_control_failed(2815)", "is_duplicate(4095)",
      "is_supplementary(8191)")
    cases.foreach(c => assert(one(c) == true, c))
    assert(one("is_secondary(255)") == false)
  }

  test("graft_l2_sq matches the HOF it replaced, bit for bit") {
    // the kernel must replay aggregate(zip_with(...))'s left-to-right
    // accumulation exactly — the ANN oracles were written against it
    val a = Seq.tabulate(64)(i => (i * 37 % 101) / 7.0)
    val b = Seq.tabulate(64)(i => (i * 53 % 97) / 11.0)
    def lit(xs: Seq[Double]) = xs.mkString("array(", "D, ", "D)")
    val kernel = one(s"graft_l2_sq(${lit(a)}, ${lit(b)})").asInstanceOf[Double]
    val hof = one(
      s"aggregate(zip_with(${lit(a)}, ${lit(b)}, (x, y) -> (x - y) * (x - y)), 0D, (s, x) -> s + x)")
      .asInstanceOf[Double]
    assert(kernel == hof, s"$kernel != $hof")
    assert(one("graft_l2_sq(array(1D, 2D), array(1D, 2D))") == 0.0)
  }

  test("exondb_version") {
    assert(one("exondb_version()") == "0.3.9")
  }

  test("SeqAnalysis.kmerCounts folds strands canonically") {
    val spark2 = SparkTestSession.get
    import spark2.implicits._
    val df = Seq("ATCGA", "AT").toDF("sequence")
    // k=4 over ATCGA: ATCG (revcomp CGAT -> keep ATCG), TCGA (its own
    // revcomp — palindrome); the len-2 row contributes nothing
    val canon = graft.functions.SeqAnalysis.kmerCounts(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(canon == Map("ATCG" -> 1L, "TCGA" -> 1L))
    // raw mode keeps the as-read strand
    val raw = graft.functions.SeqAnalysis.kmerCounts(df, canonical = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(raw == Map("ATCG" -> 1L, "TCGA" -> 1L))
    // a k-mer whose revcomp sorts lower IS folded: GGGG -> CCCC
    val g = Seq("GGGG").toDF("sequence")
    assert(graft.functions.SeqAnalysis.kmerCounts(g)
      .collect().head.getString(0) == "CCCC")
    intercept[IllegalArgumentException] {
      graft.functions.SeqAnalysis.kmerCounts(df, k = 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.SeqAnalysis.kmerCounts(df, seqCol = "nope")
    }
  }

  test("SeqAnalysis.minimizers: winnowing guarantee and sampling bound") {
    val spark2 = SparkTestSession.get
    import spark2.implicits._
    // k=4, window=3: any shared run of k+w-1 = 6 bases forces a shared
    // minimizer. Sequences share the run ACGTAC inside different flanks.
    val df = Seq(
      ("a", "GGGGACGTACGGGG"),
      ("b", "TTACGTACTTTTTT"),
      ("c", "CCCCCCCCCCCCCC")).toDF("id", "sequence")
    val fps = graft.functions.SeqAnalysis.minimizers(df)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byId = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byId("a") intersect byId("b")).nonEmpty, byId)
    assert((byId("a") intersect byId("c")).isEmpty)
    // sampling: far fewer minimizers than k-mers (11 kmers in seq a)
    assert(byId("a").size < 11)
    // too-short sequences contribute nothing, not an error
    val short = graft.functions.SeqAnalysis.minimizers(
      Seq(("s", "ACGT")).toDF("id", "sequence"))
    assert(short.count() == 0)
    intercept[IllegalArgumentException] {
      graft.functions.SeqAnalysis.minimizers(df, k = 0)
    }
  }
}
