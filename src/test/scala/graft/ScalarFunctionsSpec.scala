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

  test("norm_variant parsimony goldens") {
    def nv(pos: Long, r: String, a: String): String =
      one(s"concat_ws(':', norm_variant(${pos}L, '$r', '$a').pos, " +
        s"norm_variant(${pos}L, '$r', '$a').ref, norm_variant(${pos}L, '$r', '$a').alt)").toString
    assert(nv(100, "ACGT", "ACT") == "101:CG:C")      // suffix then prefix
    assert(nv(50, "CTT", "CT") == "50:CT:C")          // deletion keeps anchor
    assert(nv(7, "T", "TGG") == "7:T:TGG")            // already minimal
    assert(nv(9, "GCGCG", "GCG") == "9:GCG:G")        // overlapping repeats
    assert(nv(3, "AAA", "AAA") == "3:A:A")            // identical collapses to anchor
    assert(nv(11, "ACGT", "<DEL>") == "11:ACGT:<DEL>") // symbolic untouched
    assert(nv(12, "A", "A[chr2:321682[") == "12:A:A[chr2:321682[") // breakend untouched
    assert(nv(13, "AC", ".") == "13:AC:.")            // missing alt untouched
    assert(one("norm_variant(1L, CAST(NULL AS STRING), 'A')") == null)
  }

  test("split_genotype goldens") {
    assert(one("split_genotype('1/2:99:3', 1)") == "1/0:99:3")
    assert(one("split_genotype('1/2:99:3', 2)") == "0/1:99:3")
    assert(one("split_genotype('0|2', 2)") == "0|1")
    assert(one("split_genotype('./1', 1)") == "./1")
    assert(one("split_genotype('.', 3)") == ".")
    assert(one("split_genotype('2', 2)") == "1")          // haploid
    assert(one("split_genotype('1/2/3', 3)") == "0/0/1")  // polyploid
    assert(one("split_genotype(CAST(NULL AS STRING), 1)") == null)
  }

  test("quality_trim_length goldens") {
    assert(one("quality_trim_length('IIIIIIII', 4, 20)") == 8)    // clean read kept
    assert(one("quality_trim_length('####IIII', 4, 20)") == 0)    // first window fails
    assert(one("quality_trim_length('II', 4, 20)") == 2)          // shorter than window
    assert(one("quality_trim_length('', 4, 20)") == 0)
    assert(one("quality_trim_length('IIIII####', 4, 20)") == 4)   // window at 4: I### = 11.5
    assert(one("quality_trim_length(CAST(NULL AS STRING), 4, 20)") == null)
    err("quality_trim_length('III', 0, 20)")
  }

  test("assemblyStats hand-computed N50/L50/N90") {
    val df = spark.range(0).sparkSession.createDataFrame(
      Seq(Tuple1(10L), Tuple1(8L), Tuple1(6L), Tuple1(4L), Tuple1(2L))).toDF("length")
    val r = graft.functions.SeqAnalysis.assemblyStats(df).collect()(0)
    // total 30: cum desc 10,18,24,28,30 -> n50=8 (cum 18*2>=30), l50=2,
    // n90: 10*cum>=270 first at cum 28 (len 4)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      === ((5L, 30L, 10L, 8L, 2L, 4L)))
  }

  test("mendel_violation goldens") {
    assert(one("mendel_violation('1/1', '0/0', '0/1')") == true)   // father lacks 1
    assert(one("mendel_violation('0/1', '1|1', '0/0')") == false)  // 1 from f, 0 from m
    assert(one("mendel_violation('2/0', '0/1', '2/2')") == false)  // order-insensitive
    assert(one("mendel_violation('1/1:30', '0/1', '1/0')") == false) // FORMAT tail stripped
    assert(one("mendel_violation('./1', '0/0', '0/0')") == null)   // missing -> null
    assert(one("mendel_violation('1', '0/0', '0/0')") == null)     // haploid -> null
    assert(one("mendel_violation('0/1', CAST(NULL AS STRING), '0/0')") == null)
  }

  test("parse_newick goldens and malformed trees") {
    assert(one("size(parse_newick('((A:0.1,B:0.2):0.3,C);'))") == 5)
    // single leaf, no lengths
    assert(one("concat_ws('|', transform(parse_newick('(X,Y)Z;'), n -> concat(coalesce(n.name, '_'), ':', n.parent)))")
      == "Z:-1|X:0|Y:0")
    // root branch length is legal newick
    assert(one("parse_newick('(A:1)R:9;')[0].branch_length") == 9.0)
    err("parse_newick('((A,B);')")   // unbalanced (
    err("parse_newick('A,B));')")    // unbalanced )
    err("parse_newick(';')")
    assert(one("parse_newick(CAST(NULL AS STRING))") == null)
  }
}
