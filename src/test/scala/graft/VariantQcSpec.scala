package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SeqAnalysis, SeqOps, VariantQC}

/** General-semantics coverage for the VariantQC and SeqAnalysis.orfStats
  * cores. The fmt_vcf_titv / fmt_vcf_het_hom / fmt_vcf_hwe /
  * fmt_orf_scan gate entries pin fixture goldens against the DuckDB
  * oracle; this spec pins the cores on adversarial and RANDOM inputs
  * against independent plain-Scala reimplementations (no regex, no
  * Spark), so a shared-bug-in-both-sides failure mode would need the
  * same mistake in two unrelated formulations. */
class VariantQcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  // ---- independent naive ORF scanner ----

  private val codonMap: Map[String, Char] = SeqOps.codonPairs.toMap

  /** (n_orfs, longest_aa) over one already-oriented nucleotide string,
    * all three frames: walk codons, track the first M since the last
    * stop, credit an ORF at each stop that had a start. */
  private def naiveOrfs(seq0: String): (Long, Int) = {
    val seq = seq0.toUpperCase
    var n = 0L
    var longest = 0
    for (f <- 0 until 3) {
      val usable = ((seq.length - f) / 3) * 3
      if (usable > 0) {
        val aa = seq.substring(f, f + usable).grouped(3)
          .map(codonMap.getOrElse(_, 'X')).mkString
        var firstM = -1
        for (i <- aa.indices) {
          if (aa(i) == '*') {
            if (firstM >= 0) { n += 1; longest = math.max(longest, i - firstM) }
            firstM = -1
          } else if (aa(i) == 'M' && firstM < 0) firstM = i
        }
      }
    }
    (n, longest)
  }

  private def revComp(s: String): String =
    s.toUpperCase.reverse.map {
      case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'
      case other => other // N and other ambiguity codes stay put
    }

  test("orfStats matches a naive independent scanner on random sequences") {
    val rnd = new scala.util.Random(20260814L)
    // alphabet includes N and soft-mask lowercase: the lenient
    // translation must treat them as X, never throw
    val seqs = (0 until 80).map { i =>
      val len = rnd.nextInt(61) // 0..60, includes sub-codon lengths
      (s"s$i", (0 until len).map(_ => "ACGTACGTNacgt"(rnd.nextInt(13))).mkString)
    }
    val df = spark.createDataFrame(seqs).toDF("id", "sequence")
    val got = SeqAnalysis.orfStats(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    assert(got.size == seqs.size * 2)
    seqs.foreach { case (id, seq) =>
      assert(got((id, "+")) == naiveOrfs(seq), s"$id + strand of '$seq'")
      assert(got((id, "-")) == naiveOrfs(revComp(seq)), s"$id - strand of '$seq'")
    }
  }

  test("orfStats requires a stop codon and folds nested starts") {
    val df = spark.createDataFrame(Seq(
      ("open", "ATGAAAGCC"),      // M K A, no stop -> no ORF on +
      ("nested", "ATGGCCATGAAATAG") // M A M K * -> ONE orf, len 4 (MAMK)
    )).toDF("id", "sequence")
    val got = SeqAnalysis.orfStats(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    assert(got(("open", "+")) == ((0L, 0)))
    assert(got(("nested", "+")) == ((1L, 4)))
  }

  // ---- het/hom classification edges ----

  test("hetHomCounts: haploid, polyploid, partial-missing, phased") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("genotypes",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val rows = Seq(
      Row(Seq("1", "0|1:12", "./1", "2/2")),  // haploid hom-alt, phased het, partial-missing, multiallelic hom-alt
      Row(Seq("0", "1|2", "0/0/0", "0/1/2"))  // haploid hom-ref, het, triploid hom-ref, triploid het
    )
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = VariantQC.hetHomCounts(df).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // columns: n_hom_ref, n_het, n_hom_alt, n_missing
    assert(got(0) == ((1L, 0L, 1L, 0L))) // '1' hom-alt; '0' hom-ref
    assert(got(1) == ((0L, 2L, 0L, 0L))) // '0|1' + '1|2' both het
    assert(got(2) == ((1L, 0L, 0L, 1L))) // './1' missing; '0/0/0' hom-ref
    assert(got(3) == ((0L, 1L, 1L, 0L))) // '2/2' hom-alt; '0/1/2' het
  }

  // ---- Hardy-Weinberg arithmetic ----

  test("hweBySite: hand-computed chi-square and monomorphic NULL") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chrom",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("genotypes",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val rows = Seq(
      // 4 samples: 1 hom-ref, 2 het, 1 hom-alt -> p = 0.5, perfect HWE
      // E = (1, 2, 1) = O -> chi2 = 0
      Row("1", 10L, Seq("0/0", "0/1", "1/0", "1/1")),
      // haploid and triploid calls are EXCLUDED (vcftools --hardy):
      // only the 0/1 diploid enters -> n=1, p=0.5, chi2=1
      Row("1", 50L, Seq("0", "0/1", "0/0/0")),
      // all het: O = (0, 4, 0), p = 0.5, E = (1, 2, 1)
      // chi2 = 1 + 4/2 + 1 = 4
      Row("1", 20L, Seq("0/1", "0/1", "0/1", "0/1")),
      // monomorphic ref -> NULL
      Row("1", 30L, Seq("0/0", "0/0", "0/0", "0/0")),
      // monomorphic alt (lumped 1/2 counts as alt-hom) -> NULL
      Row("1", 40L, Seq("1/1", "1/2", "2/2", "1/1")))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = VariantQC.hweBySite(df).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(got(10L) == ((4L, 0.5, Some(0.0))))
    assert(got(50L) == ((1L, 0.5, Some(1.0))))
    assert(got(20L) == ((4L, 0.5, Some(4.0))))
    assert(got(30L) == ((4L, 1.0, None)))
    assert(got(40L) == ((4L, 0.0, None)))
  }

  // ---- Ti/Tv classification edges ----

  test("titv: symbolic, indel, lowercase stay out of the snp count") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ref",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("alt",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val rows = Seq(
      Row("A", Seq("G", "<DEL>")), // ti + symbolic-other
      Row("C", Seq("T")),          // ti
      Row("G", Seq("C", "T")),     // tv + tv
      Row("a", Seq("g")),          // lowercase -> other (callers emit uppercase)
      Row("AT", Seq("A")))         // indel -> other
    val df = spark.createDataFrame(rows.asJava, schema)
    val r = VariantQC.titv(df).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 2L, 3L)))
    assert(r.getDouble(4) == 1.0)
  }

  test("codingEffect: hand-computed codons on both strands") {
    val s = spark
    import s.implicits._
    // contig c1 = ATGGCATAA: '+' gene over 1..9 (M, A, *)
    // contig c2 = TTACATCAT: '-' gene over 1..9 — reading revcomp from
    // the 3' end: codon0 = revcomp(CAT @7..9) = ATG (M)
    val ref = Seq(("c1", "ATGGCATAA"), ("c2", "TTACATCAT")).toDF("id", "sequence")
    val cds = Seq(("c1", 1L, 9L, "+", "P"), ("c2", 1L, 9L, "-", "M"))
      .toDF("cchrom", "cds_start", "cds_end", "strand", "gene_id")
    val variants = Seq(
      ("c1", 4L, "G", "T"), // GCA -> TCA: A -> S, missense
      ("c1", 6L, "A", "G"), // GCA -> GCG: A -> A, synonymous
      ("c1", 7L, "T", "G"), // TAA -> GAA: * -> E, stop_lost
      ("c1", 3L, "G", "A"), // ATG -> ATA: M -> I, missense
      ("c2", 8L, "A", "G"), // plus CAT -> CGT, oriented ATG -> ACG: M -> T
      ("c2", 9L, "T", "A")) // plus CAT -> CAA, oriented ATG -> TTG: M -> L
      .toDF("chrom", "pos", "ref", "alt")
    val got = VariantQC.codingEffect(variants, cds, ref)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(5), r.getString(6), r.getString(7), r.getString(8), r.getString(9)))
      .toMap
    assert(got(("c1", 4L)) == (("GCA", "TCA", "A", "S", "missense")), got)
    assert(got(("c1", 6L)) == (("GCA", "GCG", "A", "A", "synonymous")), got)
    assert(got(("c1", 7L)) == (("TAA", "GAA", "*", "E", "stop_lost")), got)
    assert(got(("c1", 3L)) == (("ATG", "ATA", "M", "I", "missense")), got)
    assert(got(("c2", 8L)) == (("ATG", "ACG", "M", "T", "missense")), got)
    assert(got(("c2", 9L)) == (("ATG", "TTG", "M", "L", "missense")), got)
    // a variant outside every CDS yields no row (inner join semantics)
    val none = VariantQC.codingEffect(
      Seq(("c1", 99L, "A", "C")).toDF("chrom", "pos", "ref", "alt"), cds, ref)
    assert(none.count() == 0L)
  }

  // ---- leftAlign edge cases ----

  private def alignOne(fa: String, pos: Long, ref: String, alt: String,
                       maxShift: Int = 10000): (Long, String, String) = {
    import spark.implicits._
    val df = Seq((0L, "c1", pos, ref, alt)).toDF("key", "chrom", "pos", "ref", "alt")
    val r = VariantQC.leftAlign(df, fa, maxShift = maxShift).collect()(0)
    (r.getLong(2), r.getString(3), r.getString(4))
  }

  private def stageFasta(name: String, seq: String): String = {
    val fa = s"${queries.Stage.tempDir(name)}/ref.fa"
    java.nio.file.Files.write(java.nio.file.Paths.get(fa), (s">c1\n$seq\n").getBytes("UTF-8"))
    fa
  }

  test("leftAlign: contig-start boundary keeps a valid pos-1 representation") {
    // run of A starts AT position 1 — a deletion inside it can shift
    // to pos 1 but no further (no base to anchor on the left)
    val fa = stageFasta("la_start", "A" * 20 + "G" * 20)
    assert(alignOne(fa, 5, "AA", "A") === ((1L, "AA", "A")))
    // SNV untouched, no reference fetch path
    assert(alignOne(fa, 25, "G", "T") === ((25L, "G", "T")))
  }

  test("leftAlign: shift across 4kb block-fetch boundaries") {
    // homopolymer spanning the 4096-base block edge: the shift walks
    // through two cached blocks
    val seq = "C" * 4090 + "A" * 20 + "C" * 90
    val fa = stageFasta("la_blocks", seq)
    // deletion of one A anchored near the run's right end (pos 4105)
    // left-aligns to the last C before the run (pos 4090)
    assert(alignOne(fa, 4105, "AA", "A") === ((4090L, "CA", "C")))
  }

  test("leftAlign: maxShift budget stops the walk with valid alleles") {
    val fa = stageFasta("la_budget", "C" + "A" * 100 + "G" * 20)
    val (p, r, a) = alignOne(fa, 60, "AA", "A", maxShift = 5)
    assert(r.length == 2 && a.length == 1 && r.startsWith(a))
    assert(p >= 54, s"budget 5 must not shift past ~5 bases, got pos $p")
    // unlimited budget reaches the true leftmost anchor
    assert(alignOne(fa, 60, "AA", "A") === ((1L, "CA", "C")))
  }

  test("leftAlign: multi-base indel through a dinucleotide repeat") {
    // (AT)*10 repeat: deleting one AT unit left-aligns to the repeat start
    val fa = stageFasta("la_dinuc", "G" * 10 + "AT" * 10 + "C" * 10)
    // anchored mid-repeat: pos 15 ref ATA alt A (deletes TA)
    val (p, r, a) = alignOne(fa, 15, "ATA", "A")
    assert(p == 10L && r == "GAT" && a == "G", s"got ($p, $r, $a)")
  }

  test("ldR2: perfect LD, anti-correlation, monomorphic NULL, distance cutoff") {
    import spark.implicits._
    val sites = Seq(
      (0L, 10L, Seq("0/0", "0/1", "1/1", "0/1")),  // x = 0,1,2,1
      (1L, 20L, Seq("0/0", "0/1", "1/1", "0/1")),  // identical -> r2 = 1
      (2L, 30L, Seq("1/1", "0/1", "0/0", "0/1")),  // mirrored  -> r2 = 1
      (3L, 40L, Seq("0/1", "0/1", "0/1", "0/1")),  // monomorphic -> NULL
      (4L, 500L, Seq("0/0", "1/1", "0/0", "1/1"))) // beyond maxDist of all
      .toDF("sid", "pos", "genotypes")
    val out = graft.functions.VariantQC.ldR2(sites, 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out((0L, 1L)) == 1000000L, out.toString)
    assert(out((1L, 2L)) == 1000000L, out.toString)   // sign-insensitive
    assert(out((0L, 2L)) == 1000000L, out.toString)
    assert(out((1L, 3L)) == -1L && out((2L, 3L)) == -1L, out.toString) // NULL
    assert(!out.keySet.exists(_._2 == 4L), out.toString) // distance bound
    assert(out.size == 6, out.toString) // pairs among sites 0..3 within 50... (0,1),(0,2)? 30-10=20<=50 yes,(0,3)=30<=50,(1,2),(1,3),(2,3)
  }

  test("kingKinship: hand-computed trio with missing-site exclusion") {
    import spark.implicits._
    // samples: 0 and 1 are "parent/child"-like (share a het at every
    // usable site, never opposite homozygotes); 2 opposes 0 twice;
    // site 3 is missing for sample 1 (dropped ONLY for pairs with 1).
    val sites = Seq(
      (0L, Seq("0/1", "0/1", "1/1")), // x = 1,1,2
      (1L, Seq("0/1", "0/1", "0/0")), // x = 1,1,0
      (2L, Seq("0/0", "0/1", "1/1")), // x = 0,1,2  -> (0,2) opp hom
      (3L, Seq("1/1", "./.", "0/0")), // x = 2,-,0  -> (0,2) opp hom; pairs with 1 skip
      (4L, Seq("0/1", "1/1", "0/1"))) // x = 1,2,1
      .toDF("sid", "genotypes")
    val out = VariantQC.kingKinship(sites).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(7), r.getLong(8)))).toMap
    // per-site dosages (sample0, sample1, sample2):
    //   s0 (1,1,2)  s1 (1,1,0)  s2 (0,1,2)  s3 (2,-,0)  s4 (1,2,1)
    // (0,1): shared 0,1,2,4; both_het at s0,s1; no opp hom;
    //        het_0 = {s0,s1,s4} = 3, het_1 = {s0,s1,s2} = 3
    assert(out((0, 1)) == ((4L, 2L, 0L, 2L, 6L)), out.toString)
    // (0,2): all 5 shared; both_het at s4; opp_hom at s2 and s3;
    //        het_0 = 3, het_2 = {s4} = 1 -> num = 1 - 4 = -3
    assert(out((0, 2)) == ((5L, 1L, 2L, -3L, 4L)), out.toString)
    // (1,2): shared 0,1,2,4 (s3 dropped); no both-het site, no opp hom
    assert(out((1, 2)) == ((4L, 0L, 0L, 0L, 4L)), out.toString)
    assert(out.size == 3, out.toString)
  }

  // ---- shared random-genotype generator for the pop-gen estimators ----

  /** Random (sid -> dosage-per-sample) matrix with missing as -1;
    * genotype strings are rendered with mixed '/'-'|' phasing and a
    * trailing FORMAT field so the parsers earn their keep. */
  private def randomDosages(nSites: Int, nSamples: Int, seed: Long,
                            missingRate: Double = 0.1): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nSites)(Array.fill(nSamples)(
      if (rnd.nextDouble() < missingRate) -1 else rnd.nextInt(3)))
  }

  private def gtFrame(ds: Array[Array[Int]]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    ds.zipWithIndex.map { case (row, sid) =>
      (sid.toLong, sid.toLong * 7 + 1, row.toSeq.zipWithIndex.map { case (x, j) =>
        val sep = if ((sid + j) % 2 == 0) "/" else "|"
        x match {
          case -1 => s".$sep.:9"
          case 0  => s"0${sep}0:9"
          case 1  => if (j % 2 == 0) s"0${sep}1:9" else s"1${sep}0:9"
          case 2  => s"1${sep}1:9"
        }
      })
    }.toSeq.toDF("sid", "pos", "genotypes")
  }

  test("hudsonFst matches a naive per-site rational computation") {
    val ds = randomDosages(150, 9, 20260815L)
    val out = VariantQC.hudsonFst(gtFrame(ds), 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDecimal(5).toBigInteger.longValueExact,
        r.getDecimal(6).toBigInteger.longValueExact)).toMap
    var checked = 0
    for (sid <- ds.indices) {
      val (p1, p2) = ds(sid).zipWithIndex.partition(_._2 < 4)
      val c1 = p1.map(_._1).filter(_ >= 0); val c2 = p2.map(_._1).filter(_ >= 0)
      val (a1, n1) = (c1.map(_.toLong).sum, 2L * c1.length)
      val (a2, n2) = (c2.map(_.toLong).sum, 2L * c2.length)
      if (n1 >= 2 && n2 >= 2) {
        checked += 1
        val num = (a1*n2 - a2*n1) * (a1*n2 - a2*n1) * (n1-1) * (n2-1) -
          a1*(n1-a1) * n2*n2 * (n2-1) - a2*(n2-a2) * n1*n1 * (n1-1)
        val den = (a1*(n2-a2) + a2*(n1-a1)) * n1 * n2 * (n1-1) * (n2-1)
        assert(out(sid.toLong) == ((a1, n1, a2, n2, num, den)), s"site $sid")
        // cross-check the integer pair against the double formulation
        if (den != 0) {
          val (q1, q2) = (a1.toDouble / n1, a2.toDouble / n2)
          val fd = ((q1-q2)*(q1-q2) - q1*(1-q1)/(n1-1) - q2*(1-q2)/(n2-1)) /
            (q1*(1-q2) + q2*(1-q1))
          assert(math.abs(num.toDouble / den - fd) < 1e-9, s"site $sid")
        }
      } else assert(!out.contains(sid.toLong), s"site $sid should be dropped")
    }
    assert(checked > 100) // the filter must not be doing all the work
  }

  test("hudsonFst: 2000-diploid pops stay exact past the int64 envelope") {
    // n^6-scaled products: n1 = n2 = 4000 alleles -> ~4e21, far past
    // 2^63 (the pre-decimal code wrapped silently here). One site,
    // a1 = 1200, a2 = 2800; expected pair computed with BigInt.
    val spark2 = spark
    import spark2.implicits._
    val nDip = 2000
    val gts = (0 until 2 * nDip).map { j =>
      if (j < nDip) (if (j < 600) "1/1" else "0/0")      // a1 = 1200
      else (if (j < nDip + 1400) "1/1" else "0/0")        // a2 = 2800
    }
    val df = Seq((0L, gts)).toDF("sid", "genotypes")
    val r = VariantQC.hudsonFst(df, nDip).collect().head
    val (a1, n1, a2, n2) = (BigInt(1200), BigInt(4000), BigInt(2800), BigInt(4000))
    val num = (a1*n2 - a2*n1).pow(2) * (n1-1) * (n2-1) -
      a1*(n1-a1)*n2*n2*(n2-1) - a2*(n2-a2)*n1*n1*(n1-1)
    val den = (a1*(n2-a2) + a2*(n1-a1)) * n1 * n2 * (n1-1) * (n2-1)
    assert(num > BigInt(Long.MaxValue), "fixture must exceed int64 to prove the fix")
    assert(BigInt(r.getDecimal(5).toBigInteger) == num)
    assert(BigInt(r.getDecimal(6).toBigInteger) == den)
  }

  test("ldR2: 2000-sample site pair stays exact past the int64 envelope") {
    // 1e6·(nΣxy-ΣxΣy)² ~ 1.6e7·n⁴ wraps int64 past ~870 samples; a
    // perfect-LD pair over 2000 samples must still return exactly 1e6.
    val spark2 = spark
    import spark2.implicits._
    val gts = (0 until 2000).map(j => if (j % 2 == 0) "0/0" else "1/1")
    val sites = Seq((0L, 10L, gts), (1L, 20L, gts)).toDF("sid", "pos", "genotypes")
    val out = graft.functions.VariantQC.ldR2(sites, 50).collect()
    assert(out.length == 1 && out.head.getLong(2) == 1000000L,
      out.mkString(","))
  }

  test("ibsCounts matches a naive pairwise loop and partitions n_shared") {
    val ds = randomDosages(120, 6, 77L)
    val out = VariantQC.ibsCounts(gtFrame(ds)).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for (i <- 0 until 6; j <- (i + 1) until 6) {
      var (ns, i0, i1, i2) = (0L, 0L, 0L, 0L)
      for (sid <- ds.indices) {
        val (x, y) = (ds(sid)(i), ds(sid)(j))
        if (x >= 0 && y >= 0) {
          ns += 1
          math.abs(x - y) match {
            case 2 => i0 += 1; case 1 => i1 += 1; case 0 => i2 += 1
          }
        }
      }
      assert(out((i, j)) == ((ns, i0, i1, i2)), s"pair ($i,$j)")
      val (a, b, c, d) = out((i, j))
      assert(b + c + d == a, "IBS classes must partition the shared sites")
    }
  }

  test("piWindows floors per site and handles all-missing windows") {
    val ds = randomDosages(200, 8, 4242L, missingRate = 0.3)
    val out = VariantQC.piWindows(gtFrame(ds), 300L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val naive = scala.collection.mutable.Map[Long, (Long, Long)]()
    for (sid <- ds.indices) {
      val called = ds(sid).filter(_ >= 0)
      val n = 2L * called.length
      val a = called.map(_.toLong).sum
      val pi = if (n >= 2) 1000000L * 2 * a * (n - a) / (n * (n - 1)) else 0L
      val wid = (sid.toLong * 7 + 1) / 300
      val (c, s0) = naive.getOrElse(wid, (0L, 0L))
      naive(wid) = (c + 1, s0 + pi)
    }
    assert(out.keySet == naive.keySet)
    naive.foreach { case (wid, (c, s0)) =>
      assert(out(wid) == ((c, s0, s0 / c)), s"window $wid")
    }
  }

  test("singletonsBySample: hand case with an AC=2 two-het site") {
    import spark.implicits._
    val sites = Seq(
      (0L, Seq("0/0", "0/1", "0/0")),  // AC=1 -> singleton for sample 1
      (1L, Seq("1/1", "0/0", "0/0")),  // AC=2 hom -> private doubleton, s0
      (2L, Seq("0/1", "0/1", "0/0")),  // AC=2 as two hets -> counts for nobody
      (3L, Seq("0/1", "./.", "0/0")),  // AC=1 (missing drops s1) -> s0
      (4L, Seq("1/1", "0/1", "0/0"))) // AC=3 -> nobody
      .toDF("sid", "genotypes")
    val out = VariantQC.singletonsBySample(sites).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0) == ((1L, 1L)), out.toString)
    assert(out(1) == ((1L, 0L)), out.toString)
    assert(out(2) == ((0L, 0L)), out.toString)
  }
}
