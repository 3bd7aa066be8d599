package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The one-line wiring path: spark.sql.extensions=graft.GraftExtensions
  * makes every scalar function and TVF available with no further code
  * (the reference's `LOAD exon`). */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions inject scalar functions and TVFs into a fresh session") {
    // getOrCreate() would return the suite-shared session (extensions
    // only apply at session construction) — force a new session over
    // the same SparkContext
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions works on a reused SparkContext; the equivalent
    // spark.sql.extensions=graft.GraftExtensions is a static conf and
    // applies when the context itself is launched with it
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s.sql("SELECT complement('ATGC')").collect()(0).getString(0) == "TACG")
      assert(s.sql(
        "SELECT count(*) FROM read_fasta('src/test/resources/fixtures/fasta/test.fasta')")
        .collect()(0).getLong(0) == 2L)
      assert(s.sql("SELECT exondb_version()").collect()(0).getString(0) == "0.3.9")
      // pipeline TVFs resolve to the same plans the facades build
      import s.implicits._
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      Seq((10L, base), (11L, base),
        (12L, "one two three four five six seven eight nine ten"))
        .toDF("id", "body").createOrReplaceTempView("ext_docs")
      val pairs = s.sql("SELECT * FROM near_dup_pairs('ext_docs', 'id', 'body')")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((10L, 11L)))
      val spans = s.sql(
        "SELECT * FROM remove_duplicate_spans('ext_docs', 'id', 'body', 5)")
      assert(spans.count() == 3 &&
        spans.where("id = 11 AND n_kept = 0").count() == 1)
      Seq((1L, 0L, 5L)).toDF("chrom", "s", "e").createOrReplaceTempView("ext_a")
      Seq((1L, 8L, 9L)).toDF("chrom", "s", "e").createOrReplaceTempView("ext_b")
      val close = s.sql("SELECT * FROM closest_features('ext_a', 'ext_b')").collect()
      assert(close.length == 1 && close(0).getLong(3) == 3L)
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
        .toDF("id", "emb").createOrReplaceTempView("ext_vecs")
      val kept = s.sql("SELECT id FROM semantic_dedup('ext_vecs', 'id', 'emb', 2, 0.95)")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L))
      val hit = s.sql(
        """SELECT id FROM kmeans_ivf_topk('ext_vecs', 'ext_vecs', 1, 2, 2, 'id', 'emb')
           WHERE q_id = 1""").collect().map(_.getLong(0))
      assert(hit.toSeq == Seq(2L)) // the exact duplicate of vector 1
      val hit8 = s.sql(
        "SELECT id FROM int8_topk('ext_vecs', 'ext_vecs', 1, 'id', 'emb') WHERE q_id = 1")
        .collect().map(_.getLong(0))
      assert(hit8.toSeq == Seq(2L))
      val hitLsh = s.sql(
        "SELECT id FROM lsh_topk('ext_vecs', 'ext_vecs', 1, 8, 1, 'id', 'emb') WHERE q_id = 1")
        .collect().map(_.getLong(0))
      assert(hitLsh.toSeq == Seq(2L)) // the exact duplicate always collides
      Seq.fill(5)("hot").zipWithIndex.map(_.swap).map { case (i, v) => (i.toLong, v) }
        .++(Seq((9L, "cold"))).toDF("id", "v").createOrReplaceTempView("ext_vals")
      val hh = s.sql("SELECT * FROM heavy_hitters('ext_vals', 'v', 3)")
        .collect().map(r => (r.getString(0), r.getLong(2)))
      assert(hh.toSeq == Seq(("hot", 5L)))
      Seq((10L, 11L)).toDF("id_a", "id_b").createOrReplaceTempView("ext_pairs")
      val split = s.sql(
        "SELECT * FROM leakage_safe_split('ext_docs', 'ext_pairs', 'id')")
      assert(split.count() == 3 &&
        split.select("split").where("id IN (10, 11)").distinct().count() == 1)
      // 'one' (df=1) out-idfs 'alpha' (df=2): the unique doc ranks first
      val bm = s.sql("SELECT id FROM bm25_topk('ext_docs', 'alpha,one', 3, 'id', 'body')")
        .collect().map(_.getLong(0))
      assert(bm.length == 3 && bm.head == 12L, bm.toSeq)
      val edits = s.sql("SELECT * FROM edit_distance_pairs('ext_docs', 'id', 'body')")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(edits == Set((10L, 11L, 0)))
      val zipf = s.sql("SELECT n_terms, vocab FROM zipf_profile('ext_docs', 'body')")
        .collect().head
      assert(zipf.getInt(0) == 20 && zipf.getLong(1) == 20L)
      val mrl = s.sql(
        "SELECT id FROM mrl_topk('ext_vecs', 'ext_vecs', 1, 1, 2, 'id', 'emb') WHERE q_id = 1")
        .collect().map(_.getLong(0))
      assert(mrl.toSeq == Seq(2L))
      Seq(("ATCGA")).toDF("sequence").createOrReplaceTempView("ext_seqs")
      val km = s.sql("SELECT * FROM kmer_counts('ext_seqs') ORDER BY kmer")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(km.toSeq == Seq(("ATCG", 1L), ("TCGA", 1L)))
      Seq(("x", "ATGAAATAG")).toDF("id", "sequence")
        .createOrReplaceTempView("ext_orfs")
      val orfs = s.sql("SELECT * FROM orf_stats('ext_orfs') ORDER BY strand")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
      assert(orfs.toSeq == Seq(("+", 1L, 2), ("-", 0L, 0)), orfs.toSeq)
      Seq(("1", 5L, Seq("0/1", "0/1"))).toDF("chrom", "pos", "genotypes")
        .createOrReplaceTempView("ext_sites")
      val hh2 = s.sql("SELECT * FROM het_hom_counts('ext_sites')")
        .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
      assert(hh2 == Set((0, 1L), (1, 1L)), hh2) // both samples het
      val hwe = s.sql("SELECT hwe_chi2 FROM hwe_by_site('ext_sites')")
        .collect().head.getDouble(0)
      assert(hwe == 2.0, hwe) // all-het, p=0.5, n=2
      Seq(("A", Seq("G")), ("A", Seq("C"))).toDF("ref", "alt")
        .createOrReplaceTempView("ext_var")
      val tv = s.sql("SELECT n_ti, n_tv, titv FROM titv('ext_var')").collect().head
      assert((tv.getLong(0), tv.getLong(1), tv.getDouble(2)) == ((1L, 1L, 1.0)))
      Seq(("chr1", 125L), ("chr1", 155L)).toDF("chrom", "pos")
        .createOrReplaceTempView("ext_pos")
      val lifted = s.sql(
        """SELECT lifted_name, lifted_pos FROM lift_positions('ext_pos',
             '/root/repo/src/test/resources/fixtures/chain/test.chain')
           ORDER BY pos""")
        .collect().map(r => (r.getAs[String](0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(lifted.toSeq == Seq(("chrA", 75L), (null, -1L)), lifted.toSeq)
      Seq(("alpha beta", 3L), ("one two", -5L)).toDF("gram", "weight")
        .createOrReplaceTempView("ext_weights")
      val qs = s.sql(
        "SELECT id, score_raw FROM quality_score('ext_docs', 'ext_weights', 'id', 'body')")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(qs == Map(10L -> 3L, 11L -> 3L, 12L -> -5L), qs)
      // coding_effect TVF: the three-table consequence classifier
      Seq(("c1", 4L, "G", "T")).toDF("chrom", "pos", "ref", "alt")
        .createOrReplaceTempView("ext_snvs")
      Seq(("c1", 1L, 9L, "+", "P"))
        .toDF("cchrom", "cds_start", "cds_end", "strand", "gene_id")
        .createOrReplaceTempView("ext_cds")
      Seq(("c1", "ATGGCATAA")).toDF("id", "sequence")
        .createOrReplaceTempView("ext_ref")
      val eff = s.sql(
        "SELECT codon_ref, codon_alt, effect FROM coding_effect('ext_snvs', 'ext_cds', 'ext_ref')")
        .collect().head
      assert((eff.getString(0), eff.getString(1), eff.getString(2)) ==
        (("GCA", "TCA", "missense")), eff.toString)
      // sam_pileup / sam_consensus TVFs: the mpileup composition from
      // SQL — path-literal arguments resolve to the Pileup facade plans
      val pdir = java.nio.file.Files.createTempDirectory("ext_pileup")
      val samLines = Seq("@HD\tVN:1.6", "@SQ\tSN:c\tLN:8") ++
        (1 to 4).map(i => s"r$i\t0\tc\t1\t30\t4M\t*\t0\t0\tACGA\tIIII")
      java.nio.file.Files.write(pdir.resolve("r.sam"),
        scala.jdk.CollectionConverters.SeqHasAsJava(samLines).asJava)
      java.nio.file.Files.write(pdir.resolve("ref.fasta"),
        scala.jdk.CollectionConverters.SeqHasAsJava(Seq(">c", "ACGTACGT")).asJava)
      val sites = s.sql(
        s"SELECT pos, ref, depth, alt_n FROM sam_pileup('$pdir/r.sam', '$pdir/ref.fasta')")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(sites.toSeq == Seq((4L, "T", 4L, 4L)), sites.toSeq)
      val cons = s.sql(
        s"SELECT consensus, n_changed FROM sam_consensus('$pdir/r.sam', '$pdir/ref.fasta')")
        .collect().head
      assert(cons.getString(0) == "ACGAACGT" && cons.getLong(1) == 1L, cons.toString)
      // raised minDepth excludes the 4-deep site
      assert(s.sql(
        s"SELECT * FROM sam_pileup('$pdir/r.sam', '$pdir/ref.fasta', 5, 3)").count() == 0L)
      // vcf_leftalign / roh_segments / assembly_stats TVFs
      java.nio.file.Files.write(pdir.resolve("la.fa"),
        scala.jdk.CollectionConverters.SeqHasAsJava(
          Seq(">c1", "C" + "A" * 30 + "G" * 10)).asJava)
      Seq((1L, "c1", 20L, "AA", "A")).toDF("key", "chrom", "pos", "ref", "alt")
        .createOrReplaceTempView("ext_la")
      val la = s.sql(
        s"SELECT pos, ref, alt FROM vcf_leftalign('ext_la', '$pdir/la.fa')")
        .collect().head
      assert((la.getLong(0), la.getString(1), la.getString(2)) ==
        ((1L, "CA", "C")), la.toString)
      Seq((0, "c1", 1L, "1/1"), (0, "c1", 2L, "1|1"), (0, "c1", 3L, "0/0"),
          (0, "c1", 4L, "0/1"), (0, "c1", 5L, "2/2"))
        .toDF("sample_idx", "chrom", "pos", "gt")
        .createOrReplaceTempView("ext_roh")
      val roh = s.sql(
        "SELECT start, end, n_sites FROM roh_segments('ext_roh', 1) ORDER BY start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(roh.toSeq == Seq((1L, 3L, 3L), (5L, 5L, 1L)), roh.toSeq)
      Seq(10L, 8L, 6L, 4L, 2L).toDF("length").createOrReplaceTempView("ext_lens")
      val asm = s.sql("SELECT n50, l50, n90 FROM assembly_stats('ext_lens')")
        .collect().head
      assert((asm.getLong(0), asm.getLong(1), asm.getLong(2)) == ((8L, 2L, 4L)))
      Seq((0L, 10L, Seq("0/0", "0/1", "1/1")), (1L, 20L, Seq("0/0", "0/1", "1/1")))
        .toDF("sid", "pos", "genotypes").createOrReplaceTempView("ext_ld")
      val ld = s.sql("SELECT r2_micro FROM ld_r2('ext_ld', 50)").collect()
      assert(ld.length == 1 && ld(0).getLong(0) == 1000000L, ld.toSeq)
      // hudson_fst: 4 samples, pop1 = first 2; hand-computed integer pairs
      Seq((0L, Seq("0/0", "0/1", "1/1", "0/0")),
          (1L, Seq("1/1", "1/1", "0/0", "0/0")))
        .toDF("sid", "genotypes").createOrReplaceTempView("ext_fst")
      // fst_num/fst_den are DECIMAL(38,0) since the int64-overflow fix
      val fst = s.sql(
        "SELECT sid, fst_num, fst_den FROM hudson_fst('ext_fst', 2) ORDER BY sid")
        .collect().map(r => (r.getLong(0),
          r.getDecimal(1).toBigInteger.longValueExact,
          r.getDecimal(2).toBigInteger.longValueExact))
      assert(fst.toSeq == Seq((0L, -192L, 1152L), (1L, 2304L, 2304L)), fst.toSeq)
      // ibs_counts over the same sites: pair (0,1) shares ibs1@sid0, ibs2@sid1
      val ibs = s.sql(
        "SELECT n_shared, n_ibs0, n_ibs1, n_ibs2 FROM ibs_counts('ext_fst') " +
          "WHERE i = 0 AND j = 1").collect().head
      assert((ibs.getLong(0), ibs.getLong(1), ibs.getLong(2), ibs.getLong(3)) ==
        ((2L, 0L, 1L, 1L)), ibs.toString)
      // mark_duplicates: clipped twin must collapse onto the same u5
      Seq(("a", 0, "c1", 103L, "3S47M", 30L), ("b", 0, "c1", 100L, "50M", 20L))
        .toDF("qname", "flag", "chrom", "pos", "cigar", "score")
        .createOrReplaceTempView("ext_md")
      val md = s.sql(
        "SELECT qname, is_dup FROM mark_duplicates('ext_md') ORDER BY qname")
        .collect().map(r => (r.getString(0), r.getBoolean(1)))
      assert(md.toSeq == Seq(("a", false), ("b", true)), md.toSeq)
      // triangle_stats: one triangle + a pendant edge -> gcc 3*1/5
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 9L)).toDF("src", "dst")
        .createOrReplaceTempView("ext_tri")
      val tri = s.sql(
        "SELECT n_triangles, n_wedges, gcc_micro FROM triangle_stats('ext_tri')")
        .collect().head
      assert((tri.getLong(0), tri.getLong(1), tri.getLong(2)) ==
        ((1L, 5L, 600000L)), tri.toString)
      // k_core: the pendant dies at k=2, the triangle survives
      val core = s.sql(
        "SELECT node, deg FROM k_core('ext_tri', 2) ORDER BY node")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(core.toSeq == Seq((0L, 2L), (1L, 2L), (2L, 2L)), core.toSeq)
      // optimizer rule: a filter on the exploded element grows an
      // exists() pre-filter BELOW the Generate. Plan shape asserted on
      // a range()-backed relation — over a LocalRelation the optimizer
      // (correctly) goes further and ConvertToLocalRelation folds the
      // pre-filter into the literal rows, hiding it from the plan.
      val exploded = s.sql(
        """SELECT id, tok FROM (
             SELECT id, explode(split(CASE WHEN id = 12 THEN 'one two' ELSE 'alpha beta' END, ' ')) AS tok
             FROM range(13)) WHERE tok = 'one'""")
      val opt = exploded.queryExecution.optimizedPlan.toString
      assert(opt.contains("exists("),
        s"PushPredicateThroughExplode did not fire:\n$opt")
      assert(opt.linesIterator.indexWhere(_.contains("exists(")) >
        opt.linesIterator.indexWhere(_.contains("Generate")),
        s"exists() guard not below the Generate:\n$opt")
      assert(exploded.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((12L, "one")))
      // semantics preserved through the rule + local-relation collapse,
      // and no false drop when conjuncts mix pushable + row-level
      val mixed = s.sql(
        """SELECT id, tok FROM (SELECT id, explode(split(body, ' ')) AS tok FROM ext_docs)
           WHERE tok IN ('alpha', 'one') AND id < 12""")
      assert(mixed.collect().map(_.getLong(0)).toSet == Set(10L, 11L))
      // idempotence under the fixpoint: the inserted exists-guard is
      // immediately relocated below the inner Project by
      // PushDownPredicates (rewritten through the `toks` alias), so a
      // structural "is my guard still right under me" check re-fires
      // the rule every iteration — the `Max iterations (100) reached`
      // ping-pong. The TreeNodeTag on the Generate must hold the rule
      // to exactly ONE guard, including when the optimizer re-runs on
      // its own output.
      val deep = s.sql(
        """SELECT id, tok FROM (
             SELECT id, explode(toks) AS tok FROM (
               SELECT id, split(CASE WHEN id = 12 THEN 'one two' ELSE 'alpha beta' END, ' ') AS toks
               FROM range(13)))
           WHERE tok = 'one'""")
      val deepOpt = deep.queryExecution.optimizedPlan
      def nGuards(p: Any): Int = "exists\\(".r.findAllIn(p.toString).length
      assert(nGuards(deepOpt) == 1,
        s"expected exactly one exists() guard:\n$deepOpt")
      val reOpt = s.sessionState.optimizer.execute(deepOpt)
      assert(nGuards(reOpt) == 1,
        s"rule re-fired on already-optimized plan:\n$reOpt")
      assert(deep.collect().map(_.getLong(0)).toSeq == Seq(12L))
      // UDF guard: a ScalaUDF element predicate must NOT grow the
      // exists() pre-filter — HigherOrderFunctions are CodegenFallback,
      // so the guard would re-evaluate the array expression interpreted
      // and double the UDF calls (measured 16x on pipe_decontam_bloom
      // at the sf10 tier: 724.8 s guarded vs 46.4 s unguarded).
      val udfKeep = org.apache.spark.sql.functions.udf(
        (t: String) => t != null && t.startsWith("o"))
      s.udf.register("ext_udf_keep", udfKeep)
      val viaUdf = s.sql(
        """SELECT id, tok FROM (
             SELECT id, explode(split(CASE WHEN id = 12 THEN 'one two' ELSE 'alpha beta' END, ' ')) AS tok
             FROM range(13)) WHERE ext_udf_keep(tok)""")
      assert(!viaUdf.queryExecution.optimizedPlan.toString.contains("exists("),
        s"UDF predicate was pushed into an exists() guard:\n" +
          viaUdf.queryExecution.optimizedPlan)
      assert(viaUdf.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((12L, "one")))
      // randomized semantics property: with the rule active, the
      // explode+filter answer must equal the plain Scala expectation
      val rnd = new scala.util.Random(42)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee")
      (1 to 10).foreach { round =>
        val data = (0L until 30L).map { i =>
          (i, Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
        }
        val term = vocab(rnd.nextInt(vocab.size))
        data.toDF("id", "body").createOrReplaceTempView("ext_prop")
        val got = s.sql(
          s"SELECT id FROM (SELECT id, explode(split(body, ' ')) AS tok FROM ext_prop) WHERE tok = '$term'")
          .collect().map(_.getLong(0)).sorted.toSeq
        val want = data.flatMap { case (i, b) =>
          b.split(" ", -1).filter(_ == term).map(_ => i)
        }.sorted
        assert(got == want, s"round $round term $term: $got != $want")
      }
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
