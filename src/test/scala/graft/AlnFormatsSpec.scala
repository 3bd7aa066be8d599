package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftIO

/** PAF / GFA / Stockholm readers: the properties the oracle matrix does
  * not gate — byte-split equivalence (loss/duplication at boundaries),
  * record sync across splits for the multi-line Stockholm records,
  * gzip composition, and loud failure on malformed input.
  */
class AlnFormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def withMaxSplit[T](bytes: Long)(f: => T): T = {
    val k = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(k)
    spark.conf.set(k, bytes.toString)
    try f finally spark.conf.set(k, old)
  }

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft-aln")
    val p = d.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("paf: 64-byte splits == single split; tags survive") {
    val content = (0 until 300).map { i =>
      s"q$i\t1000\t0\t500\t+\tt${i % 9}\t9000\t${i * 3}\t${i * 3 + 500}\t480\t500\t${i % 61}\tNM:i:${i % 20}\ttp:A:P"
    }.mkString("", "\n", "\n")
    val path = tmpFile("big.paf", content)
    val whole = GraftIO.read_paf(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64) {
      val df = GraftIO.read_paf(spark, path)
      assert(df.rdd.getNumPartitions > 5)
      df.collect().map(_.toString).sorted
    }
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 300)
    val nm = GraftIO.read_paf(spark, path)
      .selectExpr("cast(tags['NM'] as int) AS nm").collect().map(_.getInt(0)).sum
    assert(nm == (0 until 300).map(_ % 20).sum)
  }

  test("paf: region option filters by target-span overlap") {
    val content = Seq(
      "a\t100\t0\t50\t+\tt1\t1000\t100\t200\t40\t50\t60",   // overlaps 150-400
      "b\t100\t0\t50\t+\tt1\t1000\t400\t500\t40\t50\t60",   // 1-based start 401 > 400
      "c\t100\t0\t50\t+\tt2\t1000\t150\t300\t40\t50\t60"    // wrong target
    ).mkString("", "\n", "\n")
    val path = tmpFile("r.paf", content)
    val got = GraftIO.read_paf(spark, path, Map("region" -> "t1:150-400"))
      .select("query_name").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("a"))
  }

  test("paf: a line with fewer than 12 fields fails loudly") {
    val path = tmpFile("bad.paf", "q1\t100\t0\t50\t+\tt1\t1000\n")
    val e = intercept[org.apache.spark.SparkException] {
      GraftIO.read_paf(spark, path).collect()
    }
    assert(e.getMessage.contains("12 mandatory fields")
      || Option(e.getCause).exists(_.getMessage.contains("12 mandatory fields")))
  }

  test("gfa: 64-byte splits == single split; slices are consistent") {
    val content = {
      val sb = new StringBuilder("H\tVN:Z:1.0\n")
      for (i <- 0 until 120) sb.append(s"S\tn$i\t${"ACGT" * (i % 7 + 1)}\n")
      for (i <- 0 until 120) sb.append(s"L\tn$i\t+\tn${(i + 1) % 120}\t-\t0M\n")
      sb.toString
    }
    val path = tmpFile("big.gfa", content)
    val whole = GraftIO.read_gfa(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64) {
      val df = GraftIO.read_gfa(spark, path)
      assert(df.rdd.getNumPartitions > 5)
      df.collect().map(_.toString).sorted
    }
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 240) // H skipped
    val segLens = GraftIO.read_gfa(spark, path).where("record_type = 'S'")
      .selectExpr("sum(seq_len)").collect()(0).getLong(0)
    assert(segLens == (0 until 120).map(i => 4L * (i % 7 + 1)).sum)
  }

  test("gfa: unknown record type fails loudly") {
    val path = tmpFile("bad.gfa", "X\twhat\tis\tthis\n")
    val e = intercept[org.apache.spark.SparkException] {
      GraftIO.read_gfa(spark, path).collect()
    }
    assert(e.getMessage.contains("unknown gfa record type")
      || Option(e.getCause).exists(_.getMessage.contains("unknown gfa record type")))
  }

  test("stockholm: splits sync on the record magic; interleaving concatenates") {
    // 60 records, each with 3 interleaved blocks over 2 sequences —
    // a split landing mid-record must not re-parse or drop it.
    val content = (0 until 60).map { r =>
      val b = new StringBuilder("# STOCKHOLM 1.0\n")
      b.append(s"#=GF AC FAM$r\n")
      for (_ <- 0 until 3) {
        b.append(s"s${r}a ACGU\n")
        b.append(s"s${r}b GG-U\n\n")
      }
      b.append("//\n")
      b.toString
    }.mkString
    val path = tmpFile("big.sto", content)
    val whole = GraftIO.read_stockholm(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64) {
      val df = GraftIO.read_stockholm(spark, path)
      assert(df.rdd.getNumPartitions > 5)
      df.collect().map(_.toString).sorted
    }
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 120)
    val seqs = GraftIO.read_stockholm(spark, path)
      .where("accession = 'FAM7'").selectExpr("name", "sequence")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(seqs == Map("s7a" -> "ACGUACGUACGU", "s7b" -> "GG-UGG-UGG-U"))
  }

  test("maf: splits sync on 'a' block lines; annotations skipped") {
    val content = "##maf version=1\n" + (0 until 80).map { b =>
      s"a score=$b.5\n" +
        s"s hg.chr$b ${b * 100} 8 + 999 ACGTACGT\n" +
        s"s mm.chr$b ${b * 50} 8 - 888 ACGTACGA\n" +
        s"i mm.chr$b I 0 C 0\n\n"
    }.mkString
    val path = tmpFile("big.maf", content)
    val whole = GraftIO.read_maf(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64) {
      val df = GraftIO.read_maf(spark, path)
      assert(df.rdd.getNumPartitions > 5)
      df.collect().map(_.toString).sorted
    }
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 160)
    val scores = GraftIO.read_maf(spark, path).selectExpr("sum(score)")
      .collect()(0).getDouble(0)
    assert(scores == 2 * (0 until 80).map(_ + 0.5).sum)
  }

  test("embl: splits sync on ID lines; GenBank-schema compatible") {
    val content = (0 until 60).map { r =>
      s"ID   E$r; SV 1; linear; mRNA; STD; PLN; 8 BP.\n" +
        s"AC   E$r;\nDE   rec $r\n" +
        s"FT   source          1..8\nFT                   /organism=\"x$r\"\n" +
        s"SQ   Sequence 8 BP;\n     acgtacgt        8\n//\n"
    }.mkString
    val path = tmpFile("big.embl", content)
    val whole = GraftIO.read_embl(spark, path).collect().map(_.toString).sorted
    val split = withMaxSplit(64) {
      val df = GraftIO.read_embl(spark, path)
      assert(df.rdd.getNumPartitions > 5)
      df.collect().map(_.toString).sorted
    }
    assert(split.toSeq == whole.toSeq)
    assert(whole.length == 60)
    // schema-identical to GenBank: a union across the two archives analyzes
    val gb = GraftIO.read_genbank(spark,
      "src/test/resources/fixtures/genbank/test.gb")
    assert(gb.schema == GraftIO.read_embl(spark, path).schema)
    assert(gb.unionAll(GraftIO.read_embl(spark, path)).count() == 62)
  }

  test("stockholm: gzip composition") {
    val plain = "# STOCKHOLM 1.0\n#=GF AC Z1\nx ACGU\n//\n"
    val d = Files.createTempDirectory("graft-aln")
    val gz = d.resolve("z.sto.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(plain.getBytes("UTF-8")); out.close()
    val rows = GraftIO.read_stockholm(spark, gz.toString)
      .selectExpr("accession", "name", "sequence").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "Z1"
      && rows(0).getString(1) == "x" && rows(0).getString(2) == "ACGU")
  }

  test("stockholm: record without '//' terminator fails loudly") {
    val path = tmpFile("bad.sto", "# STOCKHOLM 1.0\nx ACGU\n")
    val e = intercept[org.apache.spark.SparkException] {
      GraftIO.read_stockholm(spark, path).collect()
    }
    assert(e.getMessage.contains("without '//' terminator")
      || Option(e.getCause).exists(_.getMessage.contains("without '//' terminator")))
  }

  test("phylip: sequential layout, multi-record files, truncation errors") {
    // sequential: taxon completes before the next name line
    val seqPath = tmpFile("a.phy", "2 12\ntaxX ACGTAC\nGTACGT\ntaxY TTGCAA\nCCGGTT\n")
    val seqRows = GraftIO.read_phylip(spark, seqPath,
        Map("layout" -> "sequential"))
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(seqRows == Map("taxX" -> "ACGTACGTACGT", "taxY" -> "TTGCAACCGGTT"))
    // the same bytes parsed as interleaved must FAIL (first block would
    // claim 'GTACGT' as a taxon name and the column counts break)
    intercept[org.apache.spark.SparkException] {
      GraftIO.read_phylip(spark, seqPath).collect()
    }
    // two concatenated interleaved records in one file
    val two = tmpFile("b.phy",
      "2 8\nA ACGT\nB TTGC\n\nACGT\nTTGC\n2 4\nC GGGG\nD CCCC\n")
    val rows = GraftIO.read_phylip(spark, two).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(4)))
    assert(rows.toSet == Set((0, "A", "ACGTACGT", 8), (0, "B", "TTGCTTGC", 8),
      (1, "C", "GGGG", 4), (1, "D", "CCCC", 4)), rows.mkString(", "))
    // truncated interleaved record fails loudly
    val bad = tmpFile("c.phy", "2 8\nA ACGT\nB TTGC\nACGT\n")
    val e = intercept[org.apache.spark.SparkException] {
      GraftIO.read_phylip(spark, bad).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("truncated"), msg)
    // bad layout option is rejected up front
    intercept[Exception] {
      GraftIO.read_phylip(spark, seqPath, Map("layout" -> "diagonal")).collect()
    }
  }

  test("bedpe: split equivalence, '.' mate nulls, short line fails") {
    val lines = (0 until 300).map(i =>
      s"c${i % 4}\t${i * 10}\t${i * 10 + 5}\tc${(i + 1) % 4}\t${i * 10 + 100}" +
        s"\t${i * 10 + 120}\tsv$i\t${i % 60}\t+\t-").mkString("", "\n", "\n")
    val path = tmpFile("a.bedpe", lines)
    val whole = GraftIO.read_bedpe(spark, path).collect()
      .map(_.toString).sorted.toSeq
    val split = withMaxSplit(64) {
      GraftIO.read_bedpe(spark, path).collect().map(_.toString).sorted.toSeq
    }
    assert(whole.size == 300 && whole == split)
    // '.' mate -> null chrom2/start2/end2; -1 coords also null
    val dot = tmpFile("b.bedpe", "c1\t5\t9\t.\t-1\t-1\tx\t.\t+\t.\n")
    val r = GraftIO.read_bedpe(spark, dot).collect().head
    assert(r.getString(0) == "c1" && r.getLong(1) == 6 && r.getLong(2) == 9)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
    assert(r.getString(6) == "x" && r.isNullAt(7) && r.isNullAt(9))
    intercept[org.apache.spark.SparkException] {
      GraftIO.read_bedpe(spark, tmpFile("c.bedpe", "c1\t5\t9\tc2\n")).collect()
    }
  }

  test("blast6: split equivalence, outfmt-7 comments skipped, short line fails") {
    val lines = "# BLASTN 2.14.0+\n# Fields: qseqid ...\n" +
      (0 until 200).map(i =>
        s"q$i\ts${i % 9}\t9${i % 10}.5\t${100 + i}\t${i % 5}\t${i % 3}" +
          s"\t1\t${100 + i}\t${500 + i}\t${599 + i}\t1e-${1 + i % 40}\t${200 + i}.0")
        .mkString("", "\n", "\n")
    val path = tmpFile("h.b6", lines)
    val whole = GraftIO.read_blast6(spark, path).collect().map(_.toString).sorted.toSeq
    val split = withMaxSplit(64) {
      GraftIO.read_blast6(spark, path).collect().map(_.toString).sorted.toSeq
    }
    assert(whole.size == 200 && whole == split)
    intercept[org.apache.spark.SparkException] {
      GraftIO.read_blast6(spark, tmpFile("bad.b6", "q1\ts1\t90.0\n")).collect()
    }
  }

  test("bedgraph: +1 shift, region pruning, track lines skipped") {
    val path = tmpFile("c.bedgraph",
      "track type=bedGraph name=x\nc1\t0\t100\t1.5\nc1\t100\t200\t2.5\nc2\t50\t60\t9.0\n")
    val rows = GraftIO.read_bedgraph(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSet == Set(("c1", 1L, 100L, 1.5), ("c1", 101L, 200L, 2.5),
      ("c2", 51L, 60L, 9.0)), rows.mkString(", "))
    val pruned = GraftIO.read_bedgraph(spark, path, Map("region" -> "c1:150-160"))
      .collect()
    assert(pruned.length == 1 && pruned.head.getLong(1) == 101L)
  }

  test("markDuplicates: clip-aware 5' collapse across strands") {
    import spark.implicits._
    // three reads of one forward template with different clipping, one
    // reverse read whose unclipped 5' lands on the same base (still a
    // DIFFERENT signature: strand differs), plus an unrelated read
    val reads = Seq(
      ("a", 0, "c1", 103L, "3S47M", 30L),  // u5 = 100
      ("b", 0, "c1", 100L, "50M", 20L),    // u5 = 100 dup (a wins on score)
      ("c", 0, "c1", 105L, "5H45M", 40L),  // u5 = 100, wins
      ("d", 16, "c1", 56L, "45M5S", 10L),  // u5 = 56+45-1+5 = 105
      ("e", 16, "c1", 61L, "40M5S", 10L),  // u5 = 61+40-1+5 = 105 dup (qname)
      ("f", 0, "c2", 100L, "50M", 99L))    // other chrom
      .toDF("qname", "flag", "chrom", "pos", "cigar", "score")
    val out = graft.functions.SeqAnalysis.markDuplicates(reads)
      .collect().map(r => r.getAs[String]("qname") ->
        (r.getAs[Long]("u5"), r.getAs[Boolean]("rev"), r.getAs[Boolean]("is_dup")))
      .toMap
    assert(out("a") == ((100L, false, true)), out.toString)
    assert(out("b") == ((100L, false, true)), out.toString)
    assert(out("c") == ((100L, false, false)), out.toString)
    assert(out("d") == ((105L, true, false)), out.toString)
    assert(out("e") == ((105L, true, true)), out.toString)
    assert(out("f") == ((100L, false, false)), out.toString)
  }

  test("pdb: spec column windows, MODEL state, TVF, gzip composition") {
    val line1 = "ATOM      1  N   MET A   1      11.104   6.134  -6.504  1.00 25.50           N"
    val line2 = "HETATM    2  O   HOH B 101      20.000  21.000  22.000  1.00 30.00           O"
    val text = s"HEADER    X\nMODEL        1\n$line1\nENDMDL\nMODEL        2\n$line2\nEND\n"
    val p = tmpFile("t.pdb", text)
    val rows = graft.sources.GraftIO.read_pdb(spark, p)
      .selectExpr("model", "record", "serial", "atom_name", "res_name",
        "chain", "res_seq", "x", "b_factor", "element")
      .collect().map(_.toSeq).sortBy(_(2).asInstanceOf[Long])
    assert(rows.length == 2)
    assert(rows(0) == Seq(1, "ATOM", 1L, "N", "MET", "A", 1L, 11.104, 25.5, "N"))
    assert(rows(1) == Seq(2, "HETATM", 2L, "O", "HOH", "B", 101L, 20.0, 30.0, "O"))
    // TVF + gzip composition
    val gz = tmpFile("t.pdb.gz", "")
    val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(gz))
    out.write(text.getBytes("UTF-8")); out.close()
    graft.sources.GraftTableFunctions.registerAll(spark)
    assert(spark.sql(s"SELECT count(*) FROM read_pdb('$gz')").first().getLong(0) == 2)
    // corrupt fixed columns fail loudly, with the offending line
    val bad = tmpFile("bad.pdb", "ATOM  xxxxx  N   MET A   1      11.104   6.134  -6.504  1.00 25.50           N\n")
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.GraftIO.read_pdb(spark, bad).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bad atom serial")), msgs(e).mkString("|"))
  }
}
