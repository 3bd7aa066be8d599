package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Manual benchmark (sbt "Test/runMain graft.tools.ColumnarSpike"):
  * row-reader vs columnar-batch reader on the same uncompressed FASTA
  * (the hot text format), same splits, same queries. Records whether
  * OnHeapColumnVector batching beats per-record GenericInternalRow in
  * this parser's regime — numbers go to BENCH_NOTES.md, and the
  * columnar option's default stays off until they justify it.
  */
object ColumnarSpike {
  def main(args: Array[String]): Unit = {
    val records = args.headOption.map(_.toInt).getOrElse(1500000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-colspike")
    val p = dir.resolve("big.fasta")
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(p), 1 << 20)
    val line = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n".getBytes
    var i = 0
    while (i < records) {
      out.write(s">seq$i desc$i\n".getBytes)
      out.write(line); out.write(line); out.write(line)
      i += 1
    }
    out.close()
    println(f"[colspike] ${Files.size(p) / 1e6}%.0f MB, $records records")

    def time(label: String, columnar: Boolean): Double = {
      val opts = Map("maxsplitbytes" -> (32L << 20).toString) ++
        (if (columnar) Map("columnar" -> "true") else Map.empty)
      val df = graft.sources.GraftIO.read_fasta(spark, p.toString, opts)
      val t0 = System.nanoTime()
      val r = df.selectExpr("count(*) AS n", "sum(length(sequence)) AS s").collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[colspike] $label%-10s ${sec}%6.2f s  n=${r.getLong(0)} sum=${r.getLong(1)}")
      sec
    }
    time("warmup", columnar = false)
    val row = (1 to 3).map(_ => time("rows", columnar = false)).min
    val col = (1 to 3).map(_ => time("columnar", columnar = true)).min
    println(f"[colspike] best row=$row%.2f s columnar=$col%.2f s -> ${row / col}%.2fx")

    // nested case (round-9 verdict ask #6): the VCF record shape —
    // alt array + header-typed info struct with a scalar, a flag and a
    // Number=A float array — through the batch path vs rows
    val vrecords = args.lift(1).map(_.toInt).getOrElse(800000)
    val vp = dir.resolve("big.vcf")
    val vout = new java.io.BufferedOutputStream(Files.newOutputStream(vp), 1 << 20)
    vout.write(("##fileformat=VCFv4.2\n" +
      "##INFO=<ID=INDEL,Number=0,Type=Flag,Description=\"indel\">\n" +
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">\n" +
      "##INFO=<ID=AF,Number=A,Type=Float,Description=\"afs\">\n" +
      "##contig=<ID=1>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n").getBytes)
    i = 0
    while (i < vrecords) {
      val alt = if (i % 3 == 0) "C,T" else "G"
      val info = if (i % 5 == 0) s"INDEL;DP=${i % 97}"
        else if (i % 3 == 0) s"DP=${i % 97};AF=0.5,0.25" else s"DP=${i % 97};AF=0.125"
      vout.write(s"1\t${100 + i}\t.\tA\t$alt\t30\tPASS\t$info\n".getBytes)
      i += 1
    }
    vout.close()
    println(f"[colspike] vcf ${Files.size(vp) / 1e6}%.0f MB, $vrecords records")

    def timeVcf(label: String, columnar: Boolean): Double = {
      val opts = Map("maxsplitbytes" -> (32L << 20).toString) ++
        (if (columnar) Map("columnar" -> "true") else Map.empty)
      val df = graft.sources.GraftIO.read_vcf_file_records(spark, vp.toString, opts)
      val t0 = System.nanoTime()
      val r = df.selectExpr("count(*) AS n", "sum(info.dp) AS dp",
        "sum(size(alt)) AS na", "sum(size(info.af)) AS nf").collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[colspike] vcf $label%-10s ${sec}%6.2f s  n=${r.getLong(0)} " +
        f"dp=${r.getLong(1)} alts=${r.getLong(2)} afs=${r.getLong(3)}")
      sec
    }
    timeVcf("warmup", columnar = false)
    val vrow = (1 to 3).map(_ => timeVcf("rows", columnar = false)).min
    val vcol = (1 to 3).map(_ => timeVcf("columnar", columnar = true)).min
    println(f"[colspike] vcf best row=$vrow%.2f s columnar=$vcol%.2f s -> ${vrow / vcol}%.2fx")
    spark.stop()
  }
}
