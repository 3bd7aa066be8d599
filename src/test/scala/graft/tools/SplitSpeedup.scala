package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Manual benchmark (sbt "Test/runMain graft.tools.SplitSpeedup"):
  * generates a multi-block BGZF VCF large enough to fan out, then times
  * a full parse (sum over pos + info.dp reaches every record) as ONE
  * task vs block-split tasks. This is the single-file intra-parallelism
  * the round-4 split work buys — the reference's single-producer Arrow
  * stream cannot fan out at all. Numbers recorded in BENCH_NOTES.md.
  */
object SplitSpeedup {
  def main(args: Array[String]): Unit = {
    val lines = args.headOption.map(_.toInt).getOrElse(4000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-speedup")
    val p = dir.resolve("big.vcf.gz")
    val out = new graft.sources.core.BgzfOutputStream(
      new java.io.BufferedOutputStream(Files.newOutputStream(p), 1 << 20))
    out.write(("##fileformat=VCFv4.2\n" +
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\">\n" +
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n").getBytes("UTF-8"))
    var i = 0
    while (i < lines) {
      i += 1
      out.write(s"chr${i % 23}\t$i\tid$i\tA\tG\t50.0\tPASS\tDP=${i % 1000}\n".getBytes("UTF-8"))
    }
    out.close()
    val sizeMb = Files.size(p) / 1e6
    println(f"[speedup] generated $lines%d records, $sizeMb%.1f MB compressed")

    def timeScan(maxSplit: String, label: String): Double = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxSplit)
      val df = graft.sources.GraftIO.read_vcf_file_records(spark, p.toString)
      val parts = df.rdd.getNumPartitions
      val t0 = System.nanoTime()
      val r = df.selectExpr("sum(pos) AS s", "sum(info.dp) AS d", "count(*) AS n")
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[speedup] $label%-12s parts=$parts%3d  ${sec}%6.2f s  n=${r.getLong(2)}")
      sec
    }

    timeScan((16L << 20).toString, "warmup")
    val single = timeScan((4L << 30).toString, "single-task")
    val split = timeScan((8L << 20).toString, "block-split")
    println(f"[speedup] speedup: ${single / split}%.2fx on local[$cpus%s]")
    spark.stop()
  }
}
