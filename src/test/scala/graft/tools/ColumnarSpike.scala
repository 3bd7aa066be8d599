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
    spark.stop()
  }
}
