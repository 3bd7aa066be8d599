package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Manual benchmark (sbt "Test/runMain graft.tools.MzmlSplitSpeedup"):
  * generates one large uncompressed mzML and times a full parse (sum
  * over every decoded m/z + intensity value reaches every payload) as
  * ONE task vs byte-range split tasks — the single-file fan-out the
  * round-6 XmlRecordSlicer work buys. The reference's single-producer
  * Arrow stream (exon/src/exon/arrow_table_function/module.cpp:36) has
  * the same one-task limit this removes. Numbers in BENCH_NOTES.md.
  */
object MzmlSplitSpeedup {
  def main(args: Array[String]): Unit = {
    val spectra = args.headOption.map(_.toInt).getOrElse(60000)
    val peaks = 128 // doubles per array; 2 arrays/spectrum
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-mzml-speedup")
    val p = dir.resolve("big.mzML")
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(p), 1 << 20)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def b64(seed: Int): String = {
      val bb = java.nio.ByteBuffer.allocate(peaks * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var j = 0
      while (j < peaks) { bb.putDouble(seed + j); j += 1 }
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
    w("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n")
    w("<mzML xmlns=\"http://psi.hupo.org/ms/mzml\" version=\"1.1.0\">\n")
    w(s"""<run id="r0"><spectrumList count="$spectra">\n""")
    var i = 0
    while (i < spectra) {
      i += 1
      w(s"""<spectrum index="${i - 1}" id="scan=$i" defaultArrayLength="$peaks">""")
      w("<binaryDataArrayList count=\"2\">")
      w("<binaryDataArray><cvParam accession=\"MS:1000523\"/><cvParam accession=\"MS:1000514\"/>")
      w("<binary>"); w(b64(i)); w("</binary></binaryDataArray>")
      w("<binaryDataArray><cvParam accession=\"MS:1000523\"/><cvParam accession=\"MS:1000515\"/>")
      w("<binary>"); w(b64(i * 2)); w("</binary></binaryDataArray>")
      w("</binaryDataArrayList></spectrum>\n")
    }
    w("</spectrumList></run>\n</mzML>\n")
    out.close()
    val sizeMb = Files.size(p) / 1e6
    println(f"[speedup] generated $spectra%d spectra x ${2 * peaks}%d doubles, $sizeMb%.1f MB uncompressed")

    def timeScan(maxSplit: Long, label: String): Double = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxSplit.toString)
      val df = graft.sources.GraftIO.read_mzml(spark, p.toString)
      val parts = df.rdd.getNumPartitions
      val t0 = System.nanoTime()
      val r = df.selectExpr(
        "sum(aggregate(mz.mz, 0D, (a, x) -> a + x)) AS mz_sum",
        "sum(aggregate(intensity.intensity, 0D, (a, x) -> a + x)) AS int_sum",
        "count(*) AS n").collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[speedup] $label%-12s parts=$parts%3d  ${sec}%6.2f s  n=${r.getLong(2)}")
      sec
    }

    timeScan(16L << 20, "warmup")
    val single = timeScan(4L << 30, "single-task")
    val split = timeScan(16L << 20, "range-split")
    println(f"[speedup] speedup: ${single / split}%.2fx on local[$cpus%s]")
    spark.stop()
  }
}
