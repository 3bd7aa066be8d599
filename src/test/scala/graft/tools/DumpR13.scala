package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Round-13 optimization evidence dumper: writes
  * `plans/r13/<entry>_<suffix>.txt` with the `explain("formatted")`
  * output of each named entry (usage:
  * `sbt "Test/runMain graft.tools.DumpR13 <suffix> <entry>[,entry...]"`).
  * Run once on the pre-change tree (suffix `before`) and once after
  * (`after`); entries whose construction executes eager sub-jobs
  * (iterative loops) dump the FINAL frame's plan — the per-round shape
  * is documented in the entry's code and OPTIMIZATION_r13.md.
  */
object DumpR13 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r13"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(s"plans/r13/${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"wrote plans/r13/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
