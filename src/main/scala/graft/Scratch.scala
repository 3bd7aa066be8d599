package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val F = "src/test/resources/fixtures"
    import graft.sources.GraftIO
    println("=== bcf_query 1:2000000-20000000 agg ===")
    GraftIO.bcf_query(spark, s"$F/vcf/indexed.bcf", "1:2000000-20000000")
      .selectExpr("count(*) AS n", "sum(pos) AS pos_sum", "sum(info.dp) AS dp_sum").show(false)
    println("=== samples.bcf full ===")
    GraftIO.read_bcf_file_records(spark, s"$F/vcf/samples.bcf")
      .selectExpr("chrom","pos","ref","array_join(alt,',') AS alts","qual","filter","info.dp AS dp","format","array_join(genotypes,'|') AS gts").show(false)
    println("=== samples.vcf full (parity) ===")
    GraftIO.read_vcf_file_records(spark, s"$F/vcf/samples.vcf")
      .selectExpr("chrom","pos","ref","array_join(alt,',') AS alts","qual","filter","info.dp AS dp","format","array_join(genotypes,'|') AS gts").show(false)
    spark.stop()
  }
}
