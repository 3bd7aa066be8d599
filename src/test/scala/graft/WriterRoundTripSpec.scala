package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftIO

/** parse ∘ write = id for the writable formats (reference §2.B COPY
  * semantics), including compression, with ScalaCheck-generated records
  * (sampled with fixed seeds; scalatestplus bridge isn't on the
  * classpath). */
class WriterRoundTripSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def tmp(): String =
    Files.createTempDirectory("graft-write").resolve("out").toString

  private val seqGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf('A', 'C', 'G', 'T')).map(_.mkString)
  private val idGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))

  test("fasta round-trip (plain + gzip + zstd), generated records") {
    val recGen = for {
      id <- idGen
      desc <- Gen.option(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(20)))
      seq <- seqGen
    } yield (id, desc, seq)
    for (seed <- 1L to 5L) {
      val recs0 = Gen.nonEmptyListOf(recGen)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(List(("x", None, "ACGT")))
      // unique ids so orderBy comparison is stable
      val recs = recs0.zipWithIndex.map { case ((i, d, q), n) => (s"$i$n", d, q) }
      val schema = StructType(Seq(
        StructField("id", StringType), StructField("description", StringType),
        StructField("sequence", StringType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(recs.map(r => Row(r._1, r._2.orNull, r._3)), 2), schema)
      for (codec <- Seq("none", "gzip", "zstd")) {
        val dir = tmp()
        df.write.mode("overwrite").option("compression", codec).format("fasta").save(dir)
        val back = GraftIO.read_fasta(spark, dir,
            options = if (codec == "none") Map.empty else Map("compression" -> codec))
          .orderBy("id").collect().map(r => (r.getString(0), Option(r.getString(1)), r.getString(2)))
        assert(back.toSeq == recs.sortBy(_._1), codec)
      }
    }
  }

  test("fastq round-trip via fixture") {
    val src = GraftIO.read_fastq(spark, "src/test/resources/fixtures/fastq/test.fastq")
    val dir = tmp()
    src.write.mode("overwrite").format("fastq").save(dir)
    val back = GraftIO.read_fastq(spark, dir)
    assert(back.orderBy("name").collect().toSeq == src.orderBy("name").collect().toSeq)
  }

  test("gff round-trip via fixture (attributes map re-rendered)") {
    val src = GraftIO.read_gff(spark, "src/test/resources/fixtures/gff/test.gff")
    val dir = tmp()
    src.write.mode("overwrite").format("gff").save(dir)
    val back = GraftIO.read_gff(spark, dir)
    assert(back.orderBy("seqname").collect().toSeq == src.orderBy("seqname").collect().toSeq)
  }
}
