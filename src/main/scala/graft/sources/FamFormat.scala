package graft.sources

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.sources.core.{GraftFormat, GraftSplit}

/** plink .fam pedigree files (plink 1.9 file-format docs): six
  * whitespace columns — family, individual, father, mother ('0' = not
  * in pedigree, surfaced as NULL), sex (1 male / 2 female, anything
  * else NULL), phenotype (string: plink allows -9/0 missing codes,
  * case/control 1/2, or quantitative values — the consumer casts).
  * One record per line with no cross-line state — byte-splittable like
  * BED/BLAST6; cohort-scale .fam files ride the same split machinery
  * as every other line format. Short lines fail loudly. */
object FamFormat extends GraftFormat {
  override def name = "fam"
  override def extensions = Seq("fam")
  override def splittable = true

  override def schema(paths: Seq[Path], conf: Configuration,
                      options: Map[String, String]): StructType =
    StructType(Seq(
      StructField("family_id", StringType),
      StructField("individual_id", StringType),
      StructField("father_id", StringType),
      StructField("mother_id", StringType),
      StructField("sex", IntegerType),
      StructField("phenotype", StringType)))

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    P.lines(split, in)
      .map(_._2)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val c = line.trim.split("\\s+")
        require(c.length >= 6,
          s"fam line needs 6 fields, got ${c.length}: '$line' in ${split.path}")
        def parent(v: String): Any = if (v == "0") null else P.s(v)
        val sex: Any = c(4) match {
          case "1" => 1
          case "2" => 2
          case _   => null
        }
        Array[Any](P.s(c(0)), P.s(c(1)), parent(c(2)), parent(c(3)),
          sex, P.s(c(5)))
      }
  }
}
