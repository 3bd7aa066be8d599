package graft.sources

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.core._

/** GenBank flat files: stateful multi-record parser (LOCUS … // blocks).
  * Proven reference columns: sequence (lowercase), accession, topology
  * (test_genbank_scan.test); a features LIST(STRUCT) appears in the
  * commented UNNEST test — surfaced here as
  * ARRAY<STRUCT<kind, location, qualifiers MAP<STRING,STRING>>>.
  */
object GenBankFormat extends GraftFormat {
  override def name = "genbank"
  override def extensions = Seq("gb", "gbk", "genbank")
  /** Records sync on 'LOCUS'-headed lines the way FASTA syncs on '>':
    * content lines are indented or digit-prefixed, so a line starting
    * 'LOCUS' is unambiguously a record head. A split claims records
    * whose LOCUS line position is within its range; plain byte ranges
    * and BGZF block splits both apply. */
  override def splittable = true

  override def schema(paths: Seq[Path], conf: Configuration,
                      options: Map[String, String]): StructType =
    StructType(Seq(
      StructField("name", StringType),
      StructField("accession", StringType),
      StructField("topology", StringType),
      StructField("definition", StringType),
      StructField("sequence", StringType),
      StructField("features", ArrayType(StructType(Seq(
        StructField("kind", StringType),
        StructField("location", StringType),
        StructField("qualifiers", MapType(StringType, StringType))))))))

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    val tagged = P.linesUnbounded(split, in).buffered
    // the record parser below only needs line text; positions matter
    // solely at the LOCUS sync points where split ownership is decided
    val lines = new scala.collection.BufferedIterator[String] {
      override def head: String = tagged.head._2
      override def hasNext: Boolean = tagged.hasNext
      override def next(): String = tagged.next()._2
    }
    new Iterator[Array[Any]] {
      override def hasNext: Boolean = {
        while (tagged.hasNext && !tagged.head._2.startsWith("LOCUS")) tagged.next()
        tagged.hasNext && tagged.head._1 <= split.end
      }
      override def next(): Array[Any] = {
        require(hasNext, "no more GenBank records")
        parseRecord()
      }

      private def parseRecord(): Array[Any] = {
        val locus = lines.next() // LOCUS name bp … topology division date
        val locusParts = locus.split("\\s+")
        val name = if (locusParts.length > 1) locusParts(1) else null
        val topology =
          if (locus.contains("circular")) "circular"
          else if (locus.contains("linear")) "linear" else null

        var accession: String = null
        var definition: String = null
        val seq = new StringBuilder
        val features = scala.collection.mutable.ArrayBuffer.empty[Any]

        var done = false
        while (lines.hasNext && !done) {
          val line = lines.next()
          if (line.startsWith("//")) done = true
          else if (line.startsWith("ACCESSION")) accession = line.substring(9).trim.split("\\s+").head
          else if (line.startsWith("DEFINITION")) {
            // continuation lines are indented past the 10-char keyword field
            val sb = new StringBuilder(line.substring(10).trim)
            while (lines.hasNext && lines.head.startsWith("          "))
              sb.append(' ').append(lines.next().trim)
            definition = sb.result()
          } else if (line.startsWith("FEATURES")) {
            // feature lines: 5-space indent kind + location; qualifiers
            // are 21-space-indented /key="value" (values may span lines)
            while (lines.hasNext && lines.head.startsWith("     ")) {
              val fl = lines.next()
              val kind = fl.substring(5, math.min(21, fl.length)).trim
              if (kind.nonEmpty) {
                val location = new StringBuilder(if (fl.length > 21) fl.substring(21).trim else "")
                while (lines.hasNext && lines.head.startsWith("                     ") &&
                       !lines.head.trim.startsWith("/"))
                  location.append(lines.next().trim)
                val quals = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
                while (lines.hasNext && lines.head.startsWith("                     ") &&
                       lines.head.trim.startsWith("/")) {
                  val q = lines.next().trim.substring(1)
                  val eq = q.indexOf('=')
                  if (eq < 0) quals += ((q, ""))
                  else {
                    val k = q.substring(0, eq)
                    val v = new StringBuilder(q.substring(eq + 1))
                    // multi-line quoted value
                    while (v.startsWith("\"") && !(v.length > 1 && v.endsWith("\"")) && lines.hasNext &&
                           lines.head.startsWith("                     ") &&
                           !lines.head.trim.startsWith("/"))
                      v.append(' ').append(lines.next().trim)
                    quals += ((k, v.result().stripPrefix("\"").stripSuffix("\"")))
                  }
                }
                features += new GenericInternalRow(Array[Any](
                  UTF8String.fromString(kind),
                  UTF8String.fromString(location.result()),
                  ArrayBasedMapData(
                    quals.map(q => UTF8String.fromString(q._1): Any).toArray,
                    quals.map(q => UTF8String.fromString(q._2): Any).toArray)))
              }
            }
          } else if (line.startsWith("ORIGIN")) {
            while (lines.hasNext && !lines.head.startsWith("//"))
              seq ++= lines.next().dropWhile(c => c.isDigit || c.isWhitespace).replace(" ", "")
          }
        }
        Array[Any](
          UTF8String.fromString(name),
          if (accession == null) null else UTF8String.fromString(accession),
          if (topology == null) null else UTF8String.fromString(topology),
          if (definition == null) null else UTF8String.fromString(definition),
          UTF8String.fromString(seq.result().toLowerCase),
          new GenericArrayData(features.toArray))
      }
    }
  }
}
