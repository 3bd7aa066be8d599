package graft.sources

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.core._

/** EMBL/ENA flat files — the European mirror of GenBank's format
  * (`ID …` / `AC` / `DE` / `FT` feature table / `SQ` + `//`), emitted
  * with the SAME schema as [[GenBankFormat]] (name, accession,
  * topology, definition, sequence, features) so the two archives are
  * drop-in interchangeable downstream: every GenBank-consuming query
  * here runs unchanged on an ENA dump.
  *
  * The FT table uses GenBank's own column layout shifted behind the
  * two-letter line code ('FT' + 3 spaces, kind at column 5, location/
  * qualifiers at column 21), so the qualifier and multi-line-value
  * handling mirrors the GenBank parser deliberately. Records sync on
  * 'ID   '-headed lines (every other line carries a different
  * two-letter code), giving the same split contract as LOCUS.
  */
object EmblFormat extends GraftFormat {
  override def name = "embl"
  // '.dat' (the ENA dump suffix) is deliberately NOT claimed: it is far
  // too generic for the bare-path auto-dispatcher to grab.
  override def extensions = Seq("embl")
  override def splittable = true

  override def schema(paths: Seq[Path], conf: Configuration,
                      options: Map[String, String]): StructType =
    GenBankFormat.schema(paths, conf, options)

  private def isRecordStart(l: String): Boolean = l.startsWith("ID   ")

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    val tagged = P.linesUnbounded(split, in).buffered
    val lines = new scala.collection.BufferedIterator[String] {
      override def head: String = tagged.head._2
      override def hasNext: Boolean = tagged.hasNext
      override def next(): String = tagged.next()._2
    }
    new Iterator[Array[Any]] {
      override def hasNext: Boolean = {
        while (tagged.hasNext && !isRecordStart(tagged.head._2)) tagged.next()
        tagged.hasNext && tagged.head._1 <= split.end
      }
      override def next(): Array[Any] = {
        require(hasNext, "no more EMBL records")
        parseRecord()
      }

      private def ftBody(l: String): String = // FT line sans the code column
        if (l.length > 5) l.substring(5) else ""

      private def parseRecord(): Array[Any] = {
        val id = lines.next() // ID   name; SV n; topology; molecule; ...
        val name = id.substring(5).split("[;\\s]+").headOption.filter(_.nonEmpty).orNull
        val topology =
          if (id.contains("circular")) "circular"
          else if (id.contains("linear")) "linear" else null

        var accession: String = null
        val de = new StringBuilder
        val seq = new StringBuilder
        val features = scala.collection.mutable.ArrayBuffer.empty[Any]

        var done = false
        while (lines.hasNext && !done) {
          val line = lines.next()
          if (line.startsWith("//")) done = true
          else if (line.startsWith("AC   ") && accession == null)
            accession = line.substring(5).split("[;\\s]+").headOption
              .filter(_.nonEmpty).orNull
          else if (line.startsWith("DE   ")) {
            if (de.nonEmpty) de.append(' ')
            de.append(line.substring(5).trim): Unit
          } else if (line.startsWith("FT   ")) {
            // kind at column 5 of the body (= column 10 of the line is
            // location start in GenBank terms: body columns 0..15 kind,
            // 16.. location — matching GenBank's 5..21 minus indent)
            val body = ftBody(line)
            val kind = body.substring(0, math.min(16, body.length)).trim
            if (kind.nonEmpty) {
              val location = new StringBuilder(
                if (body.length > 16) body.substring(16).trim else "")
              // a NEW feature line is 'FT' + exactly 3 spaces + kind, so
              // startsWith("FT    ") (4 spaces) matches continuations only
              def contBody: String = ftBody(lines.head)
              while (lines.hasNext && lines.head.startsWith("FT    ") &&
                     contBody.trim.nonEmpty && !contBody.trim.startsWith("/"))
                location.append(ftBody(lines.next()).trim)
              val quals = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
              while (lines.hasNext && lines.head.startsWith("FT    ") &&
                     contBody.trim.startsWith("/")) {
                val q = ftBody(lines.next()).trim.substring(1)
                val eq = q.indexOf('=')
                if (eq < 0) quals += ((q, ""))
                else {
                  val k = q.substring(0, eq)
                  val v = new StringBuilder(q.substring(eq + 1))
                  while (v.startsWith("\"") && !(v.length > 1 && v.endsWith("\"")) &&
                         lines.hasNext && lines.head.startsWith("FT    ") &&
                         !contBody.trim.startsWith("/"))
                    v.append(' ').append(ftBody(lines.next()).trim)
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
          } else if (line.startsWith("SQ   ")) {
            while (lines.hasNext && !lines.head.startsWith("//"))
              seq ++= lines.next().filter(_.isLetter)
          }
        }
        Array[Any](
          if (name == null) null else UTF8String.fromString(name),
          if (accession == null) null else UTF8String.fromString(accession),
          if (topology == null) null else UTF8String.fromString(topology),
          if (de.isEmpty) null else UTF8String.fromString(de.result()),
          UTF8String.fromString(seq.result().toLowerCase),
          new GenericArrayData(features.toArray))
      }
    }
  }
}
