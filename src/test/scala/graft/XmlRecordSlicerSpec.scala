package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.core.XmlRecordSlicer

/** The split protocol the mzML byte-range scan rests on: for ANY way of
  * cutting the file into consecutive byte ranges, the records owned by
  * the ranges form an exact partition of the file's records — no loss,
  * no duplication, regardless of where the cuts land (mid-tag, mid-
  * base64, mid-comment content, on a record boundary).
  */
class XmlRecordSlicerSpec extends AnyFunSuite {

  private val Names = Set("spectrum", "chromatogram")

  private def records(doc: Array[Byte], start: Long, end: Long): List[String] = {
    val in = new ByteArrayInputStream(doc)
    var skipped = 0L
    while (skipped < start) skipped += in.skip(start - skipped)
    new XmlRecordSlicer(in, start, end, Names).map(new String(_, US_ASCII)).toList
  }

  /** All records = the single full-range split's view. */
  private def allRecords(doc: Array[Byte]): List[String] =
    records(doc, 0, Long.MaxValue)

  /** Every fixed split size k must reproduce the full record list by
    * concatenating consecutive [i*k, (i+1)*k) ranges. */
  private def assertExactPartition(doc: Array[Byte]): Unit = {
    val whole = allRecords(doc)
    assert(whole.nonEmpty, "fixture must contain records")
    for (k <- 1 to doc.length) {
      val pieces = (0 until doc.length by k).flatMap { s =>
        records(doc, s.toLong, math.min(s + k, doc.length).toLong)
      }.toList
      assert(pieces == whole, s"split size $k mis-partitions the records")
    }
  }

  private val doc = (
    """<?xml version="1.0" encoding="utf-8"?>
      |<mzML xmlns="http://x" version="1.1.0">
      |  <!-- run header - with > dashes - and <other> tags -->
      |  <run id="r0"><spectrumList count="5">
      |    <spectrum index="0" id="s1" note="a&gt;b"><binary>QUJD</binary></spectrum>
      |    <spectrum index="1" id="s2"><![CDATA[ fake close </spectrum> inside cdata ]]>x</spectrum>
      |    <spectrum index="2" id="s3" attr="x>y"><cvParam accession="MS:1000514"/></spectrum>
      |    <chromatogram index="0" id="c1"/>
      |    <spectrum index="3" id="s4"><!-- fake close </spectrum> in comment --><x/></spectrum>
      |  </spectrumList></run>
      |</mzML>
      |""".stripMargin).getBytes(US_ASCII)

  test("every split size yields an exact record partition") {
    assertExactPartition(doc)
  }

  test("full scan finds exactly the five records, structure intact") {
    val recs = allRecords(doc)
    assert(recs.length == 5)
    assert(recs.count(_.startsWith("<spectrum")) == 4)
    assert(recs.count(_.startsWith("<chromatogram")) == 1)
    // CDATA / comment close-tag decoys stay inside their record bytes
    assert(recs(1).contains("inside cdata ]]>x</spectrum>"))
    assert(recs(4).contains("in comment --><x/></spectrum>"))
    // quote-aware start-tag scan: '>' inside an attribute value
    assert(recs(2).startsWith("<spectrum index=\"2\" id=\"s3\" attr=\"x>y\">"))
    // self-closing record
    assert(recs(3) == "<chromatogram index=\"0\" id=\"c1\"/>")
  }

  test("a commented-out record start between records is not a record") {
    val decoy = (
      """<mzML><run>
        |<!-- disabled: <spectrum id="phantom"><binary>QUJD</binary></spectrum> -->
        |<spectrum id="real"><binary>REVG</binary></spectrum>
        |</run></mzML>
        |""".stripMargin).getBytes(US_ASCII)
    val recs = allRecords(decoy)
    assert(recs.length == 1)
    assert(recs.head.contains("id=\"real\""))
  }

  test("a CDATA'd record start between records is not a record") {
    val decoy = (
      """<mzML><run><notes><![CDATA[ <spectrum id="phantom"></spectrum> ]]></notes>
        |<spectrum id="real"/>
        |</run></mzML>
        |""".stripMargin).getBytes(US_ASCII)
    val recs = allRecords(decoy)
    assert(recs == List("<spectrum id=\"real\"/>"))
  }

  test("record names are matched whole: spectrumList is not a record start") {
    val recs = allRecords(doc)
    assert(!recs.exists(_.startsWith("<spectrumList")))
  }

  test("truncated record start tag fails, not silently drops") {
    val cut = "<mzML><spectrum id=\"s1\" attr=\"unclosed".getBytes(US_ASCII)
    intercept[java.io.EOFException] { allRecords(cut) }
  }

  test("unterminated record element fails, not silently drops") {
    val cut = "<mzML><spectrum id=\"s1\"><binary>QUJD</binary>".getBytes(US_ASCII)
    intercept[java.io.EOFException] { allRecords(cut) }
  }

  test("asDocumentStream wraps owned records in a parseable synthetic root") {
    val stream = XmlRecordSlicer.asDocumentStream(
      new ByteArrayInputStream(doc), 0, Long.MaxValue, Names)
    val text = new String(stream.readAllBytes(), US_ASCII)
    assert(text.startsWith("<splitRoot>"))
    assert(text.endsWith("</splitRoot>"))
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    val r = f.createXMLStreamReader(new ByteArrayInputStream(text.getBytes(US_ASCII)))
    var spectra = 0
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "spectrum") spectra += 1
    }
    assert(spectra == 4)
  }
}
