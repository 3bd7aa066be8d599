package graft.sources

import java.io.InputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.core._

/** mzML (mass-spec XML): streaming StAX parse of spectrum/chromatogram
  * elements; binary data arrays are base64, kind/precision/compression
  * declared by cvParam accessions (MS:1000514 m/z, MS:1000515 intensity,
  * MS:1000617 wavelength, MS:1000523 64-bit, MS:1000521 32-bit,
  * MS:1000574 zlib). Proven reference columns: id,
  * intensity STRUCT(intensity LIST(DOUBLE)), wavelength STRUCT(…)
  * (test_mzml_scan.test); m/z surfaced the same way.
  */
object MzmlFormat extends GraftFormat {
  override def name = "mzml"
  override def extensions = Seq("mzml")
  /** Byte-range splits via structural resync to `<spectrum`/
    * `<chromatogram` start tags ('<' cannot occur in base64 payloads or
    * raw in XML values — see XmlRecordSlicer). A large uncompressed
    * .mzML scans one task per ~maxSplit bytes instead of one per file. */
  override def splittable = true
  /** BGZF voff coordinates are not plumbed through the XML slicer, and
    * real-world mzML is plain-gzipped if at all — keep compressed files
    * single-task rather than claim an untested protocol. */
  override def bgzfSplittable = false

  override def schema(paths: Seq[Path], conf: Configuration,
                      options: Map[String, String]): StructType = {
    def wrapped(n: String) = StructField(n, StructType(Seq(
      StructField(n, ArrayType(DoubleType)))))
    StructType(Seq(
      StructField("id", StringType),
      wrapped("mz"), wrapped("intensity"), wrapped("wavelength")))
  }

  /** Record element names a byte-range split syncs to. */
  private val RecordNames = Set("spectrum", "chromatogram")

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    // Byte-range split: the stream arrives seek()ed to split.start; the
    // slicer re-frames it as a well-formed document of exactly this
    // split's owned records (synthetic <splitRoot> wrapper — an unknown
    // element name, so the StAX loop below passes it through). The
    // whole-file case parses the raw stream directly: it may be
    // compressed, and real mzML headers/footers carry elements the
    // slicer would drop.
    val ranged = split.start != 0 || split.end != Long.MaxValue
    val stream =
      if (ranged) XmlRecordSlicer.asDocumentStream(in, split.start, split.end, RecordNames)
      else in
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = factory.createXMLStreamReader(stream)

    // Lazy pull parser: one row is materialized at a time — an mzML row
    // holds full decoded double arrays (the largest rows in the system),
    // so buffering a whole split would hold every spectrum's peaks on
    // heap at once.
    new Iterator[Array[Any]] {
      private var id: String = null
      private var inRecord = false
      private var arrays: Map[String, Array[Double]] = Map.empty
      // per binaryDataArray state
      private var kind: String = null
      private var bits = 64
      private var zlib = false
      private var b64: String = null
      private var closed = false
      private var nextRow: Array[Any] = _

      advance()

      private def flushArray(): Unit = {
        if (kind != null && b64 != null) {
          var bytes = Base64.getDecoder.decode(b64.replaceAll("\\s", ""))
          if (zlib) {
            val inf = new java.util.zip.Inflater()
            inf.setInput(bytes)
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            while (!inf.finished()) {
              val n = inf.inflate(tmp)
              if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated zlib block")
              buf.write(tmp, 0, n)
            }
            bytes = buf.toByteArray
          }
          val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          val vals =
            if (bits == 64) { val a = new Array[Double](bytes.length / 8); var i = 0; while (i < a.length) { a(i) = bb.getDouble(i * 8); i += 1 }; a }
            else { val a = new Array[Double](bytes.length / 4); var i = 0; while (i < a.length) { a(i) = bb.getFloat(i * 4).toDouble; i += 1 }; a }
          arrays += (kind -> vals)
        }
        kind = null; bits = 64; zlib = false; b64 = null
      }

      private def buildRow(): Array[Any] = {
        def struct(n: String): Any = arrays.get(n) match {
          case Some(a) => new GenericInternalRow(Array[Any](new GenericArrayData(a)))
          case None    => null
        }
        val row = Array[Any](UTF8String.fromString(id),
          struct("mz"), struct("intensity"), struct("wavelength"))
        id = null; arrays = Map.empty
        row
      }

      private def advance(): Unit = {
        nextRow = null
        if (closed) return
        try {
          while (nextRow == null && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "spectrum" | "chromatogram" =>
                    inRecord = true
                    id = r.getAttributeValue(null, "id")
                  case "binaryDataArray" if inRecord =>
                    kind = null; bits = 64; zlib = false; b64 = null
                  case "cvParam" if inRecord =>
                    r.getAttributeValue(null, "accession") match {
                      case "MS:1000514" => kind = "mz"
                      case "MS:1000515" => kind = "intensity"
                      case "MS:1000617" => kind = "wavelength"
                      case "MS:1000523" => bits = 64
                      case "MS:1000521" => bits = 32
                      case "MS:1000574" => zlib = true
                      case _            =>
                    }
                  case "binary" if inRecord =>
                    b64 = r.getElementText
                  case _ =>
                }
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "binaryDataArray" if inRecord => flushArray()
                  case "spectrum" | "chromatogram" if inRecord =>
                    inRecord = false
                    nextRow = buildRow()
                  case _ =>
                }
              case _ =>
            }
          }
        } finally if (nextRow == null) { closed = true; r.close() }
      }

      override def hasNext: Boolean = nextRow != null
      override def next(): Array[Any] = {
        val row = nextRow
        advance()
        row
      }
    }
  }
}
