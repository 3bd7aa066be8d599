package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.core.MultiMemberGzipInputStream

/** Multi-member gzip (BGZF) decode must not depend on the underlying
  * stream's available() heuristic — object-store and HDFS streams often
  * report 0 mid-stream, which makes java's GZIPInputStream stop at the
  * first member boundary. */
class MultiMemberGzipSpec extends AnyFunSuite {

  private def member(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(s.getBytes("UTF-8"))
    gz.close()
    bos.toByteArray
  }

  /** Wraps a stream, hiding available() (always 0) and feeding one byte
    * at a time — the worst-case remote-stream shape. */
  private final class StingyStream(data: Array[Byte]) extends InputStream {
    private val in = new ByteArrayInputStream(data)
    override def read(): Int = in.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (len == 0) 0 else in.read(b, off, 1) // one byte per call
    override def available(): Int = 0
  }

  private def drain(in: InputStream): String = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](333)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toString("UTF-8")
  }

  test("concatenated members decode fully over a stingy stream") {
    val data = member("first-part|") ++ member("second-part|") ++ member("third")
    assert(drain(new MultiMemberGzipInputStream(new StingyStream(data))) ==
      "first-part|second-part|third")
  }

  test("single member and empty-payload members work") {
    assert(drain(new MultiMemberGzipInputStream(new StingyStream(member("only")))) == "only")
    val withEmpty = member("a") ++ member("") ++ member("b")
    assert(drain(new MultiMemberGzipInputStream(new StingyStream(withEmpty))) == "ab")
  }

  test("truncated/garbage trailing data raises a real error, not 'push back buffer is full'") {
    // mid-member truncation: the JDK's concatenation probe can leave up
    // to a full inflater buffer unconsumed; the pushback must absorb it
    val full = member("x" * 100000) ++ member("tail")
    val truncated = full.take(full.length - 37)
    val ex = intercept[java.io.IOException] {
      drain(new MultiMemberGzipInputStream(new ByteArrayInputStream(truncated)))
    }
    assert(!ex.getMessage.contains("Push back buffer is full"), ex.getMessage)
  }

  test("bgzf writer output decodes through the multi-member reader") {
    val payload = ("line-" * 5000).getBytes("UTF-8") // spans blocks? no: 25KB, 1 block + EOF
    val bos = new ByteArrayOutputStream()
    val bgzf = new graft.sources.core.BgzfOutputStream(bos)
    bgzf.write(payload)
    bgzf.close()
    assert(drain(new MultiMemberGzipInputStream(
      new StingyStream(bos.toByteArray))) == new String(payload, "UTF-8"))
  }
}
