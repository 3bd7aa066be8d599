package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftIO

/** WARC source: record framing, HTTP payload unwrapping, byte-range
  * splits (resync must validate a full header block, so a `WARC/1.`
  * string inside a crawled page never frames a phantom record), gzip,
  * and loud failure on truncation.
  */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def record(typ: String, uri: String, block: Array[Byte],
                     id: String = "<urn:uuid:1>",
                     contentType: String = "application/http; msgtype=response"): Array[Byte] = {
    val head = s"WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      s"WARC-Record-ID: $id\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n"
    val out = new ByteArrayOutputStream()
    out.write(head.getBytes("US-ASCII"))
    out.write(block)
    out.write("\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  private def httpBlock(status: Int, ctype: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\nServer: x\r\n\r\n" + body)
      .getBytes("UTF-8")

  private def writeWarc(name: String, records: Seq[Array[Byte]]): Path = {
    val d = Files.createTempDirectory("graft-warc")
    val p = d.resolve(name)
    val out = new ByteArrayOutputStream()
    records.foreach(out.write)
    Files.write(p, out.toByteArray)
    p
  }

  private def withMaxSplit[T](bytes: Long)(f: => T): T = {
    val k = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(k)
    spark.conf.set(k, bytes.toString)
    try f finally spark.conf.set(k, old)
  }

  test("basic scan: http unwrapping, raw blocks, header map") {
    val p = writeWarc("basic.warc", Seq(
      record("warcinfo", null, "software: graft-test\r\n".getBytes("UTF-8"),
        id = "<urn:uuid:info>", contentType = "application/warc-fields"),
      record("response", "http://example.com/a",
        httpBlock(200, "text/html; charset=utf-8", "<html>hello</html>"),
        id = "<urn:uuid:a>"),
      record("resource", "http://example.com/raw", Array[Byte](1, 2, 3, 0, -1),
        id = "<urn:uuid:raw>", contentType = "application/octet-stream")))
    val rows = GraftIO.read_warc(spark, p.toString)
      .selectExpr("record_id", "record_type", "target_uri", "content_length",
        "http_status", "http_content_type", "cast(body AS STRING) AS body_s",
        "headers['WARC-Date'] AS hdr_date")
      .collect().sortBy(_.getString(0))
    assert(rows.length == 3)
    val Array(a, info, raw) = rows
    assert(info.getString(1) == "warcinfo" && info.isNullAt(2))
    assert(info.isNullAt(4) && info.getString(6) == "software: graft-test\r\n")
    assert(a.getString(2) == "http://example.com/a")
    assert(a.getInt(4) == 200 &&
      a.getString(5) == "text/html; charset=utf-8" &&
      a.getString(6) == "<html>hello</html>")
    assert(raw.getString(1) == "resource" && raw.isNullAt(4))
    assert(rows.forall(_.getString(7) == "2026-01-01T00:00:00Z"))
  }

  test("byte-range splits == single task; WARC/1. in a payload never frames a phantom record") {
    // every body embeds a marker look-alike: resync must reject it
    // because no valid header block follows
    val recs = (1 to 120).map { i =>
      record("response", s"http://x.test/$i",
        httpBlock(200, "text/plain", s"page $i claims WARC/1.0\r\nis not a record ${"x" * (i % 37)}"),
        id = f"<urn:uuid:$i%04d>")
    }
    val p = writeWarc("big.warc", recs)
    val whole = GraftIO.read_warc(spark, p.toString)
      .selectExpr("record_id", "http_status", "cast(body AS STRING)")
      .collect().map(_.toString).sorted
    val split = withMaxSplit(512) {
      val df = GraftIO.read_warc(spark, p.toString)
      assert(df.rdd.getNumPartitions > 5, "expected byte-range fan-out")
      df.selectExpr("record_id", "http_status", "cast(body AS STRING)")
        .collect().map(_.toString).sorted
    }
    assert(whole.length == 120)
    assert(split.toSeq == whole.toSeq)
  }

  test("warc.gz reads through the gzip path (single task)") {
    val recs = (1 to 5).map(i => record("response", s"http://g.test/$i",
      httpBlock(404, "text/plain", s"gone $i"), id = s"<urn:uuid:g$i>"))
    val raw = new ByteArrayOutputStream()
    recs.foreach(raw.write)
    val d = Files.createTempDirectory("graft-warcgz")
    val p = d.resolve("c.warc.gz")
    val gz = new GZIPOutputStream(Files.newOutputStream(p))
    gz.write(raw.toByteArray); gz.close()
    val rows = GraftIO.read_warc(spark, p.toString).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Int]("http_status") == 404))
  }

  test("header-only projection skips block decode but still counts/frames correctly") {
    val p = writeWarc("prune.warc", (1 to 30).map(i =>
      record("response", s"http://p.test/$i", httpBlock(200, "a/b", "z" * 1000),
        id = s"<urn:uuid:p$i>")))
    val df = GraftIO.read_warc(spark, p.toString)
      .groupBy("record_type").count()
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("response", 30L)))
  }

  test("truncated block fails loudly, not silently short") {
    val full = record("response", "http://t.test/1",
      httpBlock(200, "text/plain", "will be cut"), id = "<urn:uuid:t>")
    val p = writeWarc("trunc.warc", Seq(full.dropRight(20)))
    val e = intercept[org.apache.spark.SparkException] {
      GraftIO.read_warc(spark, p.toString).collect()
    }
    assert(e.getCause.getMessage.toLowerCase.contains("eof"))
  }
}
