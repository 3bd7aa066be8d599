package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftIO

/** The binary BAM writer: parse ∘ write = id against the SAM-shaped
  * 10-column schema, through the real BGZF container (header + records
  * + EOF sentinel), including the '*'/null conventions (unmapped
  * reads, missing quality -> 0xFF bytes), multi-part writes, and the
  * block-split read path over our own output. */
class BamWriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val F = "src/test/resources/fixtures"

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("example.sam round-trips through the BAM writer byte conventions") {
    val dir = queries.Stage.tempDir("bam_wrt").toString
    val src = GraftIO.read_sam_file_records(spark, s"$F/sam/example.sam")
    src.write.mode("overwrite").option("refs", "ref1:10000")
      .format("bam").save(dir)
    val back = GraftIO.read_bam_file_records(spark, dir)
    assert(rowsOf(back) === rowsOf(src))
    // the unmapped read kept its bases but dropped coords and quality
    val unmapped = back.where("flag = 4").collect()
    assert(unmapped.length == 1)
    assert(unmapped(0).isNullAt(2) && unmapped(0).isNullAt(3) &&
      unmapped(0).getString(8) == "AAAA" && unmapped(0).isNullAt(9))
  }

  test("multi-part write: every part carries the header, read-back is the union") {
    val dir = queries.Stage.tempDir("bam_parts").toString
    val src = spark.range(300).selectExpr(
      "concat('r', id) AS name", "0 AS flag", "'c1' AS reference",
      "id % 500 + 1 AS start", "id % 500 + 10 AS end",
      "'30' AS mapping_quality", "'10M' AS cigar",
      "cast(null as string) AS mate_reference",
      "repeat('ACGTN', 2) AS sequence", "repeat('I', 10) AS quality_score")
    src.repartition(3).write.mode("overwrite")
      .option("refs", "c1:1000,c2:500").format("bam").save(dir)
    val back = GraftIO.read_bam_file_records(spark, dir)
    assert(back.count() == 300)
    assert(rowsOf(back) === rowsOf(src))
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".bam"))
    assert(parts.length == 3, parts.map(_.getName).toSeq)
    assert(parts.forall(_.getName.endsWith(".bam")), "codec suffix must be suppressed")
  }

  test("BGZF byte-range split over our own written BAM reproduces the rows") {
    val dir = queries.Stage.tempDir("bam_split").toString
    spark.range(4000).selectExpr(
        "concat('q', id) AS name", "cast(id % 2 as int) AS flag",
        "'c1' AS reference", "id % 900 + 1 AS start", "id % 900 + 30 AS end",
        "'60' AS mapping_quality", "'30M' AS cigar",
        "cast(null as string) AS mate_reference",
        // md5-derived bases: incompressible enough that the BGZF
        // stream actually spans multiple byte-range splits
        "translate(substr(md5(cast(id as string)), 1, 30), '0123456789abcdef', 'ACGTACGTACGTACGT') AS sequence",
        "repeat('F', 30) AS quality_score")
      .coalesce(1).write.mode("overwrite")
      .option("refs", "c1:1000").format("bam").save(dir)
    val whole = GraftIO.read_bam_file_records(spark, dir)
    val split = GraftIO.read_bam_file_records(spark, dir,
      Map("maxSplitBytes" -> "8000"))
    assert(split.rdd.getNumPartitions > 2,
      s"expected a fan-out, got ${split.rdd.getNumPartitions} partitions")
    assert(rowsOf(split) === rowsOf(whole))
    assert(split.count() == 4000)
  }

  test("missing refs option and undeclared references fail loudly") {
    val dir = queries.Stage.tempDir("bam_err").toString
    val one = spark.sql("""SELECT 'r' AS name, 0 AS flag, 'cX' AS reference,
      1L AS start, 4L AS end, '3' AS mapping_quality, '4M' AS cigar,
      cast(null as string) AS mate_reference, 'ACGT' AS sequence,
      'IIII' AS quality_score""")
    val e1 = intercept[Exception] {
      one.write.mode("overwrite").format("bam").save(s"$dir/a")
    }
    assert(e1.getMessage != null)
    val e2 = intercept[Exception] {
      one.write.mode("overwrite").option("refs", "c1:100")
        .format("bam").save(s"$dir/b")
    }
    assert(e2.getMessage != null)
  }

  test("aux decode: hand-assembled spec-layout bytes, every type") {
    // build a record body by hand straight from the SAM spec's aux
    // layout (independent of the encoder under test)
    val bb = java.nio.ByteBuffer.allocate(512)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0)       // refId -> c1
    bb.putInt(9)       // pos0
    bb.put(3.toByte)   // l_read_name ("ab\0")
    bb.put(60.toByte)  // mapq
    bb.putShort(0)     // bin
    bb.putShort(0)     // n_cigar
    bb.putShort(0)     // flag
    bb.putInt(0)       // l_seq
    bb.putInt(-1)      // next_ref
    bb.putInt(-1)      // next_pos
    bb.putInt(0)       // tlen
    bb.put("ab".getBytes("US-ASCII")).put(0.toByte)
    def tag(t: String): Unit = { bb.put(t.charAt(0).toByte).put(t.charAt(1).toByte) }
    tag("XA"); bb.put('A'.toByte).put('Q'.toByte)
    tag("Xc"); bb.put('c'.toByte).put((-5).toByte)
    tag("XC"); bb.put('C'.toByte).put(250.toByte)
    tag("Xs"); bb.put('s'.toByte).putShort((-1234).toShort)
    tag("XS"); bb.put('S'.toByte).putShort(60000.toShort)
    tag("Xi"); bb.put('i'.toByte).putInt(-100000)
    tag("XI"); bb.put('I'.toByte).putInt(0xF0000001) // 4026531841 unsigned
    tag("Xf"); bb.put('f'.toByte).putFloat(1.5f)
    tag("XZ"); bb.put('Z'.toByte).put("hello".getBytes("US-ASCII")).put(0.toByte)
    tag("XH"); bb.put('H'.toByte).put("1AFF".getBytes("US-ASCII")).put(0.toByte)
    tag("XB"); bb.put('B'.toByte).put('s'.toByte).putInt(3)
    bb.putShort(7).putShort((-8).toShort).putShort(9)
    val body = java.util.Arrays.copyOf(bb.array(), bb.position())
    val row = graft.sources.BamFormat.decodeBody(body, Array("c1"),
      wantSeq = true, wantQual = true, wantTags = true)
    val m = row(10).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayBasedMapData]
    val pairs = (0 until m.numElements().toInt).map(i =>
      m.keyArray.getUTF8String(i).toString -> m.valueArray.getUTF8String(i).toString).toMap
    assert(pairs == Map(
      "XA" -> "A:Q", "Xc" -> "i:-5", "XC" -> "i:250", "Xs" -> "i:-1234",
      "XS" -> "i:60000", "Xi" -> "i:-100000", "XI" -> "i:4026531841",
      "Xf" -> "f:1.5", "XZ" -> "Z:hello", "XH" -> "H:1AFF",
      "XB" -> "B:s,7,-8,9"), pairs.toString)
    // and the default path still returns the 10-column parity row
    assert(graft.sources.BamFormat.decodeBody(body, Array("c1"),
      wantSeq = true, wantQual = true).length == 10)
  }
}
