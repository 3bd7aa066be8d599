package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftIO, TwoBit}

/** TwoBit binary codec: write∘read = id over sequences mixing plain
  * bases, N runs, and soft-mask case runs; window fetches ==
  * substrings of the full decode; the byte-swapped (big-endian)
  * variant parses identically; corrupt signatures fail loudly.
  */
class TwoBitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private def conf = spark.sessionState.newHadoopConf()

  /** Deterministic "random" sequence with planted N and case runs. */
  private def gen(i: Int, len: Int): String = {
    val sb = new StringBuilder
    var x = i * 2654435761L + 1
    while (sb.length < len) {
      x = x * 6364136223846793005L + 1442695040888963407L
      val r = ((x >>> 33) % 23).toInt
      if (r < 16) sb.append("ACGT"((r % 4)))
      else if (r < 19) sb.append("N" * (r - 14)) // N runs of 2-4
      else sb.append("acgt"((r - 19)))           // soft-masked singles
    }
    sb.setLength(len)
    sb.result()
  }

  test("write -> read_twobit = id (N runs, soft-mask, odd lengths)") {
    val seqs = (0 until 25).map(i => (s"c$i", gen(i, 31 + i * 7)))
    val d = Files.createTempDirectory("graft-2bit")
    val path = d.resolve("t.2bit").toString
    TwoBit.write(seqs, path, conf)
    val back = GraftIO.read_twobit(spark, path)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(back == seqs.toMap)
    // mask=false folds the soft-mask runs to uppercase, nothing else
    val noMask = GraftIO.read_twobit(spark, path, mask = false)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(noMask == seqs.map { case (n, s) => (n, s.toUpperCase) }.toMap)
  }

  test("twobit_query windows == substrings; clamping; unknown name empty") {
    val seq = gen(99, 500)
    val d = Files.createTempDirectory("graft-2bit")
    val path = d.resolve("q.2bit").toString
    TwoBit.write(Seq(("chr", seq)), path, conf)
    val regions = (1 to 100).map(i => s"chr:${i * 3}-${i * 3 + 17}") ++
      Seq("chr:490-9999", "chr", "nope:1-10")
    val rows = GraftIO.twobit_query(spark, path, regions)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getString(3))).toMap
    assert(rows.size == 102) // the unknown name yields no row
    (1 to 100).foreach { i =>
      assert(rows((i * 3L, i * 3L + 17)) == seq.substring(i * 3 - 1, i * 3 + 17))
    }
    assert(rows((490L, 500L)) == seq.substring(489)) // clamped to dnaSize
    assert(rows((1L, 500L)) == seq)                  // bare-name whole fetch
  }

  test("byte-swapped (big-endian) file parses identically") {
    val seqs = Seq(("a", "ACGTNNacgtACGT"), ("b", "TTTTcccc"))
    val d = Files.createTempDirectory("graft-2bit")
    val le = d.resolve("le.2bit"); val be = d.resolve("be.2bit")
    TwoBit.write(seqs, le.toString, conf)
    // swap every u32 the reader consumes: header+index+record tables
    // are all u32-aligned EXCEPT names; rebuild by structural walk.
    val bytes = Files.readAllBytes(le)
    val out = bytes.clone()
    def swap(at: Int): Unit = {
      out(at) = bytes(at + 3); out(at + 1) = bytes(at + 2)
      out(at + 2) = bytes(at + 1); out(at + 3) = bytes(at)
    }
    var pos = 0
    (0 until 4).foreach { k => swap(pos); pos += 4 } // header
    (0 until 2).foreach { _ =>                       // index: 2 entries
      val nameLen = bytes(pos) & 0xff; pos += 1 + nameLen
      swap(pos); pos += 4
    }
    seqs.foreach { case (_, s) =>                    // records
      swap(pos); pos += 4                            // dnaSize
      (0 until 2).foreach { _ =>                     // n blocks, mask blocks
        val cnt = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
          ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
        swap(pos); pos += 4
        (0 until 2 * cnt).foreach { _ => swap(pos); pos += 4 }
      }
      swap(pos); pos += 4                            // reserved
      pos += (s.length + 3) / 4                      // packed DNA (bytes)
    }
    Files.write(be, out)
    val back = GraftIO.read_twobit(spark, be.toString)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(back == seqs.toMap)
  }

  test("non-2bit input fails loudly") {
    val d = Files.createTempDirectory("graft-2bit")
    val p = d.resolve("bad.2bit")
    Files.write(p, "this is not a 2bit file".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      TwoBit.index(p.toString, conf)
    }
    assert(e.getMessage.contains("not a 2bit file"))
  }
}
