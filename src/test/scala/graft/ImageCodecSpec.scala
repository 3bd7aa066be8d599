package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal.ImageCodec

/** The real (javax.imageio) half of the multimodal codec seam:
  * mm_real_* registry entries rely on encodePng+decode being an EXACT
  * pixel round trip (PNG is lossless), and on decode handling formats
  * the seam may meet in the wild (JPEG) plus garbage bytes loudly. */
class ImageCodecSpec extends AnyFunSuite {

  test("PNG encode -> decode round-trips pixels exactly") {
    val w = 17; val h = 15
    val png = ImageCodec.encodePng(w, h, (x, y) => (x + 2 * y + 7) % 256)
    // a real container, not a raw buffer: PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val d = ImageCodec.decode(png)
    assert(d.width == w && d.height == h && d.pixels.length == w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val got = d.pixels((y * w + x) * 3 + c) & 0xff
      assert(got == (x + 2 * y + 7) % 256,
        s"pixel ($x,$y) channel $c: got $got")
    }
  }

  test("JPEG bytes decode through the same seam (lossy, so dims only)") {
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, (x * 30) << 16)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val d = ImageCodec.decode(bos.toByteArray)
    assert(d.width == 8 && d.height == 6 && d.pixels.length == 8 * 6 * 3)
  }

  test("undecodable bytes fail loudly, not as silent empty pixels") {
    val e = intercept[IllegalArgumentException] {
      ImageCodec.decode("definitely not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("decodable"))
  }

  test("animated GIF frame sequence round-trips every frame exactly") {
    // indexed 256-gray palette => lossless; each frame has a distinct
    // gradient so a frame-ordering bug cannot cancel out
    val (w, h, nf) = (8, 6, 7)
    def gray(f: Int, x: Int, y: Int): Int = (x + 2 * y + 3 * f + 11) % 256
    val gif = ImageCodec.encodeGifFrames(w, h, nf, gray)
    assert(new String(gif, 0, 6, "US-ASCII").startsWith("GIF8"))
    val frames = ImageCodec.decodeGifFrames(gif)
    assert(frames.length == nf)
    frames.zipWithIndex.foreach { case (d, f) =>
      assert(d.width == w && d.height == h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val got = d.pixels((y * w + x) * 3 + c) & 0xff
        assert(got == gray(f, x, y), s"frame $f pixel ($x,$y) ch $c: $got")
      }
    }
  }

  test("pngMeta walks real chunks, verifies CRCs, and catches corruption") {
    import graft.pipeline.Multimodal
    val spark = SparkTestSession.get
    import spark.implicits._
    val png = ImageCodec.encodePng(19, 7, (x, y) => (3 * x + y) % 256)
    val rows = Multimodal.pngMeta(
      Seq(Multimodal.MediaRow(5L, png, 19, 7)).toDS()).collect()
    assert(rows.length == 1)
    val m = rows.head
    assert(m.width == 19 && m.height == 7, m.toString)
    assert(m.bit_depth == 8 && m.color_type == 2, m.toString) // truecolor
    assert(m.n_chunks == 3 && m.crc_ok, m.toString) // IHDR, IDAT, IEND
    // flip one IDAT payload byte: geometry still parses, CRC must trip
    val bad = png.clone(); bad(40) = (bad(40) ^ 0x55).toByte
    val mb = Multimodal.pngMeta(
      Seq(Multimodal.MediaRow(6L, bad, 19, 7)).toDS()).collect().head
    assert(!mb.crc_ok, mb.toString)
    assert(mb.width == 19 && mb.height == 7, mb.toString)
    // non-PNG bytes fail loudly
    intercept[org.apache.spark.SparkException] {
      Multimodal.pngMeta(
        Seq(Multimodal.MediaRow(7L, "plainly not a png".getBytes("UTF-8"),
          1, 1)).toDS()).collect()
    }
    // a corrupt chunk LENGTH (negative, or walking past the buffer,
    // incl. the off+12+len int-overflow path) must reject with the
    // doc-labelled message, not a raw ArrayIndexOutOfBounds from CRC32
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    for (evil <- Seq(0x7fffff00, 0x40000000, -5)) {
      val tr = png.clone()
      tr(8)  = (evil >>> 24).toByte; tr(9)  = (evil >>> 16).toByte
      tr(10) = (evil >>> 8).toByte;  tr(11) = evil.toByte
      val e = intercept[org.apache.spark.SparkException] {
        Multimodal.pngMeta(Seq(Multimodal.MediaRow(8L, tr, 19, 7)).toDS()).collect()
      }
      assert(msgs(e).exists(_.contains("corrupt PNG chunk")), s"len=$evil: ${msgs(e)}")
    }
  }

  test("averageHash: constant image hashes to zero; gradient is shift-stable") {
    import graft.pipeline.Multimodal
    val spark = SparkTestSession.get
    import spark.implicits._
    def hashOf(d: Long, f: (Int, Int) => Int): (Long, Long) = {
      val png = ImageCodec.encodePng(16, 16, f)
      val r = Multimodal.averageHash(
        Seq(Multimodal.MediaRow(d, png, 16, 16)).toDS()).collect().head
      (r.ah1, r.ah2)
    }
    // constant image: no sample exceeds the mean -> all bits zero
    assert(hashOf(0L, (_, _) => 77) == ((0L, 0L)))
    // left-dark/right-bright split: exactly the right half's bits set
    val (h1, h2) = hashOf(1L, (x, _) => if (x < 8) 10 else 200)
    assert(java.lang.Long.bitCount(h1) + java.lang.Long.bitCount(h2) == 32,
      s"$h1 $h2")
    // a +1 brightness shift must not change the hash (mean shifts too)
    val a = hashOf(2L, (x, y) => (x * 3 + y * 5) % 200)
    val b = hashOf(3L, (x, y) => (x * 3 + y * 5) % 200 + 1)
    assert(a == b, s"$a vs $b")
  }
}

/** WAV counterpart: the hand-rolled RIFF encoder must decode EXACTLY
  * through the JDK's javax.sound.sampled — including both int16
  * extremes — and garbage must fail loudly. */
class AudioCodecSpec extends AnyFunSuite {
  import graft.pipeline.Multimodal.AudioCodec

  test("WAV encode -> javax.sound decode round-trips samples exactly") {
    val samples = Array.tabulate(257)(i =>
      (((i.toLong * 31 + 7) % 65536) - 32768).toShort) ++
      Array(Short.MinValue, Short.MaxValue, 0.toShort)
    val wav = AudioCodec.encodeWav(8000, samples)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF" &&
      new String(wav, 8, 4, "US-ASCII") == "WAVE")
    val d = AudioCodec.decodeWav(wav)
    assert(d.sampleRate == 8000)
    assert(d.samples.toSeq == samples.toSeq)
  }

  test("undecodable bytes fail loudly") {
    val e = intercept[IllegalArgumentException] {
      AudioCodec.decodeWav("not audio at all, sorry".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("decodable"))
  }

}
