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
