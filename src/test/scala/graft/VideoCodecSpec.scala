package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{FfmpegCodec, Multimodal}

/** The ffmpeg video seam, config-gated like ObjectStoreSpec: this
  * sandbox ships no ffmpeg, so the cases CANCEL (not fail) unless a
  * binary resolves via GRAFT_FFMPEG or PATH. On a machine with ffmpeg
  * they close the loop the JDK cannot: the same animated-GIF fixture
  * decoded by BOTH our ImageCodec and ffmpeg must agree on frame
  * geometry and (within luma-rounding tolerance) pixel content —
  * proving the seam's subprocess plumbing, not just its signature.
  */
class VideoCodecSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def ffmpegOrCancel(): String = {
    val bin = FfmpegCodec.resolve()
    assume(bin.isDefined,
      "no ffmpeg binary found — set GRAFT_FFMPEG or add ffmpeg to PATH to " +
        "exercise the video codec seam (expected-absent in the build sandbox)")
    bin.get
  }

  test("ffmpeg decodes our animated-GIF fixture to the same frames as the JDK path") {
    val ffmpeg = ffmpegOrCancel()
    val (w, h, nf) = (8, 6, 7)
    val gif = Multimodal.ImageCodec.encodeGifFrames(w, h, nf,
      (f, x, y) => (x + 2 * y + 3 * f) % 256)
    val ours = Multimodal.ImageCodec.decodeGifFrames(gif)
    val theirs = FfmpegCodec.decodeGrayFrames(ffmpeg, gif, w, h)
    assert(theirs.length == ours.length, "frame count")
    assert(theirs.forall(_.length == w * h))
    // our frames are gray triples (r=g=b=v); ffmpeg's gray conversion
    // of an equal-channel pixel is v up to ±1 luma rounding
    ours.zip(theirs).zipWithIndex.foreach { case ((o, t), fi) =>
      (0 until w * h).foreach { p =>
        val ov = o.pixels(p * 3) & 0xff
        val tv = t(p) & 0xff
        assert(math.abs(ov - tv) <= 1, s"frame $fi pixel $p: jdk=$ov ffmpeg=$tv")
      }
    }
  }

  test("distributed frame sampling through the ffmpeg seam matches the JDK-GIF path") {
    val ffmpeg = ffmpegOrCancel()
    val videos = Multimodal.realVideoTable(spark, "/root/testdata/sf0.001")
    val jdk = Multimodal.sampleRealFrames(videos, every = 3)
      .collect().map(r => r.doc_id -> r).toMap
    val ff = FfmpegCodec.sampleFrames(videos, every = 3, width = 8, height = 6, ffmpeg)
      .collect().map(r => r.doc_id -> r).toMap
    assert(ff.keySet == jdk.keySet)
    ff.foreach { case (id, f) =>
      val j = jdk(id)
      assert(f.n_frames == j.n_frames && f.n_sampled == j.n_sampled, s"doc $id geometry")
      // pixel sums agree within 1 luma-rounding unit per sampled pixel
      assert(math.abs(f.pix_sum - j.pix_sum) <= f.n_sampled.toLong * 8 * 6,
        s"doc $id pix_sum ${f.pix_sum} vs ${j.pix_sum}")
    }
  }
}
