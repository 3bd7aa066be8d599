package graft.pipeline

import org.apache.spark.sql.Dataset

/** The TRUE video half of the multimodal codec seam: an ffmpeg
  * subprocess per media blob, executor-side, stdin → rawvideo-gray
  * stdout. Image (PNG/JPEG/GIF) and audio (WAV) decode are real JDK
  * codecs elsewhere in this package; H.264-class video has no JDK
  * decoder, so this is the documented ffmpeg seam made concrete —
  * config-gated exactly like the object-store support: [[resolve]]
  * finds a binary via `GRAFT_FFMPEG` or `PATH`, VideoCodecSpec cancels
  * cleanly when absent (this build sandbox has no ffmpeg; any real
  * deployment does).
  *
  * Scale shape: one short-lived subprocess per blob inside
  * `mapPartitions`, no temp files, no shared state — embarrassingly
  * parallel by row, the standard way a 100 TB video corpus is frame-
  * sampled on a cluster (the JNI alternative saves process spawns but
  * couples executor stability to libavcodec; a subprocess is the
  * safer default and the spawn cost is noise against real video
  * decode times).
  */
object FfmpegCodec {

  /** Resolve the ffmpeg binary: `GRAFT_FFMPEG` (explicit path, wins)
    * or the first executable `ffmpeg` on PATH. None = the seam stays
    * closed and callers must not be reached (spec cancels). */
  def resolve(): Option[String] =
    sys.env.get("GRAFT_FFMPEG").filter(p => new java.io.File(p).canExecute)
      .orElse(sys.env.getOrElse("PATH", "")
        .split(java.io.File.pathSeparator).iterator
        .filter(_.nonEmpty)
        .map(d => new java.io.File(d, "ffmpeg"))
        .find(_.canExecute).map(_.getPath))

  /** Decode any container ffmpeg reads (mp4/h264, webm, animated gif)
    * into fixed-size gray8 frames. The whole exchange is piped — media
    * bytes to stdin (fed from a side thread so neither pipe deadlocks),
    * concatenated `width*height`-byte frames from stdout. */
  def decodeGrayFrames(ffmpeg: String, media: Array[Byte],
                       width: Int, height: Int): Array[Array[Byte]] = {
    require(width > 0 && height > 0, s"bad frame size ${width}x$height")
    val cmd = java.util.Arrays.asList(ffmpeg, "-v", "error", "-i", "pipe:0",
      "-f", "rawvideo", "-pix_fmt", "gray", "-s", s"${width}x$height", "pipe:1")
    val proc = new ProcessBuilder(cmd).start()
    val feeder = new Thread(() =>
      try {
        proc.getOutputStream.write(media)
        proc.getOutputStream.close()
      } catch { case _: java.io.IOException => () /* decoder exited early */ })
    feeder.setDaemon(true)
    feeder.start()
    // stderr must drain CONCURRENTLY with stdout: a corrupt input makes
    // ffmpeg spew per-frame errors, and once those exceed the OS pipe
    // buffer ffmpeg blocks on stderr, stops producing stdout, and a
    // sequential readAllBytes deadlocks the task forever
    val errBuf = new java.util.concurrent.atomic.AtomicReference[Array[Byte]](Array.empty)
    val errDrain = new Thread(() =>
      try errBuf.set(proc.getErrorStream.readAllBytes())
      catch { case _: java.io.IOException => () })
    errDrain.setDaemon(true)
    errDrain.start()
    val out = proc.getInputStream.readAllBytes()
    feeder.join()
    errDrain.join()
    val err = new String(errBuf.get(), "UTF-8")
    val code = proc.waitFor()
    require(code == 0, s"ffmpeg exited $code: ${err.take(500)}")
    val fsize = width * height
    require(out.length % fsize == 0,
      s"ffmpeg emitted ${out.length} bytes, not a multiple of frame size $fsize")
    Array.tabulate(out.length / fsize)(i =>
      java.util.Arrays.copyOfRange(out, i * fsize, (i + 1) * fsize))
  }

  /** Frame sampling through the ffmpeg seam — the same output shape as
    * [[Multimodal.sampleRealFrames]] (the JDK-GIF path), so the two
    * decoders are interchangeable behind one pipeline surface and the
    * spec can cross-check them on the same fixture. */
  def sampleFrames(videos: Dataset[Multimodal.RealVideoRow], every: Int,
                   width: Int, height: Int,
                   ffmpeg: String): Dataset[Multimodal.RealSampledRow] = {
    import videos.sparkSession.implicits._
    require(every >= 1, s"every ($every) must be >= 1")
    videos.mapPartitions { batch =>
      batch.map { v =>
        val frames = decodeGrayFrames(ffmpeg, v.media, width, height)
        val sampled = frames.zipWithIndex.collect { case (f, i) if i % every == 0 => f }
        var firstSum = 0L
        var pixSum = 0L
        sampled.foreach { f =>
          firstSum += f(0) & 0xffL
          var i = 0
          while (i < f.length) { pixSum += f(i) & 0xffL; i += 1 }
        }
        Multimodal.RealSampledRow(v.doc_id, frames.length, sampled.length,
          firstSum, pixSum)
      }
    }
  }
}
