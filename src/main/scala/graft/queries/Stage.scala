package graft.queries

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame

/** Harness-side file staging shared by the streaming entries and the
  * writer round-trip: scratch directories are tracked and removed on JVM
  * exit (repeated bench/gate runs in one driver must not grow /tmp by a
  * dataset copy per invocation), and directory listings go through
  * File.listFiles (Files.list leaks the directory fd unless closed).
  */
object Stage {

  private val dirs = scala.collection.mutable.ArrayBuffer.empty[Path]
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.synchronized(dirs.toList).foreach(deleteRecursively)))
  }

  def tempDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    dirs.synchronized { dirs += d }
    d
  }

  private val stagedDirs = new java.util.concurrent.ConcurrentHashMap[String, Path]()
  /** Driver-lifetime nanos spent inside staged() builders — surfaced
    * separately by Bench so stream_* timings measure micro-batch
    * execution, not harness file staging. LongAdder: concurrent
    * builders (computeIfAbsent on distinct keys) must not lose updates
    * the way a volatile read-modify-write would. */
  private val stagingNanos = new java.util.concurrent.atomic.LongAdder
  def stagingSeconds: Double = stagingNanos.sum / 1e9

  /** Staged input directory memoized per key: the builder (file copies,
    * sentinel writes, midpoint scans) runs ONCE per driver; bench
    * warm-up and the measured pass reuse the same directory. Keys must
    * include the source dir so different scale factors stage apart. */
  def staged(key: String)(build: Path => Unit): Path =
    stagedDirs.computeIfAbsent(key, _ => {
      val t0 = System.nanoTime()
      val d = tempDir(key.replaceAll("[^A-Za-z0-9_-]", "_"))
      build(d)
      stagingNanos.add(System.nanoTime() - t0)
      d
    })

  /** Memoized fixture directory for READER entries: `build` writes the
    * (deterministic, sf-independent) fixture once per driver and every
    * later invocation reuses the same directory — the same untimed-
    * staging convention the streaming entries and Stage.staged users
    * follow, applied to the FormatScans reader fixtures that used to
    * re-stage through Stage.tempDir on every bench pass (r13). Writer-
    * roundtrip entries must NOT use this: there the write is the
    * measured operator. */
  def stagedDir(key: String)(build: String => Unit): String =
    staged(key)(d => build(d.toString)).toString

  private def deleteRecursively(p: Path): Unit =
    try {
      val f = p.toFile
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
        .foreach(c => deleteRecursively(c.toPath))
      f.delete(): Unit
    } catch { case _: Exception => }

  /** Write `df` as ONE parquet file at `destDir/name`, with an mtime
    * `order` steps in the future so a maxFilesPerTrigger=1 file stream
    * schedules the staged files as separate, ordered micro-batches. */
  def parquetFile(df: DataFrame, scratch: Path, destDir: Path,
                  name: String, order: Int): Unit = {
    val one = scratch.resolve(s"w_$name")
    df.coalesce(1).write.mode("overwrite").parquet(one.toString)
    val part = Option(one.toFile.listFiles()).getOrElse(Array.empty)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file under $one"))
    val dest = destDir.resolve(name)
    Files.copy(part.toPath, dest)
    Files.setLastModifiedTime(dest,
      FileTime.fromMillis(System.currentTimeMillis() + order * 10000L)): Unit
  }
}
