package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Directory maintenance for format sinks: small-file compaction and
  * staging vacuum.
  *
  * The streaming sink appends one part file per (epoch, partition) —
  * correct, but a long-lived stream accretes thousands of small files,
  * and at scale file-count is what kills scan throughput (every file is
  * a listing entry, an open, and at least one input split; a 100 TB
  * directory of 4 MB epoch shards is 25M opens per scan). `compact`
  * rewrites each directory's undersized files into ~targetBytes outputs
  * using the ordinary DSv2 scan + staged-rename writer, so the rewrite
  * is distributed (executors stream records; the driver only plans and
  * renames) and the directory stays readable throughout: new files
  * appear atomically via rename BEFORE their sources are deleted, so a
  * racing reader can transiently double-count but never lose rows. Run
  * it between triggers / in a maintenance window for exact counts —
  * the same contract as Hive/Iceberg rewrite-data-files on a plain
  * directory (no metadata log to make the swap atomic).
  *
  * The reference has no analog (its COPY writer emits one file per
  * statement, exon-duckdb `test_fasta_copy.test`); this is part of the
  * operational surface a long-running ingest needs.
  */
object GraftMaintenance {

  /** What one compact() pass did: `groups` = leaf directories rewritten,
    * `filesBefore`/`filesAfter` count only the rewritten files (untouched
    * large files are excluded), `bytesRewritten` = input bytes read. */
  final case class CompactionReport(groups: Int, filesBefore: Int,
                                    filesAfter: Int, bytesRewritten: Long)

  /** Rewrite every leaf directory's files smaller than `targetBytes`
    * into ceil(totalBytes / targetBytes) outputs. Hive-partitioned
    * layouts compact within each leaf — partition values never mix.
    * Files at or above `targetBytes`, and leaves with fewer than
    * `minFiles` undersized files, are left untouched. Compacted outputs
    * are named `compact-<id>-part-NNNNN.<ext>`, disjoint from both the
    * batch writer's `part-NNNNN-<uuid>` and the streaming sink's
    * epoch-deterministic `part-<epoch>-<partition>` namespaces, so a
    * later epoch replay can never collide with a compacted file.
    *
    * `parallelism` drives that many leaf rewrites as concurrent Spark
    * jobs (each job is itself distributed; concurrency just keeps a
    * many-leaf hive layout from serializing driver-side).
    */
  def compact(spark: SparkSession, dir: String, format: String,
              targetBytes: Long = 128L << 20,
              compression: Option[String] = None,
              minFiles: Int = 2,
              parallelism: Int = 4): CompactionReport = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(minFiles >= 2, s"minFiles must be at least 2, got $minFiles")
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(hconf)
    // resolve() already hides staging (`_temporary/`, `.compact-*`) by
    // path component, so an in-flight writer's files are never inputs
    val groups = core.GraftFiles.resolve(dir, hconf)
      .groupBy(_.getPath.getParent)
      .map { case (parent, sts) =>
        parent -> sts.filter(_.getLen < targetBytes).sortBy(_.getPath.toString)
      }
      .filter(_._2.size >= minFiles)
      .toSeq

    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, groups.size max 1)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      import scala.concurrent.{Await, Future}
      val futures = groups.map { case (parent, small) =>
        Future {
          val total = small.map(_.getLen).sum
          val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
          val compactId = UUID.randomUUID().toString.take(8)
          val staging = new Path(parent, s".compact-$compactId")
          val writer = spark.read.format(format)
            .load(small.map(_.getPath.toString): _*)
            .coalesce(nOut)
            .write.format(format).mode("overwrite")
          compression.fold(writer)(c => writer.option("compression", c))
            .save(staging.toString)
          val parts = fs.listStatus(staging)
            .filter(st => st.isFile && !st.getPath.getName.startsWith(".") &&
              !st.getPath.getName.startsWith("_"))
            .sortBy(_.getPath.getName)
          val renamed = parts.zipWithIndex.map { case (st, i) =>
            val name = st.getPath.getName
            val ext = name.substring(name.indexOf('.'))
            val dest = new Path(parent, f"compact-$compactId-part-$i%05d$ext")
            if (!fs.rename(st.getPath, dest))
              throw new java.io.IOException(
                s"compaction failed renaming ${st.getPath} -> $dest")
            dest
          }
          // loss-free ordering: sources go away only after every
          // replacement is visible
          small.foreach(st => fs.delete(st.getPath, false): Unit)
          fs.delete(staging, true)
          (small.size, renamed.length, total)
        }
      }
      val done = futures.map(Await.result(_, scala.concurrent.duration.Duration.Inf))
      CompactionReport(done.size, done.map(_._1).sum, done.map(_._2).sum,
        done.map(_._3).sum)
    } finally pool.shutdown()
  }

  /** Remove leftover staging namespaces (`_temporary/<writeId>`,
    * `.compact-<id>`) whose contents are older than `olderThanMs` — the
    * debris a crashed writer or compactor leaves behind. Age-gated so a
    * LIVE writer's staging is never swept: a namespace survives if any
    * file in it (or the namespace itself) is younger than the horizon.
    * Returns the number of namespaces removed. */
  def vacuum(spark: SparkSession, dir: String,
             olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    val horizon = System.currentTimeMillis() - olderThanMs
    def newestMTime(p: Path): Long = {
      val st = fs.getFileStatus(p)
      if (!st.isDirectory) st.getModificationTime
      else (st.getModificationTime +:
        fs.listStatus(p).map(s => newestMTime(s.getPath)).toSeq).max
    }
    def namespacesUnder(d: Path): Seq[Path] = {
      val children = fs.listStatus(d).toSeq
      val tempRoots = children.filter(st => st.isDirectory &&
        st.getPath.getName == "_temporary")
        .flatMap(st => fs.listStatus(st.getPath).toSeq.map(_.getPath))
      val compactDirs = children.collect {
        case st if st.isDirectory && st.getPath.getName.startsWith(".compact-") =>
          st.getPath
      }
      // recurse into visible subdirectories (hive partition leaves)
      val nested = children.filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
        .flatMap(st => namespacesUnder(st.getPath))
      tempRoots ++ compactDirs ++ nested
    }
    val stale = namespacesUnder(root).filter(p => newestMTime(p) < horizon)
    stale.foreach(p => { fs.delete(p, true); () })
    // sweep now-empty _temporary roots so readers' listings stay clean
    def sweepEmptyTempRoots(d: Path): Unit = {
      fs.listStatus(d).foreach { st =>
        if (st.isDirectory) {
          if (st.getPath.getName == "_temporary") {
            if (fs.listStatus(st.getPath).isEmpty) fs.delete(st.getPath, false): Unit
          } else if (!st.getPath.getName.startsWith(".")) sweepEmptyTempRoots(st.getPath)
        }
      }
    }
    sweepEmptyTempRoots(root)
    stale.size
  }
}
