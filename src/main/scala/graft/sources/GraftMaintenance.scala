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
  * directory (no metadata log to make the swap atomic). Run ONE
  * compactor per directory at a time: two concurrent compact() calls
  * would each rewrite the same source files and both survive the
  * rename, duplicating rows (a metadata-log table format is the
  * general fix; a singleton maintenance job is the operational one).
  *
  * Crash recovery: each leaf swap is journaled in a `.compact-<id>.plan`
  * marker (written atomically via temp+rename BEFORE the first
  * destination rename) recording the staged->destination mapping and
  * the source list. A compactor that dies mid-swap is repaired by the
  * next compact() on the same directory: renames still pending are
  * completed from staging, sources are then deleted, and the marker is
  * dropped — duplicates exist only between the crash and the next run,
  * and rows are never lost. A crash BEFORE the marker lands costs only
  * orphaned staging (vacuum's job); sources are untouched.
  *
  * The reference has no analog (its COPY writer emits one file per
  * statement, exon-duckdb `test_fasta_copy.test`); this is part of the
  * operational surface a long-running ingest needs.
  */
object GraftMaintenance {

  /** What one compact() pass did: `groups` = leaf directories rewritten,
    * `filesBefore`/`filesAfter` count only the rewritten files (untouched
    * large files are excluded), `bytesRewritten` = input bytes read,
    * `recoveredSwaps` = interrupted swaps from a previous crashed
    * compactor that this run completed before doing its own work. */
  final case class CompactionReport(groups: Int, filesBefore: Int,
                                    filesAfter: Int, bytesRewritten: Long,
                                    recoveredSwaps: Int = 0)

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

    // repair interrupted swaps FIRST, so this run's candidate listing
    // sees each leaf in a consistent state (completed swap = sources
    // gone, outputs present)
    val recovered = recoverInterruptedSwaps(fs, new Path(dir))

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
          val moves = parts.zipWithIndex.map { case (st, i) =>
            val name = st.getPath.getName
            val ext = name.substring(name.indexOf('.'))
            name -> f"compact-$compactId-part-$i%05d$ext"
          }.toSeq
          // journal the swap before touching the destination directory:
          // after this point a crash is repairable from the marker alone
          writeMarker(fs, parent, compactId, moves, small.map(_.getPath.getName))
          moves.foreach { case (stagedName, destName) =>
            val dest = new Path(parent, destName)
            if (!fs.rename(new Path(staging, stagedName), dest))
              throw new java.io.IOException(
                s"compaction failed renaming $staging/$stagedName -> $dest")
          }
          // loss-free ordering: sources go away only after every
          // replacement is visible
          small.foreach(st => fs.delete(st.getPath, false): Unit)
          fs.delete(staging, true)
          fs.delete(markerPath(parent, compactId), false)
          (small.size, moves.size, total)
        }
      }
      val done = futures.map(Await.result(_, scala.concurrent.duration.Duration.Inf))
      CompactionReport(done.size, done.map(_._1).sum, done.map(_._2).sum,
        done.map(_._3).sum, recovered)
    } finally pool.shutdown()
  }

  private def markerPath(parent: Path, compactId: String): Path =
    new Path(parent, s".compact-$compactId.plan")

  /** Marker format, one entry per line: `out<TAB>stagedName<TAB>destName`
    * then `src<TAB>sourceFileName`. Written to a temp name and renamed,
    * so a marker either exists complete or not at all. */
  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, parent: Path,
                          compactId: String, moves: Seq[(String, String)],
                          sources: Seq[String]): Unit = {
    val tmp = new Path(parent, s".compact-$compactId.plan.tmp")
    val out = fs.create(tmp, true)
    try {
      val text = (moves.map { case (s, d) => s"out\t$s\t$d" } ++
        sources.map(s => s"src\t$s")).mkString("", "\n", "\n")
      out.write(text.getBytes("UTF-8"))
    } finally out.close()
    if (!fs.rename(tmp, markerPath(parent, compactId)))
      throw new java.io.IOException(s"failed to publish compaction marker for $compactId")
  }

  /** Complete every journaled swap found under `root`: finish pending
    * renames from staging, delete the swap's sources, drop marker and
    * staging. Loss-safe by construction — a destination is only ever
    * created from its staged file, and sources are deleted only once
    * every destination exists. Fails loudly if neither the destination
    * nor the staged file of some output survives (somebody swept live
    * staging — rows would otherwise silently vanish). */
  private def recoverInterruptedSwaps(fs: org.apache.hadoop.fs.FileSystem,
                                      root: Path): Int = {
    def markersUnder(d: Path): Seq[Path] = {
      val children = fs.listStatus(d).toSeq
      val here = children.collect {
        case st if !st.isDirectory && st.getPath.getName.startsWith(".compact-") &&
          st.getPath.getName.endsWith(".plan") => st.getPath
      }
      val nested = children.filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
        .flatMap(st => markersUnder(st.getPath))
      here ++ nested
    }
    val markers = markersUnder(root)
    markers.foreach { marker =>
      val parent = marker.getParent
      val compactId = marker.getName.stripPrefix(".compact-").stripSuffix(".plan")
      val staging = new Path(parent, s".compact-$compactId")
      val lines = {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      val moves = lines.collect { case l if l.startsWith("out\t") =>
        val Array(_, s, d) = l.split('\t'); (s, d) }
      val sources = lines.collect { case l if l.startsWith("src\t") =>
        l.split('\t')(1) }
      moves.foreach { case (stagedName, destName) =>
        val dest = new Path(parent, destName)
        if (!fs.exists(dest)) {
          val staged = new Path(staging, stagedName)
          if (!fs.exists(staged))
            throw new java.io.IOException(
              s"unrecoverable compaction swap $compactId in $parent: neither " +
                s"$destName nor its staged file exists (was staging vacuumed " +
                "mid-swap?); sources are preserved")
          if (!fs.rename(staged, dest))
            throw new java.io.IOException(s"recovery failed renaming $staged -> $dest")
        }
      }
      sources.foreach { name =>
        val src = new Path(parent, name)
        if (fs.exists(src)) fs.delete(src, false): Unit
      }
      if (fs.exists(staging)) fs.delete(staging, true): Unit
      fs.delete(marker, false): Unit
    }
    markers.size
  }

  /** Remove leftover staging namespaces (`_temporary/<writeId>`,
    * `.compact-<id>`) whose contents are older than `olderThanMs` — the
    * debris a crashed writer or compactor leaves behind. Age-gated so a
    * LIVE writer's staging is never swept: a namespace survives if any
    * file in it (or the namespace itself) is younger than the horizon.
    * A `.compact-<id>` staging protected by a swap marker is NEVER
    * swept regardless of age — the marker means a crashed swap still
    * needs those files; run compact() to repair it instead. Returns the
    * number of namespaces removed. */
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
        case st if st.isDirectory && st.getPath.getName.startsWith(".compact-") &&
          // marker present = crashed mid-swap; recovery owns these files
          !fs.exists(new Path(d, st.getPath.getName + ".plan")) =>
          st.getPath
      }
      // a marker write that crashed before its publishing rename leaves
      // a .plan.tmp no recovery path reads — plain debris, sweepable
      val tmpMarkers = children.collect {
        case st if !st.isDirectory && st.getPath.getName.startsWith(".compact-") &&
          st.getPath.getName.endsWith(".plan.tmp") => st.getPath
      }
      // recurse into visible subdirectories (hive partition leaves)
      val nested = children.filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
        .flatMap(st => namespacesUnder(st.getPath))
      tempRoots ++ compactDirs ++ tmpMarkers ++ nested
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
