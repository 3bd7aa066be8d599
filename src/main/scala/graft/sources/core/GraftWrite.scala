package graft.sources.core

import java.io.{BufferedOutputStream, OutputStream}
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Per-format record rendering for writers (SURVEY.md §2.B — the
  * reference's commented-out COPY TO 'f.fasta' semantics: per-format
  * text rendering, optional gzip/zstd compression). */
trait RecordFormatter extends Serializable {
  /** Render one full-schema row, INCLUDING the record terminator. */
  def format(row: InternalRow, schema: StructType): String
  def fileExtension: String
}

/** Commit message: where the task attempt staged its bytes and where the
  * file belongs once the job commits. */
final case class GraftWriteCommit(tempPath: String, finalPath: String)
    extends WriterCommitMessage

/** DSv2 BatchWrite: one part file per task partition, optional
  * compression via the `compression` option ("gzip" | "zstd").
  * Distributed by construction — each executor streams its partition to
  * its own part file; nothing funnels through the driver.
  *
  * Task-commit protocol: writers stream to `_temporary/<uuid>` staging
  * files and only `commit(messages)` renames them into place, so a
  * failed, retried, or speculatively-executed task can never leave a
  * half-written part file that readers would mistake for data. `abort`
  * removes the staging directory wholesale. (Rename is atomic on
  * HDFS-like filesystems; on object stores it degrades to copy — the
  * same trade-off Spark's FileOutputCommitter v1 makes.)
  */
final case class GraftBatchWrite(formatter: RecordFormatter, schema: StructType,
                                 path: String, options: Map[String, String],
                                 sconf: SerializableConfiguration)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(formatter, schema, path, options, sconf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(sconf.value)
    messages.foreach {
      case GraftWriteCommit(temp, dest) =>
        val t = new Path(temp)
        val d = new Path(dest)
        if (!fs.rename(t, d))
          throw new java.io.IOException(s"commit failed renaming $temp -> $dest")
      case _ =>
    }
    val staging = new Path(path, "_temporary")
    if (fs.exists(staging)) fs.delete(staging, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(sconf.value)
    val staging = new Path(path, "_temporary")
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

final case class GraftWriterFactory(formatter: RecordFormatter, schema: StructType,
                                    path: String, options: Map[String, String],
                                    sconf: SerializableConfiguration)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val codec = options.get("compression").map(_.toLowerCase).filter(_ != "none")
    val ext = formatter.fileExtension + (codec match {
      case Some("gzip") => ".gz"
      case Some("zstd") => ".zst"
      case _            => ""
    })
    // taskId in the staging name keeps concurrent attempts of the same
    // partition (speculation, retry) from clobbering each other; only
    // the attempt whose message reaches commit() gets renamed into place
    val fileName = f"part-$partitionId%05d-${UUID.randomUUID().toString.take(8)}$ext"
    val temp = new Path(new Path(path, "_temporary"), s"$taskId-$fileName")
    val dest = new Path(path, fileName)
    val fs = temp.getFileSystem(sconf.value)
    val rawOut: OutputStream = fs.create(temp, true)
    val out: OutputStream = codec match {
      case Some("gzip") => new java.util.zip.GZIPOutputStream(rawOut, 1 << 16)
      case Some("zstd") => new com.github.luben.zstd.ZstdOutputStream(rawOut)
      case Some(other)  => throw new IllegalArgumentException(s"unknown compression '$other'")
      case None         => new BufferedOutputStream(rawOut, 1 << 16)
    }

    new DataWriter[InternalRow] {
      override def write(record: InternalRow): Unit =
        out.write(formatter.format(record, schema).getBytes("UTF-8"))
      override def commit(): WriterCommitMessage = {
        out.close()
        GraftWriteCommit(temp.toString, dest.toString)
      }
      override def abort(): Unit = {
        out.close()
        if (fs.exists(temp)) fs.delete(temp, false)
      }
      override def close(): Unit = ()
    }
  }
}
