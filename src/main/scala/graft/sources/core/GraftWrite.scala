package graft.sources.core

import java.io.{BufferedOutputStream, OutputStream}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** Per-format record rendering for writers (SURVEY.md §2.B — the
  * reference's commented-out COPY TO 'f.fasta' semantics: per-format
  * text rendering, optional gzip/zstd compression). */
trait RecordFormatter extends Serializable {
  /** Render one full-schema row, INCLUDING the record terminator. */
  def format(row: InternalRow, schema: StructType): String
  def fileExtension: String
}

/** DSv2 BatchWrite: one part file per task partition, optional
  * compression via the `compression` option ("gzip" | "zstd").
  * Distributed by construction — each executor streams its partition to
  * its own part file; nothing funnels through the driver. */
final case class GraftBatchWrite(formatter: RecordFormatter, schema: StructType,
                                 path: String, options: Map[String, String])
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(formatter, schema, path, options)

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class GraftWriterFactory(formatter: RecordFormatter, schema: StructType,
                                    path: String, options: Map[String, String])
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val codec = options.get("compression").map(_.toLowerCase).filter(_ != "none")
    val ext = formatter.fileExtension + (codec match {
      case Some("gzip") => ".gz"
      case Some("zstd") => ".zst"
      case _            => ""
    })
    val part = new Path(path, f"part-$partitionId%05d-${UUID.randomUUID().toString.take(8)}$ext")
    val conf = new Configuration()
    val fs = part.getFileSystem(conf)
    val rawOut: OutputStream = fs.create(part, true)
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
        new WriterCommitMessage {}
      }
      override def abort(): Unit = out.close()
      override def close(): Unit = ()
    }
  }
}
