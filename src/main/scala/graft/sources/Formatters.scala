package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

import graft.sources.core.RecordFormatter

/** Writers' record renderers (reference §2.B: the commented COPY tests
  * document FASTA/FASTQ/GFF writing; recreated here for round-trips). */

object FastaFormatter extends RecordFormatter {
  override def fileExtension = ".fasta"
  override def format(row: InternalRow, schema: StructType): String = {
    val id = row.getUTF8String(0)
    val desc = if (row.isNullAt(1)) null else row.getUTF8String(1)
    val seq = row.getUTF8String(2)
    val sb = new java.lang.StringBuilder(">").append(id)
    if (desc != null) sb.append(' ').append(desc)
    sb.append('\n').append(seq).append('\n').toString
  }
}

object FastqFormatter extends RecordFormatter {
  override def fileExtension = ".fastq"
  override def format(row: InternalRow, schema: StructType): String = {
    val sb = new java.lang.StringBuilder("@").append(row.getUTF8String(0))
    if (!row.isNullAt(1)) sb.append(' ').append(row.getUTF8String(1))
    sb.append('\n').append(row.getUTF8String(2)).append("\n+\n")
      .append(row.getUTF8String(3)).append('\n')
    sb.toString
  }
}

object GffFormatter extends graft.sources.core.GenomicRecordFormatter {
  override def fileExtension = ".gff"

  /** GFF text is 1-based inclusive; tabix wants 0-based half-open. */
  override def coordsOf(row: InternalRow, schema: StructType): (String, Long, Long) =
    (row.getUTF8String(0).toString, row.getLong(3) - 1, row.getLong(4))

  /** Generic preset over (seqname, start, end) = columns (1, 4, 5),
    * '#' comment lines — the stock `tabix -p gff` configuration. */
  override def tabixConfig: (Int, Int, Int, Int, Char) = (0, 1, 4, 5, '#')

  /** GFF3 reserved characters must be percent-encoded in attribute keys
    * and values, or a value containing ';' / '=' / ',' / tab re-parses as
    * extra separators; the reader percent-decodes, so enc∘dec = id. */
  private def enc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '%'  => sb.append("%25")
      case ';'  => sb.append("%3B")
      case '='  => sb.append("%3D")
      case ','  => sb.append("%2C")
      case '&'  => sb.append("%26")
      case '\t' => sb.append("%09")
      case '\n' => sb.append("%0A")
      case '\r' => sb.append("%0D")
      case c    => sb.append(c)
    }
    sb.toString
  }

  override def format(row: InternalRow, schema: StructType): String = {
    def s(i: Int): String = if (row.isNullAt(i)) "." else row.getUTF8String(i).toString
    val start = row.getLong(3)
    val end = row.getLong(4)
    val score = if (row.isNullAt(5)) "." else row.getFloat(5).toString
    val attrs =
      if (row.isNullAt(8)) "."
      else {
        val m = row.getMap(8)
        val keys = m.keyArray()
        val vals = m.valueArray()
        (0 until m.numElements()).map { i =>
          val vs = vals.getArray(i)
          val joined = (0 until vs.numElements())
            .map(j => enc(vs.getUTF8String(j).toString)).mkString(",")
          s"${enc(keys.getUTF8String(i).toString)}=$joined"
        }.mkString(";")
      }
    s"${s(0)}\t${s(1)}\t${s(2)}\t$start\t$end\t$score\t${s(6)}\t${s(7)}\t$attrs\n"
  }
}
