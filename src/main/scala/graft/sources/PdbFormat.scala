package graft.sources

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.sources.core.{GraftFormat, GraftSplit}

/** wwPDB structure files (PDB format v3.3, the fixed-column layout every
  * structural-biology tool reads): one row per ATOM/HETATM record with
  * the spec's column windows — serial 7-11, atom name 13-16, altLoc 17,
  * resName 18-20, chain 22, resSeq 23-26, iCode 27, x/y/z 31-54 (8.3
  * fixed), occupancy 55-60, B-factor 61-66, element 77-78 — plus the
  * enclosing MODEL number (NMR multi-model files; 1 when absent).
  *
  * MODEL is whole-file state, so the format is NOT byte-splittable;
  * parallelism is the per-FILE partition grain — the right unit for
  * structure archives, which are millions of small files rather than
  * one large one. Malformed fixed columns fail loudly with the line. */
object PdbFormat extends GraftFormat {
  override def name = "pdb"
  override def extensions = Seq("pdb", "ent")

  override def schema(paths: Seq[Path], conf: Configuration,
                      options: Map[String, String]): StructType =
    StructType(Seq(
      StructField("model", IntegerType),
      StructField("record", StringType),
      StructField("serial", LongType),
      StructField("atom_name", StringType),
      StructField("alt_loc", StringType),
      StructField("res_name", StringType),
      StructField("chain", StringType),
      StructField("res_seq", LongType),
      StructField("i_code", StringType),
      StructField("x", DoubleType),
      StructField("y", DoubleType),
      StructField("z", DoubleType),
      StructField("occupancy", DoubleType),
      StructField("b_factor", DoubleType),
      StructField("element", StringType)))

  override def read(split: GraftSplit, schema: StructType, in: InputStream,
                    options: Map[String, String]): Iterator[Array[Any]] = {
    // 1-based inclusive spec columns -> trimmed slice; short lines pad
    def slice(l: String, from: Int, to: Int): String = {
      val s = math.min(from - 1, l.length)
      val e = math.min(to, l.length)
      if (s >= e) "" else l.substring(s, e).trim
    }
    def opt(v: String): Any = if (v.isEmpty) null else P.s(v)
    def dbl(l: String, from: Int, to: Int, what: String): Any = {
      val v = slice(l, from, to)
      if (v.isEmpty) null
      else try java.lang.Double.parseDouble(v)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"pdb: bad $what '$v' (cols $from-$to) in line '$l' of ${split.path}")
      }
    }
    var model = 1
    P.linesUnbounded(split, in).map(_._2).flatMap { line =>
      if (line.startsWith("MODEL")) {
        val m = slice(line, 7, 80)
        require(m.nonEmpty && m.forall(_.isDigit),
          s"pdb: bad MODEL serial '$m' in ${split.path}")
        model = m.toInt
        None
      } else if (line.startsWith("ATOM") || line.startsWith("HETATM")) {
        val serial = slice(line, 7, 11)
        val resSeq = slice(line, 23, 26)
        require(serial.nonEmpty && serial.forall(_.isDigit),
          s"pdb: bad atom serial '$serial' in line '$line' of ${split.path}")
        require(resSeq.nonEmpty && resSeq.forall(c => c.isDigit || c == '-'),
          s"pdb: bad resSeq '$resSeq' in line '$line' of ${split.path}")
        Some(Array[Any](
          model,
          P.s(if (line.startsWith("ATOM")) "ATOM" else "HETATM"),
          serial.toLong,
          P.s(slice(line, 13, 16)),
          opt(slice(line, 17, 17)),
          P.s(slice(line, 18, 20)),
          P.s(slice(line, 22, 22)),
          resSeq.toLong,
          opt(slice(line, 27, 27)),
          dbl(line, 31, 38, "x"), dbl(line, 39, 46, "y"), dbl(line, 47, 54, "z"),
          dbl(line, 55, 60, "occupancy"), dbl(line, 61, 66, "B-factor"),
          opt(slice(line, 77, 78))))
      } else None // TER/END/HEADER/REMARK and friends carry no atoms
    }
  }
}
