package graft.sources.core

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo, SupportsTruncate, Write, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 TableProvider for one GraftFormat. Mirrors the reference's
  * generic table function (bind = inferSchema, init = planInputPartitions,
  * scan = PartitionReader) with Catalyst handling projection pushdown.
  */
abstract class GraftDataSource(format: GraftFormat)
    extends TableProvider with DataSourceRegister {

  override def shortName(): String = format.name
  override def supportsExternalMetadata(): Boolean = true

  private def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val all = GraftFiles.pathSpecs(options.asCaseSensitiveMap().asScala.toMap)
    require(all.nonEmpty, s"format '${format.name}' requires a path")
    all
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val files = pathsOf(options).flatMap(GraftFiles.resolve(_, conf)).map(_.getPath)
    format.schema(files, conf, options.asCaseSensitiveMap().asScala.toMap)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    GraftTable(format, schema, properties.asScala.toMap)
}

final case class GraftTable(format: GraftFormat, tableSchema: StructType,
                            options: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"${format.name}(${options.getOrElse("path", options.getOrElse("paths", "?"))})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    if (format.formatter.isDefined)
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
        TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
    else util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    GraftScanBuilder(format, tableSchema, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val fmt = format.formatter.getOrElse(
      throw new UnsupportedOperationException(s"format '${format.name}' is read-only"))
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("write requires a path"))
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          val hconf = SparkSession.active.sessionState.newHadoopConf()
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(hconf)
          if (doTruncate) {
            if (fs.exists(p)) fs.delete(p, true)
          } else if (fs.exists(p) && fs.listStatus(p).exists(st =>
              !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))) {
            // the reference's COPY semantics: refuse to add to an existing
            // non-empty target unless FORCE is given (test_fasta_copy.test)
            require(options.get("force").exists(_.equalsIgnoreCase("true")),
              s"target '$path' already contains data; pass option force=true " +
                "to append, or use mode(\"overwrite\") to replace (COPY ... FORCE semantics)")
          }
          val writeOpts = Seq("compression", "partitionby", "index")
            .flatMap(k => Option(info.options().get(k)).map(k -> _))
          GraftBatchWrite(fmt, info.schema(), path, options ++ writeOpts,
            new org.apache.spark.util.SerializableConfiguration(hconf))
        }

        /** writeStream into a format directory: per-epoch appends with
          * deterministic (epoch, partition) file names — see
          * [[GraftStreamingWrite]]. No COPY-force gate here: a streaming
          * sink's target accretes across epochs and restarts by design. */
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          // complete/update modes arrive as truncate-per-epoch, which a
          // format directory cannot express — append only
          require(!doTruncate,
            "streaming writes into format directories support append output mode only")
          val hconf = SparkSession.active.sessionState.newHadoopConf()
          val writeOpts = Seq("compression", "partitionby", "index")
            .flatMap(k => Option(info.options().get(k)).map(k -> _))
          GraftStreamingWrite(fmt, info.schema(), path, options ++ writeOpts,
            new org.apache.spark.util.SerializableConfiguration(hconf))
        }
      }
    }
  }
}

final case class GraftScanBuilder(format: GraftFormat, full: StructType,
                                  options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  /** Prune at the TOP level only: Catalyst may hand us a nested-pruned
    * schema (e.g. info struct narrowed to one field), but the parsers
    * emit full nested values — honoring a narrowed struct would shift
    * ordinals and silently misread sibling fields. Declaring the full
    * nested field in readSchema() makes Spark project the narrow view
    * above the scan instead. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(requiredSchema.fields.map(f => full(full.fieldIndex(f.name))))

  /** Accept simple filters for reader-side evaluation but report them all
    * back so Spark re-applies them — the reader-side pass is purely an
    * early-skip optimization (same division of labor as the reference,
    * where DataFusion re-evaluates pushed predicates; correctness never
    * depends on the source's filter implementation). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FilterEval.supported)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = GraftScan(format, full, required, pushed, options)
}

final case class GraftScan(format: GraftFormat, full: StructType, required: StructType,
                           filters: Array[Filter], options: Map[String, String])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Size + sampled-cardinality estimates (the analog of the
    * reference's ArrowScanCardinality hint) so Catalyst can pick
    * broadcast sides and join orders when a genomic table joins a
    * small one. numRows comes from [[RowStats]] (parse ~1000 records,
    * extrapolate by bytes, session-cached); disable with option
    * stats.sample=false when even the bounded driver read is unwanted
    * (e.g. high-latency object stores). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val (bytes: Long, rows: java.util.OptionalLong) =
      try {
        val session = SparkSession.active
        val conf = session.sessionState.newHadoopConf()
        val files = GraftFiles.pathSpecs(options).flatMap(GraftFiles.resolve(_, conf))
        val raw = files.map(_.getLen).sum
        // compressed files underreport their in-memory row size; scale
        // by Spark's own fileCompressionFactor knob so a ~30 MB-of-rows
        // bgzf file is not mistaken for a 9 MB broadcast candidate
        val codec = format.forcedCodec.getOrElse(
          Compression.of(GraftFiles.pathSpecs(options).headOption.getOrElse(""), options)._1)
        val factor =
          if (codec == "none") 1.0
          else math.max(1.0, session.sessionState.conf.fileCompressionFactor)
        val sample = !options.exists { case (k, v) =>
          k.equalsIgnoreCase("stats.sample") && v.equalsIgnoreCase("false") }
        val est =
          if (sample) RowStats.estimateRows(format, files, conf, options, full)
          else java.util.OptionalLong.empty()
        (math.min(Long.MaxValue / 2, (raw * factor).toLong), est)
      } catch { case _: Exception => (Long.MaxValue, java.util.OptionalLong.empty()) }
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = rows
  }
  override def description(): String =
    s"GraftScan(${format.name}, cols=[${required.fieldNames.mkString(",")}], " +
      s"filters=[${filters.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val files = GraftFiles.pathSpecs(options).flatMap(GraftFiles.resolve(_, conf))
    files.flatMap(st =>
      GraftPlanning.partitionsFor(format, st, GraftPlanning.maxSplitOf(options),
        options, conf, filters.toSeq)).toArray
  }

  /** Micro-batch streaming over an arriving-files directory: the same
    * formats, split planning, projection/filter plumbing, and reader as
    * the batch path, driven by a file-set offset (see
    * [[GraftMicroBatchStream]]). */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    GraftMicroBatchStream(format, full, required, filters, options,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(format, full, required, filters, options,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
}

/** Input-partition planning shared by the batch scan and the
  * micro-batch stream: one partition per file, per ~maxSplit byte range
  * (splittable formats), per BGZF block range, or per index-pruned
  * chunk. */
private[core] object GraftPlanning {

  /** Per-read override of the split size: a read option travels WITH
    * the relation (the session conf is read at plan time of every
    * downstream action, so a set-then-restore around a returned
    * DataFrame silently re-plans under the restored value). */
  def maxSplitOf(options: Map[String, String]): Long = {
    val maxSplit = options.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxsplitbytes") => v.toLong
    }.getOrElse(SparkSession.active.sessionState.conf.filesMaxPartitionBytes)
    require(maxSplit > 0, s"maxSplitBytes must be positive, got $maxSplit")
    maxSplit
  }

  def partitionsFor(format: GraftFormat, st: org.apache.hadoop.fs.FileStatus,
                    maxSplit: Long, options: Map[String, String],
                    conf: Configuration,
                    filters: Seq[Filter] = Nil): Seq[GraftInputPartition] = {
    val path = st.getPath.toString
    val len = st.getLen
    val codec = format.forcedCodec.getOrElse(Compression.of(path, options)._1)
    indexedChunks(format, path, options, conf, filters) match {
      case Some(chunks) =>
        // index-driven pruning: one partition per merged BGZF chunk;
        // executors read only the blocks the index says can match
        chunks.map(c => GraftInputPartition(path, c._1, c._2, len, bgzfChunk = true))
      case None =>
        if (format.splittable && codec == "none" && len > maxSplit) {
          // One partition per ~maxSplit bytes; parser syncs to record start.
          val n = splitCount(path, len, maxSplit)
          (0 until n).map { i =>
            val s = i.toLong * maxSplit
            GraftInputPartition(path, s, math.min(s + maxSplit, len), len)
          }
        } else if (format.bgzfSplittable && (codec == "gzip" || codec == "bgzf") &&
            len > maxSplit && Bgzf.isBgzf(path, len, st.getModificationTime, conf)) {
          // BGZF is block-addressable: one partition per ~maxSplit
          // COMPRESSED bytes; executors sync to the next block header
          // and apply the anchor-voff ownership protocol. This is what
          // keeps a single 100 GB .bam/.vcf.gz from serializing a
          // cluster into one task.
          val n = splitCount(path, len, maxSplit)
          (0 until n).map { i =>
            val s = i.toLong * maxSplit
            GraftInputPartition(path, s, math.min(s + maxSplit, len), len,
              bgzfSplit = true)
          }
        } else {
          Seq(GraftInputPartition(path, 0, Long.MaxValue, len))
        }
    }
  }

  /** A tiny maxSplitBytes against a huge file must reject the
    * configuration, not saturate `.toInt` at Int.MaxValue and try to
    * materialize ~2^31 partition objects on the driver. 4M partitions
    * per file is already far beyond any sane plan. */
  private def splitCount(path: String, len: Long, maxSplit: Long): Int = {
    val n = (len + maxSplit - 1) / maxSplit
    require(n <= (1L << 22),
      s"maxSplitBytes=$maxSplit yields $n partitions for $path " +
        s"($len bytes); raise maxSplitBytes")
    n.toInt
  }

  /** Index fast path, delegated to the format (tabix for VCF, BAI for
    * BAM, CSI for BCF — the reference's noodles-backed indexed queries,
    * SURVEY.md §3.3). Handles both the single `region` option and the
    * batched `regions` list ([[Regions]]): the format loads its index
    * once and returns one merged chunk set for the whole batch.
    * Phase-1 scan+filter remains the fallback and the correctness
    * baseline. */
  private def indexedChunks(format: GraftFormat, path: String,
      options: Map[String, String], conf: Configuration,
      filters: Seq[Filter]): Option[Seq[(Long, Long)]] = {
    val explicit = Regions.fromOptions(options)
    // no explicit region? infer one from the pushed filters — a
    // declarative `WHERE chrom = '1' AND pos BETWEEN a AND b` prunes
    // through the index exactly like the region option (soundness
    // argument at [[GraftFormat.regionColumns]]; Spark re-applies the
    // filters above the scan either way)
    val inferred: Option[Seq[String]] =
      if (explicit.nonEmpty) Some(explicit)
      else format.regionColumns
        .flatMap { case (cc, pc) => Regions.fromFilters(filters, cc, pc) }
    inferred match {
      case None => None
      // contradictory conjunction: zero partitions, PROVABLE from the
      // filters alone — no index required
      case Some(Nil) => Some(Seq.empty)
      case Some(rs) => format.regionChunks(path, rs, conf)
    }
  }
}

final case class GraftInputPartition(path: String, start: Long, end: Long,
                                     fileLen: Long, bgzfChunk: Boolean = false,
                                     bgzfSplit: Boolean = false)
    extends InputPartition

final case class GraftReaderFactory(format: GraftFormat, full: StructType,
                                    required: StructType, filters: Array[Filter],
                                    options: Map[String, String],
                                    sconf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  /** The shared open path: (filtered full-schema value iterator, close).
    * Both the row and the columnar reader are thin shapes over this. */
  private def openIterator(p: GraftInputPartition): (Iterator[Array[Any]], () => Unit) = {
    // session Hadoop conf shipped from the driver: spark.hadoop.* (s3a
    // credentials, endpoints, ...) must reach executor-side FS access
    val conf = sconf.value
    // projection + pushed-filter references: parsers may skip the work
    // of materializing any other top-level column
    val needed = Some(required.fieldNames.toSet ++ filters.flatMap(_.references))
    val raw = GraftFiles.open(p.path, conf)
    val codec = format.forcedCodec.getOrElse(Compression.of(p.path, options)._1)
    val ranged = !p.bgzfChunk && !p.bgzfSplit && (p.start != 0 || p.end != Long.MaxValue)
    if (ranged) {
      require(codec == "none", "ranged split over compressed input")
      raw.seek(p.start) // LineReader expects the stream positioned at split start
    }
    val pred = FilterEval.build(filters, full)
    if (p.bgzfSplit) {
      // executor-side sync + open in one read: first BGZF block header
      // in [start, end); a range interior to one block owns nothing
      // (the block belongs to the split containing its start)
      Bgzf.openSynced(raw, p.start, p.end, p.fileLen) match {
        case None =>
          raw.in.close()
          return (Iterator.empty, () => ())
        case Some(stream) =>
          // split bounds in voff coordinates: [S<<16, (E<<16)-1] — an
          // anchor voff is <= (E<<16)-1 iff its block starts before E
          val split = GraftSplit(p.path,
            if (p.start == 0) 0L else p.start << 16, (p.end << 16) - 1,
            p.fileLen, bgzfSplit = true, conf = conf, neededCols = needed)
          return (format.read(split, full, stream, options).filter(pred),
            () => stream.close())
      }
    }
    val stream =
      if (p.bgzfChunk) new BgzfRangeStream(raw, p.start, p.end) // index chunk, pre-decompressed
      else if (ranged) raw.stream
      else Compression.wrap(raw.stream, codec)
    val split = GraftSplit(p.path, if (ranged) p.start else 0,
      if (ranged) p.end else Long.MaxValue, p.fileLen, bgzfChunk = p.bgzfChunk,
      conf = conf, neededCols = needed)
    (format.read(split, full, stream, options).filter(pred), () => stream.close())
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (fullIter, closeFn) = openIterator(partition.asInstanceOf[GraftInputPartition])
    val fieldIdx = required.fieldNames.map(full.fieldIndex)
    val it = fullIter.map { vals =>
      val out = new Array[Any](fieldIdx.length)
      var i = 0
      while (i < fieldIdx.length) { out(i) = vals(fieldIdx(i)); i += 1 }
      new GenericInternalRow(out): InternalRow
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
      override def get(): InternalRow = current
      override def close(): Unit = closeFn()
    }
  }

  /** Columnar batch reads (option columnar=true): the same parser fills
    * OnHeapColumnVectors 4096 rows at a time instead of allocating one
    * GenericInternalRow per record, and Spark's codegen'd
    * ColumnarToRow (or a fully columnar consumer) takes over above —
    * the Arrow-native shape of the reference's scan
    * (arrow_reader.rs:153), opt-in while the measured win is profiled
    * per format. Offered for flat atomic projections AND one level of
    * nesting — array-of-atomic and struct-of-(atomic | array-of-atomic)
    * — which covers the VCF record shape end-to-end (alt/genotypes
    * arrays, the header-typed `info` struct); deeper nesting (maps,
    * array-of-struct) falls back to the row path per partition. */
  private def columnarEnabled: Boolean = options.exists { case (k, v) =>
    k.equalsIgnoreCase("columnar") && v.equalsIgnoreCase("true") }

  private def atomic(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.BooleanType => true
    case _ => false
  }

  private def columnarSupported(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    dt match {
      case t if atomic(t) => true
      case ArrayType(et, _) => atomic(et)
      case st: StructType => st.fields.forall(f => f.dataType match {
        case t if atomic(t) => true
        case ArrayType(et, _) => atomic(et)
        case _ => false
      })
      case _ => false
    }
  }

  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnarEnabled && required.fields.forall(f => columnarSupported(f.dataType))

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
    val (fullIter, closeFn) = openIterator(partition.asInstanceOf[GraftInputPartition])
    val fieldIdx = required.fieldNames.map(full.fieldIndex)
    import org.apache.spark.sql.execution.vectorized.WritableColumnVector
    val capacity = 4096
    val vectors = required.fields.map(f => new OnHeapColumnVector(capacity, f.dataType))
    val batch = new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]))

    // positional write of an atomic at rowId n (top-level and struct
    // children share the batch's row addressing)
    def putAtomic(vec: WritableColumnVector, n: Int, dt: DataType, v: Any): Unit =
      dt match {
        case StringType =>
          val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
          vec.putByteArray(n, b, 0, b.length): Unit
        case LongType    => vec.putLong(n, v.asInstanceOf[Long])
        case IntegerType => vec.putInt(n, v.asInstanceOf[Int])
        case FloatType   => vec.putFloat(n, v.asInstanceOf[Float])
        case DoubleType  => vec.putDouble(n, v.asInstanceOf[Double])
        case BooleanType => vec.putBoolean(n, v.asInstanceOf[Boolean])
        case other => throw new IllegalStateException(s"non-atomic $other in columnar path")
      }

    // array elements APPEND to the shared child vector (offset/length
    // recorded per row); struct children write positionally at n
    def putValue(vec: WritableColumnVector, n: Int, dt: DataType, v: Any): Unit =
      dt match {
        case st: StructType =>
          if (v == null) {
            vec.putNull(n)
            // keep children positionally defined at n
            var i = 0
            while (i < st.fields.length) { vec.getChild(i).putNull(n); i += 1 }
          } else {
            vec.putNotNull(n)
            val row = v.asInstanceOf[InternalRow]
            var i = 0
            while (i < st.fields.length) {
              val f = st.fields(i)
              putValue(vec.getChild(i), n, f.dataType,
                if (row.isNullAt(i)) null else row.get(i, f.dataType))
              i += 1
            }
          }
        case ArrayType(et, _) =>
          if (v == null) vec.putNull(n)
          else {
            val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            val child = vec.arrayData()
            val offset = child.getElementsAppended
            var i = 0
            while (i < arr.numElements()) {
              if (arr.isNullAt(i)) child.appendNull()
              else et match {
                case StringType =>
                  val b = arr.getUTF8String(i).getBytes
                  child.appendByteArray(b, 0, b.length): Unit
                case LongType    => child.appendLong(arr.getLong(i))
                case IntegerType => child.appendInt(arr.getInt(i))
                case FloatType   => child.appendFloat(arr.getFloat(i))
                case DoubleType  => child.appendDouble(arr.getDouble(i))
                case BooleanType => child.appendBoolean(arr.getBoolean(i))
                case other => throw new IllegalStateException(
                  s"non-atomic array element $other in columnar path")
              }
              i += 1
            }
            vec.putArray(n, offset, arr.numElements()): Unit
          }
        case t =>
          if (v == null) vec.putNull(n) else putAtomic(vec, n, t, v)
      }

    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = {
        if (!fullIter.hasNext) return false
        var n = 0
        vectors.foreach(_.reset())
        while (n < capacity && fullIter.hasNext) {
          val vals = fullIter.next()
          var c = 0
          while (c < fieldIdx.length) {
            putValue(vectors(c), n, required.fields(c).dataType, vals(fieldIdx(c)))
            c += 1
          }
          n += 1
        }
        batch.setNumRows(n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = closeFn()
    }
  }
}
