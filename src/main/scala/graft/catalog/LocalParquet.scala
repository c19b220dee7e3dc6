package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._

/** Driver-side single-file parquet writer for MANIFEST PARTS — the
  * metadata plane of [[Layout]]'s snapshot log (zone rows, provenance
  * markers): O(file-count) rows at ANY table scale, so routing them
  * through a Spark job is pure overhead (~150 ms planning + task +
  * commit protocol per part, measured r20) against ~2 ms of direct
  * parquet I/O. Data-plane writes (table files, deletion vectors —
  * O(rows)) stay distributed.
  *
  * Fidelity contract: a part written here must read back through
  * `spark.read.parquet` with the SAME schema (names, types,
  * nullability) and values as one written by
  * `spark.createDataFrame(rows).coalesce(1).write.parquet` — pinned by
  * LocalParquetSpec's round-trip matrix. Date/timestamp values convert
  * through Spark's own [[DateTimeUtils]], so the epoch arithmetic is
  * identical by construction. Types outside the supported set make
  * [[supports]] false and the caller falls back to the Spark path. */
object LocalParquet {

  /** Can every field be written with exact Spark-read-back fidelity? */
  def supports(schema: StructType): Boolean =
    schema.fields.forall(f => f.dataType match {
      case StringType | LongType | IntegerType | DoubleType |
           BooleanType | DateType | TimestampType => true
      case _ => false
    })

  private def parquetType(f: StructField): Type = {
    val rep =
      if (f.nullable) Type.Repetition.OPTIONAL else Type.Repetition.REQUIRED
    f.dataType match {
      case StringType =>
        Types.primitive(PrimitiveType.PrimitiveTypeName.BINARY, rep)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
      case LongType =>
        Types.primitive(PrimitiveType.PrimitiveTypeName.INT64, rep)
          .named(f.name)
      case IntegerType =>
        Types.primitive(PrimitiveType.PrimitiveTypeName.INT32, rep)
          .named(f.name)
      case DoubleType =>
        Types.primitive(PrimitiveType.PrimitiveTypeName.DOUBLE, rep)
          .named(f.name)
      case BooleanType =>
        Types.primitive(PrimitiveType.PrimitiveTypeName.BOOLEAN, rep)
          .named(f.name)
      case DateType =>
        Types.primitive(PrimitiveType.PrimitiveTypeName.INT32, rep)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
      case TimestampType =>
        // INT64 µs adjusted-to-UTC — Spark reads it as TimestampType
        // under any session zone (and writes this form itself on
        // Spark 4's default outputTimestampType)
        Types.primitive(PrimitiveType.PrimitiveTypeName.INT64, rep)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
      case dt => throw new IllegalArgumentException(s"unsupported: $dt")
    }
  }

  private def message(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach(f => b.addField(parquetType(f)))
    b.named("spark_schema") // the name Spark's own writer uses
  }

  private def add(g: Group, name: String, dt: DataType, v: Any): Unit =
    dt match {
      case StringType => g.append(name, v.asInstanceOf[String])
      case LongType => g.append(name, v.asInstanceOf[Long])
      case IntegerType => g.append(name, v.asInstanceOf[Int])
      case DoubleType => g.append(name, v.asInstanceOf[Double])
      case BooleanType => g.append(name, v.asInstanceOf[Boolean])
      case DateType =>
        val days = v match {
          case d: java.sql.Date => DateTimeUtils.fromJavaDate(d)
          case d: java.time.LocalDate => DateTimeUtils.localDateToDays(d)
        }
        g.append(name, days)
      case TimestampType =>
        val micros = v match {
          case t: java.sql.Timestamp => DateTimeUtils.fromJavaTimestamp(t)
          case t: java.time.Instant => DateTimeUtils.instantToMicros(t)
        }
        g.append(name, micros)
      case _ => throw new IllegalArgumentException(s"unsupported: $dt")
    }

  // ---- driver-side read of manifest parts -------------------------

  /** Max total bytes [[readAll]] will pull onto the driver. Manifest
    * parts are O(file-count) rows; even a million-file table's zone
    * manifest is ~tens of MB. Anything bigger falls back to the
    * distributed read. */
  val MaxLocalReadBytes: Long = 64L * 1024 * 1024

  private def sparkField(t: Type): Option[StructField] = {
    if (!t.isPrimitive) return None
    val p = t.asPrimitiveType()
    val nullable = t.getRepetition == Type.Repetition.OPTIONAL
    if (t.getRepetition == Type.Repetition.REPEATED) return None
    val lta = p.getLogicalTypeAnnotation
    val dt: Option[DataType] =
      (p.getPrimitiveTypeName, lta) match {
        case (PrimitiveType.PrimitiveTypeName.BINARY,
              _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
          Some(StringType)
        case (PrimitiveType.PrimitiveTypeName.INT64, null) => Some(LongType)
        case (PrimitiveType.PrimitiveTypeName.INT64,
              ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
            if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS &&
              ts.isAdjustedToUTC => Some(TimestampType)
        case (PrimitiveType.PrimitiveTypeName.INT32, null) => Some(IntegerType)
        case (PrimitiveType.PrimitiveTypeName.INT32,
              _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
          Some(DateType)
        case (PrimitiveType.PrimitiveTypeName.DOUBLE, null) => Some(DoubleType)
        case (PrimitiveType.PrimitiveTypeName.BOOLEAN, null) =>
          Some(BooleanType)
        case _ => None
      }
    dt.map(StructField(t.getName, _, nullable))
  }

  private def sparkSchema(msg: MessageType): Option[StructType] = {
    val fields = (0 until msg.getFieldCount)
      .map(i => sparkField(msg.getType(i)))
    if (fields.forall(_.isDefined)) Some(StructType(fields.map(_.get)))
    else None
  }

  private def value(g: Group, i: Int, dt: DataType): Any = dt match {
    case StringType => g.getString(i, 0)
    case LongType => g.getLong(i, 0)
    case IntegerType => g.getInteger(i, 0)
    case DoubleType => g.getDouble(i, 0)
    case BooleanType => g.getBoolean(i, 0)
    case DateType => DateTimeUtils.toJavaDate(g.getInteger(i, 0))
    case TimestampType => DateTimeUtils.toJavaTimestamp(g.getLong(i, 0))
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  /** Read a set of parquet data files entirely on the driver —
    * (schema, rows) exactly as `spark.read.parquet` + `collect` would
    * produce them (same type mapping, same [[DateTimeUtils]]
    * conversions; LocalParquetSpec pins the equivalence). None when
    * any file uses a type outside the supported set, the files'
    * schemas differ, or the total size exceeds [[MaxLocalReadBytes]] —
    * callers then fall back to the distributed read. */
  def readAll(conf: Configuration,
              files: Seq[org.apache.hadoop.fs.FileStatus])
      : Option[(StructType, Array[Row])] = {
    if (files.isEmpty) return None
    if (files.map(_.getLen).sum > MaxLocalReadBytes) return None
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var schema: StructType = null
      files.foreach { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val msg =
          try fr.getFooter.getFileMetaData.getSchema
          finally fr.close()
        val s = sparkSchema(msg).getOrElse(return None)
        if (schema == null) schema = s
        else if (schema != s) return None
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
            st.getPath)
          .withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            val vals = new Array[Any](s.fields.length)
            var i = 0
            while (i < s.fields.length) {
              vals(i) =
                if (g.getFieldRepetitionCount(i) == 0) null
                else value(g, i, s.fields(i).dataType)
              i += 1
            }
            out += Row.fromSeq(vals.toIndexedSeq)
            g = reader.read()
          }
        } finally reader.close()
      }
      Some((schema, out.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-file zone stats straight from the parquet FOOTER —
    * (row_count, min, max) of `column`, min/max as the same external
    * JVM values `min(col)/max(col)` + collect would produce. Exact by
    * the format: row-group statistics for these physical types are
    * full-width (no truncation), so the bounds equal the data's true
    * min/max. None when the column is missing, a row group lacks
    * statistics, or the type is outside the numeric/date/timestamp
    * set (notably STRINGS, whose binary stats MAY be truncated —
    * callers fall back to the aggregation job). All-null columns
    * yield Some((n, null, null)), matching the agg's null min/max. */
  def footerZone(conf: Configuration, st: org.apache.hadoop.fs.FileStatus,
                 column: String, dt: DataType)
      : Option[(Long, Any, Any)] = {
    val ordering: Ordering[Any] = (dt match {
      case LongType | TimestampType => Ordering.Long
      case IntegerType | DateType => Ordering.Int
      case DoubleType => Ordering.Double.TotalOrdering
      case _ => return None
    }).asInstanceOf[Ordering[Any]]
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(st, conf)
      val fr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val blocks = fr.getFooter.getBlocks.asScala
        var nRows = 0L
        var mn: Option[Any] = None
        var mx: Option[Any] = None
        for (b <- blocks) {
          nRows += b.getRowCount
          val cc = b.getColumns.asScala.find(c =>
            c.getPath.toDotString == column).getOrElse(return None)
          val stats = cc.getStatistics
          if (stats == null || !stats.isNumNullsSet) return None
          if (stats.getNumNulls < b.getRowCount) {
            if (!stats.hasNonNullValue) return None
            val (lo, hi) = (stats.genericGetMin, stats.genericGetMax)
            val (l, h) = (lo, hi) match {
              case (a: java.lang.Integer, b0: java.lang.Integer) =>
                (a.intValue: Any, b0.intValue: Any)
              case (a: java.lang.Long, b0: java.lang.Long) =>
                (a.longValue: Any, b0.longValue: Any)
              case (a: java.lang.Double, b0: java.lang.Double) =>
                (a.doubleValue: Any, b0.doubleValue: Any)
              case _ => return None
            }
            mn = Some(mn.fold(l)(m => ordering.min(m, l)))
            mx = Some(mx.fold(h)(m => ordering.max(m, h)))
          }
        }
        def ext(v: Option[Any]): Any = v match {
          case None => null
          case Some(x) => dt match {
            case DateType => DateTimeUtils.toJavaDate(x.asInstanceOf[Int])
            case TimestampType =>
              DateTimeUtils.toJavaTimestamp(x.asInstanceOf[Long])
            case _ => x
          }
        }
        Some((nRows, ext(mn), ext(mx)))
      } finally fr.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Write `rows` as ONE parquet file at `file` (no temp/rename — the
    * caller owns atomicity, same contract as the Spark path). */
  def write(conf: Configuration, file: Path, schema: StructType,
            rows: Iterable[Row]): Unit = {
    val msg = message(schema)
    val wConf = new Configuration(conf)
    GroupWriteSupport.setSchema(msg, wConf)
    val writer = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile
          .fromPath(file, wConf))
      .withConf(wConf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try {
      val factory = new SimpleGroupFactory(msg)
      rows.foreach { r =>
        val g = factory.newGroup()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = r.get(i)
          if (v == null) {
            if (!f.nullable)
              throw new IllegalArgumentException(
                s"null in non-nullable field ${f.name}")
          } else add(g, f.name, f.dataType, v)
        }
        writer.write(g)
      }
    } finally writer.close()
  }
}
