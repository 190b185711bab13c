package graft.sources

import java.io.BufferedInputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container source/sink (source-family completeness next to
  * parquet/ORC/CSV/JSON-lines — the schema'd row format Kafka pipelines
  * and log shippers hand over). Built directly on the `org.apache.avro`
  * jars that ship with Spark — no connector dependency.
  *
  * Scale posture: Avro containers are block-splittable, but the split
  * unit used here is the FILE — `binaryFiles` hands each container to one
  * task and the decoder streams records off it. Log-shipper output is
  * many medium files, so file-granular parallelism is the honest scale
  * shape without re-implementing sync-marker splitting; one giant
  * container should be pre-split upstream (same posture note as the
  * XLSX/NetCDF readers, which are driver-side for formats that cannot
  * split at all).
  *
  * Supported surface: records of boolean / int / long / float / double /
  * string / bytes / enum (→ string) fields, nullable via `[null, T]`
  * unions, and arrays of those primitives. Nested records, maps, and
  * logical types are out of scope — pre-flatten upstream.
  */
object Avro {

  /** Avro schema → Spark schema (supported surface only; anything else
    * fails fast with the offending field named). */
  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro type must be record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (tpe, nullable) = fieldType(f.schema(), f.name())
      StructField(f.name(), tpe, nullable)
    })
  }

  private def fieldType(s: Schema, name: String): (DataType, Boolean) =
    s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala.toSeq
        val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
        require(nonNull.size == 1 && branches.size <= 2,
          s"field $name: only [null, T] unions are supported, got $s")
        (primitive(nonNull.head, name), true)
      case _ => (primitive(s, name), false)
    }

  private def primitive(s: Schema, name: String): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY   =>
      val et = s.getElementType
      if (et.getType == Schema.Type.UNION) {
        val branches = et.getTypes.asScala.toSeq
        val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
        require(nonNull.size == 1 && branches.size <= 2,
          s"field $name: only [null, T] union array elements are supported, got $et")
        ArrayType(primitive(nonNull.head, name), containsNull = true)
      } else ArrayType(primitive(et, name), containsNull = false)
    case other => throw new IllegalArgumentException(
      s"field $name: unsupported Avro type $other (pre-flatten upstream)")
  }

  private def toSparkValue(v: Any): Any = v match {
    case null          => null
    case u: Utf8       => u.toString
    case e: GenericData.EnumSymbol => e.toString
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case a: java.util.Collection[_] => a.asScala.toSeq.map(toSparkValue)
    case other => other
  }

  private def toRow(rec: GenericRecord, n: Int): Row =
    Row.fromSeq((0 until n).map(i => toSparkValue(rec.get(i))))

  /** Schema of a container file, read from its header (driver-side peek —
    * the header is a few KB regardless of file size). Goes through the
    * Hadoop FS API so any filesystem Spark can read works here too. */
  def schemaOf(spark: SparkSession, file: String): Schema = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new DataFileStream(
      new BufferedInputStream(fs.open(p)),
      new GenericDatumReader[GenericRecord]())
    try in.getSchema finally in.close()
  }

  /** Distributed Avro read: one task per container file, records streamed
    * off the block decoder (never materialized per-file). `path` is a
    * directory, glob, or single file on any Hadoop-visible filesystem;
    * `schemaFile` pins the expected schema (defaults to the first file
    * matched — same one-header peek Spark's own format inference does). */
  def read(spark: SparkSession, path: String,
           schemaFile: Option[String] = None): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val hpath = new org.apache.hadoop.fs.Path(path)
    val fs = hpath.getFileSystem(hconf)
    // a directory means "its .avro children"; a glob or file passes through
    val globPath =
      if (fs.isDirectory(hpath)) new org.apache.hadoop.fs.Path(path, "*.avro")
      else hpath
    val probe = schemaFile.getOrElse {
      val matched = fs.globStatus(globPath)
      require(matched != null && matched.nonEmpty, s"no files match $globPath")
      matched.map(_.getPath.toString).min
    }
    val probeAvro = schemaOf(spark, probe)
    val sparkSchema = toSparkSchema(probeAvro)
    val n = sparkSchema.size
    // Ship the probe schema as the READER schema so Avro does name-based
    // resolution per file: schema-evolved containers (reordered fields,
    // added fields with defaults) align by field name instead of silently
    // misbinding by position; incompatible files fail fast in the decoder.
    val readerJson = probeAvro.toString
    val rows = spark.sparkContext
      .binaryFiles(globPath.toString)
      .flatMap { case (_, pds) =>
        val reader = new Schema.Parser().parse(readerJson)
        val in = new DataFileStream(pds.open(),
          new GenericDatumReader[GenericRecord](null, reader))
        // close on task end, not just on exhaustion — a limit()/take()
        // that abandons the iterator mid-file must not leak the handle
        var closed = false
        def close(): Unit = if (!closed) { closed = true; in.close() }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => close()))
        new Iterator[Row] {
          def hasNext: Boolean = {
            if (closed) false
            else { val h = in.hasNext; if (!h) close(); h }
          }
          def next(): Row = toRow(in.next(), n)
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Spark schema → Avro record schema (nullable → [null, T] union). */
  def toAvroSchema(schema: StructType, recordName: String = "row"): Schema = {
    def prim(dt: DataType, name: String): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, containsNull) =>
        val elem = prim(et, name)
        // null-tolerant elements ride as a [null, T] union so a null
        // element fails here (supported) rather than deep in the writer
        Schema.createArray(
          if (containsNull)
            Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), elem))
          else elem)
      case other => throw new IllegalArgumentException(
        s"field $name: unsupported Spark type $other for Avro sink")
    }
    val fields = schema.fields.map { f =>
      val base = prim(f.dataType, f.name)
      val s = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def toAvroValue(v: Any, s: Schema): Any = v match {
    case null => null
    case bytes: Array[Byte] => java.nio.ByteBuffer.wrap(bytes)
    case seq: scala.collection.Seq[_] =>
      val elem = resolve(s).getElementType
      seq.map(toAvroValue(_, elem)).asJava
    case other => other
  }

  private def resolve(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Distributed Avro sink: each partition writes one container via the
    * Hadoop `AvroKeyOutputFormat` (avro-mapred ships with Spark). The
    * Schema is shipped as its JSON string — `Schema` itself is not
    * serializable. */
  def write(df: DataFrame, path: String): Unit = {
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    import org.apache.hadoop.mapreduce.Job

    val avroSchema = toAvroSchema(df.schema)
    val schemaJson = avroSchema.toString
    val sparkSchema = df.schema
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fields = schema.getFields.asScala.toIndexedSeq
      val colIdx = fields.map(f => sparkSchema.fieldIndex(f.name()))
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fields.length) {
          rec.put(i, toAvroValue(row.get(colIdx(i)), fields(i).schema()))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }
}
