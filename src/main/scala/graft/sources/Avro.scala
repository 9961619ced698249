package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro ingestion WITHOUT the spark-avro datasource module (absent
  * from this classpath): the classic Hadoop-ecosystem container
  * format read through the public `newAPIHadoopFile` +
  * avro-mapreduce `AvroKeyInputFormat` path — splittable, codec-aware
  * (deflate/snappy blocks), schema-on-read from the container header.
  *
  * Scale shape is identical to any file scan: one task per input
  * split, records decoded and converted to Rows inside the task (the
  * Avro reader REUSES its record object, so every value is copied out
  * before the iterator advances — the standard Hadoop-RDD hazard),
  * and the schema is read once, driver-side, from the first file
  * header (metadata-only, no data scan).
  *
  * Type coverage: Avro primitives, nullable `[null, T]` unions,
  * arrays of primitives, and top-level records of those — the
  * Hadoop-era payload shapes. Anything richer (maps, fixed, nested
  * records, multi-branch unions) throws with the field named rather
  * than decoding garbage.
  */
object Avro {

  private def toSql(s: Schema, field: String): DataType = s.getType match {
    case Schema.Type.LONG    => LongType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY   =>
      ArrayType(toSql(s.getElementType, field))
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
        .filterNot(_.getType == Schema.Type.NULL)
      require(branches.size == 1,
        s"avro field '$field': only [null, T] unions are supported, got $s")
      toSql(branches.head, field)
    case other =>
      throw new IllegalArgumentException(
        s"avro field '$field': unsupported type $other")
  }

  private def nullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** StructType for a top-level Avro RECORD schema. */
  private[graft] def sqlSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"top-level avro schema must be a record, got ${avro.getType}")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      StructField(f.name, toSql(f.schema, f.name), nullable(f.schema))
    })
  }

  /** Copy one decoded value out of the (reused) Avro record into the
    * JVM value Spark's Row encoder expects. */
  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (l: java.util.List[_], ArrayType(el, _)) =>
      l.asScala.toSeq.map(convert(_, el))
    case (x, _) => x // avro primitives already match
  }

  /** Read every .avro container under `path` (a file or directory)
    * into a DataFrame. Schema from the first file's header; all files
    * must share it (Avro's own evolution rules apply at write time). */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val first = {
      val p = new Path(path)
      val f =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
            .headOption.getOrElse(throw new IllegalArgumentException(
              s"$path: no .avro files"))
        else p
      val in = fs.open(f)
      try {
        val dfs = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        try dfs.getSchema finally dfs.close()
      } finally if (in != null) () // closed by dfs.close()
    }
    val struct = sqlSchema(first)
    val fields = struct.fields.map(f => (f.name, f.dataType))
    val glob = if (fs.getFileStatus(new Path(path)).isDirectory)
      s"$path/*.avro" else path
    val rows = spark.sparkContext.newAPIHadoopFile(
        glob,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .map { case (k, _) =>
        // copy out every field NOW — the input format reuses the record
        val r = k.datum()
        Row.fromSeq(fields.toSeq.map { case (n, dt) => convert(r.get(n), dt) })
      }
    spark.createDataFrame(rows, struct)
  }

  /** Avro schema for a Spark StructType (the writer-side inverse of
    * [[sqlSchema]], same type coverage). */
  private[graft] def avroSchema(struct: StructType, name: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case ArrayType(el, _) => Schema.createArray(prim(el))
      case other => throw new IllegalArgumentException(
        s"avro writer: unsupported Spark type $other")
    }
    val fields = struct.fields.map { f =>
      val base = prim(f.dataType)
      val s = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft", false,
      java.util.Arrays.asList(fields: _*))
  }

  /** Spark value → Avro value for [[writeAvro]]. */
  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(el, _)) =>
      java.util.Arrays.asList(seq.map(x => toAvro(x, el)).toSeq: _*)
    case (x, _) => x
  }

  /** Write a DataFrame as splittable .avro container files via the
    * public avro-mapreduce `AvroKeyOutputFormat` (the writer twin of
    * [[readAvro]]; same type coverage). The Avro `Schema` object is
    * not serializable, so its JSON travels to executors and each
    * partition re-parses it once; records are built per row — one
    * output file per partition, the standard Hadoop commit protocol
    * (task-attempt temp + atomic rename) giving all-or-nothing
    * output at any parallelism. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val struct = df.schema
    val schema = avroSchema(struct, "row")
    val schemaJson = schema.toString
    val fields = struct.fields.map(f => (f.name, f.dataType))
    val rdd = df.rdd.mapPartitions { it =>
      val s = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(s)
        var i = 0
        while (i < fields.length) {
          rec.put(fields(i)._1, toAvro(row.get(i), fields(i)._2))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    org.apache.avro.mapreduce.AvroJob.setOutputKeySchema(job, schema)
    rdd.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[org.apache.avro.mapreduce.AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }
}
