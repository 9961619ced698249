package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** Round-trip gate for the hadoopRDD-based Avro reader: files written
  * with the stock Avro container writer come back value-identical,
  * including nullable unions, bytes and arrays. */
class AvroSpec extends AnyFunSuite {
  import TestSpark._

  private def writeAvro(dir: String, name: String, schema: Schema)
                       (rows: GenericRecord*): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, name))
    try rows.foreach(w.append) finally w.close()
  }

  test("avro containers round-trip through readAvro") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    val schema = SchemaBuilder.record("doc").fields()
      .requiredLong("id")
      .requiredString("text")
      .optionalDouble("score")
      .name("payload").`type`().bytesType().noDefault()
      .name("tags").`type`().array().items().stringType().noDefault()
      .endRecord()
    def rec(id: Long, text: String, score: java.lang.Double,
            payload: Array[Byte], tags: Seq[String]): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id); r.put("text", text); r.put("score", score)
      r.put("payload", java.nio.ByteBuffer.wrap(payload))
      r.put("tags", java.util.Arrays.asList(tags: _*))
      r
    }
    // two files: the reader must glob the directory and share schema
    writeAvro(dir, "a.avro", schema)(
      rec(1L, "alpha", 0.5, Array[Byte](1, 2), Seq("x", "y")),
      rec(2L, "beta", null, Array[Byte](), Seq.empty))
    writeAvro(dir, "b.avro", schema)(
      rec(3L, "gamma", -1.25, Array[Byte](9), Seq("z")))

    val df = graft.sources.Avro.readAvro(spark, dir)
    assert(df.schema.fieldNames.toSeq ===
      Seq("id", "text", "score", "payload", "tags"))
    assert(df.schema("score").nullable)
    val got = df.orderBy($"id")
      .select($"id", $"text", $"score", $"payload", $"tags")
      .collect()
    assert(got.length === 3)
    assert(got(0).getLong(0) === 1L && got(0).getString(1) === "alpha")
    assert(got(0).getDouble(2) === 0.5)
    assert(got(0).getAs[Array[Byte]](3).toSeq === Seq[Byte](1, 2))
    assert(got(0).getSeq[String](4) === Seq("x", "y"))
    assert(got(1).isNullAt(2) && got(1).getSeq[String](4).isEmpty)
    assert(got(2).getDouble(2) === -1.25)
    // aggregates run on it like any source
    assert(df.agg(org.apache.spark.sql.functions.sum($"id")).head()
      .getLong(0) === 6L)
  }

  test("writeAvro round-trips a DataFrame through the container format") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("avrow").toString
    val src = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text", $"n_chars",
        split($"text", " ").as("toks"),
        when($"doc_id" % 3 === 0, $"n_chars".cast("double")).as("maybe"))
    graft.sources.Avro.writeAvro(src, dir + "/docs")
    val back = graft.sources.Avro.readAvro(spark, dir + "/docs")
    assert(back.schema("maybe").nullable)
    val a = src.orderBy($"doc_id").collect().toSeq
    val b = back.select(src.columns.map(col): _*)
      .orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }

  test("unsupported avro shapes fail loudly with the field named") {
    val bad = SchemaBuilder.record("m").fields()
      .name("kv").`type`().map().values().stringType().noDefault()
      .endRecord()
    val e = intercept[IllegalArgumentException] {
      graft.sources.Avro.sqlSchema(bad)
    }
    assert(e.getMessage.contains("kv"))
  }
}
