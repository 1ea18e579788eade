package graft

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import graft.connectors.AvroSerde

class AvroSerdeSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"Metric","fields":[
      |{"name":"name","type":"string"},{"name":"value","type":"double"}]}""".stripMargin

  test("wire-format round trip preserves record and schema id") {
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("name", "cpu")
    rec.put("value", 0.75)
    val ser = AvroSerde.serialize(schemaJson, schemaId = 7)
    val bytes = ser(rec)
    assert(bytes(0) === 0)
    val (id, back) = AvroSerde.deserialize(schemaJson)(bytes)
    assert(id === 7)
    assert(back.get("name").toString === "cpu")
    assert(back.get("value") === 0.75)
  }

  test("deserializeValueColumn decodes a binary DataFrame column per partition") {
    val schema = new Schema.Parser().parse(schemaJson)
    val ser = AvroSerde.serialize(schemaJson, 1)
    val rows = Seq("a" -> 1.5, "b" -> 2.5).map { case (n, v) =>
      val r = new GenericData.Record(schema)
      r.put("name", n); r.put("value", v)
      ser(r)
    }
    val df = rows.toDF("value")
    val out = AvroSerde.deserializeValueColumn[(String, Double)](df, schemaJson, "value")(
      r => (r.get("name").toString, r.get("value").asInstanceOf[Double]))
    assert(out.collect().toSet === Set(("a", 1.5), ("b", 2.5)))
  }

  test("deserialize rejects non-wire-format payloads") {
    intercept[IllegalArgumentException] {
      AvroSerde.deserialize(schemaJson)(Array[Byte](9, 9, 9))
    }
  }
}
