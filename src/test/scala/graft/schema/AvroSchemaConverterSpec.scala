package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroSchemaConverterSpec extends AnyFunSuite {

  test("converts the reference silver schema with logical types and unions") {
    val avro =
      """{
        |  "type": "record", "name": "r", "fields": [
        |    {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        |    {"name": "id", "type": "long"},
        |    {"name": "n", "type": "int"},
        |    {"name": "cat", "type": ["null", "string"]},
        |    {"name": "price", "type": "double"},
        |    {"name": "f", "type": "float"},
        |    {"name": "b", "type": "boolean"},
        |    {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        |    {"name": "weird", "type": "fixed16"}
        |  ]
        |}""".stripMargin
    val st = AvroSchemaConverter.toStructType(avro)
    assert(st("ts").dataType === TimestampType)
    assert(st("id").dataType === LongType)
    assert(st("n").dataType === IntegerType)
    assert(st("cat").dataType === StringType)
    assert(st("cat").nullable === true)
    assert(st("id").nullable === false)
    assert(st("price").dataType === DoubleType)
    assert(st("f").dataType === FloatType)
    assert(st("b").dataType === BooleanType)
    assert(st("d").dataType === DateType)
    assert(st("weird").dataType === StringType) // unknown → string fallback
  }

  test("rejects schemas without fields") {
    intercept[IllegalArgumentException] {
      AvroSchemaConverter.toStructType("""{"type":"record","name":"x"}""")
    }
  }
}
