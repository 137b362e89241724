package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** C4: Avro-record-JSON → Spark StructType, mirroring the reference's
  * hand-rolled converter (/root/reference/bronze-silver.py:22-57):
  *
  *   - primitive map string/int/long/float/double/boolean;
  *   - logical types timestamp-micros → TimestampType, date → DateType;
  *   - union ["null", T] → nullable field;
  *   - unknown types fall back to StringType (reference line 39).
  */
object AvroSchemaConverter {

  def toStructType(avroJson: String): StructType = {
    val root = JsonMethods.parse(avroJson)
    val fields = (root \ "fields") match {
      case JArray(fs) => fs.map(toField)
      case _ => throw new IllegalArgumentException(
        "avro schema has no fields[] array")
    }
    StructType(fields)
  }

  private def toField(f: JValue): StructField = {
    val name = (f \ "name") match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("field without name")
    }
    val (dt, nullable) = toType(f \ "type")
    StructField(name, dt, nullable)
  }

  /** Returns (sparkType, nullable). */
  private def toType(t: JValue): (DataType, Boolean) = t match {
    case JString(s) => (primitive(s), false)
    // union ["null", T] (or [T, "null"]) → nullable T
    case JArray(members) =>
      val nonNull = members.filterNot(_ == JString("null"))
      val dt = nonNull.headOption.map(m => toType(m)._1).getOrElse(StringType)
      (dt, members.contains(JString("null")))
    // logical types: {"type": "long", "logicalType": "timestamp-micros"}
    case o: JObject =>
      (o \ "logicalType") match {
        case JString("timestamp-micros") | JString("timestamp-millis") =>
          (TimestampType, false)
        case JString("date") => (DateType, false)
        case _ => (o \ "type") match {
          case JString(s) => (primitive(s), false)
          case _ => (StringType, false)
        }
      }
    case _ => (StringType, false)
  }

  private def primitive(s: String): DataType = s match {
    case "string" => StringType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case _ => StringType // unknown → string fallback, as the reference
  }
}
