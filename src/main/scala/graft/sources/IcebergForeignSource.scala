package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("graft-iceberg").load(path)` — stream a
  * FOREIGN Iceberg v2 table (no Iceberg jar) via
  * [[graft.streaming.IcebergStreamSource]]. Stream-only by design: batch
  * foreign reads go through [[graft.iceberg.IcebergImport.read]] /
  * `readWhere` / `readPartition`, which return composed plans (delete
  * anti-joins) a plain file relation cannot express. */
class IcebergForeignSource extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg source requires a path"))

  private def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.getOrElse("mode", "append") match {
      case "append" => false
      case "cdc" => true
      case other => throw new IllegalArgumentException(
        s"graft-iceberg mode must be 'append' or 'cdc', got '$other'")
    }

  override def sourceSchema(ctx: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), new graft.streaming.IcebergStreamSource(
      ctx.sparkSession, location(parameters),
      cdc = cdcMode(parameters)).schema)

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    new graft.streaming.IcebergStreamSource(ctx.sparkSession,
      location(parameters),
      parameters.get("skipRewrites").exists(_.toBoolean),
      cdc = cdcMode(parameters))
}
