package graft.tools

import java.io.File
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** DEV/TEST utility: an in-process loopback Iceberg REST catalog
  * owning ONE table — the server half of the open protocol that
  * [[graft.catalog.RestCatalog]] speaks, implemented far enough to
  * exercise the whole client contract with zero egress:
  *
  *   - `GET /v1/config` (no prefix) and `loadTable` from its own
  *     current pointer;
  *   - `POST .../tables/{t}` = `CommitTableRequest`: requirements
  *     checked against ITS current metadata (`assert-ref-snapshot-id`,
  *     including the null form asserting a ref's ABSENCE → 409 on
  *     failure), updates applied in order (`add-snapshot`,
  *     `set-snapshot-ref` — main moves current-snapshot-id and the
  *     snapshot-log, tags don't — `remove-snapshot-ref`, `add-spec`),
  *     and the next metadata.json PERSISTED next to the old ones (the
  *     catalog owns the pointer swap, exactly like a real service).
  *
  * Used by the REST catalog specs and by the catalog-lifecycle oracle
  * query (the driver's Verify runs it in-process). NOT a production
  * server: single table, no auth, no namespaces listing. */
final class LoopbackIcebergCatalog(ident: String,
    @volatile private var currentLoc: String) {
  private implicit val fmts: Formats = DefaultFormats
  private val Array(ns, tbl) = ident.split('.')
  private var server: HttpServer = _

  def location: String = currentLoc

  /** Start serving on an ephemeral loopback port; returns base URI. */
  def start(): String = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => route(ex))
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def readMeta(): JValue = parse(new String(
    Files.readAllBytes(new File(currentLoc).toPath),
    StandardCharsets.UTF_8))

  /** (status, body) for a CommitTableRequest payload. */
  def commit(body: String): (Int, String) = synchronized {
    val req = parse(body)
    val meta = readMeta()
    val refs = (meta \ "refs") match {
      case JObject(fs0) => fs0.toMap
      case _ => Map.empty[String, JValue]
    }
    // requirements: assert-ref-snapshot-id against CURRENT state; a
    // null snapshot-id asserts the ref does NOT exist (the create-ref
    // guard), a value asserts it points exactly there
    val conflict = (req \ "requirements").children.exists { r =>
      (r \ "type").extractOpt[String].contains(
        "assert-ref-snapshot-id") && {
        val ref = (r \ "ref").extract[String]
        val have = refs.get(ref)
          .flatMap(v => (v \ "snapshot-id").extractOpt[Long])
          .orElse(if (ref == "main")
            (meta \ "current-snapshot-id").extractOpt[Long] else None)
        (r \ "snapshot-id") match {
          case JNull | JNothing => have.isDefined
          case v => !have.contains(v.extract[Long])
        }
      }
    }
    if (conflict)
      return (409, """{"error":{"message":"Requirement failed: """ +
        """branch was updated concurrently","type":""" +
        """"CommitFailedException","code":409}}""")
    var out = meta
    (req \ "updates").children.foreach { u =>
      (u \ "action").extract[String] match {
        case "add-snapshot" =>
          val snap = u \ "snapshot"
          val seq = (snap \ "sequence-number").extract[Long]
          out = replaceFields(out, List(
            "snapshots" -> JArray((out \ "snapshots").children :+ snap),
            "last-sequence-number" -> JLong(math.max(
              (out \ "last-sequence-number").extractOpt[Long]
                .getOrElse(0L), seq)),
            "last-updated-ms" ->
              JLong(System.currentTimeMillis())))
        case "add-spec" =>
          out = replaceFields(out, List(
            "partition-specs" -> JArray(
              (out \ "partition-specs").children :+ (u \ "spec"))))
        case "remove-snapshots" =>
          val ids = (u \ "snapshot-ids").children
            .map(_.extract[Long]).toSet
          out = replaceFields(out, List(
            "snapshots" -> JArray((out \ "snapshots").children
              .filterNot(s =>
                ids((s \ "snapshot-id").extract[Long]))),
            "snapshot-log" -> JArray((out \ "snapshot-log").children
              .filterNot(e =>
                ids((e \ "snapshot-id").extract[Long])))))
        case "remove-snapshot-ref" =>
          val name = (u \ "ref-name").extract[String]
          out = replaceFields(out, List("refs" -> JObject(
            ((out \ "refs") match {
              case JObject(fs0) => fs0.filterNot(_._1 == name)
              case _ => Nil
            }))))
        case "set-snapshot-ref" =>
          val name = (u \ "ref-name").extract[String]
          val id = (u \ "snapshot-id").extract[Long]
          val refd: JValue = ("snapshot-id" -> id) ~
            ("type" -> (u \ "type").extractOpt[String]
              .getOrElse("branch"))
          val newRefs = JObject(((out \ "refs") match {
            case JObject(fs0) => fs0.filterNot(_._1 == name)
            case _ => Nil
          }) :+ (name -> refd))
          val mainFields =
            if (name != "main") Nil
            else List[JField](
              "current-snapshot-id" -> JLong(id),
              "snapshot-log" -> JArray(
                (out \ "snapshot-log").children :+
                  ((("timestamp-ms" -> System.currentTimeMillis()) ~
                    ("snapshot-id" -> id)): JValue)))
          out = replaceFields(out,
            List[JField]("refs" -> newRefs) ++ mainFields)
        case other =>
          return (400, s"""{"error":{"message":"unsupported update
            |$other","type":"BadRequest","code":400}}""".stripMargin)
      }
    }
    val dir = new File(currentLoc).getParentFile
    val next = new File(dir,
      f"${System.nanoTime()}%020d-rest.metadata.json")
    Files.write(next.toPath,
      compact(render(out)).getBytes(StandardCharsets.UTF_8))
    currentLoc = next.getAbsolutePath
    (200, compact(render(
      ("metadata-location" -> currentLoc) ~ ("metadata" -> out))))
  }

  private def replaceFields(meta: JValue,
      fields: List[JField]): JValue = {
    val names = fields.map(_._1).toSet
    JObject(meta.asInstanceOf[JObject].obj
      .filterNot(f => names(f._1)) ++ fields)
  }

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val (code, body) =
      if (path == "/v1/config")
        (200, """{"defaults":{},"overrides":{}}""")
      else if (path == s"/v1/namespaces/$ns/tables/$tbl") {
        if (ex.getRequestMethod == "POST")
          commit(new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8))
        else (200, compact(render(
          ("metadata-location" -> currentLoc) ~
            ("metadata" -> readMeta()))))
      } else (404, """{"error":{"message":"NoSuchTable",
        |"type":"NoSuchTableException","code":404}}""".stripMargin)
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
