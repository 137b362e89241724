package graft.tools

import java.io.File
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** DEV/TEST utility: an in-process loopback Iceberg REST catalog —
  * the server half of the open protocol that
  * [[graft.catalog.RestCatalog]] speaks, implemented far enough to
  * exercise the whole client contract with zero egress:
  *
  *   - `GET /v1/config` (no prefix) and `loadTable` from its own
  *     current pointer;
  *   - `POST .../tables/{t}` = `CommitTableRequest`: requirements
  *     checked against ITS current metadata (`assert-ref-snapshot-id`,
  *     including the null form asserting a ref's ABSENCE → 409 on
  *     failure), updates applied in order (`add-snapshot` — with the
  *     v3 row-lineage contract: first-row-id validated against
  *     next-row-id, which then advances by added-rows —
  *     `set-snapshot-ref` — main moves current-snapshot-id and the
  *     snapshot-log, tags don't — `remove-snapshot-ref` — refused when
  *     a current ref targets a removed snapshot — `add-spec`), and the
  *     next metadata.json PERSISTED next to the old ones (the catalog
  *     owns the pointer swap, exactly like a real service);
  *   - namespace + table CREATION (`POST /v1/namespaces`,
  *     `POST .../namespaces/{ns}/tables` = CreateTableRequest — the
  *     CATALOG writes the initial metadata, no snapshot, 409 on
  *     duplicates) and listing (`GET` on both routes);
  *   - optional bearer-token auth ([[requiredToken]]) — 401 without
  *     the exact `Authorization: Bearer` header.
  *
  * Used by the REST catalog specs and by the catalog-lifecycle oracle
  * query (the driver's Verify runs it in-process). NOT a production
  * server: in-memory namespace registry, single process. */
final class LoopbackIcebergCatalog(ident: String, initialLoc: String,
    warehouse: Option[String] = None) {
  private implicit val fmts: Formats = DefaultFormats

  /** The LAST dot splits table from namespace (multi-level namespaces
    * join with the protocol's 0x1F unit separator in the URL path,
    * matching the client's encoding — URI.getPath hands it back
    * decoded). */
  private def split(id: String): (String, String) = {
    val i = id.lastIndexOf('.')
    require(i > 0 && i < id.length - 1,
      s"catalog table identifier must be namespace.table, got '$id'")
    (id.substring(0, i).replace(".", "\u001f"), id.substring(i + 1))
  }
  private val primary = split(ident)

  // every table this catalog owns: (ns, table) -> current metadata loc
  private val tabs =
    scala.collection.concurrent.TrieMap[(String, String), String](
      primary -> initialLoc)
  private val nss =
    scala.collection.concurrent.TrieMap[String, Unit](primary._1 -> ())

  private var server: HttpServer = _

  /** When set, every request must carry `Authorization: Bearer <t>` —
    * the simplest production auth scheme; 401 otherwise. */
  @volatile var requiredToken: Option[String] = None

  /** When set to (client_id, client_secret), the spec's OAuth2
    * client-credentials token endpoint (`POST /v1/oauth/tokens`) is
    * live: it issues expiring bearer tokens against those credentials,
    * and every OTHER route requires a live issued token (or the static
    * [[requiredToken]]). 401 on wrong credentials, missing header, or
    * an EXPIRED token — the refresh path the client must survive. */
  @volatile var oauthClient: Option[(String, String)] = None
  /** Advertised token lifetime (expires_in, seconds). */
  @volatile var tokenTtlSeconds: Long = 3600L
  // issued token -> expiry epoch millis
  private val issued =
    scala.collection.concurrent.TrieMap[String, Long]()
  /** Force-expire every issued token — deterministic expiry for specs
    * (no sleeping through real TTLs). */
  def expireTokens(): Unit =
    issued.keys.foreach(t => issued.update(t, 0L))
  /** Number of tokens minted so far (spec observability). */
  def tokensIssued: Int = issued.size

  /** When set, LIST routes return at most N entries per response plus
    * the spec's `next-page-token` (opaque to the client; here an
    * offset) — pins the client's page-draining loop. */
  @volatile var pageSize: Option[Int] = None

  private def pageOffset(ex: HttpExchange): Int =
    Option(ex.getRequestURI.getQuery).getOrElse("").split('&')
      .flatMap { kv =>
        val i = kv.indexOf('=')
        if (i < 0) None
        else Some(kv.take(i) ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8"))
      }.toMap.get("pageToken")
      .flatMap(t => scala.util.Try(t.toInt).toOption).getOrElse(0)

  private def paginate[T](items: List[T], offset: Int)
      : (List[T], Option[String]) = pageSize match {
    case None => (items, None)
    case Some(n) =>
      (items.slice(offset, offset + n),
        if (offset + n < items.size) Some((offset + n).toString)
        else None)
  }

  /** The PRIMARY table's current metadata location. */
  def location: String = tabs(primary)

  /** Any table's current metadata location (dotted identifier). */
  def locationOf(id: String): Option[String] = tabs.get(split(id))

  /** Start serving on an ephemeral loopback port; returns base URI. */
  def start(): String = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => route(ex))
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def readMeta(loc: String): JValue = parse(new String(
    Files.readAllBytes(new File(loc).toPath), StandardCharsets.UTF_8))

  /** (status, body) for a CommitTableRequest against the PRIMARY
    * table — kept for the specs that drive commits directly. */
  def commit(body: String): (Int, String) = commitAt(primary, body)

  /** The spec's assert-ref-snapshot-id check against CURRENT metadata;
    * a null snapshot-id asserts the ref does NOT exist (the create-ref
    * and first-commit guards), a value asserts it points exactly
    * there. Shared by single-table commits and transactions (which
    * must check EVERY member before applying ANY). */
  private def reqConflict(meta: JValue, req: JValue): Boolean = {
    val refs = (meta \ "refs") match {
      case JObject(fs0) => fs0.toMap
      case _ => Map.empty[String, JValue]
    }
    (req \ "requirements").children.exists { r =>
      (r \ "type").extractOpt[String].contains(
        "assert-ref-snapshot-id") && {
        val ref = (r \ "ref").extract[String]
        val have = refs.get(ref)
          .flatMap(v => (v \ "snapshot-id").extractOpt[Long])
          .orElse(if (ref == "main")
            // -1 = created-but-never-written: main does not exist yet,
            // so the null-form assert (first-commit guard) passes
            (meta \ "current-snapshot-id").extractOpt[Long]
              .filter(_ != -1L) else None)
        (r \ "snapshot-id") match {
          case JNull | JNothing => have.isDefined
          case v => !have.contains(v.extract[Long])
        }
      }
    }
  }

  private def commitAt(key: (String, String), body: String)
      : (Int, String) = synchronized {
    val curLoc = tabs(key)
    val req = parse(body)
    val meta = readMeta(curLoc)
    if (reqConflict(meta, req))
      return (409, """{"error":{"message":"Requirement failed: """ +
        """branch was updated concurrently","type":""" +
        """"CommitFailedException","code":409}}""")
    var out = meta
    (req \ "updates").children.foreach { u =>
      (u \ "action").extract[String] match {
        case "add-snapshot" =>
          val snap = u \ "snapshot"
          val seq = (snap \ "sequence-number").extract[Long]
          // v3 row lineage is CATALOG-maintained state: the snapshot's
          // first-row-id must not fall below the table's next-row-id (a
          // stale value means a concurrent commit consumed row-id space
          // after the client loaded — accepting it would assign
          // overlapping row ids), and on success next-row-id advances
          // to first-row-id + added-rows
          val rowIdFields: List[JField] =
            (out \ "next-row-id").extractOpt[Long] match {
              case Some(nextRowId) =>
                val first = (snap \ "first-row-id").extractOpt[Long]
                val added = (snap \ "added-rows").extractOpt[Long]
                if (first.isEmpty || added.isEmpty)
                  return (400, """{"error":{"message":"v3 snapshot """ +
                    """needs first-row-id and added-rows","type":""" +
                    """"BadRequest","code":400}}""")
                if (first.get < nextRowId)
                  return (409, """{"error":{"message":"Requirement """ +
                    """failed: snapshot first-row-id is below the """ +
                    """table's next-row-id (concurrent commit consumed""" +
                    """ row-id space)","type":"CommitFailedException",""" +
                    """"code":409}}""")
                List("next-row-id" -> JLong(first.get + added.get))
              case None => Nil
            }
          out = replaceFields(out, List(
            "snapshots" -> JArray((out \ "snapshots").children :+ snap),
            "last-sequence-number" -> JLong(math.max(
              (out \ "last-sequence-number").extractOpt[Long]
                .getOrElse(0L), seq)),
            "last-updated-ms" ->
              JLong(System.currentTimeMillis())) ++ rowIdFields)
        case "add-spec" =>
          out = replaceFields(out, List(
            "partition-specs" -> JArray(
              (out \ "partition-specs").children :+ (u \ "spec"))))
        case "remove-snapshots" =>
          val ids = (u \ "snapshot-ids").children
            .map(_.extract[Long]).toSet
          // server-side ref validation (what a managed catalog does):
          // a removal that would leave ANY current ref — main's head
          // included — pointing at a dropped snapshot is a commit
          // conflict, not a metadata update. This closes the race the
          // client's load-time ref asserts cannot see: a ref CREATED
          // after the expiry loaded its state.
          val refTargets = ((out \ "refs") match {
            case JObject(fs0) => fs0.flatMap { case (_, v) =>
              (v \ "snapshot-id").extractOpt[Long] }
            case _ => Nil
          }) ++ (out \ "current-snapshot-id").extractOpt[Long]
            .filter(_ != -1L).toList
          if (refTargets.exists(ids))
            return (409, """{"error":{"message":"Requirement failed: """ +
              """a ref targets a snapshot being removed","type":""" +
              """"CommitFailedException","code":409}}""")
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
    val dir = new File(curLoc).getParentFile
    val next = new File(dir,
      f"${System.nanoTime()}%020d-rest.metadata.json")
    Files.write(next.toPath,
      compact(render(out)).getBytes(StandardCharsets.UTF_8))
    tabs(key) = next.getAbsolutePath
    (200, compact(render(
      ("metadata-location" -> next.getAbsolutePath) ~
        ("metadata" -> out))))
  }

  /** (status, body) for a CreateTableRequest in namespace `ns`: the
    * CATALOG builds and persists the initial metadata.json — declared
    * schema and spec, NO snapshot (current-snapshot-id -1; the first
    * append commits against the null-form main assert), v3 tables
    * initialized with next-row-id 0. 409 on duplicates. */
  private def createTable(ns: String, body: String): (Int, String) =
    synchronized {
      if (!nss.contains(ns))
        return (404, """{"error":{"message":"NoSuchNamespace","type":""" +
          """"NoSuchNamespaceException","code":404}}""")
      val req = parse(body)
      val name = (req \ "name").extract[String]
      if (tabs.contains((ns, name)))
        return (409, """{"error":{"message":"Table already exists",""" +
          """"type":"AlreadyExistsException","code":409}}""")
      val fmtVersion = (req \ "properties" \ "format-version")
        .extractOpt[String].map(_.toInt).getOrElse(2)
      val loc = (req \ "location").extractOpt[String]
        .orElse(warehouse.map(w =>
          s"${w.stripSuffix("/")}/${ns.replace("\u001f", "/")}/$name"))
        .getOrElse(return (400,
          """{"error":{"message":"no location in request and no """ +
            """warehouse default","type":"BadRequest","code":400}}"""))
      val schemaJ = (req \ "schema") match {
        case JNothing => return (400,
          """{"error":{"message":"CreateTableRequest needs a schema",""" +
            """"type":"BadRequest","code":400}}""")
        case sch => replaceFields(sch, List(
          "schema-id" -> JInt(0), "type" -> JString("struct")))
      }
      // max over EVERY id the schema carries — nested struct leaves and
      // collection element/key/value slots included, like a real
      // catalog (a top-level-only max would hand later column adds an
      // id a nested leaf already owns)
      val lastColId = math.max(
        (schemaJ \ "fields").children
          .flatMap(f => (f \ "id").extractOpt[Int]).foldLeft(0)(math.max),
        graft.iceberg.IcebergImport
          .nestedIdsJ((schemaJ \ "fields").children)
          .keys.foldLeft(0)(math.max))
      val specJ = (req \ "partition-spec") match {
        case JNothing =>
          (("spec-id" -> 0) ~ ("fields" -> JArray(Nil))): JValue
        case sp => replaceFields(sp, List("spec-id" -> JInt(0)))
      }
      val lastPartId = (specJ \ "fields").children
        .flatMap(f => (f \ "field-id").extractOpt[Int])
        .foldLeft(999)(math.max)
      val meta: JValue =
        ("format-version" -> fmtVersion) ~
          ("table-uuid" -> java.util.UUID.nameUUIDFromBytes(
            s"$ns.$name".getBytes(StandardCharsets.UTF_8)).toString) ~
          ("location" -> loc) ~
          ("last-sequence-number" -> 0L) ~
          ("last-updated-ms" -> System.currentTimeMillis()) ~
          ("last-column-id" -> lastColId) ~
          ("current-schema-id" -> 0) ~
          ("schemas" -> JArray(List(schemaJ))) ~
          ("default-spec-id" -> 0) ~
          ("partition-specs" -> JArray(List(specJ))) ~
          ("last-partition-id" -> lastPartId) ~
          ("default-sort-order-id" -> 0) ~
          ("sort-orders" -> JArray(List(
            (("order-id" -> 0) ~ ("fields" -> JArray(Nil))): JValue))) ~
          ("properties" -> JObject(Nil)) ~
          ("current-snapshot-id" -> -1L) ~
          ("refs" -> JObject(Nil)) ~
          ("snapshots" -> JArray(Nil)) ~
          ("snapshot-log" -> JArray(Nil)) ~
          ("metadata-log" -> JArray(Nil))
      val withRowId: JValue =
        if (fmtVersion >= 3)
          replaceFields(meta, List("next-row-id" -> JLong(0L)))
        else meta
      val metaDir = new File(loc, "metadata")
      metaDir.mkdirs()
      val f = new File(metaDir,
        f"${System.nanoTime()}%020d-rest.metadata.json")
      Files.write(f.toPath,
        compact(render(withRowId)).getBytes(StandardCharsets.UTF_8))
      tabs((ns, name)) = f.getAbsolutePath
      (200, compact(render(
        ("metadata-location" -> f.getAbsolutePath) ~
          ("metadata" -> withRowId))))
    }

  private def replaceFields(meta: JValue,
      fields: List[JField]): JValue = {
    val names = fields.map(_._1).toSet
    JObject(meta.asInstanceOf[JObject].obj
      .filterNot(f => names(f._1)) ++ fields)
  }

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val post = ex.getRequestMethod == "POST"
    def reqBody: String = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    val header = Option(ex.getRequestHeaders.getFirst("Authorization"))
    val staticOk = requiredToken.exists(t => header.contains(s"Bearer $t"))
    val issuedOk = oauthClient.isDefined && header.exists { h =>
      val t = h.stripPrefix("Bearer ")
      issued.get(t).exists(_ > System.currentTimeMillis())
    }
    val authorized =
      if (requiredToken.isEmpty && oauthClient.isEmpty) true
      else staticOk || issuedOk
    val delete = ex.getRequestMethod == "DELETE"
    val TablesRe = "/v1/namespaces/([^/]+)/tables".r
    val TableRe = "/v1/namespaces/([^/]+)/tables/([^/]+)".r
    val NsRe = "/v1/namespaces/([^/]+)".r
    val (code, body) =
      // the token endpoint itself is pre-auth by definition
      if (path == "/v1/oauth/tokens" && post) {
        oauthClient match {
          case None =>
            (404, """{"error":{"message":"token endpoint disabled",""" +
              """"type":"NotFound","code":404}}""")
          case Some((cid, secret)) =>
            val form = reqBody.split('&').flatMap { kv =>
              val i = kv.indexOf('=')
              if (i < 0) None
              else Some(java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
                java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8"))
            }.toMap
            if (form.get("grant_type") != Some("client_credentials"))
              (400, """{"error":"unsupported_grant_type"}""")
            else if (form.get("client_id") != Some(cid) ||
                form.get("client_secret") != Some(secret))
              (401, """{"error":"invalid_client"}""")
            else {
              val t = java.util.UUID.randomUUID().toString
              issued(t) = System.currentTimeMillis() +
                tokenTtlSeconds * 1000
              (200, s"""{"access_token":"$t","token_type":"bearer",""" +
                s""""expires_in":$tokenTtlSeconds}""")
            }
        }
      }
      else if (!authorized)
        (401, """{"error":{"message":"Not authorized","type":""" +
          """"NotAuthorizedException","code":401}}""")
      else if (path == "/v1/config")
        (200, """{"defaults":{},"overrides":{}}""")
      else if (path == "/v1/namespaces" && post) {
        val nsName = (parse(reqBody) \ "namespace").children
          .map(_.extract[String]).mkString("\u001f")
        if (nsName.isEmpty)
          (400, """{"error":{"message":"empty namespace","type":""" +
            """"BadRequest","code":400}}""")
        else if (nss.putIfAbsent(nsName, ()).isDefined)
          (409, """{"error":{"message":"Namespace already exists",""" +
            """"type":"AlreadyExistsException","code":409}}""")
        else (200, compact(render(
          ("namespace" -> nsName.split('\u001f').toList) ~
            ("properties" -> JObject(Nil)))))
      } else if (path == "/v1/namespaces") {
        val (page, next) = paginate(nss.keys.toList.sorted,
          pageOffset(ex))
        val body0: JValue = ("namespaces" -> JArray(page.map(n =>
          JArray(n.split('\u001f').map(JString(_): JValue).toList)
            : JValue)))
        (200, compact(render(next.map(t =>
          body0 merge (("next-page-token" -> t): JValue))
          .getOrElse(body0))))
      }
      else if (path == "/v1/transactions/commit" && post) synchronized {
        // CommitTransactionRequest: ALL members' requirements checked
        // against current state FIRST; only when every check passes are
        // the members applied (each through the single-table path,
        // reentrant under this lock) — a failure applies NOTHING
        val req = parse(reqBody)
        val members = (req \ "table-changes").children.map { tc =>
          val id = tc \ "identifier"
          val key = ((id \ "namespace").children
            .map(_.extract[String]).mkString(""),
            (id \ "name").extract[String])
          (key, tc)
        }
        if (members.isEmpty)
          (400, """{"error":{"message":"empty transaction","type":""" +
            """"BadRequest","code":400}}""")
        else if (members.exists(m => !tabs.contains(m._1)))
          (404, """{"error":{"message":"NoSuchTable","type":""" +
            """"NoSuchTableException","code":404}}""")
        else if (members.exists { case (key, tc) =>
          reqConflict(readMeta(tabs(key)), tc) })
          (409, """{"error":{"message":"Requirement failed on a """ +
            """transaction member: no table moved","type":""" +
            """"CommitFailedException","code":409}}""")
        else if (members.map(_._1).distinct.size != members.size)
          // two members naming the SAME table cannot both pass their
          // asserts against one pre-state — refuse up front instead of
          // half-applying
          (400, """{"error":{"message":"duplicate table in """ +
            """transaction members","type":"BadRequest","code":400}}""")
        else {
          // apply with pointer rollback: if any member still fails in
          // commitAt, restore EVERY member's metadata pointer — the
          // observable catalog state stays all-or-nothing (files a
          // half-applied member wrote become orphans, exactly like an
          // aborted single-table commit)
          val saved = members.map(m => m._1 -> tabs(m._1))
          try {
            members.foreach { case (key, tc) =>
              val (c, b) = commitAt(key, compact(render(tc)))
              require(c == 200,
                s"transaction member $key failed post-check: $c $b")
            }
            (200, "{}")
          } catch {
            case e: Throwable =>
              saved.foreach { case (k, v) => tabs(k) = v }
              (409, """{"error":{"message":"transaction aborted, no """ +
                """table moved","type":"CommitFailedException",""" +
                """"code":409}}""")
          }
        }
      }
      else if (path == "/v1/tables/rename" && post) synchronized {
        // the spec's rename route: only the catalog's name -> table
        // binding moves; metadata/history/data untouched
        val req = parse(reqBody)
        def key(j: JValue): (String, String) =
          ((j \ "namespace").children.map(_.extract[String])
            .mkString("\u001f"), (j \ "name").extract[String])
        val src = key(req \ "source")
        val dst = key(req \ "destination")
        if (!tabs.contains(src))
          (404, """{"error":{"message":"NoSuchTable","type":""" +
            """"NoSuchTableException","code":404}}""")
        else if (!nss.contains(dst._1))
          (404, """{"error":{"message":"NoSuchNamespace","type":""" +
            """"NoSuchNamespaceException","code":404}}""")
        else if (tabs.contains(dst))
          (409, """{"error":{"message":"Table already exists",""" +
            """"type":"AlreadyExistsException","code":409}}""")
        else {
          tabs(dst) = tabs.remove(src).get
          (200, "{}")
        }
      }
      else path match {
        case TableRe(ns, tbl) if delete =>
          // drop: the catalog forgets the binding; no file is purged
          // (shared-tree contract — same as expire's)
          if (tabs.remove((ns, tbl)).isDefined) (204, "")
          else (404, """{"error":{"message":"NoSuchTable","type":""" +
            """"NoSuchTableException","code":404}}""")
        case NsRe(ns) if delete =>
          if (!nss.contains(ns))
            (404, """{"error":{"message":"NoSuchNamespace","type":""" +
              """"NoSuchNamespaceException","code":404}}""")
          else if (tabs.keys.exists(_._1 == ns))
            (409, """{"error":{"message":"Namespace is not empty",""" +
              """"type":"NamespaceNotEmptyException","code":409}}""")
          else { nss.remove(ns); (204, "") }
        case TableRe(ns, tbl) if tabs.contains((ns, tbl)) =>
          if (post) commitAt((ns, tbl), reqBody)
          else (200, compact(render(
            ("metadata-location" -> tabs((ns, tbl))) ~
              ("metadata" -> readMeta(tabs((ns, tbl)))))))
        case TablesRe(ns) if post => createTable(ns, reqBody)
        case TablesRe(ns) if nss.contains(ns) =>
          val (page, next) = paginate(
            tabs.keys.filter(_._1 == ns).map(_._2).toList.sorted,
            pageOffset(ex))
          val body0: JValue = ("identifiers" -> JArray(page.map(t =>
            ((("namespace" -> JArray(ns.split('\u001f')
              .map(JString(_): JValue).toList)) ~
              ("name" -> t)): JValue))))
          (200, compact(render(next.map(tok =>
            body0 merge (("next-page-token" -> tok): JValue))
            .getOrElse(body0))))
        case _ =>
          (404, """{"error":{"message":"NoSuchTable",
            |"type":"NoSuchTableException","code":404}}""".stripMargin)
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    if (bytes.isEmpty) ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    }
    ex.close()
  }
}
