package graft.catalog

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

import org.json4s.{DefaultFormats, Formats, JArray, JNothing, JObject, JString, JValue}
import org.json4s.jackson.JsonMethods.parse

/** Minimal client for the Apache Iceberg REST catalog protocol
  * (rest-catalog-open-api.yaml, the published OpenAPI spec) — the
  * production integration seam the reference assumes via its managed
  * catalog (`/root/reference/raw-bronze.py:104-109`,
  * `bronze-silver.py:60-72`: every engine resolves `(namespace, table)
  * → current metadata location` through a shared catalog, then walks
  * the tree itself). graft implements exactly that resolution step:
  *
  *   - `GET {uri}/v1/config` — catalog config; an advertised `prefix`
  *     (override wins over default) is spliced into subsequent routes;
  *   - `GET {uri}/v1/{prefix}/namespaces/{ns}/tables/{table}` —
  *     LoadTableResult; its `metadata-location` is the read handle.
  *
  * The returned location feeds [[graft.iceberg.IcebergImport]]
  * verbatim (an explicit `.metadata.json` path pins that exact
  * version — honoring catalog-side rollbacks that a
  * latest-file-in-directory scan would miss). Multi-level namespaces
  * use the spec's `%1F` unit separator in the URL path. Everything is
  * JDK-only (HttpURLConnection) and endpoint-agnostic, so tests run
  * it against an in-process loopback server with zero egress. */
object RestCatalog {

  private implicit val fmts: Formats = DefaultFormats

  /** Response body for a finished exchange. On error codes where the
    * server sent no body `getErrorStream` is null — fall back to an
    * EMPTY body, never `getInputStream`: that call throws a raw
    * IOException for >=400 responses and would mask the HTTP status
    * the caller's require() message reports. */
  private def responseBody(conn: HttpURLConnection, code: Int): String = {
    val stream = if (code < 400) Option(conn.getInputStream)
      else Option(conn.getErrorStream)
    stream.map(s => new String(s.readAllBytes(), StandardCharsets.UTF_8))
      .getOrElse("")
  }

  private def httpGet(uri: String): String = {
    val (code, body) = retry401(uri) {
      val conn = new URI(uri).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("Accept", "application/json")
      bearer(uri).foreach(t =>
        conn.setRequestProperty("Authorization", s"Bearer $t"))
      try {
        val code = conn.getResponseCode
        (code, responseBody(conn, code))
      } finally conn.disconnect()
    }
    require(code == 200,
      s"REST catalog GET $uri failed: HTTP $code — ${body.take(500)}")
    body
  }

  // ---- bearer-token seam (production catalogs authenticate; the open
  // protocol's simplest scheme is a static `Authorization: Bearer`
  // header). One registration per catalog base URI — header-only, no
  // token ever logged; tests exercise it against the loopback server
  // with zero egress. ----
  private val tokens =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register (or clear, with None) the bearer token sent with every
    * request to `catalogUri`. */
  def setBearerToken(catalogUri: String, token: Option[String]): Unit = {
    val key = catalogUri.stripSuffix("/")
    token match {
      case Some(t) => tokens.put(key, t)
      case None => tokens.remove(key)
    }
  }

  /** The registered token for the catalog that owns `uri`, if any —
    * longest registered base-URI prefix wins. A prefix only matches at
    * a PATH boundary (uri == base, or base + '/...'): a raw
    * startsWith would leak catalog A's credential to
    * `http://host:8080` when A registered `http://host:80`, or to
    * `/cat2` when A registered `/cat`. A static token beats OAuth
    * credentials registered for the same base (explicit wins). */
  private def bearer(uri: String): Option[String] =
    matchBase(tokens, uri).map(_._2)
      .orElse(oauthTokenFor(uri))

  private def matchBase[V](
      m: java.util.concurrent.ConcurrentHashMap[String, V],
      uri: String): Option[(String, V)] = {
    import scala.jdk.CollectionConverters._
    m.asScala.filter { case (base, _) =>
      uri == base || uri.startsWith(base + "/") }
      .toSeq.sortBy(-_._1.length).headOption
  }

  // ---- OAuth2 client-credentials seam (the spec's token endpoint,
  // `POST /v1/oauth/tokens` with grant_type=client_credentials) — what
  // production REST catalogs actually speak. The token is cached per
  // catalog base until shortly before its advertised expiry; any 401
  // on a data route invalidates the cache and the request retries ONCE
  // with a fresh token ([[retry401]]). Credentials are header-only and
  // never logged. ----
  private case class OAuthCreds(clientId: String, clientSecret: String,
      scope: Option[String])
  private val oauthCreds =
    new java.util.concurrent.ConcurrentHashMap[String, OAuthCreds]()
  // base -> (access token, expiry epoch millis; 0 = no expiry)
  private val oauthTokens =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** Register OAuth2 client credentials for `catalogUri`; every request
    * to that base then carries a client-credentials bearer token,
    * fetched lazily and refreshed on expiry or 401. */
  def setOAuthCredentials(catalogUri: String, clientId: String,
      clientSecret: String, scope: Option[String] = None): Unit =
    oauthCreds.put(catalogUri.stripSuffix("/"),
      OAuthCreds(clientId, clientSecret, scope))

  /** Forget `catalogUri`'s OAuth credentials and any cached token. */
  def clearOAuthCredentials(catalogUri: String): Unit = {
    val key = catalogUri.stripSuffix("/")
    oauthCreds.remove(key)
    oauthTokens.remove(key)
  }

  private def oauthTokenFor(uri: String): Option[String] =
    matchBase(oauthCreds, uri).map { case (base, creds) =>
      Option(oauthTokens.get(base))
        .filter { case (_, exp) =>
          exp == 0L || System.currentTimeMillis() < exp }
        .map(_._1)
        .getOrElse(fetchOAuthToken(base, creds))
    }

  /** `POST {base}/v1/oauth/tokens` (form-encoded, per RFC 6749 §4.4 as
    * published in the catalog OpenAPI spec); caches and returns the
    * access token. 60 s of safety margin on the advertised expiry so a
    * token never goes stale mid-request. */
  private def fetchOAuthToken(base: String, creds: OAuthCreds): String = {
    def enc(s: String) = URLEncoder.encode(s, "UTF-8")
    val form = Seq(
      "grant_type" -> "client_credentials",
      "client_id" -> creds.clientId,
      "client_secret" -> creds.clientSecret) ++
      creds.scope.map("scope" -> _)
    val body = form.map { case (k, v) => s"${enc(k)}=${enc(v)}" }
      .mkString("&")
    val conn = new URI(s"$base/v1/oauth/tokens").toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type",
      "application/x-www-form-urlencoded")
    conn.setRequestProperty("Accept", "application/json")
    val (code, resp) = try {
      val out = conn.getOutputStream
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val c = conn.getResponseCode
      (c, responseBody(conn, c))
    } finally conn.disconnect()
    require(code == 200, s"OAuth token request to $base failed: " +
      s"HTTP $code — ${resp.take(500)}")
    val j = parse(resp)
    val token = (j \ "access_token").extractOpt[String].getOrElse(
      throw new IllegalStateException(
        s"OAuth token response from $base carried no access_token"))
    val expiry = (j \ "expires_in").extractOpt[Long]
      .map(s => System.currentTimeMillis() + math.max(0L, s - 60) * 1000)
      .getOrElse(0L)
    oauthTokens.put(base, (token, expiry))
    token
  }

  /** Run one HTTP attempt; on a 401 with OAuth credentials registered
    * for this uri, drop the cached token and retry ONCE (the second
    * attempt's [[bearer]] fetches fresh) — the client behavior the
    * protocol expects when a token expires server-side before the
    * client's own expiry margin fires. Static-token and unauthenticated
    * setups return the 401 untouched. */
  private def retry401(uri: String)(exchange: => (Int, String))
      : (Int, String) = {
    val first = exchange
    if (first._1 != 401) first
    else matchBase(oauthCreds, uri) match {
      case None => first
      case Some((base, _)) =>
        oauthTokens.remove(base)
        exchange
    }
  }

  /** The catalog's advertised route prefix, if any (`overrides` beats
    * `defaults`, per the config endpoint's merge contract). */
  private def prefix(catalogUri: String): Option[String] = {
    val cfg = parse(httpGet(s"${catalogUri.stripSuffix("/")}/v1/config"))
    (cfg \ "overrides" \ "prefix").extractOpt[String]
      .orElse((cfg \ "defaults" \ "prefix").extractOpt[String])
      .filter(_.nonEmpty)
  }

  /** The spec's table route for a dotted identifier: the last dot
    * splits table from namespace; deeper namespaces join with the
    * spec's 0x1F unit separator in the URL. */
  private def tableRoute(catalogUri: String,
      identifier: String): String = {
    val parts = identifier.split('.')
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"catalog table identifier must be namespace.table, " +
        s"got '$identifier'")
    val base = catalogUri.stripSuffix("/")
    val pfx = prefix(base).map(p => s"/$p").getOrElse("")
    val ns = URLEncoder.encode(parts.init.mkString("\u001f"), "UTF-8")
    val tbl = URLEncoder.encode(parts.last, "UTF-8")
    s"$base/v1$pfx/namespaces/$ns/tables/$tbl"
  }

  /** Resolve a dotted `namespace.table` identifier to the table's
    * current `metadata-location`. Fails loud on HTTP errors (404 = no
    * such table / namespace) and on a response without a location. */
  def loadTableMetadataLocation(catalogUri: String,
      identifier: String): String = {
    val res: JValue = parse(httpGet(tableRoute(catalogUri, identifier)))
    (res \ "metadata-location").extractOpt[String].getOrElse(
      throw new IllegalStateException(
        s"REST catalog returned no metadata-location for $identifier " +
          s"(staged-create entries cannot be read)"))
  }

  /** POST a JSON body; returns (status, response body). Shared by the
    * commit/create routes — 409 handling stays caller-specific. */
  private def httpPost(uri: String, body: String): (Int, String) =
    retry401(uri) {
      val conn = new URI(uri).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setRequestProperty("Accept", "application/json")
      bearer(uri).foreach(t =>
        conn.setRequestProperty("Authorization", s"Bearer $t"))
      try {
        val out = conn.getOutputStream
        try out.write(body.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        val code = conn.getResponseCode
        (code, responseBody(conn, code))
      } finally conn.disconnect()
    }

  private def nsRoute(catalogUri: String): String = {
    val base = catalogUri.stripSuffix("/")
    val pfx = prefix(base).map(p => s"/$p").getOrElse("")
    s"$base/v1$pfx/namespaces"
  }

  /** Create a namespace (`POST /v1/{prefix}/namespaces`) — the
    * multi-level form joins on '.'. `ifNotExists` turns the spec's 409
    * AlreadyExists into a no-op. Returns true when created. */
  def createNamespace(catalogUri: String, namespace: String,
      ifNotExists: Boolean = false): Boolean = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    require(namespace.nonEmpty, "namespace must be non-empty")
    val body = compact(render(
      ("namespace" -> namespace.split('.').toList) ~
        ("properties" -> JObject(Nil))))
    val (code, resp) = httpPost(nsRoute(catalogUri), body)
    if (code == 409 && ifNotExists) return false
    require(code == 200, s"REST catalog createNamespace $namespace " +
      s"failed: HTTP $code — ${resp.take(500)}")
    true
  }

  /** Drain a paginated list route: follow `next-page-token` until the
    * server stops sending one (the spec's opaque-token contract — the
    * client never interprets the token, only echoes it back). Production
    * catalogs paginate thousand-table namespaces; a client that reads
    * one page silently UNDERCOUNTS. */
  private def pagedList(uriBase: String, key: String): Seq[JValue] = {
    val out = Seq.newBuilder[JValue]
    var token: Option[String] = None
    var pages = 0
    var done = false
    while (!done) {
      val uri = token.map(t => uriBase +
        (if (uriBase.contains('?')) "&" else "?") +
        s"pageToken=${URLEncoder.encode(t, "UTF-8")}").getOrElse(uriBase)
      val res = parse(httpGet(uri))
      out ++= (res \ key).children
      token = (res \ "next-page-token").extractOpt[String]
        .filter(_.nonEmpty)
      done = token.isEmpty
      pages += 1
      require(pages <= 100000,
        s"runaway pagination on $uriBase (server keeps sending " +
          "next-page-token)")
    }
    out.result()
  }

  /** List namespaces (`GET /v1/{prefix}/namespaces`) as dotted names —
    * every page followed per the spec's pagination contract. */
  def listNamespaces(catalogUri: String): Seq[String] =
    pagedList(nsRoute(catalogUri), "namespaces").map(_.children
      .map(_.extract[String]).mkString("."))

  /** List a namespace's tables
    * (`GET /v1/{prefix}/namespaces/{ns}/tables`) as dotted
    * namespace.table identifiers. */
  def listTables(catalogUri: String, namespace: String): Seq[String] = {
    val ns = URLEncoder.encode(
      namespace.split('.').mkString("\u001f"), "UTF-8")
    pagedList(s"${nsRoute(catalogUri)}/$ns/tables", "identifiers")
      .map { id =>
        ((id \ "namespace").children.map(_.extract[String]) :+
          (id \ "name").extract[String]).mkString(".")
      }
  }

  /** Create a table catalog-first (`POST
    * /v1/{prefix}/namespaces/{ns}/tables`, the spec's
    * CreateTableRequest): the CATALOG creates and owns the initial
    * metadata (no snapshot — the first append commits against the
    * null-form main assert). `schemaJson`/`specJson` are the Iceberg
    * schema/partition-spec JSON objects; `location` is where the
    * catalog should root the table (omitted = server's warehouse
    * default). `ifNotExists` turns 409 AlreadyExists into a no-op
    * returning the EXISTING table's metadata-location. Returns the
    * metadata-location. */
  def createTable(catalogUri: String, identifier: String,
      schemaJson: JValue, specJson: Option[JValue] = None,
      location: Option[String] = None,
      formatVersion: Int = 2,
      ifNotExists: Boolean = false): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    val parts = identifier.split('.')
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"catalog table identifier must be namespace.table, " +
        s"got '$identifier'")
    val ns = URLEncoder.encode(parts.init.mkString("\u001f"), "UTF-8")
    val body = compact(render(
      ("name" -> parts.last) ~
        ("schema" -> schemaJson) ~
        ("partition-spec" -> specJson.getOrElse(
          (("spec-id" -> 0) ~ ("fields" -> JArray(Nil))): JValue)) ~
        ("location" -> location.map(JString(_): JValue)
          .getOrElse(JNothing: JValue)) ~
        ("properties" -> JObject(List(
          "format-version" -> JString(formatVersion.toString)))) ~
        ("stage-create" -> false)))
    val (code, resp) = httpPost(
      s"${nsRoute(catalogUri)}/$ns/tables", body)
    if (code == 409 && ifNotExists)
      return loadTableMetadataLocation(catalogUri, identifier)
    require(code == 200, s"REST catalog createTable $identifier " +
      s"failed: HTTP $code — ${resp.take(500)}")
    (parse(resp) \ "metadata-location").extractOpt[String].getOrElse(
      throw new IllegalStateException(
        s"createTable $identifier returned no metadata-location"))
  }

  /** HTTP DELETE; returns (status, body). */
  private def httpDelete(uri: String): (Int, String) =
    retry401(uri) {
      val conn = new URI(uri).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestMethod("DELETE")
      conn.setRequestProperty("Accept", "application/json")
      bearer(uri).foreach(t =>
        conn.setRequestProperty("Authorization", s"Bearer $t"))
      try {
        val code = conn.getResponseCode
        (code, responseBody(conn, code))
      } finally conn.disconnect()
    }

  /** Drop a table from the catalog
    * (`DELETE /v1/{prefix}/namespaces/{ns}/tables/{t}`). The catalog
    * forgets the table; data/metadata files are NOT purged here —
    * deliberate on a shared tree (other engines may hold pinned
    * snapshots; orphan cleanup is a separate manual concern, exactly
    * like expire's contract). `ifExists` turns 404 into a no-op.
    * Returns true when dropped. */
  def dropTable(catalogUri: String, identifier: String,
      ifExists: Boolean = false): Boolean = {
    val (code, resp) = httpDelete(tableRoute(catalogUri, identifier))
    if (code == 404 && ifExists) return false
    require(code == 200 || code == 204,
      s"REST catalog dropTable $identifier failed: HTTP $code — " +
        resp.take(500))
    true
  }

  /** Rename a table (`POST /v1/{prefix}/tables/rename` with the spec's
    * source/destination identifier pair). The table's metadata,
    * history and data are untouched — only the catalog's name → table
    * binding changes. Destination collisions 409 loud. */
  def renameTable(catalogUri: String, from: String, to: String): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    def identJson(id: String): JValue = {
      val parts = id.split('.')
      require(parts.length >= 2 && parts.forall(_.nonEmpty),
        s"catalog table identifier must be namespace.table, got '$id'")
      ("namespace" -> parts.init.toList) ~ ("name" -> parts.last)
    }
    val base = catalogUri.stripSuffix("/")
    val pfx = prefix(base).map(p => s"/$p").getOrElse("")
    val (code, resp) = httpPost(s"$base/v1$pfx/tables/rename",
      compact(render(("source" -> identJson(from)) ~
        ("destination" -> identJson(to)))))
    if (code == 409) throw new IllegalStateException(
      s"REST catalog rename $from -> $to conflicted (HTTP 409) — " +
        s"the destination already exists: ${resp.take(300)}")
    require(code == 200 || code == 204,
      s"REST catalog rename $from -> $to failed: HTTP $code — " +
        resp.take(500))
  }

  /** Drop an EMPTY namespace
    * (`DELETE /v1/{prefix}/namespaces/{ns}`); a namespace that still
    * holds tables 409s. Returns true when dropped ( false = 404 with
    * `ifExists`). */
  def dropNamespace(catalogUri: String, namespace: String,
      ifExists: Boolean = false): Boolean = {
    val ns = URLEncoder.encode(
      namespace.split('.').mkString("\u001f"), "UTF-8")
    val (code, resp) = httpDelete(s"${nsRoute(catalogUri)}/$ns")
    if (code == 404 && ifExists) return false
    if (code == 409) throw new IllegalStateException(
      s"REST catalog dropNamespace $namespace refused (HTTP 409) — " +
        s"namespace not empty: ${resp.take(300)}")
    require(code == 200 || code == 204,
      s"REST catalog dropNamespace $namespace failed: HTTP $code — " +
        resp.take(500))
    true
  }

  /** Commit to a catalog-owned table — the spec's `CommitTableRequest`
    * (`POST .../tables/{table}` with `requirements` + `updates`): the
    * CLIENT writes data files, manifests and the manifest list, the
    * CATALOG applies the updates and owns the metadata.json pointer
    * swap. `requirements` guard the read-check-write race exactly like
    * the filesystem rename does locally (`assert-ref-snapshot-id`): a
    * 409 means another committer won and maps to the same loud
    * "re-read and retry" contract. Returns the new metadata-location
    * when the catalog advertises one. */
  def commitTable(catalogUri: String, identifier: String,
      requirements: Seq[JValue], updates: Seq[JValue]): Option[String] =
    (commitTableFull(catalogUri, identifier, requirements, updates)
      \ "metadata-location").extractOpt[String]

  /** ATOMIC multi-table commit — the spec's
    * `POST /v1/{prefix}/transactions/commit` (CommitTransactionRequest:
    * a list of per-table changes, each with its own identifier,
    * requirements and updates). ALL tables commit or NONE does: a
    * requirement failure on any member 409s the whole transaction and
    * no table moves — the cross-table atomicity a single-table commit
    * loop cannot provide (a crash between loop iterations leaves
    * half-moved state). Returns nothing on success; the caller re-reads
    * each table through the catalog for the new handles. */
  def commitTransaction(catalogUri: String,
      changes: Seq[(String, Seq[JValue], Seq[JValue])]): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    require(changes.nonEmpty, "commitTransaction needs at least one table")
    val tableChanges = changes.map { case (identifier, reqs, ups) =>
      val parts = identifier.split('.')
      require(parts.length >= 2 && parts.forall(_.nonEmpty),
        s"catalog table identifier must be namespace.table, " +
          s"got '$identifier'")
      (("identifier" -> (("namespace" -> parts.init.toList) ~
        ("name" -> parts.last))) ~
        ("requirements" -> JArray(reqs.toList)) ~
        ("updates" -> JArray(ups.toList))): JValue
    }
    val base = catalogUri.stripSuffix("/")
    val pfx = prefix(base).map(p => s"/$p").getOrElse("")
    val (code, resp) = httpPost(s"$base/v1$pfx/transactions/commit",
      compact(render("table-changes" -> JArray(tableChanges.toList))))
    if (code == 409) throw new IllegalStateException(
      s"REST catalog transaction conflicted (HTTP 409) — a concurrent " +
        s"commit won on one of the member tables; NO table moved. " +
        s"Re-read and retry: ${resp.take(300)}")
    require(code == 200 || code == 204,
      s"REST catalog transaction failed: HTTP $code — ${resp.take(500)}")
  }

  /** [[commitTable]] returning the FULL parsed response (the spec's
    * CommitTableResponse carries the new `metadata` object too) — used
    * where the caller must inspect what the catalog actually applied,
    * e.g. the v3 row-lineage contract check in write-back publish. */
  def commitTableFull(catalogUri: String, identifier: String,
      requirements: Seq[JValue], updates: Seq[JValue]): JValue = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    val body = compact(render(
      ("requirements" -> org.json4s.JArray(requirements.toList)) ~
        ("updates" -> org.json4s.JArray(updates.toList))))
    val uri = tableRoute(catalogUri, identifier)
    val (code, resp) = httpPost(uri, body)
    if (code == 409) throw new IllegalStateException(
      s"REST catalog commit to $identifier conflicted (HTTP 409) — " +
        "a concurrent commit won; re-read the table and retry: " +
        resp.take(300))
    require(code == 200, s"REST catalog commit POST $uri failed: " +
      s"HTTP $code — ${resp.take(500)}")
    parse(resp)
  }
}
