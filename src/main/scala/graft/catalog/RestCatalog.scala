package graft.catalog

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

import org.json4s.{DefaultFormats, Formats, JValue}
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

  private def httpGet(uri: String): String = {
    val conn = new URI(uri).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.setRequestProperty("Accept", "application/json")
    try {
      val code = conn.getResponseCode
      val stream = if (code < 400) conn.getInputStream
        else Option(conn.getErrorStream).getOrElse(conn.getInputStream)
      val body = new String(stream.readAllBytes(), StandardCharsets.UTF_8)
      require(code == 200,
        s"REST catalog GET $uri failed: HTTP $code — ${body.take(500)}")
      body
    } finally conn.disconnect()
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
      requirements: Seq[JValue], updates: Seq[JValue]): Option[String] = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    val body = compact(render(
      ("requirements" -> org.json4s.JArray(requirements.toList)) ~
        ("updates" -> org.json4s.JArray(updates.toList))))
    val uri = tableRoute(catalogUri, identifier)
    val conn = new URI(uri).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setRequestProperty("Accept", "application/json")
    try {
      val out = conn.getOutputStream
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val code = conn.getResponseCode
      val stream = if (code < 400) conn.getInputStream
        else Option(conn.getErrorStream).getOrElse(conn.getInputStream)
      val resp = new String(stream.readAllBytes(),
        StandardCharsets.UTF_8)
      if (code == 409) throw new IllegalStateException(
        s"REST catalog commit to $identifier conflicted (HTTP 409) — " +
          "a concurrent commit won; re-read the table and retry: " +
          resp.take(300))
      require(code == 200, s"REST catalog commit POST $uri failed: " +
        s"HTTP $code — ${resp.take(500)}")
      (parse(resp) \ "metadata-location").extractOpt[String]
    } finally conn.disconnect()
  }
}
