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

  /** Resolve a dotted `namespace.table` identifier to the table's
    * current `metadata-location`. The last dot splits table from
    * namespace; deeper namespaces join with the spec's 0x1F unit
    * separator in the URL. Fails loud on HTTP errors (404 = no such
    * table / namespace) and on a response without a location. */
  def loadTableMetadataLocation(catalogUri: String,
      identifier: String): String = {
    val parts = identifier.split('.')
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"catalog table identifier must be namespace.table, " +
        s"got '$identifier'")
    val base = catalogUri.stripSuffix("/")
    val pfx = prefix(base).map(p => s"/$p").getOrElse("")
    val ns = URLEncoder.encode(parts.init.mkString("\u001f"), "UTF-8")
    val tbl = URLEncoder.encode(parts.last, "UTF-8")
    val res: JValue = parse(httpGet(
      s"$base/v1$pfx/namespaces/$ns/tables/$tbl"))
    (res \ "metadata-location").extractOpt[String].getOrElse(
      throw new IllegalStateException(
        s"REST catalog returned no metadata-location for $identifier " +
          s"(staged-create entries cannot be read)"))
  }
}
