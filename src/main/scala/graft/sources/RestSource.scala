package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.Instant

/** S5: the raw-zone REST ingestor (SURVEY.md §2.1;
  * /root/reference/raw/ingestors.py:22-42): GET `{url}/{endpoint}` with
  * headers, stamp `loaded_at` and `asset_type` onto each payload
  * document, land the result as a JSON-lines file in the raw zone for
  * the schema-enforced S1 scan to pick up.
  *
  * Deliberately driver-side and OUT of the query engine proper — raw
  * acquisition is I/O orchestration, not a distributed operator. The
  * transport is injectable so tests (and this zero-egress environment)
  * run against a fake; the default is java.net.http.
  */
final case class RestEndpoint(
    baseUrl: String,
    endpoint: String,
    headers: Map[String, String],
    assetType: String)

class RestSource(transport: RestEndpoint => String = RestSource.httpTransport,
                 now: () => Instant = () => Instant.now()) {

  /** Fetch one endpoint and land it as `<rawRoot>/<schema>/<table>/
    * <timestamp>.json`. The payload may be a JSON object (landed as one
    * line) or a JSON array (landed as one line per element — the
    * JSON-lines shape Spark's JSON source expects). Each document gets
    * `loaded_at` (ISO-8601, the fetch time — reference stamps
    * source-side, raw/ingestors.py:36) and `asset_type` injected.
    */
  def land(ep: RestEndpoint, rawRoot: String, schema: String, table: String): String = {
    val body = transport(ep).trim
    val stamp = now()
    val docs: Seq[String] = splitTopLevel(body).map(injectFields(_, stamp, ep.assetType))
    val dir = Paths.get(rawRoot, schema, table)
    Files.createDirectories(dir)
    val file = dir.resolve(s"${stamp.toEpochMilli}.json")
    Files.writeString(file, docs.mkString("\n"))
    file.toString
  }

  /** Top-level JSON array → elements; anything else → single document. */
  private[sources] def splitTopLevel(body: String): Seq[String] = {
    if (!body.startsWith("[")) return Seq(body)
    val inner = body.substring(1, body.lastIndexOf(']'))
    // split on top-level commas (string- and nesting-aware)
    val out = Seq.newBuilder[String]
    var depth = 0
    var inString = false
    var escaped = false
    val current = new StringBuilder
    inner.foreach { c =>
      if (escaped) { escaped = false; current += c }
      else if (inString) {
        if (c == '\\') escaped = true else if (c == '"') inString = false
        current += c
      } else c match {
        case '"' => inString = true; current += c
        case '{' | '[' => depth += 1; current += c
        case '}' | ']' => depth -= 1; current += c
        case ',' if depth == 0 =>
          if (current.toString.trim.nonEmpty) out += current.toString.trim
          current.clear()
        case _ => current += c
      }
    }
    if (current.toString.trim.nonEmpty) out += current.toString.trim
    out.result()
  }

  /** Inject loaded_at + asset_type as the first fields of a JSON object
    * document (non-objects are wrapped under "value").
    */
  private[sources] def injectFields(doc: String, at: Instant, assetType: String): String = {
    val fields = s""""loaded_at": "${at.toString}", "asset_type": "${assetType}""""
    val t = doc.trim
    if (t.startsWith("{")) s"{$fields, ${t.substring(1).trim}".replaceFirst(",\\s*}$", "}")
    else s"""{$fields, "value": $t}"""
  }
}

object RestSource {
  /** Default transport: blocking GET via java.net.http. */
  def httpTransport(ep: RestEndpoint): String = {
    val builder = HttpRequest.newBuilder(URI.create(s"${ep.baseUrl}/${ep.endpoint}"))
    ep.headers.foreach { case (k, v) => builder.header(k, v) }
    HttpClient.newHttpClient()
      .send(builder.GET().build(), HttpResponse.BodyHandlers.ofString())
      .body()
  }
}
