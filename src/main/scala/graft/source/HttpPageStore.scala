package graft.source

/** HTTP transport for the SRI source (S1 + X5).
  *
  * Reference behavior (client.js:1485-1522): walk `$$meta.next` links
  * sequentially; fall back to offset pagination when next links are
  * broken; retry failed requests. Here the next-link walk happens once at
  * PLAN time (driver) to enumerate page URLs — executors then fetch pages
  * in parallel, one `InputPartition` each. For APIs with working offset
  * pagination, [[offsetPages]] skips the walk entirely (the
  * `nextLinksBroken` mode) and enumeration is free.
  *
  * `fetchFn` is injectable so the walk/retry logic is testable offline;
  * the default uses HttpURLConnection (no third-party deps).
  */
final class HttpPageStore(
    firstPageUrl: String,
    fetchFn: String => String = HttpPageStore.httpGet,
    maxRetries: Int = 3,
    retryBackoffMs: Long = 1000,
    sleepFn: Long => Unit = Thread.sleep) extends PageStore {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // bodies downloaded during the next-link walk, handed to
  // planInputPartitions via cachedBody so each page crosses the wire once
  @transient private lazy val walked =
    scala.collection.concurrent.TrieMap[String, String]()

  override def listPages(): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer[String]()
    var url: String = firstPageUrl
    while (url != null) {
      pages += url
      val b = fetch(url)
      walked.put(url, b)
      val next = mapper.readTree(b).path("$$meta").path("next")
      url = if (next.isMissingNode || next.isNull) null
      else resolve(firstPageUrl, next.asText())
    }
    pages.toSeq
  }

  override def cachedBody(page: String): Option[String] = walked.get(page)

  override def fetch(page: String): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= maxRetries) {
      try return fetchFn(page)
      catch {
        case e: Throwable =>
          last = e; attempt += 1
          if (attempt <= maxRetries) sleepFn(retryBackoffMs * attempt)
      }
    }
    throw new java.io.IOException(
      s"fetch failed after ${maxRetries + 1} attempts: $page", last)
  }

  /** Resolve a possibly-relative next link against the first page's
    * scheme+host (SRI next links are usually host-relative). */
  private def resolve(base: String, next: String): String =
    if (next.startsWith("http")) next
    else {
      val u = java.net.URI.create(base)
      s"${u.getScheme}://${u.getAuthority}$next"
    }
}

object HttpPageStore {
  /** Offset-based enumeration for the reference's `nextLinksBroken` mode:
    * page URLs are computable without any fetch. */
  def offsetPages(basePath: String, limit: Int, total: Long): Seq[String] = {
    val sep = if (basePath.contains("?")) "&" else "?"
    (0L until total by limit.toLong)
      .map(off => s"$basePath${sep}limit=$limit&offset=$off")
  }

  def httpGet(url: String): String = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(60000) // reference default, client.js:109-110
    conn.setReadTimeout(60000)
    conn.setRequestProperty("Accept", "application/json")
    try {
      val code = conn.getResponseCode
      if (code >= 400) throw new java.io.IOException(s"HTTP $code for $url")
      new String(conn.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
    } finally conn.disconnect()
  }
}
