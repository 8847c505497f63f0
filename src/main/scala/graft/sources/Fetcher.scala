package graft.sources

import graft.store.BlobStore

/** The engine's fetch boundary — the reference's cache-miss -> GET ->
  * bytes contract with failure -> None (core_local/azure_common_scrapers
  * .py:35-64 fetch_excel_from_url, azure_fred_scraper.py:62-128): a failed
  * download returns None, the dataset records an error status, and the run
  * CONTINUES with the other datasets. Injectable so pipelines are testable
  * without a network and runnable in a zero-egress sandbox. */
trait Fetcher {
  /** The payload at `url`, or None after exhausting retries. */
  def fetch(url: String): Option[Array[Byte]]
}

/** Production HTTP implementation over java.net.http (JDK built-in): GET
  * with timeout, up to `maxRetries` attempts with linear backoff on
  * 5xx/429/connect failures (the reference's requests.get retry shape),
  * None on any terminal failure — the caller records the per-dataset
  * error status and moves on. 4xx (other than 429) is terminal
  * immediately: a wrong URL can't be fixed by retrying. */
final class HttpFetcher(timeoutSecs: Int = 30, maxRetries: Int = 3,
                        backoffMs: Long = 500) extends Fetcher {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSecs.toLong))
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  def fetch(url: String): Option[Array[Byte]] = {
    // a malformed or non-HTTP URL can never succeed: terminal None, not a
    // throw (the trait contract is bytes-or-None; callers key error
    // statuses on it). Scheme-less URLs parse as relative URIs, which
    // HttpRequest.newBuilder rejects — catch that class here too.
    val uri =
      try {
        val u = java.net.URI.create(url)
        if (u.getScheme != "http" && u.getScheme != "https") return None
        u
      } catch { case _: IllegalArgumentException => return None }
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      try {
        val req = java.net.http.HttpRequest.newBuilder(uri)
          .timeout(java.time.Duration.ofSeconds(timeoutSecs.toLong))
          .GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        val code = resp.statusCode()
        if (code == 200) return Some(resp.body())
        if (code < 500 && code != 429) return None
        // the backoff sleep lives INSIDE the try: an interrupt during it
        // must also resolve to None, not escape the contract
        if (attempt < maxRetries) Thread.sleep(backoffMs * attempt)
      } catch {
        case _: java.io.IOException =>
          try { if (attempt < maxRetries) Thread.sleep(backoffMs * attempt) }
          catch { case _: InterruptedException =>
            Thread.currentThread().interrupt(); return None
          }
        case _: InterruptedException =>
          Thread.currentThread().interrupt(); return None
      }
    }
    None
  }
}

/** Cache-backed fetcher — the scrapers' bronze landing zone
  * (azure_common_scrapers.py:35-64): serve from the blob cache if present,
  * else delegate and write through. A None from the delegate is NOT
  * cached, so the next run retries the fetch instead of replaying the
  * failure. The cached payload lands as a regular blob file, readable by
  * the grid sources directly (`BlobStore.path`-rooted). */
final class CachedFetcher(blobs: BlobStore, delegate: Fetcher) extends Fetcher {
  def fetch(url: String): Option[Array[Byte]] = {
    val key = CachedFetcher.cacheKey(url)
    blobs.download(key).orElse {
      val d = delegate.fetch(url)
      d.foreach(blobs.upload(key, _))
      d
    }
  }
}

object CachedFetcher {
  /** Blob name for a URL: short md5 of the full URL + basename — two
    * distinct URLs sharing a basename must not collide in the cache. */
  def cacheKey(url: String): String = {
    val base = url.split('/').last.takeWhile(c => c != '?' && c != '#')
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(url.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"cache_${md}_$base"
  }
}
