package graft

import graft.config.Registry
import graft.pipeline.Runner
import graft.sources.{CachedFetcher, Fetcher, GridSource, HttpFetcher}
import graft.store.{BlobStore, TableStore}
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

/** The fetch boundary: HTTP retry/None-on-failure against a real localhost
  * server, the write-through blob cache, and the per-dataset error status
  * that lets a run continue past a dead source
  * (azure_common_scrapers.py:35-64, main_azure.py:136-152). */
class FetcherSpec extends SparkSuite {

  // ----------------------------------------------------------- HttpFetcher

  private def withServer(handler: com.sun.net.httpserver.HttpExchange => Unit)
                        (body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", ex => { handler(ex); ex.close() })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
                      code: Int, payload: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, if (payload.isEmpty) -1 else payload.length.toLong)
    if (payload.nonEmpty) ex.getResponseBody.write(payload)
  }

  test("HttpFetcher: 200 returns bytes; 5xx retries then succeeds") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      if (calls.incrementAndGet() < 3) respond(ex, 503, Array.empty)
      else respond(ex, 200, "payload".getBytes("UTF-8"))
    } { base =>
      val f = new HttpFetcher(timeoutSecs = 5, maxRetries = 3, backoffMs = 1)
      assert(f.fetch(s"$base/data.xls").map(new String(_, "UTF-8")) == Some("payload"))
      assert(calls.get() == 3)
    }
  }

  test("HttpFetcher: 404 is terminal (no retry); exhausted 5xx -> None") {
    val calls = new AtomicInteger(0)
    withServer { ex => calls.incrementAndGet(); respond(ex, 404, Array.empty) } { base =>
      assert(new HttpFetcher(5, 3, 1).fetch(s"$base/missing").isEmpty)
      assert(calls.get() == 1)
    }
    val calls5 = new AtomicInteger(0)
    withServer { ex => calls5.incrementAndGet(); respond(ex, 500, Array.empty) } { base =>
      assert(new HttpFetcher(5, 3, 1).fetch(s"$base/down").isEmpty)
      assert(calls5.get() == 3)
    }
  }

  test("HttpFetcher: connection refused -> None, not an exception") {
    // a port with no listener: every attempt fails at connect
    assert(new HttpFetcher(1, 2, 1).fetch("http://127.0.0.1:1/x").isEmpty)
  }

  test("HttpFetcher: malformed / scheme-less / non-http URLs -> None") {
    val f = new HttpFetcher(1, 1, 1)
    assert(f.fetch("ht tp://bad url").isEmpty)        // unparseable URI
    assert(f.fetch("example.com/I_AUTO.XLS").isEmpty) // relative, no scheme
    assert(f.fetch("ftp://example.com/f.xls").isEmpty) // unsupported scheme
  }

  // --------------------------------------------------------- CachedFetcher

  test("CachedFetcher: write-through cache, delegate called once; None not cached") {
    val blobs = new BlobStore(spark, Files.createTempDirectory("graft-fc").toString)
    val calls = new AtomicInteger(0)
    val delegate = new Fetcher {
      def fetch(url: String): Option[Array[Byte]] = {
        calls.incrementAndGet()
        if (url.endsWith("dead.xls")) None else Some(url.getBytes("UTF-8"))
      }
    }
    val f = new CachedFetcher(blobs, delegate)
    val u = "http://example.test/a/live.xls"
    assert(f.fetch(u).isDefined && calls.get() == 1)
    assert(f.fetch(u).isDefined && calls.get() == 1) // served from cache
    assert(blobs.exists(CachedFetcher.cacheKey(u)))
    val dead = "http://example.test/a/dead.xls"
    assert(f.fetch(dead).isEmpty && calls.get() == 2)
    assert(f.fetch(dead).isEmpty && calls.get() == 3) // failure NOT cached
    // same basename, different URL: distinct cache entries
    assert(CachedFetcher.cacheKey("http://a.test/x/data.xls") !=
      CachedFetcher.cacheKey("http://b.test/y/data.xls"))
  }

  // --------------------------------------------- per-dataset error status

  test("runFetched: failed fetch -> error status, run continues; summary mixed") {
    val dir = Files.createTempDirectory("graft-ff").toString
    val store = new TableStore(spark, dir)
    val runner = new Runner(spark, store,
      () => Timestamp.valueOf("2025-06-01 00:00:00"))
    val cfg = Registry.edbConfigs.find(_.name == "auto_sales").get
    val bytes = Files.readAllBytes(Paths.get("fixtures/edb_auto_sales.xls"))
    val stub = new Fetcher {
      def fetch(url: String): Option[Array[Byte]] =
        if (url.contains("auto_sales")) Some(bytes)
        else if (url.contains("broken")) // up-but-broken: 200 with HTML
          Some("<html>maintenance</html>".getBytes("UTF-8"))
        else None
    }
    val blobs = new BlobStore(spark, s"$dir/_blobs")
    val cached = new CachedFetcher(blobs, stub)
    def parse(b: Array[Byte]) = {
      val key = "staged_auto_sales.xls"
      blobs.upload(key, b)
      val grid = GridSource.readGrid(spark, s"$dir/_blobs/$key", cfg.dataLocation)
      GridSource.canonicalize(GridSource.processMonthly(grid, cfg), cfg)._1
    }
    val snake = Registry.snakeCase(cfg.valueColumn)
    val results = Seq(
      "http://edb.test/auto_sales.xls" -> cfg.tableName,
      "http://edb.test/gone.xls" -> "gonetable",
      "http://edb.test/broken.xls" -> "brokentable" // parse throws, run survives
    ).map { case (url, table) =>
      runner.runFetched(table, cached.fetch(url), parse, Seq(snake))
    }
    assert(results.map(_.status) == Seq("success", "error", "error"))
    assert(results.head.newRows == 119)
    assert(store.exists(cfg.tableName) &&
      !store.exists("gonetable") && !store.exists("brokentable"))
    // the mixed statuses flow through the run summary unchanged
    val summary = runner.summarize(results, 1.0)
    assert(summary.select("status").collect().map(_.getString(0)).sorted
      .toSeq == Seq("error", "error", "success"))
  }
}
