package graft

import java.nio.file.{Files, Paths}

import graft.io.FileCache

/** S8 remote-file cache: pass-through, miss→fetch→hit, version-keyed
  * entries, sidecar metadata, concurrency, and error parity with the
  * reference's `cached_path`. Extends the SHARED SparkSpec session — a
  * suite-local getOrCreate would hand back the shared session and stopping
  * it would kill every later suite. */
class FileCacheSpec extends SparkSpec {

  private def freshDirs(): (String, String) = {
    val root = Files.createTempDirectory("graft-fcache").toString
    Files.createDirectories(Paths.get(s"$root/src"))
    Files.createDirectories(Paths.get(s"$root/cache"))
    (s"$root/src", s"$root/cache")
  }

  test("a bare existing local path passes through; a missing one raises") {
    val (src, cache) = freshDirs()
    val f = s"$src/weights.bin"
    Files.write(Paths.get(f), Array[Byte](1, 2, 3))
    assert(FileCache.cachedPath(f, cache) === f)
    intercept[java.io.FileNotFoundException] {
      FileCache.cachedPath(s"$src/nope.bin", cache)
    }
    intercept[java.io.FileNotFoundException] {
      FileCache.cachedPath(s"file://$src/nope.bin", cache)
    }
    assert(Files.list(Paths.get(cache)).count() === 0, "pass-through must not populate")
  }

  test("URI miss fetches once into a content-addressed entry; hits reuse it") {
    val (src, cache) = freshDirs()
    val payload = Array.tabulate[Byte](10000)(_.toByte)
    Files.write(Paths.get(s"$src/model.bin"), payload)
    val uri = s"file://$src/model.bin"
    val p1 = FileCache.cachedPath(uri, cache)
    assert(p1.startsWith(cache) && Files.readAllBytes(Paths.get(p1)).toSeq === payload.toSeq)
    // sidecar metadata, reference-shaped {url, etag}
    val meta = Files.readString(Paths.get(p1 + ".json"))
    assert(meta.contains("\"url\"") && meta.contains(uri) && meta.contains("\"etag\""))
    val mtime = Files.getLastModifiedTime(Paths.get(p1))
    val p2 = FileCache.cachedPath(uri, cache)
    assert(p2 === p1)
    assert(Files.getLastModifiedTime(Paths.get(p1)) === mtime, "a hit must not re-copy")
  }

  test("a changed source gets a NEW entry; the old one stays addressable") {
    val (src, cache) = freshDirs()
    val f = Paths.get(s"$src/data.bin")
    Files.write(f, "version one".getBytes)
    val uri = s"file://$f"
    val p1 = FileCache.cachedPath(uri, cache)
    // distinct (length, mtime) tag — also bump mtime explicitly so the test
    // doesn't depend on filesystem timestamp granularity
    Files.write(f, "version two, longer".getBytes)
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    // per-JVM memo caches the OLD resolution by design (an executor's model
    // stays consistent for the process lifetime); a fresh cacheDir models a
    // new executor seeing the new version
    val cache2 = Files.createTempDirectory("graft-fcache2").toString
    val p2 = FileCache.cachedPath(uri, cache2)
    assert(Files.readString(Paths.get(p2)) === "version two, longer")
    assert(Files.readString(Paths.get(p1)) === "version one",
      "old entries are never invalidated, as in the reference")
    assert(Paths.get(p1).getFileName.toString !== Paths.get(p2).getFileName.toString,
      "the version tag must key the entry name")
  }

  test("concurrent first-callers fetch once and all get intact bytes") {
    val (src, cache) = freshDirs()
    val payload = Array.tabulate[Byte](200000)(i => (i * 31).toByte)
    Files.write(Paths.get(s"$src/big.bin"), payload)
    val uri = s"file://$src/big.bin"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 8).map(_ => Future(FileCache.cachedPath(uri, cache)))),
      30.seconds)
    assert(results.toSet.size === 1)
    assert(Files.readAllBytes(Paths.get(results.head)).toSeq === payload.toSeq)
    // exactly one entry + one sidecar, no leftover temp files
    val files = Files.list(Paths.get(cache)).iterator()
    var names = List.empty[String]
    while (files.hasNext) names ::= files.next().getFileName.toString
    assert(names.count(_.endsWith(".tmp")) === 0, s"leftover temps in $names")
    assert(names.size === 2, s"expected entry + sidecar, got $names")
  }

  test("http(s) sources fetch once, keyed by the response ETag (in-process server, zero egress)") {
    val (_, cache) = freshDirs()
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var etag = "\"v1\""
    @volatile var body = "weights mark one".getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/model.bin", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      ex.getResponseHeaders.set("ETag", etag)
      ex.sendResponseHeaders(200, body.length)
      try ex.getResponseBody.write(body) finally ex.close()
    })
    server.createContext("/gone.bin", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val uri = s"$base/model.bin"
      val p1 = FileCache.cachedPath(uri, cache)
      assert(Files.readAllBytes(Paths.get(p1)).toSeq === body.toSeq)
      assert(Files.readString(Paths.get(p1 + ".json")).contains("v1"),
        "sidecar must record the ETag")
      assert(FileCache.cachedPath(uri, cache) === p1)
      assert(hits.get() === 1, "a memo hit must not re-contact the server")
      // a changed remote (new ETag) gets a NEW entry; fresh cacheDir models
      // a new executor (the per-JVM memo pins the old resolution by design)
      etag = "\"v2\""; body = "weights mark two, longer".getBytes
      val cache2 = Files.createTempDirectory("graft-fcache-http2").toString
      val p2 = FileCache.cachedPath(uri, cache2)
      assert(Files.readString(Paths.get(p2)) === "weights mark two, longer")
      assert(Paths.get(p1).getFileName.toString !== Paths.get(p2).getFileName.toString,
        "the ETag must key the entry name")
      assert(Files.readString(Paths.get(p1)) === "weights mark one",
        "old entries are never invalidated")
      // reference error parity: HTTP 404 raises FileNotFoundException
      intercept[java.io.FileNotFoundException] {
        FileCache.cachedPath(s"$base/gone.bin", cache)
      }
    } finally server.stop(0)
  }

  test("http redirects are followed to the artifact (not cached as the artifact); loops fail") {
    val (_, cache) = freshDirs()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def port = server.getAddress.getPort
    val payload = "real artifact bytes".getBytes
    server.createContext("/redirect.bin", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.set("Location", s"http://127.0.0.1:$port/real.bin")
      ex.sendResponseHeaders(302, -1); ex.close()
    })
    server.createContext("/real.bin", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.set("ETag", "\"real-v1\"")
      ex.sendResponseHeaders(200, payload.length)
      try ex.getResponseBody.write(payload) finally ex.close()
    })
    server.createContext("/loop.bin", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.set("Location", s"http://127.0.0.1:$port/loop.bin")
      ex.sendResponseHeaders(302, -1); ex.close()
    })
    server.start()
    try {
      val p = FileCache.cachedPath(s"http://127.0.0.1:$port/redirect.bin", cache)
      assert(Files.readAllBytes(Paths.get(p)).toSeq === payload.toSeq,
        "the TARGET's bytes must be cached, never the 302 stub")
      assert(Files.readString(Paths.get(p + ".json")).contains("redirect.bin"),
        "the entry is keyed by the uri the caller resolves")
      val e = intercept[java.io.IOException] {
        FileCache.cachedPath(s"http://127.0.0.1:$port/loop.bin", cache)
      }
      assert(e.getMessage.contains("too many redirects"), e.getMessage)
    } finally server.stop(0)
  }

  test("a truncated http body (server early close) is never cached; the retry succeeds") {
    val (_, cache) = freshDirs()
    val payload = Array.tabulate[Byte](4096)(i => (i * 7).toByte)
    @volatile var truncate = true
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/cut.bin", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.set("ETag", "\"cut1\"")
      // declares the FULL length, then closes early on the first attempt —
      // the client may see either a stream error or a plain short EOF; the
      // byte-count check must refuse to cache the torn body in both cases
      ex.sendResponseHeaders(200, payload.length)
      val n = if (truncate) 100 else payload.length
      try ex.getResponseBody.write(payload, 0, n) finally ex.close()
    })
    server.start()
    try {
      val uri = s"http://127.0.0.1:${server.getAddress.getPort}/cut.bin"
      intercept[java.io.IOException] { FileCache.cachedPath(uri, cache) }
      val leaked = Files.list(Paths.get(cache)).iterator()
      assert(!leaked.hasNext, "a torn fetch must leave no cache entry, sidecar, or tmp")
      // the failed fetch is not memoized; the healthy retry caches intact bytes
      truncate = false
      val p = FileCache.cachedPath(uri, cache)
      assert(Files.readAllBytes(Paths.get(p)).toSeq === payload.toSeq)
    } finally server.stop(0)
  }

  test("stale crash debris (orphan tmp + entry-less sidecar) is swept on re-fetch") {
    val (src, cache) = freshDirs()
    Files.write(Paths.get(s"$src/m.bin"), "payload".getBytes)
    val uri = s"file://$src/m.bin"
    // plant debris for the SAME entry a crashed fetcher would have left:
    // name = sha256(uri).sha256(tag) — recompute via a probe fetch into a
    // scratch cache, which tells us the entry name without touching `cache`
    val probe = Files.createTempDirectory("graft-fcache-probe").toString
    val name = Paths.get(FileCache.cachedPath(uri, probe)).getFileName.toString
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 60 * 60 * 1000)
    val tmp = Paths.get(cache, s".$name.12345.tmp")
    Files.write(tmp, "torn".getBytes)
    Files.setLastModifiedTime(tmp, old)
    val sidecar = Paths.get(cache, name + ".json")
    Files.write(sidecar, "{}".getBytes)
    Files.setLastModifiedTime(sidecar, old)
    // fresh debris must survive (a concurrent fetcher may own it)
    val freshTmp = Paths.get(cache, s".$name.99999.tmp")
    Files.write(freshTmp, "in-flight".getBytes)
    // memo is keyed (uri, cacheDir), so this is a real fetch into `cache`
    val p = FileCache.cachedPath(uri, cache)
    assert(Files.readString(Paths.get(p)) === "payload")
    assert(!Files.exists(tmp), "stale tmp debris must be swept")
    assert(Files.exists(freshTmp), "fresh tmp (possibly another process's) must survive")
    assert(Files.readString(sidecar).contains("\"url\""),
      "the stale entry-less sidecar must have been replaced by the real one")
  }

  test("executor-side use: tasks resolve the same local path via the memo") {
    val (src, cache) = freshDirs()
    Files.write(Paths.get(s"$src/shared.bin"), "shared weights".getBytes)
    val uri = s"file://$src/shared.bin"
    import spark.implicits._
    val paths = spark.range(0, 64, 1, 8).mapPartitions { it =>
      val p = FileCache.cachedPath(uri, cache)
      it.map(_ => p)
    }.collect()
    assert(paths.toSet.size === 1)
    assert(Files.readString(Paths.get(paths.head)) === "shared weights")
  }
}
