package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.source.HttpPageStore

/** Next-link walk, relative-URL resolution, retry policy — offline via an
  * injected fetch function (the HTTP layer itself is a 20-line default). */
class HttpPageStoreSpec extends AnyFunSuite {

  private val pages = Map(
    "https://api.example.org/a?limit=2" ->
      """{"$$meta": {"next": "/a?limit=2&offset=2"}, "results": [1, 2]}""",
    "https://api.example.org/a?limit=2&offset=2" ->
      """{"$$meta": {"next": "/a?limit=2&offset=4"}, "results": [3, 4]}""",
    "https://api.example.org/a?limit=2&offset=4" ->
      """{"$$meta": {}, "results": [5]}""")

  test("walks $$meta.next to enumerate pages, resolving relative links; " +
    "bodies fetched exactly once and cached for the partitions") {
    var fetches = 0
    val store = new HttpPageStore("https://api.example.org/a?limit=2",
      fetchFn = { u => fetches += 1; pages(u) })
    assert(store.listPages() === Seq(
      "https://api.example.org/a?limit=2",
      "https://api.example.org/a?limit=2&offset=2",
      "https://api.example.org/a?limit=2&offset=4"))
    assert(fetches === 3)
    // walked bodies are cached → partition readers won't re-fetch
    assert(store.cachedBody("https://api.example.org/a?limit=2")
      .contains(pages("https://api.example.org/a?limit=2")))
    assert(fetches === 3)
  }

  test("retries transient failures with backoff, then succeeds") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val store = new HttpPageStore("u",
      fetchFn = { _ =>
        calls += 1
        if (calls < 3) throw new RuntimeException("flaky")
        "ok"
      },
      maxRetries = 3, retryBackoffMs = 10, sleepFn = sleeps += _)
    assert(store.fetch("u") === "ok")
    assert(calls === 3)
    assert(sleeps.toSeq === Seq(10L, 20L)) // linear backoff
  }

  test("gives up after maxRetries and surfaces the cause") {
    val store = new HttpPageStore("u",
      fetchFn = _ => throw new RuntimeException("down"),
      maxRetries = 2, retryBackoffMs = 1, sleepFn = _ => ())
    val e = intercept[java.io.IOException](store.fetch("u"))
    assert(e.getMessage.contains("after 3 attempts"))
    assert(e.getCause.getMessage === "down")
  }

  test("offset enumeration for the nextLinksBroken mode") {
    assert(HttpPageStore.offsetPages("/a", 500, 1200) === Seq(
      "/a?limit=500&offset=0", "/a?limit=500&offset=500",
      "/a?limit=500&offset=1000"))
    assert(HttpPageStore.offsetPages("/a?f=x", 500, 500) ===
      Seq("/a?f=x&limit=500&offset=0"))
  }
}
