package graft.streaming

import java.util.concurrent.{CountDownLatch, LinkedBlockingQueue, TimeUnit}

/** socket.io HTTP long-polling transport — the fallback both socket.io
  * client majors take when the websocket upgrade is blocked (strict
  * proxies, TLS-terminating middleboxes; the library default behind the
  * reference's client.js:1987-2006). Same [[EventSource]] seam as
  * [[WebSocketEventSource]], same [[SocketIoCodec]] frame grammar — the
  * only transport-specific part is the carry: GET drains queued server
  * packets (one in-flight long poll at a time, per the engine.io
  * contract), POST sends client packets, and request/response bodies
  * batch packets via [[SocketIoCodec.encodePayload]] (0x1E-separated in
  * v4, length-prefixed in v3).
  *
  * Handshake over polling: GET (no sid) → `0{"sid":...}` open; v4 then
  * POSTs `40` and polls for the connect ack, a v2/v3 server acks
  * unprompted; then the room join POSTs and the poll pump starts. v3
  * keep-alive is client-originated `2` pings at the handshake's
  * pingInterval (the same inversion [[WebSocketEventSource]] handles);
  * v4 servers ping first and the pump answers.
  *
  * Failure contract is the listener's: any HTTP error, non-200, or
  * engine.io close lands in `failure` and the next `poll` throws after
  * draining buffered events — [[PushListener]] closes and reconnects on
  * its cadence.
  *
  * In-session UPGRADE (`upgrade = true`): when the handshake's
  * `upgrades` offers `websocket`, the client probes the same session
  * over a websocket (`2probe` → `3probe`), pauses the (quiescent)
  * polling channel, and commits with `5` — the engine.io upgrade flow
  * the socket.io client performs by default (polling first for
  * proxy-safety, websocket once proven). After the `5`, all frames ride
  * the websocket through the same decode path and v3 client pings move
  * onto it; a failed or timed-out probe falls back to the polling pump.
  */
final class PollingEventSource(
    httpBase: String,
    joinPath: String,
    protocolV4: Boolean = true,
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 30000L,
    upgrade: Boolean = false) extends EventSource {

  import java.net.http.{HttpClient, HttpRequest, HttpResponse, WebSocket}

  private val events = new LinkedBlockingQueue[PushEvent]()
  @volatile private var failure: Throwable = _
  @volatile private var sid: String = _
  @volatile private var running = false
  @volatile private var pump: Thread = _
  @volatile private var ws: WebSocket = _
  @volatile private var pinger: java.util.concurrent.ScheduledExecutorService = _
  // engine.io's cache-buster `t=` param — monotonic, not a clock
  private val tick = new java.util.concurrent.atomic.AtomicLong(0L)
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
    .build()

  private def baseUri: String = {
    val u = java.net.URI.create(httpBase)
    val eio = if (protocolV4) 4 else 3
    s"${u.getScheme}://${u.getAuthority}/socket.io/?EIO=$eio&transport=polling"
  }

  private def uri(withSid: Boolean): java.net.URI = {
    val s = if (withSid) s"&sid=$sid" else ""
    java.net.URI.create(s"$baseUri$s&t=${tick.incrementAndGet()}")
  }

  private def get(timeoutMs: Long = requestTimeoutMs): Seq[String] = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(withSid = sid != null))
        .timeout(java.time.Duration.ofMillis(math.max(1L, timeoutMs)))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(
        s"polling GET ${resp.statusCode()}: ${resp.body().take(200)}")
    SocketIoCodec.decodePayload(resp.body(), protocolV4)
  }

  private def post(frames: String*): Unit = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(withSid = true))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
        .POST(HttpRequest.BodyPublishers.ofString(
          SocketIoCodec.encodePayload(frames, protocolV4)))
        .header("Content-Type", "text/plain;charset=UTF-8")
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(
        s"polling POST ${resp.statusCode()}: ${resp.body().take(200)}")
  }

  override def connect(): Unit = {
    // terminate any PRIOR session first: a handleFrame-signaled failure
    // (server Close, undecodable frame) leaves the old pump thread
    // looping — it reads the shared @volatile sid, so a reconnect
    // without this would run TWO concurrent long-polls against the new
    // session (engine.io forbids poll overlap; the server errors both,
    // forcing a reconnect storm) and double-deliver into `events`
    running = false
    stopPinger()
    abortWs()
    locally {
      val t = pump
      if (t != null) {
        t.interrupt() // wakes an in-flight HttpClient.send
        t.join(5000L)
        pump = null
      }
    }
    events.clear(); failure = null; sid = null
    val deadline = System.nanoTime() + connectTimeoutMs * 1000000L
    // remaining handshake budget, as the per-request timeout cap: a
    // server that keeps answering noops without ever acking must not
    // stretch connect() past connectTimeoutMs by up to a full
    // requestTimeoutMs per in-flight long poll
    def remainingMs(): Long = {
      val ms = (deadline - System.nanoTime()) / 1000000L
      if (ms <= 0)
        throw new java.io.IOException(
          s"socket.io polling handshake timed out after ${connectTimeoutMs}ms")
      ms
    }
    // open: first GET carries no sid
    var pending = get(math.min(requestTimeoutMs, remainingMs())).toList
    val open = pending.headOption.map(SocketIoCodec.decode) match {
      case Some(o: SocketIoCodec.Open) => pending = pending.tail; o
      case other => throw new java.io.IOException(
        s"polling handshake did not open with an engine.io Open: $other")
    }
    sid = open.sid
    if (protocolV4) post("40") // request the default-namespace connect
    else startPinger(open.pingIntervalMs)
    // drain until the namespace connect ack, then join the room
    var connected = false
    while (!connected) {
      if (pending.isEmpty)
        pending = get(math.min(requestTimeoutMs, remainingMs())).toList
      else pending.head match {
        case f =>
          pending = pending.tail
          SocketIoCodec.decode(f) match {
            case _: SocketIoCodec.Connect => connected = true
            case SocketIoCodec.ConnectError(_, reason) =>
              throw new java.io.IOException(
                s"namespace connect error: $reason")
            case SocketIoCodec.Ping => post(SocketIoCodec.encodePong)
            case e: SocketIoCodec.Event =>
              // an update racing the handshake still counts
              // (at-least-once) — never drop it
              SocketIoCodec.eventToPush(e).foreach(events.put)
            case _ => () // opens/noops/keep-alives before the ack
          }
      }
    }
    post(SocketIoCodec.encodeJoin(joinPath))
    // leftover frames from the handshake GETs are real traffic
    pending.foreach(handleFrame)
    running = true
    // in-session upgrade (engine.io): when the handshake offered
    // `websocket` and the caller opted in, probe the websocket on the
    // SAME session before the poll pump starts — 2probe → 3probe → `5`.
    // The pause-and-drain step of the contract is trivially satisfied
    // here: no pump is running yet and the join POST has completed, so
    // the polling channel is quiescent when `5` is sent; the server
    // flushes anything it queued meanwhile to the websocket and answers
    // later polls (none from us) with noop. A failed probe falls back
    // to the polling pump — exactly the client library's behavior.
    if (upgrade && open.upgrades.contains("websocket") &&
        tryUpgrade(open.pingIntervalMs)) {
      () // transport switched: the websocket listener delivers
    } else {
      val t = new Thread(() => pumpLoop(), "graft-polling-pump")
      t.setDaemon(true)
      t.start()
      pump = t
    }
  }

  /** The engine.io websocket endpoint for THIS session: same authority,
    * `transport=websocket` and the polling handshake's sid. */
  private def wsUri: java.net.URI = {
    val u = java.net.URI.create(httpBase)
    val scheme = if (u.getScheme == "https") "wss" else "ws"
    val eio = if (protocolV4) 4 else 3
    java.net.URI.create(s"$scheme://${u.getAuthority}/socket.io/" +
      s"?EIO=$eio&transport=websocket&sid=$sid")
  }

  /** Probe + upgrade: `2probe` over a fresh websocket on the session,
    * expect `3probe`, then commit with `5`. True = the websocket is the
    * transport from here on (v3 client pings move onto it); false = any
    * step failed or timed out and polling stays authoritative. */
  private def tryUpgrade(pingIntervalMs: Long): Boolean = {
    val probed = new CountDownLatch(1)
    val probeOk = new java.util.concurrent.atomic.AtomicBoolean(false)
    val upgraded = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new WebSocket.Listener {
      private val partial = new StringBuilder
      override def onText(w: WebSocket, data: CharSequence, last: Boolean)
      : java.util.concurrent.CompletionStage[_] = {
        partial.append(data)
        if (last) {
          val frame = partial.toString; partial.setLength(0)
          if (frame == "3probe") { probeOk.set(true); probed.countDown() }
          else handleFrame(frame)
        }
        w.request(1)
        null
      }
      override def onError(w: WebSocket, err: Throwable): Unit = {
        if (upgraded.get) failure = err
        probed.countDown()
      }
      override def onClose(w: WebSocket, code: Int, reason: String)
      : java.util.concurrent.CompletionStage[_] = {
        if (upgraded.get)
          failure = new java.io.IOException(
            s"websocket closed by server: $code $reason")
        probed.countDown()
        null
      }
    }
    try {
      val w = HttpClient.newHttpClient().newWebSocketBuilder()
        .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
        .buildAsync(wsUri, listener)
        .join()
      w.sendText("2probe", true).join()
      if (!probed.await(connectTimeoutMs, TimeUnit.MILLISECONDS) ||
          !probeOk.get) {
        w.abort(); false
      } else {
        w.sendText("5", true).join()
        upgraded.set(true)
        ws = w
        // v3 keep-alive moves onto the websocket; the polling POST
        // channel is closed by the upgrade and must not carry pings
        if (!protocolV4) startPinger(pingIntervalMs)
        true
      }
    } catch { case _: Throwable => false }
  }

  private def abortWs(): Unit = {
    val w = ws
    if (w != null) {
      try { w.sendClose(WebSocket.NORMAL_CLOSURE, "bye"); () }
      catch { case _: Throwable => () }
      w.abort()
      ws = null
    }
  }

  private def pumpLoop(): Unit =
    // a handleFrame-signaled failure (Close frame, undecodable frame)
    // ends the pump too — the listener reconnects with a fresh pump,
    // and a zombie pump would long-poll the next session concurrently
    try while (running && failure == null) get().foreach(handleFrame)
    catch {
      case _: Throwable if !running => () // closed under the pump
      case t: Throwable => failure = t
    }

  /** Keep-alives ride the ACTIVE transport: the websocket once the
    * session upgraded (the polling channel is closed then), POST before. */
  private def sendKeepAlive(frame: String): Unit = {
    val w = ws
    if (w != null) { w.sendText(frame, true); () } else post(frame)
  }

  private def handleFrame(frame: String): Unit =
    try SocketIoCodec.decode(frame) match {
      case SocketIoCodec.Ping => sendKeepAlive(SocketIoCodec.encodePong)
      case e: SocketIoCodec.Event =>
        SocketIoCodec.eventToPush(e).foreach(events.put)
      case SocketIoCodec.Close =>
        failure = new java.io.IOException("server sent engine.io close")
      case _ => () // opens, pongs, noops, acks, disconnects
    } catch {
      case t: Throwable => failure = t // undecodable frame → reconnect
    }

  private def startPinger(intervalMs: Long): Unit = {
    stopPinger()
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      r => { val t = new Thread(r, "graft-eio3-poll-ping")
             t.setDaemon(true); t })
    val period = math.max(1000L, intervalMs)
    ex.scheduleAtFixedRate(
      () => try sendKeepAlive(SocketIoCodec.encodeClientPing)
            catch { case t: Throwable => failure = t },
      period, period, TimeUnit.MILLISECONDS)
    pinger = ex
  }

  private def stopPinger(): Unit = {
    val p = pinger
    if (p != null) { p.shutdownNow(); pinger = null }
  }

  override def poll(timeoutMs: Long): Option[PushEvent] = {
    // buffered events drain before a failure surfaces (at-least-once)
    val buffered = events.poll()
    if (buffered != null) return Some(buffered)
    if (failure != null) {
      val f = failure; failure = null
      throw new java.io.IOException("socket.io polling transport dropped", f)
    }
    Option(events.poll(math.max(0L, timeoutMs), TimeUnit.MILLISECONDS))
  }

  override def close(): Unit = {
    running = false
    stopPinger()
    val t = pump
    if (t != null) t.interrupt()
    val upgradedWs = ws != null
    abortWs()
    // best-effort engine.io close packet so the server frees the
    // session — over POST only while polling was still authoritative
    // (the upgrade closed that channel; the ws close frame covers it)
    if (sid != null && !upgradedWs) {
      try post("1") catch { case _: Throwable => () }
    }
  }
}
