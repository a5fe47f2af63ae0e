package graft

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
import org.apache.spark.sql.functions._
import graft.runner.{ParquetTarget, SyncConfig, SyncRunner}
import graft.streaming.{PollingEventSource, PushListener, SocketIoCodec}

/** The HTTP long-polling fallback transport against a REAL localhost
  * HTTP server: a minimal engine.io polling endpoint (GET drains an
  * outbound frame queue, POST records client packets) speaks the
  * socket.io handshake/event grammar at
  * [[graft.streaming.PollingEventSource]], and the full [[PushListener]]
  * loop lands an actual delta merge — the polling twin of
  * `WebSocketEventSourceSpec`, covering the transport the reference's
  * socket.io client falls back to behind strict proxies
  * (client.js:1987-2006). */
class PollingEventSourceSpec extends SparkSuite {
  import spark.implicits._

  /** Loopback engine.io polling stub. GET with a sid long-polls the
    * outbound queue (2 s slices, `6` noop on empty so the client
    * re-polls); GET without a sid serves the scripted handshake
    * payload; POST bodies are payload-decoded into `clientPackets`. */
  private final class StubPollServer(v4: Boolean,
      handshakeFrames: Seq[String]) {
    private val server = new java.net.ServerSocket(
      0, 16, java.net.InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    def base: String = s"http://127.0.0.1:$port"
    val clientPackets = new LinkedBlockingQueue[String]()
    private val outbound = new LinkedBlockingQueue[String]()
    @volatile private var running = true
    /** True once a websocket connection on this stub has completed the
      * engine.io upgrade (client committed with `5`). */
    @volatile var wsUpgraded = false
    /** False = the ws endpoint accepts the connection but never answers
      * the `2probe` — the stalled-middlebox shape the probe exists to
      * detect; the client must fall back to polling. */
    @volatile var answerProbe = true
    /** Count of client `2` pings received ON THE WEBSOCKET — the v3
      * keep-alive-inversion assertion (POST-side pings don't count). */
    @volatile var wsPings = 0
    /** Called with every decoded client packet (before queueing) —
      * tests hook the v4 `40` connect request here. */
    @volatile var onClientPacket: String => Unit = _ => ()

    def send(frame: String): Unit = outbound.put(frame)
    def awaitClient(): String = {
      val f = clientPackets.poll(10, TimeUnit.SECONDS)
      assert(f != null, "expected a client packet"); f
    }

    private val acceptor = new Thread(() => {
      try while (running) {
        val s = server.accept()
        val t = new Thread(() => serve(s), "stub-poll-conn")
        t.setDaemon(true); t.start()
      } catch { case _: Throwable => () }
    }, "stub-poll-accept")

    private def serve(sock: java.net.Socket): Unit = {
      try {
        val in = sock.getInputStream
        val out = sock.getOutputStream
        while (running) {
          // request line + headers
          val head = new StringBuilder
          while (!head.endsWith("\r\n\r\n")) {
            val c = in.read()
            if (c < 0) return
            head.append(c.toChar)
          }
          val lines = head.toString.split("\r\n")
          val Array(method, path, _) = lines(0).split(" ", 3)
          // RFC6455 upgrade request → minimal websocket endpoint for
          // the engine.io in-session upgrade (probe / commit / events)
          if (lines.exists(_.toLowerCase.startsWith("upgrade: websocket"))) {
            val key = lines
              .find(_.toLowerCase.startsWith("sec-websocket-key:"))
              .map(_.split(":", 2)(1).trim).getOrElse("")
            val guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
            val accept = java.util.Base64.getEncoder.encodeToString(
              java.security.MessageDigest.getInstance("SHA-1")
                .digest((key + guid).getBytes("UTF-8")))
            out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
              "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
              s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes("UTF-8"))
            out.flush()
            serveWs(in, out)
            return
          }
          val len = lines.find(_.toLowerCase.startsWith("content-length:"))
            .map(_.split(":", 2)(1).trim.toInt).getOrElse(0)
          val body = new Array[Byte](len)
          var off = 0
          while (off < len) {
            val n = in.read(body, off, len - off)
            if (n < 0) return
            off += n
          }
          val resp: String = method match {
            case "POST" =>
              SocketIoCodec.decodePayload(new String(body, "UTF-8"), v4)
                .foreach { p => onClientPacket(p); clientPackets.put(p) }
              "ok"
            case "GET" if !path.contains("sid=") =>
              SocketIoCodec.encodePayload(handshakeFrames, v4)
            case "GET" =>
              val f = outbound.poll(2, TimeUnit.SECONDS)
              SocketIoCodec.encodePayload(
                if (f == null) Seq("6") else Seq(f), v4)
          }
          val bytes = resp.getBytes("UTF-8")
          out.write(("HTTP/1.1 200 OK\r\n" +
            "Content-Type: text/plain;charset=UTF-8\r\n" +
            s"Content-Length: ${bytes.length}\r\n\r\n").getBytes("UTF-8"))
          out.write(bytes); out.flush()
        }
      } catch { case _: Throwable => () }
      finally { try sock.close() catch { case _: Throwable => () } }
    }

    /** Post-101 loop: read masked client text frames, answer the
      * engine.io probe, and after the `5` commit flush the SAME
      * outbound queue over the websocket (the server-side flush the
      * upgrade contract promises for packets queued mid-switch). */
    private def serveWs(in: java.io.InputStream,
        out: java.io.OutputStream): Unit = {
      val wlock = new Object
      def writeText(s: String): Unit = wlock.synchronized {
        val b = s.getBytes("UTF-8")
        require(b.length < 126, "stub ws frames stay short")
        out.write(0x81); out.write(b.length); out.write(b); out.flush()
      }
      def readFully(buf: Array[Byte]): Boolean = {
        var off = 0
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          if (n < 0) return false
          off += n
        }
        true
      }
      @volatile var open = true
      var sender: Thread = null
      try {
        while (running && open) {
          val b0 = in.read(); if (b0 < 0) return
          val b1 = in.read(); if (b1 < 0) return
          val op = b0 & 0x0f
          var len = b1 & 0x7f
          if (len == 126) {
            val ext = new Array[Byte](2)
            if (!readFully(ext)) return
            len = ((ext(0) & 0xff) << 8) | (ext(1) & 0xff)
          }
          val mask = new Array[Byte](if ((b1 & 0x80) != 0) 4 else 0)
          if (!readFully(mask)) return
          val payload = new Array[Byte](len)
          if (!readFully(payload)) return
          if (mask.nonEmpty)
            (0 until len).foreach(i =>
              payload(i) = (payload(i) ^ mask(i % 4)).toByte)
          op match {
            case 0x8 => open = false // close
            case 0x1 =>
              new String(payload, "UTF-8") match {
                case "2probe" => if (answerProbe) writeText("3probe")
                case "5" =>
                  wsUpgraded = true
                  sender = new Thread(() => {
                    try while (running && open) {
                      val f = outbound.poll(200, TimeUnit.MILLISECONDS)
                      if (f != null) writeText(f)
                    } catch { case _: Throwable => () }
                  }, "stub-ws-send")
                  sender.setDaemon(true); sender.start()
                case "2" => // v3 client ping over the websocket
                  wsPings += 1; writeText("3")
                case "1" => open = false // engine.io close
                case p => onClientPacket(p); clientPackets.put(p)
              }
            case _ => () // pings/pongs/continuations: not exercised
          }
        }
      } finally {
        open = false
        if (sender != null) sender.interrupt()
      }
    }

    def start(): Unit = acceptor.start()
    def stop(): Unit = {
      running = false
      try server.close() catch { case _: Throwable => () }
    }
  }

  private val OpenV4 =
    """0{"sid":"p1","pingInterval":25000,"pingTimeout":20000}"""
  private val OpenV4Upgrade =
    """0{"sid":"p1","upgrades":["websocket"],""" +
      """"pingInterval":25000,"pingTimeout":20000}"""

  /** v4 stub that acks the namespace when the client POSTs `40`. */
  private def v4Server(open: String = OpenV4): StubPollServer = {
    val srv = new StubPollServer(v4 = true, Seq(open))
    srv.onClientPacket = p => if (p == "40") srv.send("""40{"sid":"n1"}""")
    srv
  }

  test("v4 polling handshake, room join, server ping/pong, and update " +
      "delivery over real localhost HTTP") {
    val srv = v4Server()
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons?limit=5")
    try {
      src.connect()
      assert(srv.awaitClient() === "40")
      assert(srv.awaitClient() === """42["join","/persons"]""")
      // server ping → client pong (v4 direction)
      srv.send("2")
      assert(srv.awaitClient() === "3")
      // update frame surfaces as a PushEvent
      srv.send("""42["update",{"path":"/persons","type":"UPDATE"}]""")
      val got = src.poll(5000)
      assert(got.contains(graft.streaming.PushEvent("/persons", "update")))
      // non-update rooms do not surface
      srv.send("""42["other",{"path":"/persons"}]""")
      assert(src.poll(200).isEmpty)
    } finally { src.close(); srv.stop() }
  }

  test("v3 polling: length-prefixed payloads, unprompted connect ack, " +
      "and CLIENT-originated pings at the handshake interval") {
    // v3 handshake: open + namespace ack in ONE payload, tight interval
    val srv = new StubPollServer(v4 = false, Seq(
      """0{"sid":"p3","pingInterval":1000,"pingTimeout":5000}""", "40"))
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons",
      protocolV4 = false)
    try {
      src.connect()
      assert(srv.awaitClient() === """42["join","/persons"]""")
      // the client must originate '2' pings periodically in v3
      assert(srv.awaitClient() === "2")
      srv.send("3")
      assert(srv.awaitClient() === "2")
      // events flow over the v3 framing too
      srv.send("""42["update",{"path":"/persons"}]""")
      assert(src.poll(5000)
        .contains(graft.streaming.PushEvent("/persons", "update")))
    } finally { src.close(); srv.stop() }
  }

  test("server drop surfaces on poll as a transport error so the " +
      "listener reconnects") {
    val srv = v4Server()
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons",
      requestTimeoutMs = 3000)
    try {
      src.connect()
      srv.send("""42["update",{"path":"/persons"}]""")
      assert(src.poll(5000)
        .contains(graft.streaming.PushEvent("/persons", "update")))
      srv.stop()
      intercept[java.io.IOException] {
        var n = 0
        while (n < 100) { src.poll(100); n += 1 }
      }
    } finally src.close()
  }

  test("engine.io in-session upgrade: polling handshake → 2probe/" +
      "3probe → '5' commit — events and keep-alives ride the " +
      "websocket, no poll pump runs") {
    import scala.jdk.CollectionConverters._
    val srv = v4Server(OpenV4Upgrade)
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons",
      upgrade = true)
    try {
      src.connect()
      assert(srv.awaitClient() === "40")
      assert(srv.awaitClient() === """42["join","/persons"]""")
      val end = System.currentTimeMillis() + 5000
      while (!srv.wsUpgraded && System.currentTimeMillis() < end)
        Thread.sleep(10)
      assert(srv.wsUpgraded, "client never committed the upgrade")
      assert(!Thread.getAllStackTraces.keySet.asScala.exists(t =>
          t.getName == "graft-polling-pump" && t.isAlive),
        "poll pump running after a successful upgrade — the polling " +
          "channel must go quiet")
      // events flow over the websocket now
      srv.send("""42["update",{"path":"/persons","type":"UPDATE"}]""")
      assert(src.poll(5000)
        .contains(graft.streaming.PushEvent("/persons", "update")))
      // server ping → client pong, both over the websocket
      srv.send("2")
      assert(srv.awaitClient() === "3")
    } finally { src.close(); srv.stop() }
  }

  test("v3 upgrade: the client-originated keep-alive moves ONTO the " +
      "websocket after the '5' commit (the polling POST channel is " +
      "closed by the upgrade)") {
    // v3 handshake: open (with upgrades) + namespace ack in ONE
    // payload; tight pingInterval so the post-upgrade ping arrives fast
    val srv = new StubPollServer(v4 = false, Seq(
      """0{"sid":"p3","upgrades":["websocket"],""" +
        """"pingInterval":1000,"pingTimeout":5000}""", "40"))
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons",
      protocolV4 = false, upgrade = true)
    try {
      src.connect()
      assert(srv.awaitClient() === """42["join","/persons"]""")
      val end = System.currentTimeMillis() + 5000
      while (!srv.wsUpgraded && System.currentTimeMillis() < end)
        Thread.sleep(10)
      assert(srv.wsUpgraded, "v3 client never committed the upgrade")
      // the stub counts pings received ON the websocket separately —
      // POST-side pings (pre-upgrade) cannot satisfy this
      val deadline = System.currentTimeMillis() + 8000
      while (srv.wsPings < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(srv.wsPings >= 1,
        "no client keep-alive arrived over the websocket after the upgrade")
      // and events still flow over the websocket in v3 framing
      srv.send("""42["update",{"path":"/persons"}]""")
      assert(src.poll(5000)
        .contains(graft.streaming.PushEvent("/persons", "update")))
    } finally { src.close(); srv.stop() }
  }

  test("upgrade probe unanswered → clean fallback to the polling pump") {
    val srv = v4Server(OpenV4Upgrade)
    srv.answerProbe = false
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons",
      upgrade = true, connectTimeoutMs = 1500)
    try {
      src.connect()
      assert(srv.awaitClient() === "40")
      assert(srv.awaitClient() === """42["join","/persons"]""")
      assert(!srv.wsUpgraded)
      // polling stayed authoritative: events arrive via the pump
      srv.send("""42["update",{"path":"/persons","type":"UPDATE"}]""")
      assert(src.poll(8000)
        .contains(graft.streaming.PushEvent("/persons", "update")))
    } finally { src.close(); srv.stop() }
  }

  test("delta merges across the upgrade boundary: an update queued " +
      "DURING the switch is flushed to the websocket and a post-" +
      "upgrade update lands too — both drive real merges") {
    val dir = java.nio.file.Files.createTempDirectory("upg-push")
    val target = new ParquetTarget(spark, s"$dir/apptable")
    val runner = new SyncRunner(spark, SyncConfig("apptable", s"$dir/state"))
    target.overwrite(Seq(("/persons/1", 100L, "a"))
      .toDF("href", "modified_ms", "jsondata"))
    val delta = Seq(("/persons/1", 200L, "b"), ("/persons/2", 200L, "c"))
      .toDF("href", "modified_ms", "jsondata")
    val none = Seq.empty[String].toDF("href")

    val srv = v4Server(OpenV4Upgrade)
    // the mid-switch race: an update enqueued right behind the connect
    // ack — whichever side of the `5` the transfer lands on, the
    // contract (server flushes its queue to the websocket) delivers it
    srv.onClientPacket = p => if (p == "40") {
      srv.send("""40{"sid":"n1"}""")
      srv.send("""42["update",{"path":"/persons","type":"UPDATE"}]""")
    }
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons",
      upgrade = true)
    val listener = new PushListener(src,
      rooms = Map("/persons" ->
        (_ => { runner.deltaSync(delta, none, target); () })),
      reconnectMs = 50L, retryMs = 50L)
    listener.start()
    try {
      val end = System.currentTimeMillis() + 15000
      while ((!srv.wsUpgraded || listener.syncsRun.get() < 1) &&
          System.currentTimeMillis() < end)
        Thread.sleep(10)
      assert(srv.wsUpgraded, "upgrade never committed")
      assert(listener.syncsRun.get() >= 1,
        "the mid-switch update never drove a merge")
      // and a post-upgrade update drives another
      val before = listener.syncsRun.get()
      srv.send("""42["update",{"path":"/persons","type":"UPDATE"}]""")
      val end2 = System.currentTimeMillis() + 15000
      while (listener.syncsRun.get() < before + 1 &&
          System.currentTimeMillis() < end2)
        Thread.sleep(10)
      assert(listener.syncsRun.get() >= before + 1,
        "post-upgrade update never drove a merge")
      val got = target.read(spark)
        .as[(String, Long, String)].collect().toSet
      assert(got === Set(("/persons/1", 200L, "b"),
        ("/persons/2", 200L, "c")))
    } finally { listener.stop(); srv.stop() }
  }

  test("reconnect after a server Close terminates the old pump — " +
      "exactly one live poll pump, no concurrent long-polls on the " +
      "new session") {
    import scala.jdk.CollectionConverters._
    def livePumps(): Int = Thread.getAllStackTraces.keySet.asScala
      .count(t => t.getName == "graft-polling-pump" && t.isAlive)
    val srv = v4Server()
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons")
    try {
      src.connect()
      assert(srv.awaitClient() === "40")
      assert(srv.awaitClient() === """42["join","/persons"]""")
      // engine.io Close → handleFrame signals failure; the pump loop
      // must EXIT (pre-fix it kept long-polling until close())
      srv.send("1")
      intercept[java.io.IOException] {
        var n = 0
        while (n < 100) { src.poll(100); n += 1 }
      }
      // the listener's reconnect path: connect() again on the same
      // source — it must terminate any prior pump before starting one
      src.connect()
      assert(srv.awaitClient() === "40")
      assert(srv.awaitClient() === """42["join","/persons"]""")
      val end = System.currentTimeMillis() + 5000
      while (livePumps() > 1 && System.currentTimeMillis() < end)
        Thread.sleep(20)
      assert(livePumps() === 1,
        "old pump still long-polling after reconnect — engine.io " +
          "forbids poll overlap")
      // the new session still delivers
      srv.send("""42["update",{"path":"/persons","type":"UPDATE"}]""")
      assert(src.poll(5000)
        .contains(graft.streaming.PushEvent("/persons", "update")))
    } finally { src.close(); srv.stop() }
  }

  test("payload codec golden frames: v4 record separator, v3 length " +
      "prefixes, round-trip") {
    val frames = Seq("2", """42["update",{"path":"/p"}]""", "6")
    val v4 = SocketIoCodec.encodePayload(frames, v4 = true)
    assert(v4 === frames.mkString("\u001e"))
    assert(SocketIoCodec.decodePayload(v4, v4 = true) === frames)
    val v3 = SocketIoCodec.encodePayload(frames, v4 = false)
    assert(v3 === "1:2" + "26:" + """42["update",{"path":"/p"}]""" + "1:6")
    assert(SocketIoCodec.decodePayload(v3, v4 = false) === frames)
    assert(SocketIoCodec.decodePayload("", v4 = true).isEmpty)
    assert(SocketIoCodec.decodePayload("", v4 = false).isEmpty)
    intercept[IllegalArgumentException] {
      SocketIoCodec.decodePayload("5:ab", v4 = false)
    }
  }

  test("full loop: a frame from the live polling transport drives a " +
      "REAL delta merge through PushListener") {
    val dir = java.nio.file.Files.createTempDirectory("poll-push")
    val target = new ParquetTarget(spark, s"$dir/apptable")
    val runner = new SyncRunner(spark, SyncConfig("apptable", s"$dir/state"))
    target.overwrite(Seq(("/persons/1", 100L, "a"))
      .toDF("href", "modified_ms", "jsondata"))
    val delta = Seq(("/persons/1", 200L, "b"), ("/persons/2", 200L, "c"))
      .toDF("href", "modified_ms", "jsondata")
    val none = Seq.empty[String].toDF("href")

    val srv = v4Server()
    srv.start()
    val src = new PollingEventSource(srv.base, joinPath = "/persons")
    val listener = new PushListener(src,
      rooms = Map("/persons" ->
        (_ => { runner.deltaSync(delta, none, target); () })),
      reconnectMs = 50L, retryMs = 50L)
    listener.start()
    try {
      // wait for the transport to join the room, then broadcast
      assert(srv.awaitClient() === "40")
      assert(srv.awaitClient() === """42["join","/persons"]""")
      srv.send("""42["update",{"path":"/persons"}]""")
      val end = System.currentTimeMillis() + 15000
      while (listener.syncsRun.get() < 1 && System.currentTimeMillis() < end)
        Thread.sleep(10)
      assert(listener.syncsRun.get() >= 1, "merge never ran")
      val got = target.read(spark)
        .as[(String, Long, String)].collect().toSet
      assert(got === Set(("/persons/1", 200L, "b"),
        ("/persons/2", 200L, "c")))
    } finally { listener.stop(); srv.stop() }
  }
}
