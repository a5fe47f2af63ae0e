package graft

import java.util.concurrent.{CountDownLatch, LinkedBlockingQueue, TimeUnit}
import org.apache.spark.sql.functions._
import graft.runner.{ParquetTarget, SyncConfig, SyncRunner}
import graft.streaming.{PushListener, WebSocketEventSource}

/** The live socket.io transport against a REAL localhost websocket: a
  * minimal RFC6455 server (handshake + text frames, loopback only)
  * speaks the socket.io v4 handshake/event grammar at
  * [[graft.streaming.WebSocketEventSource]] and the full
  * [[PushListener]] loop lands an actual delta merge — the closest a
  * sandbox without a socket.io broker can get to the reference's
  * `installBroadCastListeners` wiring (client.js:1987-2047). */
class WebSocketEventSourceSpec extends SparkSuite {
  import spark.implicits._

  /** Loopback RFC6455 stub: accepts ONE client, completes the HTTP
    * upgrade, records every client text frame, and sends scripted
    * server frames on demand. */
  private final class StubWsServer {
    private val server = new java.net.ServerSocket(
      0, 4, java.net.InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    val clientFrames = new LinkedBlockingQueue[String]()
    private val upgraded = new CountDownLatch(1)
    @volatile private var out: java.io.OutputStream = _
    @volatile private var sock: java.net.Socket = _
    @volatile private var running = true

    private val thread = new Thread(() => serve(), "stub-ws-server")

    private def serve(): Unit = {
      try {
        sock = server.accept()
        val in = sock.getInputStream
        out = sock.getOutputStream
        // HTTP upgrade request
        val req = new StringBuilder
        while (!req.endsWith("\r\n\r\n")) {
          val c = in.read()
          if (c < 0) throw new java.io.EOFException("header EOF")
          req.append(c.toChar)
        }
        val key = req.toString.linesIterator
          .find(_.toLowerCase.startsWith("sec-websocket-key:"))
          .map(_.split(":", 2)(1).trim)
          .getOrElse(sys.error("no Sec-WebSocket-Key"))
        val accept = java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("SHA-1").digest(
            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
              .getBytes("UTF-8")))
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes("UTF-8"))
        out.flush()
        upgraded.countDown()
        // client frame pump (client→server frames are masked)
        while (running) {
          val b0 = in.read(); if (b0 < 0) return
          val opcode = b0 & 0x0F
          val b1 = in.read(); if (b1 < 0) return
          var len = (b1 & 0x7F).toLong
          if (len == 126) len = ((in.read() << 8) | in.read()).toLong
          else if (len == 127) {
            len = 0L; (0 until 8).foreach(_ => len = (len << 8) | in.read())
          }
          val masked = (b1 & 0x80) != 0
          val mask = if (masked) Array.fill(4)(in.read().toByte)
            else Array.empty[Byte]
          val payload = new Array[Byte](len.toInt)
          var off = 0
          while (off < len) {
            val n = in.read(payload, off, len.toInt - off)
            if (n < 0) return
            off += n
          }
          if (masked) payload.indices.foreach(i =>
            payload(i) = (payload(i) ^ mask(i % 4)).toByte)
          opcode match {
            case 1 => clientFrames.put(new String(payload, "UTF-8"))
            case 8 => running = false // close
            case _ => () // ping/pong/continuation: not exercised
          }
        }
      } catch { case _: Throwable => () }
    }

    def start(): Unit = thread.start()
    def awaitUpgrade(): Unit =
      assert(upgraded.await(10, TimeUnit.SECONDS), "client never upgraded")
    def awaitClient(): String = {
      val f = clientFrames.poll(10, TimeUnit.SECONDS)
      assert(f != null, "expected a client frame"); f
    }
    /** Server→client text frame (unmasked, FIN). */
    def send(text: String): Unit = {
      val p = text.getBytes("UTF-8")
      val header =
        if (p.length <= 125) Array(0x81.toByte, p.length.toByte)
        else Array(0x81.toByte, 126.toByte,
          ((p.length >> 8) & 0xFF).toByte, (p.length & 0xFF).toByte)
      val o = out
      o.synchronized { o.write(header); o.write(p); o.flush() }
    }
    def stop(): Unit = {
      running = false
      // close the ACCEPTED connection too — closing only the listening
      // socket leaves the live connection up and the client never sees
      // the drop
      val s = sock
      if (s != null) { try s.close() catch { case _: Throwable => () } }
      try server.close() catch { case _: Throwable => () }
    }
  }

  /** Runs the server side of the v4 handshake + room join on its own
    * thread, then leaves the connection open for scripted events. */
  private def scriptHandshake(srv: StubWsServer): Thread = {
    val t = new Thread(() => {
      srv.awaitUpgrade()
      srv.send("""0{"sid":"s1","pingInterval":25000,"pingTimeout":20000}""")
      assert(srv.awaitClient() === "40") // v4 namespace connect request
      srv.send("""40{"sid":"abc"}""")
      assert(srv.awaitClient() === """42["join","/persons"]""")
    }, "stub-ws-script")
    t.start(); t
  }

  test("v4 handshake, room join, ping/pong, and update delivery over a " +
      "real localhost websocket") {
    val srv = new StubWsServer
    srv.start()
    val script = scriptHandshake(srv)
    val src = new WebSocketEventSource(
      s"ws://127.0.0.1:${srv.port}/socket.io/?EIO=4&transport=websocket",
      joinPath = "/persons?limit=500") // join strips the query, ref 2006
    try {
      src.connect() // blocks until the join frame went out
      script.join(10000)
      // keep-alive: server ping → client pong
      srv.send("2")
      assert(srv.awaitClient() === "3")
      // update-room frame surfaces as a PushEvent; keep-alives skipped
      srv.send("""42["update",{"path":"/persons","type":"UPDATE"}]""")
      val got = src.poll(5000)
      assert(got.contains(graft.streaming.PushEvent("/persons", "update")))
      // non-update rooms do not surface
      srv.send("""42["other",{"path":"/persons"}]""")
      assert(src.poll(200).isEmpty)
    } finally { src.close(); srv.stop() }
  }

  test("server drop surfaces on poll as a transport error (after " +
      "buffered events drain) so the listener reconnects") {
    val srv = new StubWsServer
    srv.start()
    val script = scriptHandshake(srv)
    val src = new WebSocketEventSource(
      s"ws://127.0.0.1:${srv.port}/socket.io/?EIO=4&transport=websocket",
      joinPath = "/persons")
    try {
      src.connect()
      script.join(10000)
      srv.send("""42["update",{"path":"/persons"}]""")
      // wait for delivery, then kill the server socket
      val e = src.poll(5000)
      assert(e.contains(graft.streaming.PushEvent("/persons", "update")))
      srv.stop()
      intercept[java.io.IOException] {
        // the close lands asynchronously; poll surfaces it within the wait
        var n = 0
        while (n < 100) { src.poll(100); n += 1 }
      }
    } finally src.close()
  }

  test("v3 mode: the CLIENT originates keep-alive pings at the " +
      "handshake's pingInterval (engine.io v3 inverts the direction)") {
    val srv = new StubWsServer
    srv.start()
    val script = new Thread(() => {
      srv.awaitUpgrade()
      // v3 open: tight pingInterval so the test observes a ping fast;
      // a v2/v3 server acks the namespace UNPROMPTED (no '40' expected)
      srv.send("""0{"sid":"s1","pingInterval":1000,"pingTimeout":5000}""")
      srv.send("""40""")
      assert(srv.awaitClient() === """42["join","/persons"]""")
    }, "stub-ws-script-v3")
    script.start()
    val src = new WebSocketEventSource(
      s"ws://127.0.0.1:${srv.port}/socket.io/?EIO=3&transport=websocket",
      joinPath = "/persons", protocolV4 = false)
    try {
      src.connect()
      script.join(10000)
      // the client must send '2' within ~pingInterval; answer '3' and
      // expect the NEXT one too (periodic, not one-shot)
      assert(srv.awaitClient() === "2")
      srv.send("3")
      assert(srv.awaitClient() === "2")
    } finally { src.close(); srv.stop() }
  }

  test("uriFor builds both protocol majors' endpoints") {
    assert(WebSocketEventSource.uriFor("http://h:5000") ===
      "ws://h:5000/socket.io/?EIO=4&transport=websocket")
    assert(WebSocketEventSource.uriFor("https://api.example.org", v4 = false) ===
      "wss://api.example.org/socket.io/?EIO=3&transport=websocket")
  }

  test("full loop: a frame from the live websocket drives a REAL delta " +
      "merge through PushListener") {
    val dir = java.nio.file.Files.createTempDirectory("ws-push")
    val target = new ParquetTarget(spark, s"$dir/apptable")
    val runner = new SyncRunner(spark, SyncConfig("apptable", s"$dir/state"))
    target.overwrite(Seq(("/persons/1", 100L, "a"))
      .toDF("href", "modified_ms", "jsondata"))
    val delta = Seq(("/persons/1", 200L, "b"), ("/persons/2", 200L, "c"))
      .toDF("href", "modified_ms", "jsondata")
    val none = Seq.empty[String].toDF("href")

    val srv = new StubWsServer
    srv.start()
    val script = scriptHandshake(srv)
    val src = new WebSocketEventSource(
      s"ws://127.0.0.1:${srv.port}/socket.io/?EIO=4&transport=websocket",
      joinPath = "/persons")
    val listener = new PushListener(src,
      rooms = Map("/persons" ->
        (_ => { runner.deltaSync(delta, none, target); () })),
      reconnectMs = 50L, retryMs = 50L)
    listener.start()
    try {
      script.join(10000)
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
