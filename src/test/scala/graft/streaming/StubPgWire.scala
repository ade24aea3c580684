package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8

/** Protocol-faithful replication-server stub — the PG side of
  * [[PgWireClient]], the same arrangement as sinks' StubCH: this
  * environment has no PostgreSQL, so the WIRE mechanics (LSN-ordered
  * XLogData streaming, keepalives, standby-status acks, WAL retention
  * until the flushed LSN, restart replay from an arbitrary LSN) are
  * exercised against an in-process server speaking the same messages.
  *
  * Frames are PgOutput binary frames; their embedded LSN is the
  * ordering/retention key. `append` feeds live tail data to connected
  * clients; `prune` discards frames at-or-below the client-acked
  * flush point — the server-side WAL recycling that the ack exists to
  * permit.
  */
final class StubPgWire(initial: Seq[Array[Byte]],
                       dieAfterFramesOnce: Int = -1,
                       password: Option[String] = None,
                       tamperServerSignature: Boolean = false,
                       skipSaslFinal: Boolean = false,
                       md5Password: Option[String] = None,
                       tlsContext: Option[javax.net.ssl.SSLContext] = None,
                       // SASL mechanisms advertised when `password` is set:
                       // a hardened PG fleet serves ONLY -PLUS
                       saslMechanisms: Seq[String] = Seq(Scram.Mechanism),
                       // models the relaying MITM: the server's expected
                       // channel binding is computed from a DIFFERENT
                       // certificate than the one the client's TLS leg saw
                       tamperChannelBinding: Boolean = false) {

  private val log = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
  initial.foreach(f => log += ((PgOutput.parse(f).lsn.get, f)))

  // fault injection: the FIRST connection dies abruptly (socket close,
  // no keepalive) after streaming this many frames — the server-bounce
  // scenario PgWireClient.runWithReconnect exists for
  @volatile private var dieBudget = dieAfterFramesOnce

  @volatile var flushedByClient: Long = Long.MinValue
  @volatile var statusesSeen: Int = 0
  @volatile private var stopped = false
  private var server: ServerSocket = _
  private val threads = scala.collection.mutable.ArrayBuffer.empty[Thread]

  /** `port = 0` picks an ephemeral port; a fixed port lets a test
    * bounce the server and have the client reconnect to the same place.
    */
  def start(port: Int = 0): Int = {
    server = new ServerSocket(port)
    val acceptor = new Thread(() => {
      try while (!stopped) {
        val sock = server.accept()
        val t = new Thread(() => try handle(sock) catch { case _: Throwable => () })
        t.setDaemon(true); t.start()
        threads.synchronized { threads += t }
      } catch { case _: Throwable => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    threads.synchronized { threads += acceptor }
    server.getLocalPort
  }

  def append(frames: Seq[Array[Byte]]): Unit = log.synchronized {
    frames.foreach(f => log += ((PgOutput.parse(f).lsn.get, f)))
  }

  /** Discard frames the client has durably flushed — WAL recycling. */
  def prune(): Unit = log.synchronized {
    val cut = flushedByClient
    log.filterInPlace(_._1 > cut)
  }

  /** Oldest retained LSN (Long.MaxValue when the log is empty). */
  def oldestRetained: Long = log.synchronized {
    if (log.isEmpty) Long.MaxValue else log.map(_._1).min
  }

  def stop(): Unit = {
    stopped = true
    try server.close() catch { case _: Throwable => () }
  }

  private def handle(plainSock: Socket): Unit = {
    plainSock.setSoTimeout(30000)
    var sock = plainSock
    var in = new DataInputStream(sock.getInputStream)
    var out = new DataOutputStream(sock.getOutputStream)
    // the server's OWN certificate hash (RFC 5929) once TLS is up — what
    // a -PLUS verifier binds the SCRAM exchange to
    var localCertHash: Option[Array[Byte]] = None
    // --- optional SSLRequest, then the PQ v3 handshake (the walsender's
    // side of the public grammar). SSLRequest and StartupMessage share
    // the leading int32-length framing: len==8 + the magic code means
    // SSLRequest; answer 'S' and run the JSSE server handshake when a
    // TLS context is configured, 'N' otherwise (the sslmode=disable
    // server posture a require-mode client must refuse).
    var len = in.readInt()
    if (len == 8) {
      val code = in.readInt()
      if (code != PgWire.SslRequestCode) { sock.close(); return }
      tlsContext match {
        case Some(ctx) =>
          out.writeByte('S'); out.flush()
          val ssl = ctx.getSocketFactory
            .createSocket(sock, null, sock.getPort, true)
            .asInstanceOf[javax.net.ssl.SSLSocket]
          ssl.setUseClientMode(false)
          ssl.startHandshake()
          localCertHash = ssl.getSession.getLocalCertificates.headOption.collect {
            case c: java.security.cert.X509Certificate => PgWire.tlsServerEndPoint(c)
          }
          sock = ssl
          in = new DataInputStream(ssl.getInputStream)
          out = new DataOutputStream(ssl.getOutputStream)
        case None =>
          out.writeByte('N'); out.flush()
      }
      len = in.readInt() // now the real StartupMessage
    }
    // StartupMessage with replication=database, else this is not a
    // replication session and the stub refuses like a real walsender
    val params = PgWire.readStartupAfterLen(in, len)
    if (!params.get("replication").contains("database")) {
      PgWire.writeTyped(out, 'E',
        PgWire.errorBody("connection is not a replication connection"))
      sock.close()
      return
    }
    // trust → AuthenticationOk directly; password → the real
    // SCRAM-SHA-256 exchange (AuthenticationSASL 10 → 11 → 12), with the
    // same Scram math a walsender runs against its stored verifier
    def authInt(code: Int, tail: Array[Byte] = Array.emptyByteArray) =
      java.nio.ByteBuffer.allocate(4 + tail.length).putInt(code).put(tail).array()
    md5Password.foreach { pw =>
      // legacy AuthenticationMD5Password (code 5): 4-byte salt out,
      // "md5<hex>" response back, verified against the same double-md5
      // a pre-v10 pg_authid row stores
      val salt = Array[Byte](0x13, 0x37, 0x5a, 0x7e)
      PgWire.writeTyped(out, 'R', authInt(5, salt))
      val (tm, bm) = PgWire.readTyped(in)
      if (tm != 'p') { sock.close(); return }
      val got = new String(bm.takeWhile(_ != 0), UTF_8)
      val want = PgWire.md5Response(
        params.getOrElse("user", ""), pw, salt)
      if (got != want) {
        PgWire.writeTyped(out, 'E', PgWire.errorBody(
          "password authentication failed for user \"graft\""))
        sock.close(); return
      }
    }
    password match {
      case None => ()
      case Some(pw) =>
        PgWire.writeTyped(out, 'R',
          authInt(10, saslMechanisms.flatMap(PgWire.cstr).toArray :+ 0.toByte))
        val (t1, b1) = PgWire.readTyped(in)
        if (t1 != 'p') { sock.close(); return }
        // SASLInitialResponse: mechanism cstr + int32 len + initial data
        val mechEnd = b1.indexOf(0.toByte)
        val mech = new String(b1, 0, mechEnd, UTF_8)
        if (!saslMechanisms.contains(mech)) {
          PgWire.writeTyped(out, 'E',
            PgWire.errorBody(s"unsupported SASL mechanism $mech"))
          sock.close(); return
        }
        val ilen = java.nio.ByteBuffer.wrap(b1, mechEnd + 1, 4).getInt
        val clientFirst = new String(b1, mechEnd + 5, ilen, UTF_8)
        // -PLUS: the verifier REQUIRES client-final's c= to carry the
        // gs2 header plus THIS server's certificate hash (tampered under
        // tamperChannelBinding — the relaying-MITM model, whose own cert
        // necessarily differs from the one the client bound to)
        val expectCbind =
          if (mech != Scram.MechanismPlus) None
          else localCertHash.map { h =>
            val bound = if (tamperChannelBinding) h.map(b => (b ^ 0x5a).toByte) else h
            "p=tls-server-end-point,,".getBytes(UTF_8) ++ bound
          }
        val verifier = new Scram.Verifier(pw,
          "graft-stub-salt".getBytes(UTF_8), 4096, "srvnonce", expectCbind)
        PgWire.writeTyped(out, 'R',
          authInt(11, verifier.serverFirst(clientFirst).getBytes(UTF_8)))
        val (t2, b2) = PgWire.readTyped(in)
        if (t2 != 'p') { sock.close(); return }
        verifier.verifyClientFinal(new String(b2, UTF_8)) match {
          case None =>
            PgWire.writeTyped(out, 'E', PgWire.errorBody(
              "password authentication failed for user \"graft\""))
            sock.close(); return
          case Some(serverFinal) =>
            // skipSaslFinal models the MITM short-circuit (ADVICE r12):
            // collect the client proof, then jump straight to
            // AuthenticationOk without ever proving verifier knowledge
            if (!skipSaslFinal) {
              val v = if (tamperServerSignature)
                serverFinal.dropRight(4) + "AAA=" else serverFinal
              PgWire.writeTyped(out, 'R', authInt(12, v.getBytes(UTF_8)))
            }
        }
    }
    PgWire.writeTyped(out, 'R', java.nio.ByteBuffer.allocate(4).putInt(0).array())
    PgWire.writeTyped(out, 'S',
      PgWire.cstr("server_version") ++ PgWire.cstr("16.0"))
    PgWire.writeTyped(out, 'K',
      java.nio.ByteBuffer.allocate(8).putInt(4242).putInt(7).array())
    PgWire.writeTyped(out, 'Z', Array('I'.toByte))
    // Query: START_REPLICATION SLOT <slot> LOGICAL <X/X>
    val (qt, qbody) = PgWire.readTyped(in)
    if (qt != 'Q') { sock.close(); return }
    val q = new String(qbody.takeWhile(_ != 0), UTF_8).trim
    val m = "START_REPLICATION\\s+SLOT\\s+(\\S+)\\s+LOGICAL\\s+(\\S+)".r
      .findFirstMatchIn(q)
    if (m.isEmpty) {
      PgWire.writeTyped(out, 'E', PgWire.errorBody(s"syntax error at: $q"))
      sock.close()
      return
    }
    val startAfter = PgWire.parseLsn(m.get.group(2))
    // CopyBothResponse: textual format, zero columns — copy-data both ways
    PgWire.writeTyped(out, 'W',
      java.nio.ByteBuffer.allocate(3).put(0.toByte).putShort(0.toShort).array())
    // reader side: CopyData-wrapped standby statuses arrive asynchronously
    val reader = new Thread(() => {
      try while (!stopped && !sock.isClosed) {
        val (typ, body) = PgWire.readTyped(in)
        if (typ == 'd' && body(0) == 'r'.toByte) {
          val s = PgWire.decodeStandbyStatus(body)
          flushedByClient = math.max(flushedByClient, s.flushed)
          statusesSeen += 1
        }
      } catch { case _: Throwable => () }
    })
    reader.setDaemon(true)
    reader.start()
    // writer side: stream everything past the cursor, then keepalive —
    // every replication submessage rides inside CopyData ('d')
    var cursor = startAfter
    var sentThisConn = 0
    try while (!stopped && !sock.isClosed) {
      val batch = log.synchronized { log.filter(_._1 > cursor).sortBy(_._1).toSeq }
      batch.foreach { case (lsn, frame) =>
        if (dieBudget >= 0 && sentThisConn >= dieBudget) {
          dieBudget = -1 // die once, then behave
          sock.close()
          return
        }
        PgWire.writeTyped(out, 'd', PgWire.encodeXLogData(
          PgWire.XLogData(cursor, lsn, System.nanoTime() / 1000, frame)))
        cursor = lsn
        sentThisConn += 1
      }
      PgWire.writeTyped(out, 'd', PgWire.encodeKeepalive(
        PgWire.Keepalive(cursor, System.nanoTime() / 1000, replyRequested = true)))
      Thread.sleep(20)
    } catch { case _: SocketException => () }
    finally sock.close()
  }
}
