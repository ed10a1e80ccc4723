package graft.source

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** MySQL client/server protocol — the CONNECTION layer of operator S1.
  *
  * [[BinlogWire]] decodes binlog event BYTES; this file supplies the last
  * slice the reference gets from go-mysql's syncer
  * (`/root/reference/src/library/binlog/handler.go:58-71` via
  * `vendor/src/github.com/siddontang/go-mysql/replication/binlogsyncer.go`):
  * dial a MySQL server, authenticate, register as a replica, and issue
  * `COM_BINLOG_DUMP`, after which the server streams binlog events over the
  * wire. Everything here is the PUBLIC MySQL client/server protocol:
  *
  *  - packets: 3-byte little-endian payload length + 1-byte sequence id;
  *    a 0xffffff-length payload continues in the next packet;
  *  - initial handshake v10: server version, 20-byte auth nonce split 8+12,
  *    capability flags split low/high, auth plugin name;
  *  - HandshakeResponse41 with `mysql_native_password`:
  *    `SHA1(pw) XOR SHA1(nonce ++ SHA1(SHA1(pw)))`;
  *  - text resultsets for `COM_QUERY` (column count, column definitions,
  *    EOF, rows of length-encoded strings, EOF) — used for
  *    `SHOW BINARY LOGS`, the metadata-only "what exists" call that mirrors
  *    the file source's `Files.size` planning;
  *  - `COM_REGISTER_SLAVE` (0x15) then `COM_BINLOG_DUMP` (0x12) with the
  *    BINLOG_DUMP_NON_BLOCK flag: the server sends every event from the
  *    requested (file, pos), then an EOF packet instead of blocking — the
  *    protocol's own bounded-batch mode, which is exactly the micro-batch
  *    contract ([[ReplMicroBatchStream]] plans offsets, each partition
  *    drains one bounded dump).
  *
  * Event packets wrap each binlog event in one OK byte (0x00) followed by
  * the 19-byte event header + body — the same bytes [[BinlogEventDecoder]]
  * already parses from files.
  */
object MysqlWire {

  // command codes (public protocol)
  val COM_QUIT = 0x01
  val COM_QUERY = 0x03
  val COM_REGISTER_SLAVE = 0x15
  val COM_BINLOG_DUMP = 0x12
  val COM_BINLOG_DUMP_GTID = 0x1e

  /** The server's refusal when auto-position resume needs purged binlogs
    * (ER_MASTER_FATAL_ERROR_READING_BINLOG carries the purged-gtids text). */
  val ER_MASTER_FATAL_ERROR_READING_BINLOG = 1236

  // capability flags (the subset this client speaks)
  val CLIENT_LONG_PASSWORD = 0x00000001L
  val CLIENT_PROTOCOL_41 = 0x00000200L
  val CLIENT_SSL = 0x00000800L
  val CLIENT_SECURE_CONNECTION = 0x00008000L
  val CLIENT_PLUGIN_AUTH = 0x00080000L

  /** MySQL's error for a plaintext connection to a
    * `require_secure_transport=ON` server (the managed-MySQL default). */
  val ER_SECURE_TRANSPORT_REQUIRED = 3159

  val BINLOG_DUMP_NON_BLOCK = 0x01

  def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  def leAt(b: Array[Byte], at: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v |= (b(at + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Read one logical packet: (sequenceId, payload). Reassembles 16 MiB
    * continuation packets. Returns null at clean EOF before any byte. */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    def readN(n: Int, eofOk: Boolean): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) {
          if (off == 0 && eofOk) return null
          throw new EOFException("connection closed mid-packet")
        }
        off += r
      }
      buf
    }
    val head = readN(4, eofOk = true)
    if (head == null) return null
    var len = (leAt(head, 0, 3)).toInt
    val seq = head(3) & 0xff
    var payload = readN(len, eofOk = false)
    while (len == 0xffffff) {
      val h2 = readN(4, eofOk = false)
      len = leAt(h2, 0, 3).toInt
      payload = payload ++ readN(len, eofOk = false)
    }
    (seq, payload)
  }

  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Unit = {
    // payloads here are tiny (commands); continuation split not needed,
    // but guard loudly rather than corrupt framing
    require(payload.length < 0xffffff, "oversized client packet")
    out.write(le(payload.length, 3)); out.write(seq & 0xff)
    out.write(payload)
    out.flush()
  }

  /** mysql_native_password scramble: SHA1(pw) XOR SHA1(nonce ++ SHA1(SHA1(pw)));
    * empty password → empty token. */
  def nativePasswordScramble(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha1 = MessageDigest.getInstance("SHA-1")
    val h1 = sha1.digest(password.getBytes(StandardCharsets.UTF_8))
    sha1.reset()
    val h2 = sha1.digest(h1)
    sha1.reset()
    sha1.update(nonce)
    sha1.update(h2)
    val rhs = sha1.digest()
    h1.indices.map(i => (h1(i) ^ rhs(i)).toByte).toArray
  }

  /** caching_sha2_password scramble (MySQL 8's default plugin, public
    * protocol): SHA256(pw) XOR SHA256(SHA256(SHA256(pw)) ++ nonce); empty
    * password → empty token. This is the CACHED fast path's proof — the
    * server accepts it whenever the account's SHA256 digest is in its auth
    * cache (any prior full login primes it). */
  def cachingSha2Scramble(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha = MessageDigest.getInstance("SHA-256")
    val h1 = sha.digest(password.getBytes(StandardCharsets.UTF_8))
    sha.reset()
    val h2 = sha.digest(h1)
    sha.reset()
    sha.update(h2)
    sha.update(nonce)
    val rhs = sha.digest()
    h1.indices.map(i => (h1(i) ^ rhs(i)).toByte).toArray
  }

  /** caching_sha2 FULL-auth scramble: the NUL-terminated password XORed with
    * the handshake nonce (cycled) — the plaintext the RSA exchange encrypts.
    * Public protocol: the XOR prevents a replay of the ciphertext alone from
    * being useful against a different session's nonce. */
  def sha2XorPassword(password: String, nonce: Array[Byte]): Array[Byte] = {
    val pwd = password.getBytes(StandardCharsets.UTF_8) :+ 0.toByte
    pwd.indices.map(i => (pwd(i) ^ nonce(i % nonce.length)).toByte).toArray
  }

  /** Encrypt the XOR-scrambled password with the server's RSA public key
    * (PEM/SPKI as served in the AuthMoreData reply to a 0x02 public-key
    * request) using RSA-OAEP(SHA-1) — MySQL 8's padding for
    * caching_sha2_password full auth over a non-TLS channel. */
  def sha2RsaEncrypt(password: String, nonce: Array[Byte], publicKeyPem: String): Array[Byte] = {
    val b64 = publicKeyPem
      .replaceAll("-----(BEGIN|END) (RSA )?PUBLIC KEY-----", "")
      .replaceAll("\\s", "")
    val der = java.util.Base64.getDecoder.decode(b64)
    val key = java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
    val cipher = javax.crypto.Cipher.getInstance("RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE, key)
    cipher.doFinal(sha2XorPassword(password, nonce))
  }

  def isOk(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0x00
  def isEof(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0xfe && p.length < 9
  def isErr(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0xff

  /** Render an ERR packet's (code, message); fails loudly on anything else. */
  def errOf(p: Array[Byte]): String = {
    val code = leAt(p, 1, 2)
    var at = 3
    if (p.length > 3 && p(3) == '#') at += 6 // sql-state marker + 5 bytes
    val msg = new String(p, at, p.length - at, StandardCharsets.UTF_8)
    s"MySQL error $code: $msg"
  }

  /** A server ERR packet as an exception carrying its numeric code, so
    * callers can branch on SPECIFIC server errors (a missing RELOAD
    * privilege, say) instead of string-matching the rendered message. */
  final class MysqlServerError(val code: Int, msg: String)
      extends java.io.IOException(msg)

  def errEx(p: Array[Byte]): MysqlServerError =
    new MysqlServerError(leAt(p, 1, 2).toInt, errOf(p))
}

/** TLS posture for the replication channel — serializable (shipped inside
  * [[ReplConfig]] to executors; the `SSLContext` is built lazily ON USE, it
  * never crosses the wire). The public protocol's upgrade: the client sends a
  * 32-byte SSL-request packet (the HandshakeResponse41 prefix with
  * `CLIENT_SSL` set), the TLS handshake runs on the raw socket, and the full
  * handshake response + everything after travels encrypted. Modes mirror the
  * mysql client's `--ssl-mode`:
  *
  *  - `TlsConfig.Off` — plaintext (a `require_secure_transport=ON` server
  *    refuses with ERR 3159; [[ReplicationClient.connect]] renders the fix);
  *  - `enabled` with neither truststore nor trustAll — the JVM's default
  *    trust anchors WITH hostname verification (`VERIFY_IDENTITY`): the
  *    right default against a public-CA managed endpoint;
  *  - `truststorePath` (PKCS12) — pin a private CA / self-signed server cert
  *    (`VERIFY_CA` semantics: chain is verified against the pinned anchors;
  *    hostname is not, since private-CA certs routinely lack the deployment
  *    host's SAN);
  *  - `trustAll` — no verification (dev only; still encrypted).
  */
case class TlsConfig(enabled: Boolean = false, trustAll: Boolean = false,
                     truststorePath: String = "", truststorePassword: String = "")
    extends Serializable {

  private def context(): javax.net.ssl.SSLContext =
    if (trustAll) {
      val tm = new javax.net.ssl.X509TrustManager {
        override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
          Array.empty
      }
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, Array(tm), null)
      ctx
    } else if (truststorePath.nonEmpty) {
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val is = new java.io.FileInputStream(truststorePath)
      try ks.load(is, truststorePassword.toCharArray) finally is.close()
      val tmf = javax.net.ssl.TrustManagerFactory
        .getInstance(javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, null)
      ctx
    } else javax.net.ssl.SSLContext.getDefault

  /** Layer TLS over an already-connected socket (client mode) and run the
    * handshake eagerly so certificate rejection surfaces HERE with a clear
    * message, not as a generic IOException on the first later read. */
  def wrap(plain: Socket, host: String, port: Int): javax.net.ssl.SSLSocket = {
    val ssl = context().getSocketFactory
      .createSocket(plain, host, port, true)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    if (!trustAll && truststorePath.isEmpty) {
      val params = ssl.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      ssl.setSSLParameters(params)
    }
    try { ssl.startHandshake(); ssl }
    catch {
      case e: javax.net.ssl.SSLException =>
        throw new java.io.IOException(
          s"TLS handshake with $host:$port failed: ${e.getMessage}. If the " +
            "server uses a self-signed or private-CA certificate, pin it " +
            "with tlsTruststore=<pkcs12 path> (+ tlsTruststorePassword), " +
            "or tlsInsecure=true for dev.", e)
    }
  }
}

object TlsConfig {
  val Off: TlsConfig = TlsConfig()
}

/** Minimal replication-protocol client. One instance = one connection = one
  * ordered event stream (the same single-stream shape as the reference's
  * canal loop). Not thread-safe; a DSv2 partition owns its client. */
final class ReplicationClient(host: String, port: Int, user: String, password: String,
                              serverId: Long, tls: TlsConfig = TlsConfig.Off)
    extends AutoCloseable {
  import MysqlWire._

  private var socket: Socket = _
  private var in: InputStream = _
  private var out: OutputStream = _
  private var dumping = false

  /** Dial + handshake + authenticate. */
  def connect(timeoutMs: Int = 10000): Unit = {
    socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), timeoutMs)
    socket.setSoTimeout(timeoutMs)
    socket.setTcpNoDelay(true)
    in = new BufferedInputStream(socket.getInputStream, 1 << 16)
    out = new BufferedOutputStream(socket.getOutputStream, 1 << 14)

    val (seq, hs) = readPacket(in) match {
      case null => throw new EOFException(s"$host:$port closed before handshake")
      case p => p
    }
    if (isErr(hs)) throw errEx(hs)
    require((hs(0) & 0xff) == 10, s"unsupported handshake protocol ${hs(0) & 0xff}")
    // server_version: nul-terminated from offset 1
    var at = 1
    while (hs(at) != 0) at += 1
    at += 1
    at += 4 // thread id
    val auth1 = java.util.Arrays.copyOfRange(hs, at, at + 8); at += 8
    at += 1 // filler
    var serverCaps = leAt(hs, at, 2); at += 2 // capability flags (lower)
    var nonce = auth1
    if (at < hs.length) {
      at += 1 + 2 // charset, status
      serverCaps |= leAt(hs, at, 2) << 16; at += 2 // capability flags (upper)
      val authLen = hs(at) & 0xff; at += 1
      at += 10 // reserved
      // auth-data part 2: max(13, authLen - 8) bytes, last is a NUL
      val part2Len = math.max(13, authLen - 8)
      val auth2 = java.util.Arrays.copyOfRange(hs, at, at + part2Len - 1)
      nonce = auth1 ++ auth2.take(12)
    }

    val caps = CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41 |
      CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH |
      (if (tls.enabled) CLIENT_SSL else 0L)
    var respSeq = seq + 1
    if (tls.enabled) {
      // CLIENT_SSL upgrade (public protocol): a 32-byte SSL-request packet —
      // the HandshakeResponse41 prefix (caps with CLIENT_SSL, max packet,
      // charset, 23 reserved zeros) and NO user/auth — then the TLS
      // handshake on the raw socket; the full response follows encrypted.
      if ((serverCaps & CLIENT_SSL) == 0)
        throw new java.io.IOException(
          s"$host:$port does not advertise CLIENT_SSL (the server was built " +
            "or started without TLS support) but option tls=true was set; " +
            "drop tls=true or enable TLS on the server")
      val ssl = new java.io.ByteArrayOutputStream()
      ssl.write(le(caps, 4)); ssl.write(le((1 << 24) - 1, 4)); ssl.write(33)
      ssl.write(new Array[Byte](23))
      writePacket(out, respSeq, ssl.toByteArray); respSeq += 1
      socket = tls.wrap(socket, host, port)
      socket.setSoTimeout(timeoutMs)
      in = new BufferedInputStream(socket.getInputStream, 1 << 16)
      out = new BufferedOutputStream(socket.getOutputStream, 1 << 14)
    }
    val token = nativePasswordScramble(password, nonce)
    val b = new java.io.ByteArrayOutputStream()
    b.write(le(caps, 4)); b.write(le((1 << 24) - 1, 4)); b.write(33) // utf8
    b.write(new Array[Byte](23))
    b.write(user.getBytes(StandardCharsets.UTF_8)); b.write(0)
    b.write(token.length); b.write(token)
    b.write("mysql_native_password".getBytes(StandardCharsets.UTF_8)); b.write(0)
    writePacket(out, respSeq, b.toByteArray)

    var (rseq, reply) = readPacketOrFail()
    // AuthSwitchRequest (0xfe + plugin name + fresh nonce): a MySQL 8 server
    // whose default plugin differs switches the account's plugin here —
    // answer with the re-scrambled token in THAT plugin's formula.
    // Distinguished from a plain EOF packet by its length (isEof is < 9).
    if (reply.nonEmpty && (reply(0) & 0xff) == 0xfe && reply.length >= 9) {
      val nul = reply.indexOf(0.toByte, 1)
      require(nul > 1, "malformed AuthSwitchRequest")
      val plugin = new String(reply, 1, nul - 1, StandardCharsets.UTF_8)
      val fresh = java.util.Arrays.copyOfRange(reply, nul + 1,
        math.min(reply.length, nul + 21)) // 20-byte nonce; trailing NUL dropped
      val switched = plugin match {
        case "mysql_native_password" => nativePasswordScramble(password, fresh)
        case "caching_sha2_password" => cachingSha2Scramble(password, fresh)
        case other => throw new IllegalArgumentException(
          s"unsupported auth plugin switch: $other (use mysql_native_password " +
            "or caching_sha2_password for the replication user)")
      }
      writePacket(out, rseq + 1, switched)
      var next = readPacketOrFail()
      // caching_sha2 continuation: 0x01 0x03 = cached FAST path accepted (an
      // OK follows); 0x01 0x04 = the cache is cold and the server demands
      // FULL auth. Over a non-TLS channel the public protocol is the RSA
      // exchange: request the server's public key (one 0x02 byte), XOR the
      // NUL-terminated password with the handshake nonce, RSA-OAEP encrypt,
      // send — the server verifies and replies OK, priming its cache for the
      // fast path on every later dial. (Parity-plus: the reference's vendored
      // go-mysql is native-password only.)
      if (plugin == "caching_sha2_password" && next._2.length >= 2 &&
          (next._2(0) & 0xff) == 0x01) {
        (next._2(1) & 0xff) match {
          case 0x03 => next = readPacketOrFail() // fast-auth success marker
          case 0x04 if tls.enabled =>
            // FULL auth over TLS — the standard path: the channel is already
            // encrypted, so the NUL-terminated plaintext password goes
            // straight down it (no RSA exchange), the server verifies
            // against its stored SHA-256 digest and primes the cache.
            writePacket(out, next._1 + 1,
              password.getBytes(StandardCharsets.UTF_8) :+ 0.toByte)
            next = readPacketOrFail()
          case 0x04 =>
            writePacket(out, next._1 + 1, Array(0x02.toByte)) // public key, please
            val (kseq, kpkt) = readPacketOrFail()
            if (isErr(kpkt)) throw new java.io.IOException(
              "caching_sha2_password full auth: the server refused to hand " +
                s"out its RSA public key (${errOf(kpkt)}). Set option " +
                "tls=true (full auth over TLS is the standard path), prime " +
                "the cache with one TLS login, or create the replication " +
                "user WITH mysql_native_password")
            require((kpkt(0) & 0xff) == 0x01 && kpkt.length > 1,
              "expected AuthMoreData carrying the RSA public key")
            val pem = new String(kpkt, 1, kpkt.length - 1, StandardCharsets.UTF_8)
            writePacket(out, kseq + 1, sha2RsaEncrypt(password, fresh, pem))
            next = readPacketOrFail()
          case other => throw new java.io.IOException(
            f"unexpected caching_sha2 continuation 0x$other%02x")
        }
      }
      rseq = next._1; reply = next._2
    }
    if (isErr(reply)) {
      val ex = errEx(reply)
      if (ex.code == ER_SECURE_TRANSPORT_REQUIRED && !tls.enabled)
        throw new java.io.IOException(
          s"$host:$port requires TLS (require_secure_transport=ON — the " +
            s"managed-MySQL default): ${ex.getMessage}. Set option tls=true " +
            "(and tlsTruststore=<pkcs12> if the server cert is not " +
            "public-CA signed)", ex)
      throw new java.io.IOException(s"auth failed: ${ex.getMessage}", ex)
    }
    require(isOk(reply), "unexpected auth reply")
  }

  /** [[MysqlWire.readPacket]] that treats a clean close as an error: inside
    * a session every expected packet has a sender, so null always means the
    * server went away — surface that, not a downstream MatchError/NPE. */
  private def readPacketOrFail(): (Int, Array[Byte]) = readPacket(in) match {
    case null => throw new EOFException(s"$host:$port closed the connection")
    case p => p
  }

  private def sendCommand(payload: Array[Byte]): Unit = {
    require(!dumping, "connection is in binlog-dump mode")
    writePacket(out, 0, payload) // each command restarts the sequence
  }

  private def expectOk(): Unit = {
    val (_, p) = readPacketOrFail()
    if (isErr(p)) throw errEx(p)
    require(isOk(p) || isEof(p), "expected OK")
  }

  /** COM_QUERY returning a text resultset as rows of nullable strings
    * (None = SQL NULL); statements that return OK yield Nil. Materializes —
    * metadata-sized results only; the snapshot data path uses
    * [[queryForeach]]. */
  def query(sql: String): Seq[Seq[Option[String]]] = {
    val rows = Seq.newBuilder[Seq[Option[String]]]
    queryForeach(sql)(rows += _)
    rows.result()
  }

  /** COM_QUERY streaming the text resultset one row at a time — bounded
    * memory for arbitrarily large results (the snapshot's `SELECT *` over a
    * big table arrives row-packet by row-packet and is spooled, never
    * held). */
  def queryForeach(sql: String)(f: Seq[Option[String]] => Unit): Unit = {
    sendCommand(Array(COM_QUERY.toByte) ++ sql.getBytes(StandardCharsets.UTF_8))
    val (_, first) = readPacketOrFail()
    if (isErr(first)) throw errEx(first)
    if (isOk(first)) return
    val nCols = new BinlogWire.Cursor(first, 0).lenenc().toInt
    var i = 0
    while (i < nCols) { readPacketOrFail(); i += 1 } // column definitions (opaque here)
    require(isEof(readPacketOrFail()._2), "missing EOF after column defs")
    var rp = readPacketOrFail()._2
    while (!isEof(rp)) {
      if (isErr(rp)) throw errEx(rp)
      val c = new BinlogWire.Cursor(rp, 0)
      val row = Seq.newBuilder[Option[String]]
      while (c.remaining > 0) {
        if ((rp(c.at) & 0xff) == 0xfb) { c.skip(1); row += None }
        else row += Some(c.str(c.lenenc().toInt))
      }
      f(row.result())
      rp = readPacketOrFail()._2
    }
  }

  /** The server's immutable identity (`@@server_uuid`) — the one value that
    * distinguishes "same primary, rotated/purged forward" from "a different
    * primary after failover" when binlog file names are disjoint. MariaDB
    * has no server_uuid; any server error yields None (callers fall back to
    * a name-continuity heuristic). */
  def serverUuid(): Option[String] =
    try query("SELECT @@server_uuid").headOption.flatMap(_.headOption.flatten)
    catch { case _: MysqlWire.MysqlServerError => None }

  /** `SHOW BINARY LOGS` → sorted (file, sizeBytes): the replication
    * analogue of [[CdcSource.listFiles]] — metadata only, never events.
    * Sorted by the NUMERIC file suffix where present: plain lexicographic
    * order breaks when the server's counter crosses a digit-length boundary
    * (`binlog.999999` rotates to `binlog.1000000`, which sorts lexically
    * BEFORE it — MySQL keeps widening the suffix). */
  def binaryLogs(): Seq[(String, Long)] =
    query("SHOW BINARY LOGS")
      .map(r => (r(0).getOrElse(""), r(1).getOrElse("0").toLong))
      .sortBy { case (name, _) =>
        val dot = name.lastIndexOf('.')
        val suffix = if (dot >= 0) name.substring(dot + 1) else ""
        val num = if (suffix.nonEmpty && suffix.forall(_.isDigit)) suffix.toLong else -1L
        (if (dot >= 0) name.substring(0, dot) else name, num, name)
      }

  /** COM_REGISTER_SLAVE: announce this client in SHOW SLAVE HOSTS. */
  def registerSlave(reportHost: String = "graft", reportPort: Int = 0): Unit = {
    val hostB = reportHost.getBytes(StandardCharsets.UTF_8)
    val userB = user.getBytes(StandardCharsets.UTF_8)
    val b = new java.io.ByteArrayOutputStream()
    b.write(COM_REGISTER_SLAVE)
    b.write(le(serverId, 4))
    b.write(hostB.length); b.write(hostB)
    b.write(userB.length); b.write(userB)
    b.write(0) // password not reported
    b.write(le(reportPort, 2))
    b.write(le(0, 4)) // replication rank (unused)
    b.write(le(0, 4)) // master id (0 = from server)
    sendCommand(b.toByteArray)
    expectOk()
  }

  /** Re-arm the socket read timeout — the blocking-dump loop idles between
    * events for up to a heartbeat period, far longer than the handshake
    * timeout that is appropriate during [[connect]]. */
  def soTimeout(ms: Int): Unit = socket.setSoTimeout(ms)

  /** Ask the server to emit HEARTBEAT events every `secs` while a blocking
    * dump is idle (the reference's canal.toml 30 s heartbeat): the liveness
    * signal that distinguishes "no traffic" from "dead connection", letting
    * the reader keep a finite socket timeout. The variable is in
    * nanoseconds. */
  def setHeartbeatPeriod(secs: Int): Unit = {
    sendCommand(Array(COM_QUERY.toByte) ++
      s"SET @master_heartbeat_period = ${secs.toLong * 1000000000L}"
        .getBytes(StandardCharsets.UTF_8))
    expectOk()
  }

  /** Tell the server we accept its checksum format (real servers refuse to
    * dump to a slave that has not set this; go-mysql does the same). */
  def negotiateChecksum(): Unit = {
    sendCommand(Array(COM_QUERY.toByte) ++
      "SET @master_binlog_checksum = @@global.binlog_checksum"
        .getBytes(StandardCharsets.UTF_8))
    expectOk()
  }

  /** COM_BINLOG_DUMP from (file, pos). Non-blocking mode: the server sends
    * everything it has, then EOF — one bounded micro-batch per dump. */
  def dump(file: String, pos: Long, nonBlocking: Boolean = true): Unit = {
    require(pos >= 4, s"binlog positions start at 4 (after magic), got $pos")
    val b = new java.io.ByteArrayOutputStream()
    b.write(COM_BINLOG_DUMP)
    b.write(le(pos, 4))
    b.write(le(if (nonBlocking) BINLOG_DUMP_NON_BLOCK else 0, 2))
    b.write(le(serverId, 4))
    b.write(file.getBytes(StandardCharsets.UTF_8))
    sendCommand(b.toByteArray)
    dumping = true
  }

  /** COM_BINLOG_DUMP_GTID — auto-position: the SERVER chooses the dump start
    * from the replica's executed set (`MASTER_AUTO_POSITION=1`'s wire form).
    * Payload (public protocol): flags(2) server_id(4) name_len(4) name
    * pos(8) data_len(4) data, with an EMPTY name + pos 4 meaning "you pick"
    * and data = the [[GtidSet]] wire encoding. The server answers with an
    * artificial ROTATE naming its chosen file, then streams, skipping
    * transactions already in the set — or refuses with 1236 when required
    * binlogs are purged. */
  def dumpGtid(executed: GtidSet, nonBlocking: Boolean = true): Unit = {
    val data = executed.encode
    val b = new java.io.ByteArrayOutputStream()
    b.write(COM_BINLOG_DUMP_GTID)
    b.write(le(if (nonBlocking) BINLOG_DUMP_NON_BLOCK else 0, 2))
    b.write(le(serverId, 4))
    b.write(le(0, 4)) // empty file name: server-side auto-position
    b.write(le(4L, 8))
    b.write(le(data.length.toLong, 4))
    b.write(data)
    sendCommand(b.toByteArray)
    dumping = true
  }

  /** Next event's raw bytes (19-byte header + body), or null at the
    * non-blocking dump's EOF packet. A socket close WITHOUT that EOF packet
    * is an ERROR, never an end-of-batch: the planner has already promised
    * this partition's byte range to the checkpoint, so silently returning
    * null here would commit an offset past events that were never read —
    * permanent data loss. Throwing instead fails the task, Spark retries,
    * and at-least-once holds. */
  def nextEvent(): Array[Byte] = {
    val pkt = readPacket(in)
    if (pkt == null)
      throw new EOFException(
        s"$host:$port closed mid-dump (no EOF packet): network drop, server " +
          "restart, or a duplicate server_id dump being killed — the task " +
          "must retry, not truncate")
    val p = pkt._2
    if (isEof(p)) { dumping = false; return null }
    if (isErr(p)) throw errEx(p)
    require((p(0) & 0xff) == 0x00, "malformed event packet")
    java.util.Arrays.copyOfRange(p, 1, p.length)
  }

  override def close(): Unit = {
    try {
      if (socket != null && !socket.isClosed && !dumping) {
        try writePacket(out, 0, Array(COM_QUIT.toByte)) catch { case _: Exception => () }
      }
    } finally if (socket != null) socket.close()
  }
}

/** Base-schema bootstrap from a live server — the reference needs no manual
  * schema registration: canal fetches `SHOW FULL COLUMNS` on demand
  * (`vendor/.../canal/canal.go:282-305`). This is the eager engine-start
  * equivalent: walk the server's databases/tables once over the metadata
  * connection and register every table's column list, so a user points the
  * engine at a server and decoding just works. Versioned drift then evolves
  * from these bases as ALTERs stream in. */
object SchemaBootstrap {

  val SystemDbs: Set[String] =
    Set("information_schema", "mysql", "performance_schema", "sys")

  /** Register every (db, table)'s base schema; returns what was registered.
    * `SHOW FULL COLUMNS`' Type column is exactly the spec
    * [[graft.cdc.SchemaRegistry.colMetaOf]] parses (enum/set value lists,
    * `unsigned` markers included) — the same string canal reads. */
  def fromServer(c: ReplicationClient, registry: graft.cdc.SchemaRegistry,
                 includeDb: String => Boolean = db => !SystemDbs.contains(db))
      : Seq[(String, String)] = {
    val dbs = c.query("SHOW DATABASES").flatMap(_.headOption.flatten).filter(includeDb)
    for {
      db <- dbs
      table <- c.query(s"SHOW TABLES FROM `$db`").flatMap(_.headOption.flatten)
    } yield {
      val cols = c.query(s"SHOW FULL COLUMNS FROM `$db`.`$table`").collect {
        case row if row.nonEmpty && row.head.isDefined =>
          graft.cdc.SchemaRegistry.colMetaOf(row.head.get,
            row.lift(1).flatten.getOrElse(""))
      }
      registry.register(db, table, cols)
      (db, table)
    }
  }
}

/** [[BinlogReader]] over a LIVE replication connection: dial, authenticate,
  * `COM_REGISTER_SLAVE`, then `COM_BINLOG_DUMP` from `(file, fromByte)` and
  * decode the event stream with the same [[BinlogEventDecoder]] as the file
  * reader. Event positions come from each header's `log_pos - event_size`
  * (log_pos is the END of the event within its file — the unit of
  * `mysql.Position.Pos`); artificial server events (the fake ROTATE and the
  * re-sent FORMAT_DESCRIPTION carry log_pos 0) decode for their side effects
  * but never emit.
  *
  * Positions must be EVENT BOUNDARIES: a dump cannot start mid-event (the
  * file reader re-parses from the magic; a socket cannot). The planner
  * guarantees this — [[ReplMicroBatchStream]] only checkpoints offsets at
  * file ends or the server-reported live tail, both of which the server
  * only ever advances by whole events. `fromByte` ≤ 4 means "start of
  * file". */
final class ReplicationBinlogReader(host: String, port: Int, user: String, password: String,
                                    serverId: Long, file: String, fromByte: Long,
                                    untilByte: Long, seqBase: Long = 0L,
                                    tls: TlsConfig = TlsConfig.Off,
                                    attachRowsQuery: Boolean = false) extends BinlogReader {
  private val client = new ReplicationClient(host, port, user, password, serverId, tls)
  client.connect()
  client.negotiateChecksum()
  client.registerSlave()
  client.dump(file, math.max(4L, fromByte))
  private val decoder = new BinlogEventDecoder(seqBase, s"$host:$port/$file", attachRowsQuery)
  private var done = false

  /** 64-bit end position of the last real event seen. The header's log_pos
    * field is 32-bit and WRAPS once a binlog file grows past 4 GiB (a large
    * transaction extends a file beyond max_binlog_size); trusting it raw
    * would make post-wrap events fail the fromByte/untilByte range checks
    * and silently vanish. Positions are therefore reconstructed in the
    * 4 GiB window tracked here: dump order is monotone (only the re-sent
    * FORMAT_DESCRIPTION, handled by type, legitimately points backwards),
    * so a backwards jump of more than 2 GiB is the wrap. */
  private var lastEnd = math.max(4L, fromByte)

  override def nextLine(): (Long, String) = {
    while (!done) {
      val ev = client.nextEvent()
      if (ev == null) { done = true; return null }
      val head = java.util.Arrays.copyOfRange(ev, 0, 19)
      val body = java.util.Arrays.copyOfRange(ev, 19, ev.length)
      val etype = head(4) & 0xff
      val eventSize = MysqlWire.leAt(head, 9, 4)
      val logPos = MysqlWire.leAt(head, 13, 4) // 32-bit: the low word only
      // A REAL rotate (log_pos > 0; the dump-start artificial one carries 0)
      // ends the requested file: a real server's non-blocking dump KEEPS
      // STREAMING into the next binlog file, whose events restart at small
      // log_pos values — without this stop they would pass the untilByte
      // check and be mis-attributed to THIS file's range, duplicating the
      // next file's partition. (The scripted stub ends each dump at the
      // file's end; a live server does not.)
      if (etype == BinlogWire.ROTATE_EVENT && logPos > 0) { done = true; return null }
      val eventStart =
        if (logPos == 0) -1L // artificial server event (the one reliable marker)
        else {
          var end = (lastEnd & ~0xffffffffL) | logPos
          if (etype == BinlogWire.FORMAT_DESCRIPTION_EVENT) {
            // re-sent at every dump start with its true in-file log_pos: a
            // small backwards value, never a wrap — decode for side effects
            // (checksum mode), don't move the window
            end - eventSize
          } else {
            if (end + 0x80000000L < lastEnd) end += 0x100000000L // log_pos wrapped
            // A log_pos smaller than the event's own size normally marks an
            // artificial server event — but an event whose true 64-bit end
            // lands within eventSize bytes past a 4 GiB multiple wraps into
            // exactly that range. Classify by the RECONSTRUCTED start: only
            // a start before the file magic (4) is truly implausible.
            if (end - eventSize < 4L) -1L
            else {
              lastEnd = math.max(lastEnd, end)
              end - eventSize
            }
          }
        }
      if (eventStart >= untilByte) { done = true; return null }
      val line = decoder.decode(head, body, math.max(eventStart, 0L))
      if (line != null && eventStart >= fromByte) return (eventStart, line)
    }
    null
  }

  override def close(): Unit = client.close()
}
