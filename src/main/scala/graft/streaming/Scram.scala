package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import java.security.MessageDigest

/** SCRAM-SHA-256 and SCRAM-SHA-256-PLUS (RFC 5802 / RFC 7677), the
  * mechanisms PostgreSQL uses for password auth since v10 — pure-JVM
  * crypto (HMAC-SHA256 + PBKDF2), no native libraries. Both halves
  * live here: the CLIENT exchange [[PgWireClient]] runs inside
  * AuthenticationSASL, and the VERIFIER math a server needs
  * (StubPgWire authenticates with it in tests; a real PG stores
  * StoredKey/ServerKey derived exactly this way).
  *
  * Channel binding (RFC 5802 §6, RFC 5929 tls-server-end-point): on a
  * TLS socket whose server offers `-PLUS`, the client binds the SCRAM
  * exchange to the server certificate's hash — a relaying MITM that
  * terminates both TLS legs presents a DIFFERENT certificate, so its
  * relayed proof fails even though both passwords are correct. On a
  * TLS socket whose server offers only the base mechanism, the gs2
  * header carries `y` (client can bind, server apparently can't) so a
  * binding-capable real server detects a PLUS-stripping downgrade; on
  * a plaintext socket there is no channel to bind and the header is
  * `n`. A PLUS-only server reached WITHOUT TLS is refused loudly.
  */
object Scram {

  val Mechanism = "SCRAM-SHA-256"
  val MechanismPlus = "SCRAM-SHA-256-PLUS"

  def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg)
  }

  def h(msg: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(msg)

  /** Hi(str, salt, i) — PBKDF2-HMAC-SHA256 with dkLen = hash length. */
  def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  /** Parse `k1=v1,k2=v2,...` attribute lists (values may contain '='). */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",").filter(_.length >= 2).map(p => p.charAt(0) -> p.drop(2)).toMap

  /** The client side of one full exchange. Construct with the password
    * and a nonce, feed the server-first message, emit the client-final
    * message, then REQUIRE the server's signature — a peer that cannot
    * prove knowledge of the verifier is treated as hostile even after
    * it "accepts" the password.
    */
  final class Client(password: String, clientNonce: String,
                     username: String = "",
                     channelBinding: Option[Array[Byte]] = None,
                     tlsAvailable: Boolean = false) {
    // PostgreSQL ignores the SASL username (the startup user binds the
    // role) and clients send it empty; the RFC 7677 test vector carries
    // one, so it stays a parameter — ScramSpec pins the math against
    // the published vector verbatim.
    //
    // gs2 flag (RFC 5802 §7): `p=` binds to the TLS channel (the -PLUS
    // path; `channelBinding` is the tls-server-end-point cert hash),
    // `y` = client supports binding but the server offered no -PLUS
    // (downgrade-detectable by a binding-capable server), `n` = no
    // channel exists (plaintext socket).
    val gs2Header: String = channelBinding match {
      case Some(_)               => "p=tls-server-end-point,,"
      case None if tlsAvailable  => "y,,"
      case None                  => "n,,"
    }
    /** cbind-input: the gs2 header bytes, plus the channel-binding data
      * itself on the `p=` path — what client-final's `c=` carries.
      */
    val cbindInput: Array[Byte] =
      gs2Header.getBytes(UTF_8) ++ channelBinding.getOrElse(Array.emptyByteArray)
    val clientFirstBare = s"n=$username,r=$clientNonce"
    def clientFirstMessage: String = gs2Header + clientFirstBare

    private var serverFirst: String = _
    private var authMessage: String = _
    private var saltedPassword: Array[Byte] = _

    /** server-first → client-final (throws on a nonce that does not
      * extend ours — the replay guard RFC 5802 requires).
      */
    def clientFinal(serverFirstMessage: String): String = {
      serverFirst = serverFirstMessage
      val a = attrs(serverFirstMessage)
      val nonce = a('r')
      require(nonce.startsWith(clientNonce), "server nonce must extend the client nonce")
      val salt = unb64(a('s'))
      val iters = a('i').toInt
      require(iters >= 1 && iters <= 10000000, s"absurd iteration count $iters")
      saltedPassword = hi(password, salt, iters)
      val clientFinalNoProof = s"c=${b64(cbindInput)},r=$nonce"
      authMessage = s"$clientFirstBare,$serverFirstMessage,$clientFinalNoProof"
      val clientKey = hmac(saltedPassword, "Client Key".getBytes(UTF_8))
      val storedKey = h(clientKey)
      val proof = xor(clientKey, hmac(storedKey, authMessage.getBytes(UTF_8)))
      s"$clientFinalNoProof,p=${b64(proof)}"
    }

    /** Verify the server's `v=` signature from AuthenticationSASLFinal. */
    def verifyServerFinal(serverFinalMessage: String): Boolean = {
      val a = attrs(serverFinalMessage)
      a.get('v').exists { v =>
        val serverKey = hmac(saltedPassword, "Server Key".getBytes(UTF_8))
        MessageDigest.isEqual(
          unb64(v), hmac(serverKey, authMessage.getBytes(UTF_8)))
      }
    }
  }

  /** The verifier side (what a server stores/computes) — used by
    * StubPgWire to authenticate the client exactly the way a real
    * walsender would.
    */
  final class Verifier(password: String, val salt: Array[Byte],
                       val iterations: Int, serverNonceExt: String,
                       expectCbind: Option[Array[Byte]] = None) {
    // expectCbind: the full cbind-input bytes a -PLUS server requires —
    // gs2 header ++ ITS OWN certificate's tls-server-end-point hash. A
    // client-final whose `c=` differs (a MITM re-terminating TLS with
    // its own cert, or a stripped-binding downgrade) is rejected even
    // when the password proof itself is valid.
    private val saltedPassword = hi(password, salt, iterations)
    private var authMessage: String = _
    private var fullNonce: String = _

    def serverFirst(clientFirstMessage: String): String = {
      // strip the gs2 header ("n,,", "y,,", or "p=tls-server-end-point,,")
      val bare = clientFirstMessage.split(",", 3).last
      fullNonce = attrs(bare)('r') + serverNonceExt
      val sf = s"r=$fullNonce,s=${b64(salt)},i=$iterations"
      authMessage = s"$bare,$sf," // client-final-no-proof appended in verify
      sf
    }

    /** Check the client proof; Some(serverFinal) on success. */
    def verifyClientFinal(clientFinalMessage: String): Option[String] = {
      val idx = clientFinalMessage.lastIndexOf(",p=")
      if (idx < 0) return None
      val noProof = clientFinalMessage.substring(0, idx)
      val a = attrs(clientFinalMessage)
      if (!a.get('r').contains(fullNonce)) return None
      expectCbind match {
        case Some(exp) if !a.get('c').contains(b64(exp)) => return None
        case _ => ()
      }
      val am = (authMessage + noProof).getBytes(UTF_8)
      val clientKey0 = hmac(saltedPassword, "Client Key".getBytes(UTF_8))
      val storedKey = h(clientKey0)
      val sig = hmac(storedKey, am)
      val clientKey = xor(unb64(a('p')), sig)
      if (!MessageDigest.isEqual(h(clientKey), storedKey)) None
      else {
        val serverKey = hmac(saltedPassword, "Server Key".getBytes(UTF_8))
        Some(s"v=${b64(hmac(serverKey, am))}")
      }
    }
  }
}
