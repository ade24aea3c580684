package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** SCRAM-SHA-256 math pinned against the PUBLISHED RFC 7677 test
  * vector (user "user", password "pencil"), plus the client↔verifier
  * closure laws the wire exchange relies on.
  */
class ScramSpec extends AnyFunSuite {

  // The RFC 7677 §3 example, verbatim.
  private val rfcNonce = "rOprNGfwEbeRWgbNEkqO"
  private val rfcServerFirst =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
  private val rfcClientFinal =
    "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
  private val rfcServerFinal = "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="

  test("client reproduces the RFC 7677 test vector byte-for-byte") {
    val c = new Scram.Client("pencil", rfcNonce, username = "user")
    assert(c.clientFirstMessage === "n,,n=user,r=" + rfcNonce)
    assert(c.clientFinal(rfcServerFirst) === rfcClientFinal)
    assert(c.verifyServerFinal(rfcServerFinal),
      "the published server signature must verify")
    assert(!c.verifyServerFinal("v=AAAA"), "a forged signature must not")
  }

  test("client ↔ verifier closure: fresh exchange authenticates mutually") {
    val c = new Scram.Client("hunter2", "clientnonce123")
    val v = new Scram.Verifier("hunter2",
      "somesalt".getBytes("UTF-8"), 4096, "serverext")
    val sf = v.serverFirst(c.clientFirstMessage)
    val cf = c.clientFinal(sf)
    val fin = v.verifyClientFinal(cf)
    assert(fin.isDefined, "correct password must authenticate")
    assert(c.verifyServerFinal(fin.get), "and mutually")
  }

  test("wrong password, replayed nonce, and forged proof all fail") {
    val v = new Scram.Verifier("right",
      "somesalt".getBytes("UTF-8"), 4096, "srv")
    val bad = new Scram.Client("wrong", "nonceA")
    val cf = bad.clientFinal(v.serverFirst(bad.clientFirstMessage))
    assert(v.verifyClientFinal(cf).isEmpty, "wrong password must fail")
    // nonce replay guard: a server-first whose nonce does not extend
    // the client's must be rejected before any proof is computed
    val c2 = new Scram.Client("right", "nonceB")
    intercept[IllegalArgumentException](
      c2.clientFinal("r=stolen,s=c29tZXNhbHQ=,i=4096"))
    // absurd iteration count is a CPU-bomb — refused
    val c3 = new Scram.Client("right", "nonceC")
    intercept[IllegalArgumentException](
      c3.clientFinal(s"r=nonceCx,s=c29tZXNhbHQ=,i=${Int.MaxValue}"))
    // mangled proof
    val v2 = new Scram.Verifier("right", "somesalt".getBytes("UTF-8"), 4096, "x")
    val c4 = new Scram.Client("right", "nonceD")
    val good = c4.clientFinal(v2.serverFirst(c4.clientFirstMessage))
    val forged = good.substring(0, good.lastIndexOf("p=")) + "p=AAAA"
    assert(v2.verifyClientFinal(forged).isEmpty)
  }

  test("gs2 flags follow RFC 5802: n (no channel), y (unbound TLS), p (bound)") {
    val hash = Array.tabulate[Byte](32)(_.toByte)
    assert(new Scram.Client("pw", "n1").gs2Header === "n,,")
    assert(new Scram.Client("pw", "n2", tlsAvailable = true).gs2Header === "y,,")
    val bound = new Scram.Client("pw", "n3", channelBinding = Some(hash))
    assert(bound.gs2Header === "p=tls-server-end-point,,")
    // cbind-input = gs2 header bytes ++ binding data (RFC 5802 §6)
    assert(bound.cbindInput ===
      "p=tls-server-end-point,,".getBytes("UTF-8") ++ hash)
  }

  test("channel-bound exchange closes only against the matching binding") {
    val hash = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val expect = "p=tls-server-end-point,,".getBytes("UTF-8") ++ hash
    val v = new Scram.Verifier("pw",
      "somesalt".getBytes("UTF-8"), 4096, "srv", Some(expect))
    val c = new Scram.Client("pw", "bn1", channelBinding = Some(hash))
    val fin = v.verifyClientFinal(c.clientFinal(v.serverFirst(c.clientFirstMessage)))
    assert(fin.isDefined, "matching binding + password must authenticate")
    assert(c.verifyServerFinal(fin.get), "and mutually")
    // a client bound to a DIFFERENT certificate (the relaying-MITM
    // shape) fails even with the correct password
    val other = hash.map(b => (b ^ 1).toByte)
    val v2 = new Scram.Verifier("pw",
      "somesalt".getBytes("UTF-8"), 4096, "srv", Some(expect))
    val c2 = new Scram.Client("pw", "bn2", channelBinding = Some(other))
    assert(v2.verifyClientFinal(
      c2.clientFinal(v2.serverFirst(c2.clientFirstMessage))).isEmpty)
    // and an UNBOUND client against a binding-requiring verifier fails
    val v3 = new Scram.Verifier("pw",
      "somesalt".getBytes("UTF-8"), 4096, "srv", Some(expect))
    val c3 = new Scram.Client("pw", "bn3", tlsAvailable = true)
    assert(v3.verifyClientFinal(
      c3.clientFinal(v3.serverFirst(c3.clientFirstMessage))).isEmpty)
  }

  test("tls-server-end-point: SHA-256 of the certificate's DER (RFC 5929)") {
    // the fixture certs are SHA256withRSA → hash alg maps to SHA-256
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(TlsFixtures.goodKeystore.toFile)
    try ks.load(fis, TlsFixtures.storePass.toCharArray) finally fis.close()
    val cert = ks.getCertificate("stub")
      .asInstanceOf[java.security.cert.X509Certificate]
    val got = PgWire.tlsServerEndPoint(cert)
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest(cert.getEncoded)
    assert(got === want)
  }

  private def loadCert(ksPath: java.nio.file.Path): java.security.cert.X509Certificate = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(ksPath.toFile)
    try ks.load(fis, TlsFixtures.storePass.toCharArray) finally fis.close()
    ks.getCertificate("stub").asInstanceOf[java.security.cert.X509Certificate]
  }

  test("tls-server-end-point: RSASSA-PSS digest recovered from signature params (ADVICE r14)") {
    // getSigAlgName is just "RSASSA-PSS"; the real digest lives in the
    // RFC 4055 params. Mapping PSS blindly to SHA-256 only happens to
    // work when the params SAY SHA-256 — assert we actually read them.
    val cert = loadCert(TlsFixtures.pssKeystore)
    assert(cert.getSigAlgName.toUpperCase.contains("RSASSA-PSS"))
    assert(PgWire.pssDigest(cert) === Some("SHA-256"))
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest(cert.getEncoded)
    assert(PgWire.tlsServerEndPoint(cert) === want)
  }

  test("tls-server-end-point: SHA-224 certificate hashes with SHA-224 (matches PG)") {
    // ADVICE r15: PostgreSQL's be_tls_get_certificate_hash only remaps
    // MD5/SHA-1 to SHA-256; SHA-224 resolves via EVP_get_digestbynid and
    // channel-binds fine with libpq — so must we (NOT a silent SHA-256
    // map, and NOT a refusal: both would break interop with a server
    // that works today).
    val cert = loadCert(TlsFixtures.sha224Keystore)
    assert(cert.getSigAlgName.toUpperCase.contains("SHA224"))
    val want = java.security.MessageDigest.getInstance("SHA-224")
      .digest(cert.getEncoded)
    assert(PgWire.tlsServerEndPoint(cert) === want)
  }
}
