package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** Self-signed certificate material for the replication-socket TLS
  * legs (SURVEY §2.A2 / VERDICT r12 #2). Certificates are generated
  * once per JVM with the JDK's own `keytool` (pure-JDK: no sun.security
  * internals, no native tooling), so the fixtures hold on any machine
  * with the test JDK:
  *
  *  - `good`     — CN=localhost with SAN dns:localhost,ip:127.0.0.1:
  *                 passes verify-full endpoint identification against
  *                 the 127.0.0.1 connect address.
  *  - `badhost`  — CN/SAN for a DIFFERENT host: chain-valid (verify-ca
  *                 passes when trusted) but verify-full must refuse it.
  *  - `other`    — an unrelated keypair: a trust store holding only
  *                 this cert must fail verify-ca against `good`.
  */
object TlsFixtures {

  val storePass = "changeit"

  private lazy val dir: Path = Files.createTempDirectory("graft_tls")

  private def keytool(args: String*): Unit = {
    val bin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "keytool").toString
    val p = new ProcessBuilder((bin +: args): _*)
      .redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(), UTF_8)
    require(p.waitFor() == 0, s"keytool failed:\n$log")
  }

  private def genKeystore(name: String, dname: String,
                          san: Option[String],
                          sigAlg: Option[String] = None): Path = {
    val ks = dir.resolve(s"$name.p12")
    val base = Seq("-genkeypair", "-alias", "stub", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ks.toString, "-storepass", storePass,
      "-keypass", storePass, "-dname", dname, "-validity", "3650")
    keytool(base ++ sigAlg.toSeq.flatMap(a => Seq("-sigalg", a))
      ++ san.toSeq.flatMap(s => Seq("-ext", s"SAN=$s")): _*)
    ks
  }

  lazy val goodKeystore: Path =
    genKeystore("good", "CN=localhost", Some("dns:localhost,ip:127.0.0.1"))
  lazy val badHostKeystore: Path =
    genKeystore("badhost", "CN=elsewhere.example", Some("dns:elsewhere.example"))
  lazy val otherKeystore: Path =
    genKeystore("other", "CN=unrelated", None)
  /** RSASSA-PSS-signed cert (digest hidden in the signature params) —
    * exercises the PSS branch of PgWire.tlsServerEndPoint. */
  lazy val pssKeystore: Path =
    genKeystore("pss", "CN=localhost", Some("dns:localhost,ip:127.0.0.1"),
      sigAlg = Some("RSASSA-PSS"))
  /** SHA-224 signature: PostgreSQL's be_tls_get_certificate_hash has no
    * SHA-224 branch, so channel binding must refuse it loudly. */
  lazy val sha224Keystore: Path =
    genKeystore("s224", "CN=localhost", Some("dns:localhost,ip:127.0.0.1"),
      sigAlg = Some("SHA224withRSA"))

  private def loadKs(p: Path): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(p.toFile)
    try ks.load(fis, storePass.toCharArray) finally fis.close()
    ks
  }

  /** Server-side SSLContext presenting the keystore's certificate —
    * what StubPgWire serves after answering 'S' to SSLRequest. */
  def serverContext(ksPath: Path): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadKs(ksPath), storePass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** A PKCS12 trust store holding ONLY the given keystore's
    * certificate — the client-side `sslrootcert` analogue. */
  def trustStoreFor(ksPath: Path, name: String): String = {
    val trust = KeyStore.getInstance("PKCS12")
    trust.load(null, null)
    trust.setCertificateEntry("stub", loadKs(ksPath).getCertificate("stub"))
    val out = dir.resolve(s"trust_$name.p12")
    val fos = new java.io.FileOutputStream(out.toFile)
    try trust.store(fos, storePass.toCharArray) finally fos.close()
    out.toString
  }
}
