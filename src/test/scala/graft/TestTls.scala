package graft

/** Self-signed localhost keystore via the JDK's own keytool — no crypto
  * library needed to stand up a real TLS listener in tests (shared by
  * the PG and MySQL wire-client suites). */
object TestTls {
  lazy val context: javax.net.ssl.SSLContext = {
    val dir = java.nio.file.Files.createTempDirectory("fake-tls")
    dir.toFile.deleteOnExit()
    val ks = dir.resolve("ks.p12")
    ks.toFile.deleteOnExit()
    val proc = new ProcessBuilder("keytool", "-genkeypair", "-alias",
      "fake", "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ks.toString, "-storepass", "changeit",
      "-dname", "CN=localhost", "-validity", "1")
      .redirectErrorStream(true).start()
    val log = new String(proc.getInputStream.readAllBytes)
    require(proc.waitFor() == 0, log)
    val store = java.security.KeyStore.getInstance("PKCS12")
    val is = java.nio.file.Files.newInputStream(ks)
    try store.load(is, "changeit".toCharArray) finally is.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}
