package graft.sources

import java.net.Socket

/** Shared client-side TLS upgrade for the wire clients (PG SSLRequest,
  * MySQL CLIENT_SSL): layer an SSLSocket over an already-connected
  * socket. `verify = false` is the libpq `require`/`prefer` semantic —
  * encrypt, trust any certificate; `verify = true` uses the JDK default
  * trust store plus hostname verification (`verify-full`). */
private[graft] object TlsSocket {

  /** `protocols` pins the enabled TLS versions (the TDS tunnel pins
    * TLSv1.2: a 1.3 server's post-handshake NewSessionTicket flight
    * would race the moment both sides stop framing records in TDS
    * packets — the same reason FreeTDS and the vendor drivers shipped
    * 1.2-only first). */
  def wrap(raw: Socket, host: String, port: Int,
           verify: Boolean,
           protocols: Array[String] = null): javax.net.ssl.SSLSocket = {
    val ctx =
      if (verify) javax.net.ssl.SSLContext.getDefault
      else {
        val c = javax.net.ssl.SSLContext.getInstance("TLS")
        c.init(null, Array[javax.net.ssl.TrustManager](
          new javax.net.ssl.X509TrustManager {
            override def checkClientTrusted(
                cs: Array[java.security.cert.X509Certificate],
                a: String): Unit = ()
            override def checkServerTrusted(
                cs: Array[java.security.cert.X509Certificate],
                a: String): Unit = ()
            override def getAcceptedIssuers
                : Array[java.security.cert.X509Certificate] = Array.empty
          }), null)
        c
      }
    val ssl = ctx.getSocketFactory
      .createSocket(raw, host, port, true)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    if (protocols != null) ssl.setEnabledProtocols(protocols)
    if (verify) {
      val sp = ssl.getSSLParameters
      sp.setEndpointIdentificationAlgorithm("HTTPS")
      ssl.setSSLParameters(sp)
    }
    ssl.startHandshake()
    ssl
  }
}
