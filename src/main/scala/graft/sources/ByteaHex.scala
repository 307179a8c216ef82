package graft.sources

/** PG bytea hex rendering (`\x` + lowercase hex) in one digit-table
  * pass — THE shared implementation for every surface that must agree
  * byte-for-byte (the TDS binary/LOB decoder, the SQLite blob reader,
  * the COPY sink's typed literal formatter); three hand-kept copies of
  * this loop previously had to stay compatible by convention. */
object ByteaHex {
  private val Digits = "0123456789abcdef".toCharArray

  def render(b: Array[Byte]): String = render(b, 0, b.length)

  def render(b: Array[Byte], off: Int, len: Int): String = {
    val chars = new Array[Char](2 + 2 * len)
    chars(0) = '\\'; chars(1) = 'x'
    var j = 0
    while (j < len) {
      val v = b(off + j) & 0xFF
      chars(2 + 2 * j) = Digits(v >> 4)
      chars(3 + 2 * j) = Digits(v & 15)
      j += 1
    }
    new String(chars)
  }
}
