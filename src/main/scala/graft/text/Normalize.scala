package graft.text

/** Newline normalization applied before feature extraction.
  * Reference: `/root/reference/features.py:98`
  * (`snippet.replace("\r\n", "\n").replace("\r", "\n")`).
  * Must be byte-exact identical in engine and oracle.
  */
object Normalize {
  def newlines(s: String): String = {
    if (s == null) return null
    if (s.indexOf('\r') < 0) return s // fast path: no allocation
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\r') {
        sb.append('\n')
        if (i + 1 < n && s.charAt(i + 1) == '\n') i += 2 else i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
