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

  /** Unicode NFC normalization kernel for the `NfcNormalize` native
    * expression (and anyone else): composes decomposed sequences
    * (e + U+0301 -> é) so fingerprints, dedup grams, and token counts
    * see ONE byte form per canonical-equivalent text — the first
    * normalization every web-corpus pipeline applies. Fast path: the
    * dominant already-normalized row is returned UNTOUCHED (same
    * UTF8String, zero allocation) — `Normalizer.isNormalized` is a scan,
    * not a rewrite. Called from generated code. */
  def nfcUtf8(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
