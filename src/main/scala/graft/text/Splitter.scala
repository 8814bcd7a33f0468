package graft.text

/** Snippet splitter: break a file into chunks of at least `limit` non-empty
  * lines; the trailing remainder (if any) is merged into the last full
  * chunk. Behavior re-expressed from
  * `/root/reference/data/the_stack/create_stack_snippets.py:120-141`.
  *
  * Invariants (property-tested):
  *  - joining chunks with "\n" reproduces the line content of the input
  *  - every chunk except the last has >= limit non-empty lines
  */
object Splitter {

  def splitSnippet(snippet: String, limit: Int): Array[String] = {
    val lines = PyText.splitLines(snippet)
    val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
    if (lines.isEmpty) chunks += ""
    else {
      val current = scala.collection.mutable.ArrayBuffer.empty[String]
      var nonEmpty = 0
      var li = 0
      while (li < lines.length) {
        val line = lines(li)
        current += line
        if (PyText.hasNonSpace(line)) nonEmpty += 1
        if (nonEmpty >= limit) {
          chunks += current.mkString("\n")
          current.clear()
          nonEmpty = 0
        }
        li += 1
      }
      if (current.nonEmpty) chunks += current.mkString("\n")
    }
    if (chunks.length >= 2) {
      val merged = chunks(chunks.length - 2) + "\n" + chunks(chunks.length - 1)
      chunks.remove(chunks.length - 1)
      chunks(chunks.length - 1) = merged
    }
    chunks.toArray
  }
}
