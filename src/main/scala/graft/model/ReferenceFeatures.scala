package graft.model

/** The reference's curated substring-feature corpus at FULL scale.
  *
  * Provenance (public content, re-expressed as data): the 32 per-language
  * token lists under `/root/reference/feature_lists/<lang>.py` (1,408 entries,
  * ast-extracted verbatim incl. symbol-heavy and newline-bearing tokens),
  * assembled exactly like `/root/reference/features.py:45-81`: concatenate
  * all lists, dedupe, sort → 746 distinct feature tokens. Checked in as a
  * TSV resource (`lang \t escaped-token`, escapes: \\ \t \n \r) so the
  * engine exercises codegen/broadcast/accuracy at the reference's real
  * model size, not just the 10-feature demo model. (Round-2 shipped a
  * 1,345-entry subset — a generator defect dropped 63 symbol tokens like
  * "diff --git", "@@", "$(", "==="; round 3 regenerated the full corpus.)
  */
object ReferenceFeatures {

  private def unescape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't'  => b.append('\t'); i += 2
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case '\\' => b.append('\\'); i += 2
          case o    => b.append(c); b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** lang → its token list (order as in the reference file, deduped
    * within each lang — the parser owns that invariant). */
  lazy val byLang: Map[String, Array[String]] = {
    val in = getClass.getResourceAsStream("/graft/reference_features.tsv")
    require(in != null, "reference_features.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().filter(_.nonEmpty).zipWithIndex.toArray
        .map { case (line, ln) =>
          val i = line.indexOf('\t')
          require(i > 0, s"reference_features.tsv line ${ln + 1}: expected 'lang<TAB>token', got: $line")
          (line.substring(0, i), unescape(line.substring(i + 1)))
        }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    } finally src.close()
  }

  /** Class labels = the 32 language-list names, sorted. */
  lazy val langs: Array[String] = byLang.keys.toArray.sorted

  /** The assembled feature list: dedupe + sort over all lists — the exact
    * `features.py` semantics (Python sorted() and Scala String ordering
    * agree: all 746 tokens are ASCII). */
  lazy val tokens: Array[String] = byLang.valuesIterator.flatten.toSet.toArray.sorted

  /** Deterministic full-size model (746 features × 32 classes).
    *
    * Weights are EXACT DYADIC rationals — 2.0 for a token in the class's
    * list, -0.125 otherwise, intercept 0 — so every logit is an exact
    * multiple of 1/8 regardless of summation order, and the SQL oracle's
    * algebraic restatement (2.125·hits_c − 0.125·total_hits) reproduces
    * them bit-identically. This is the golden fixture proving the scoring
    * path (Aho–Corasick matcher + broadcast + linear scorer) at the
    * reference's real model size; a TRAINED model of the same shape is
    * exercised by TrainerSpec's 32-class gate. */
  lazy val fullModel: LangIdModel = {
    val fs = tokens
    val cs = langs
    val member = cs.map(c => byLang(c).toSet)
    LangIdModel(
      features = fs,
      classes = cs,
      coef = Array.tabulate(cs.length, fs.length)((i, j) =>
        if (member(i)(fs(j))) 2.0 else -0.125),
      intercept = Array.fill(cs.length)(0.0),
    )
  }
}
