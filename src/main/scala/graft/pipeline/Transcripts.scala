package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** A single transcript turn — the graft's primary input row
  * (BASELINE.json input_hint): Iceberg-shaped table
  * (conv_id, turn_idx, role, text, tool, ts).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
)

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Pure function of (seed, conv, turn): the same table is produced at any
  * parallelism and any scale — no external data. Embeds, at controlled
  * rates: per-language word-soup text (en/de/fr/es + code), PII patterns
  * (emails, phones, SSNs, card numbers, IPs), script/style/fence blocks
  * for the scrub paths, and junk (digit floods, whitespace floods, tiny
  * turns) for the quality rules.
  *
  * Skew: conv index ≡ 0 (mod 100) is a "hot" conversation with hotFactor×
  * more turns — exercises the salted repartitioning path.
  */
object Transcripts {

  val Langs: Array[String] = Array("en", "de", "fr", "es")

  // Distinct high-frequency word pools per language (hand-written; enough
  // signal for a char-n-gram model to separate languages reliably).
  val WordPools: Map[String, Array[String]] = Map(
    "en" -> Array("the", "and", "with", "that", "have", "this", "from", "they",
      "would", "there", "their", "what", "about", "which", "when", "make",
      "like", "time", "just", "know", "people", "year", "good", "some",
      "could", "them", "other", "than", "then", "look", "only", "come"),
    "de" -> Array("der", "die", "das", "und", "ist", "nicht", "mit", "auf",
      "sich", "auch", "eine", "aber", "haben", "wenn", "oder", "wir",
      "schon", "mehr", "kann", "durch", "gegen", "zeit", "über", "doch",
      "nach", "wird", "sind", "noch", "beim", "ganz", "jetzt", "immer"),
    "fr" -> Array("les", "des", "est", "dans", "pour", "que", "une", "sur",
      "avec", "sont", "plus", "pas", "vous", "fait", "comme", "tout",
      "nous", "mais", "être", "cette", "ses", "aux", "bien", "leur",
      "sans", "peut", "deux", "même", "ces", "très", "était", "entre"),
    "es" -> Array("los", "las", "una", "por", "con", "para", "del", "está",
      "pero", "más", "como", "sus", "este", "entre", "cuando", "muy",
      "sobre", "también", "hasta", "donde", "quien", "desde", "todo",
      "durante", "todos", "uno", "les", "contra", "otros", "ese", "eso",
      "había"),
  )

  /** Synthetic word pool for language index >= 4 (north-star scale: 97
    * languages). Each synthetic language draws syllables from its own
    * hash-chosen consonant/vowel subsets, so pools are mutually distinct
    * with overwhelming probability and a char-n-gram model can separate
    * them — deterministic, no external data. */
  def synthPool(langIdx: Int): Array[String] = {
    val consonants = "bcdfghjklmnpqrstvwxz"
    val vowels = "aeiouy"
    val h0 = graft.dedup.Dedup.mix64(0xabcdef1234L + langIdx)
    // language-specific alphabet bias: 8 consonants + 3 vowels
    val cs = Array.tabulate(8)(i =>
      consonants(((graft.dedup.Dedup.mix64(h0 + i) & Long.MaxValue) % consonants.length).toInt))
    val vs = Array.tabulate(3)(i =>
      vowels(((graft.dedup.Dedup.mix64(h0 - i - 1) & Long.MaxValue) % vowels.length).toInt))
    Array.tabulate(32) { w =>
      val hw = graft.dedup.Dedup.mix64(h0 ^ (w * 0x9e3779b97f4a7c15L))
      val nSyl = 2 + ((hw & Long.MaxValue) % 3).toInt
      val sb = new StringBuilder
      var s = 0
      while (s < nSyl) {
        val hs = graft.dedup.Dedup.mix64(hw + s)
        sb.append(cs(((hs & Long.MaxValue) % cs.length).toInt))
        sb.append(vs((((hs >>> 8) & Long.MaxValue) % vs.length).toInt))
        if ((hs & 4) == 0) sb.append(cs((((hs >>> 16) & Long.MaxValue) % cs.length).toInt))
        s += 1
      }
      sb.toString
    }
  }

  def langName(langIdx: Int): String =
    if (langIdx < Langs.length) Langs(langIdx) else f"syn$langIdx%02d"

  def poolOf(langIdx: Int): Array[String] =
    if (langIdx < Langs.length) WordPools(Langs(langIdx)) else synthPool(langIdx)

  val CodeSnippets: Array[String] = Array(
    "def process(data):\n    return [x * 2 for x in data]\n",
    "func main() {\n\tfmt.Println(\"ok\")\n}\n",
    "SELECT id, name FROM users WHERE active = 1;\n",
    "const handler = async (req, res) => {\n  res.json({ok: true});\n};\n",
    "for (int i = 0; i < n; i++) { sum += a[i]; }\n",
  )

  val Tools: Array[String] = Array("search", "calculator", "browser", "editor", null)

  // ---- deterministic PRNG helpers (pure functions of the key) ----
  @inline private def rng(seed: Long, a: Long, b: Long, salt: Long): Long =
    graft.dedup.Dedup.mix64(seed ^ (a * 0x9e3779b97f4a7c15L) ^ (b * 0xc2b2ae3d27d4eb4fL) ^ salt)

  @inline private def pick[T](arr: Array[T], r: Long): T =
    arr(((r & Long.MaxValue) % arr.length).toInt)

  /** Number of turns of conversation `conv` (hot convs are 0 mod 100). */
  def turnsOf(seed: Long, conv: Long, hotFactor: Int): Int = {
    val base = 4 + ((rng(seed, conv, 0, 1) & Long.MaxValue) % 12).toInt
    if (conv % 100 == 0) base * hotFactor else base
  }

  /** Language index of a conversation (stable across its turns). */
  def langIdxOf(seed: Long, conv: Long, nLangs: Int): Int =
    ((rng(seed, conv, 0, 2) & Long.MaxValue) % nLangs).toInt

  /** Language of a conversation (stable across its turns). */
  def langOf(seed: Long, conv: Long, nLangs: Int = Langs.length): String =
    langName(langIdxOf(seed, conv, nLangs))

  /** The text of one turn: word soup in the conv's language plus seeded
    * special content. Rates: ~6% PII, ~5% code, ~4% scrub-target markup,
    * ~5% junk. */
  def textOf(seed: Long, conv: Long, turn: Int, nLangs: Int = Langs.length): String = {
    val pool = poolOf(langIdxOf(seed, conv, nLangs))
    val r0 = rng(seed, conv, turn.toLong, 3)
    val nWords = 8 + ((r0 & Long.MaxValue) % 60).toInt
    val sb = new java.lang.StringBuilder(nWords * 7)
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(if (i % 12 == 11) "\n" else " ")
      sb.append(pick(pool, rng(seed, conv, turn.toLong, 100 + i)))
      // sentence punctuation: without it every turn fails the reference's
      // PunctRatio >= 0.01 rule and the keep rate collapses to ~10%
      if (i % 9 == 8) sb.append('.') else if (i % 13 == 12) sb.append(',')
      i += 1
    }
    val special = (rng(seed, conv, turn.toLong, 4) & Long.MaxValue) % 100
    if (special < 2) {
      sb.append(" contact me at user").append((r0 & Long.MaxValue) % 1000)
        .append("@example.com")
    } else if (special < 4) {
      sb.append(" call 555-").append(100 + (r0 & Long.MaxValue) % 900)
        .append("-").append(1000 + (r0 & Long.MaxValue) % 9000)
    } else if (special < 5) {
      sb.append(" ssn 123-45-").append(1000 + (r0 & Long.MaxValue) % 9000)
    } else if (special < 6) {
      sb.append(" from 10.0.").append((r0 & Long.MaxValue) % 256)
        .append(".").append((r0 & Long.MaxValue) % 256)
    } else if (special < 11) {
      sb.append("\n").append(pick(CodeSnippets, r0))
    } else if (special < 13) {
      sb.append("\n<script type=\"text/js\">var secret = ")
        .append((r0 & Long.MaxValue) % 100).append(";</script> done")
    } else if (special < 15) {
      sb.append("\n```python\nprint(").append((r0 & Long.MaxValue) % 100)
        .append(")\n```\nafter")
    } else if (special < 17) {
      sb.append(" this is ").append(
        pick(Array("frakk", "smegh", "gorram"), r0)).append(" nonsense")
    } else if (special < 20) {
      // junk: digit flood / whitespace flood / tiny
      val kind = special % 3
      if (kind == 0) { sb.setLength(0); var k = 0
        while (k < 120) { sb.append(((r0 >>> (k % 60)) & 7)); k += 1 } }
      else if (kind == 1) { sb.setLength(0); sb.append("ok")
        var k = 0; while (k < 200) { sb.append(' '); k += 1 }; sb.append("end") }
      else sb.setLength(2.min(sb.length))
    }
    sb.toString
  }

  def roleOf(turn: Int): String =
    if (turn % 2 == 0) "user" else if (turn % 7 == 3) "tool" else "assistant"

  /** One fully-materialized turn. */
  def turnAt(seed: Long, conv: Long, turn: Int, nLangs: Int = Langs.length): Turn = {
    val role = roleOf(turn)
    Turn(
      conv_id = f"conv$conv%08d",
      turn_idx = turn,
      role = role,
      text = textOf(seed, conv, turn, nLangs),
      tool = if (role == "tool") pick(Tools, rng(seed, conv, turn.toLong, 5)) else null,
      ts = new Timestamp(1700000000000L + conv * 3600000L + turn * 30000L),
    )
  }

  /** Distributed deterministic generation: one row per (conv, turn).
    * flatMap over conv ids, then repartition to balance hot convs away
    * from single tasks. */
  def generate(spark: SparkSession, nConvs: Long, seed: Long = 42L,
               hotFactor: Int = 50, numPartitions: Int = 0,
               nLangs: Int = Langs.length): Dataset[Turn] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism * 2
    spark.range(0, nConvs, 1, parts)
      .flatMap { conv =>
        val n = turnsOf(seed, conv, hotFactor)
        (0 until n).iterator.map(t => turnAt(seed, conv, t, nLangs))
      }
  }

  /** Expected language label of a conv (generation truth, for eval). */
  def truthLang(seed: Long, convId: String, nLangs: Int = Langs.length): String =
    langOf(seed, convId.stripPrefix("conv").toLong, nLangs)
}
