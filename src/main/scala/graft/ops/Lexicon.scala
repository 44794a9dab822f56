package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lexicon machinery + frozen language-ID spec LANGID-2.
  *
  * Mirrors the reference's lexicon layer: named word collections with a
  * CONTENT-HASH pin so a run records exactly which dictionary produced
  * its labels (vkit/element/lexicon.py:62-134 stores a sha256 over the
  * collection), and a unicode-range interval table for char-class
  * lookups (vkit/utility/text/opt.py:50-99 uses an interval tree; at
  * this scale a sorted-array binary search is the same contract).
  *
  * LANGID-2 (frozen; the DuckDB oracle mirrors it EXACTLY — change both
  * together):
  *   1. no tokens -> 'other'
  *   2. script presence, first match wins: hiragana/katakana -> 'ja',
  *      hangul -> 'ko', CJK ideographs -> 'zh', cyrillic -> 'ru'
  *      (ja/ko precede zh because those scripts co-occur with kanji)
  *   3. else stopword-ratio argmax over {en, de, fr, es} on lowercased
  *      whitespace tokens; winner needs ratio >= 0.03; ties break in
  *      the fixed order en, de, fr, es; no winner -> 'other'
  */
object Lexicon {

  /** A named word set with a deterministic content hash. */
  final case class Lex(name: String, words: Vector[String]) {
    lazy val contentHash: String =
      Lexicon.sha256Hex(name + ":" + words.sorted.mkString(","))
  }

  /** Broadcast-friendly collection; `contentHash` pins the exact
    * dictionary contents a run used (goes into the correctness gate via
    * t_lang_id's lex_hash column).
    */
  final case class Collection(lexicons: Vector[Lex]) {
    def apply(name: String): Lex = lexicons.find(_.name == name).get
    lazy val contentHash: String =
      Lexicon.sha256Hex(lexicons.sortBy(_.name)
        .map(l => l.name + "=" + l.contentHash).mkString("|"))
  }

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** LANGID-2 stopword sets (frozen; lowercase). */
  val stopwords: Vector[Lex] = Vector(
    Lex("en", Vector("the", "a", "of", "and", "to", "in", "is", "it",
      "you", "that", "he", "was")),
    Lex("de", Vector("der", "die", "das", "und", "ist", "ich", "nicht",
      "ein", "eine", "mit", "auf", "zu")),
    Lex("fr", Vector("le", "la", "les", "et", "un", "une", "est", "que",
      "pour", "dans", "ce", "pas")),
    Lex("es", Vector("el", "los", "las", "y", "es", "en", "por", "con",
      "para", "una", "como", "su")))

  val collection: Collection = Collection(stopwords)

  /** Unicode char-class intervals (closed ranges, sorted, disjoint) —
    * the reference's interval-lookup contract.
    */
  val charRanges: Array[(Int, Int, String)] = Array(
    (0x0030, 0x0039, "digit"),
    (0x0041, 0x005A, "latin"),
    (0x0061, 0x007A, "latin"),
    (0x00C0, 0x024F, "latin"),
    (0x0370, 0x03FF, "greek"),
    (0x0400, 0x04FF, "cyrillic"),
    (0x0590, 0x05FF, "hebrew"),
    (0x0600, 0x06FF, "arabic"),
    (0x0900, 0x097F, "devanagari"),
    (0x3040, 0x309F, "hiragana"),
    (0x30A0, 0x30FF, "katakana"),
    (0x4E00, 0x9FFF, "cjk"),
    (0xAC00, 0xD7AF, "hangul"),
    (0xFF01, 0xFF5E, "fullwidth"))

  /** Char class by binary search over the interval table; "other" when
    * no range matches.
    */
  def charClass(cp: Int): String = {
    var lo = 0
    var hi = charRanges.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val (a, b, cls) = charRanges(mid)
      if (cp < a) hi = mid - 1
      else if (cp > b) lo = mid + 1
      else return cls
    }
    "other"
  }

  /** LANGID-2 as a pure codegen'd Column expression (no UDF). */
  def langId(text: Column): Column = {
    val toks = filter(split(lower(text), " "), x => x =!= lit(""))
    // denominator floored at 1 (mirrored in the oracle SQL) so the
    // empty-token row never divides by zero on either engine
    val total = greatest(size(toks), lit(1)).cast("double")
    def ratio(lex: Lex): Column = {
      val arr = array(lex.words.map(lit): _*)
      size(filter(toks, x => array_contains(arr, x)))
        .cast("double") / total
    }
    val rEn = ratio(collection("en"))
    val rDe = ratio(collection("de"))
    val rFr = ratio(collection("fr"))
    val rEs = ratio(collection("es"))
    when(size(toks) === 0, "other")
      .when(text.rlike("[\\x{3040}-\\x{30FF}]"), "ja")
      .when(text.rlike("[\\x{AC00}-\\x{D7AF}]"), "ko")
      .when(text.rlike("[\\x{4E00}-\\x{9FFF}]"), "zh")
      .when(text.rlike("[\\x{0400}-\\x{04FF}]"), "ru")
      .when(rEn >= rDe && rEn >= rFr && rEn >= rEs && rEn >= 0.03, "en")
      .when(rDe >= rFr && rDe >= rEs && rDe >= 0.03, "de")
      .when(rFr >= rEs && rFr >= 0.03, "fr")
      .when(rEs >= 0.03, "es")
      .otherwise("other")
  }
}
