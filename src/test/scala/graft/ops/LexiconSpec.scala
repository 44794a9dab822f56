package graft.ops

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LexiconSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("content hash is deterministic and order-insensitive") {
    val a = Lexicon.Lex("x", Vector("b", "a"))
    val b = Lexicon.Lex("x", Vector("a", "b"))
    assert(a.contentHash == b.contentHash)
    assert(a.contentHash != Lexicon.Lex("x", Vector("a", "c")).contentHash)
    // the pinned collection hash the t_lang_id oracle hardcodes
    assert(Lexicon.collection.contentHash ==
      "1ae5c9b63faf8888188da2b5682443411b2ddee1e77d29d31479883ba4626b52")
  }

  test("char classes via interval search") {
    assert(Lexicon.charClass('a') == "latin")
    assert(Lexicon.charClass('Z') == "latin")
    assert(Lexicon.charClass('é') == "latin")
    assert(Lexicon.charClass('7') == "digit")
    assert(Lexicon.charClass(0x4E2D) == "cjk")
    assert(Lexicon.charClass(0x3042) == "hiragana")
    assert(Lexicon.charClass(0x30A2) == "katakana")
    assert(Lexicon.charClass(0xAC00) == "hangul")
    assert(Lexicon.charClass(0x0414) == "cyrillic")
    assert(Lexicon.charClass(0x03B1) == "greek")
    assert(Lexicon.charClass(0xFF21) == "fullwidth")
    assert(Lexicon.charClass(' ') == "other")
  }

  test("LANGID-2 classifies scripts and stopword languages") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy to be there"),
      (2L, "der hund ist nicht mit der katze auf dem sofa"),
      (3L, "le chat est dans la maison pour la nuit ce soir"),
      (4L, "los gatos y los perros en la casa por la noche"),
      (5L, "日本語のテキストです"), // kana -> ja
      (6L, "한국어 텍스트입니다"), // hangul -> ko
      (7L, "中文文本在这里"), // ideographs only -> zh
      (8L, "русский текст здесь"), // cyrillic -> ru
      (9L, "zzz qqq xxx www yyy"), // no stopwords -> other
      (10L, "   ")) // no tokens -> other
    val out = samples.toDF("id", "text")
      .select($"id", Lexicon.langId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "ja", 6L -> "ko", 7L -> "zh", 8L -> "ru", 9L -> "other",
      10L -> "other"))
  }
}
