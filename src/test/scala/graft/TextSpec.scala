package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text._

/** Ports of the reference's unit tables: tests/test_shape.py:14-51 and
  * tests/test_bio.py:31-105.
  */
class ShapeSpec extends AnyFunSuite {
  import Shape._

  val cases: Seq[(String, Seq[String])] = Seq(
    "В" -> Seq("RU_X"),
    "ИЛ-2" -> Seq("RU_XX"),
    "105г." -> Seq("NUM", "RU_x", "PUNCT_."),
    "Pal-Yz" -> Seq("EN_Xx-Xx"),
    "и Я-ДаА" -> Seq("RU_x", "RU_OTHER"),
    "Прибыл на I@" -> Seq("RU_Xx", "RU_xx", "EN_X", "PUNCT_@"),
    "и -‐" -> Seq("RU_x", "PUNCT_OTHER")
  )

  test("word_shape over tokenizer matches reference fixture table") {
    for ((text, expected) <- cases) {
      val got = Tokenizer.tokenize(text).map(t => wordShape(t.text)).toSeq
      assert(got == expected, s"text=$text")
    }
  }

  test("SHAPES table has the reference layout") {
    assert(SHAPES.length == 7 + 7 + Shape.PUNCTS.length + 3)
    assert(SHAPES.take(2) == Seq("RU_X", "RU_x"))
    assert(SHAPES.takeRight(2) == Seq("NUM", "OTHER"))
  }

  test("fast paths == reference formulations (wordType/shape/vocab-lower)") {
    val rnd = new scala.util.Random(42)
    val alphabet =
      "абвгдеёжзиклмнопрстуфхцчшщъыьэюяАБВГДЕЁЖЗИКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ" +
        "abczABCZ0189+-.,!?…«»№_@#%борщ BoRschİΣ" // İ/Σ: full lower != per-char lower
    def randWord(): String = {
      val n = 1 + rnd.nextInt(6)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val words = (1 to 5000).map(_ => randWord()) ++
      Seq("", "В", "ИЛ-2", "105г", "+7", "-", "+", "3,5", "...", "№", "ёЁ",
        "İ", "İSTANBUL", "ΟΣ", "ΣΣ")
    val vocab = graft.pack.SynthPack.build().wordVocab
    for (w <- words) {
      assert(wordType(w) == wordTypeRegex(w), s"wordType mismatch on '$w'")
      if (w.nonEmpty) {
        assert(SHAPES(shapeOrdinal(w)) == wordShape(w), s"shapeOrdinal mismatch on '$w'")
        assert(vocab.encodeLower(w) == vocab.encode(lowerFast(w)),
          s"encodeLower mismatch on '$w'")
      }
    }
  }

  test("python isupper/islower semantics") {
    assert(pyIsUpper("ИЛ-2"))
    assert(!pyIsUpper("и"))
    assert(pyIsLower("ил-2"))
    assert(!pyIsUpper("-2") && !pyIsLower("-2")) // no cased chars
    assert(isTitle("Иван") && !isTitle("ИВАН") && !isTitle("И"))
    assert(isDashTitle("Pal-Yz") && !isDashTitle("Pal-YZ"))
  }
}

class TokenizerSpec extends AnyFunSuite {
  test("digits/letters split, hyphen join, punct runs") {
    def words(t: String) = Tokenizer.tokenize(t).map(_.text).toSeq
    assert(words("105г.") == Seq("105", "г", "."))
    assert(words("ИЛ-2") == Seq("ИЛ-2"))
    assert(words("2011-2020") == Seq("2011-2020"))
    assert(words("3,5 кг") == Seq("3,5", "кг"))
    assert(words("«Газпром» купил завод.") == Seq("«", "Газпром", "»", "купил", "завод", "."))
    assert(words("Привет... Да?!") == Seq("Привет", "...", "Да", "?!"))
  }

  test("offsets are exact substrings") {
    val text = "Иван Петров купил завод в Москве."
    for (t <- Tokenizer.tokenize(text))
      assert(text.substring(t.start, t.stop) == t.text)
  }

  test("sentenize splits on terminal + uppercase and drops empties") {
    val text = "Иван купил завод. Пётр продал офис.\n\n«Газпром» открыл филиал."
    val sents = Tokenizer.sentenize(text).map(_.text).toSeq
    assert(sents == Seq("Иван купил завод.", "Пётр продал офис.", "«Газпром» открыл филиал."))
    for (s <- Tokenizer.sentenize(text))
      assert(text.substring(s.start, s.stop) == s.text)
  }

  test("razdel-parity fixture table (tokenize), 50+ cases") {
    // sources: reference tests/test_shape.py:14-51 word classes, README
    // examples, and razdel's documented conventions on initials,
    // abbreviations, digit+unit, hyphen compounds, numeric formats
    val table: Seq[(String, Seq[String])] = Seq(
      // digit/letter splits and units
      "105г." -> Seq("105", "г", "."),
      "105 г." -> Seq("105", "г", "."),
      "10кг" -> Seq("10", "кг"),
      "XXIвек" -> Seq("XXIвек"), // roman numerals are letters
      "5-й" -> Seq("5-й"),
      "70-х" -> Seq("70-х"),
      "2011-2020" -> Seq("2011-2020"),
      "1,5" -> Seq("1,5"),
      "3.14" -> Seq("3.14"),
      "1.2.3" -> Seq("1.2.3"),
      "+7" -> Seq("+", "7"),
      "-5" -> Seq("-", "5"),
      "№5" -> Seq("№", "5"),
      "50%" -> Seq("50", "%"),
      "$100" -> Seq("$", "100"),
      // hyphen compounds
      "по-моему" -> Seq("по-моему"),
      "кто-то" -> Seq("кто-то"),
      "ИЛ-2" -> Seq("ИЛ-2"),
      "Pal-Yz" -> Seq("Pal-Yz"),
      "Санкт-Петербург" -> Seq("Санкт-Петербург"),
      "科学-x" -> Seq("科学-x"),
      "интернет-магазин" -> Seq("интернет-магазин"),
      // dangling dashes do not join
      "слово -" -> Seq("слово", "-"),
      "- слово" -> Seq("-", "слово"),
      "а - б" -> Seq("а", "-", "б"),
      // punct runs of the joinable class
      "..." -> Seq("..."),
      "?!" -> Seq("?!"),
      "Да?!" -> Seq("Да", "?!"),
      "Что?.." -> Seq("Что", "?.."),
      "—" -> Seq("—"),
      "-‐" -> Seq("-‐"),
      // non-joinable punct: one char each
      "«»" -> Seq("«", "»"),
      "()" -> Seq("(", ")"),
      "[]" -> Seq("[", "]"),
      ",," -> Seq(",", ","),
      "a,b" -> Seq("a", ",", "b"),
      ";" -> Seq(";"),
      // initials and abbreviations tokenize as separate atoms
      "А. С. Пушкин" -> Seq("А", ".", "С", ".", "Пушкин"),
      "т.д." -> Seq("т", ".", "д", "."),
      "т. е." -> Seq("т", ".", "е", "."),
      "ул. Ленина" -> Seq("ул", ".", "Ленина"),
      // mixed script/case words from the shape fixture classes
      "Иван" -> Seq("Иван"),
      "ИВАН" -> Seq("ИВАН"),
      "иВАН" -> Seq("иВАН"),
      "Ёлка" -> Seq("Ёлка"),
      "ёж" -> Seq("ёж"),
      "word" -> Seq("word"),
      "WoRd" -> Seq("WoRd"),
      "слово123" -> Seq("слово", "123"),
      "123слово" -> Seq("123", "слово"),
      "e-mail" -> Seq("e-mail"),
      "сумма=100" -> Seq("сумма", "=", "100"),
      "a_b" -> Seq("a_b"), // underscore is a word char (\w)
      "Привет, мир!" -> Seq("Привет", ",", "мир", "!"),
      "«Яндекс»!" -> Seq("«", "Яндекс", "»", "!"))
    for ((in, want) <- table) {
      val got = Tokenizer.tokenize(in).map(_.text).toSeq
      assert(got == want, s"tokenize('$in'): got $got want $want")
      for (t <- Tokenizer.tokenize(in))
        assert(in.substring(t.start, t.stop) == t.text)
    }
    assert(table.size >= 50)
  }

  test("sentenize: initials and abbreviations do not end sentences") {
    def sents(t: String) = Tokenizer.sentenize(t).map(_.text).toSeq
    assert(sents("Роман написал А. С. Пушкин. Все читали.") ==
      Seq("Роман написал А. С. Пушкин.", "Все читали."))
    assert(sents("Это было в 1990 г. Потом всё изменилось.") ==
      Seq("Это было в 1990 г. Потом всё изменилось."))
    assert(sents("Дом на ул. Ленина. Рядом парк.") ==
      Seq("Дом на ул. Ленина.", "Рядом парк.")) // Ленина is no abbrev
    assert(sents("Яблоки, груши и т.д. Сливы тоже.") ==
      Seq("Яблоки, груши и т.д. Сливы тоже."))
    assert(sents("Он ушёл. Она осталась.") == Seq("Он ушёл.", "Она осталась."))
    assert(sents("Что это?! Не знаю...") == Seq("Что это?!", "Не знаю..."))
    assert(sents("Конец.") == Seq("Конец."))
  }

  test("findTokens aligns words to offsets (token.py:20-26)") {
    val text = "а б а"
    val toks = Tokenizer.findTokens(text, Seq("а", "б", "а"))
    assert(toks.map(t => (t.start, t.stop)).toSeq == Seq((0, 1), (2, 3), (4, 5)))
  }
}

class BioSpec extends AnyFunSuite {
  import Bio._
  private def toks(n: Int): IndexedSeq[Token] =
    (0 until n).map(i => Token(i * 2, i * 2 + 1, (i + 1).toString))

  val bioTests: Seq[Seq[String]] = Seq(
    Seq("O", "O", "O"), Seq(),
    Seq("B-PER", "O", "O"), Seq("B-PER", "I-PER", "O"), Seq("B-PER", "I-PER"),
    Seq("B-PER", "B-LOC", "O"), Seq("B-PER", "B-PER", "O"))

  val ioTests: Seq[Seq[String]] = Seq(
    Seq("O", "O", "O"), Seq(),
    Seq("I-PER", "O", "O"), Seq("I-PER", "I-PER", "O"),
    Seq("I-PER", "I-LOC", "O"), Seq("I-PER", "I-PER"))

  test("bio round trip (test_bio.py test_bio)") {
    for (tags <- bioTests) {
      val t = toks(tags.length)
      val spans = bioSpans(t, tags.toIndexedSeq)
      assert(spansBio(t, spans.toIndexedSeq).toSeq == tags)
    }
  }

  test("io round trip (test_bio.py test_io)") {
    for (tags <- ioTests) {
      val t = toks(tags.length)
      val spans = ioSpans(t, tags.toIndexedSeq)
      assert(spansIo(t, spans.toIndexedSeq).toSeq == tags)
    }
  }

  test("bio_io convert + select_type (test_bio.py)") {
    assert(bioIo(Seq("B-PER", "I-PER", "I-LOC")).toSeq == Seq("I-PER", "I-PER", "I-LOC"))
    assert(selectTypeTags(Seq("B-PER", "I-LOC"), "PER").toSeq == Seq("B-PER", "O"))
  }

  test("property: spans->bio->spans fixpoint on 500 random tag sequences") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("O", "B-PER", "I-PER", "B-LOC", "I-LOC")
    for (_ <- 0 until 500) {
      val tags = Vector.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
      val t = toks(tags.length)
      val spans = bioSpans(t, tags)
      // recovered spans are aligned, sorted, non-overlapping -> fixpoint
      val again = bioSpans(t, spansBio(t, spans.toIndexedSeq).toIndexedSeq)
      assert(again.toSeq == spans.toSeq, s"tags=$tags")
    }
  }

  test("conll tag codec round trip with sorted keys (conll.py:3-23)") {
    val tag = Conll.formatTag("NOUN", Map("Number" -> "Sing", "Case" -> "Acc"))
    assert(tag == "NOUN|Case=Acc|Number=Sing")
    assert(Conll.parseTag(tag) == ("NOUN", Map("Case" -> "Acc", "Number" -> "Sing")))
    assert(Conll.parseTag("ADP") == ("ADP", Map.empty))
  }
}
