package graft.text

/** Word-shape classifier.
  *
  * Re-creates the behavior of the reference's shape module
  * (reference: slovnet/shape.py:16-95): a word is classified as
  * RU / EN / NUM / PUNCT / OTHER by a first-match alternation anchored at
  * the start of the word, and letter words additionally get a
  * capitalization outline (X / x / XX / xx / Xx / Xx-Xx / OTHER).
  *
  * Parity notes vs the Python original:
  *  - Python `re.match` anchors at position 0 and `lastgroup` reports the
  *    alternative that matched — we test the alternatives in the same order.
  *  - Python `str.isupper`/`islower` require at least one cased character
  *    and all cased characters upper/lower — reproduced in [[pyIsUpper]] /
  *    [[pyIsLower]].
  */
object Shape {
  val RU = "RU"
  val EN = "EN"
  val NUM = "NUM"
  val PUNCT = "PUNCT"
  val OTHER = "OTHER"

  /** Punct inventory (slovnet/shape.py:9-15). */
  val PUNCTS: String =
    "!#$%&()[]\\/*+,.:;<=>?@^_{|}~" +
      "-‐−‒⁃–—―" +
      "`\"'«»„“ʼʻ”" +
      "№…"

  private val punctSet: Set[Char] = PUNCTS.toSet

  // Alternation order matters: RU | EN | NUM | PUNCT (first match wins).
  private val RuRe = "(?iu)[а-яё]+".r
  private val EnRe = "(?i)[a-z]+".r
  private val NumRe = "[+-]?[0-9]+".r
  private val PunctRe = ("[" + java.util.regex.Pattern.quote(PUNCTS) + "]+").r

  val X = "X"
  val xS = "x"
  val XX = "XX"
  val xx = "xx"
  val Xx = "Xx"
  val Xx_Xx = "Xx-Xx"

  /** Python str.isupper: >=1 cased char, no lowercase cased chars. */
  def pyIsUpper(s: String): Boolean = {
    var cased = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLowerCase(c)) return false
      if (Character.isUpperCase(c) || Character.isTitleCase(c)) cased = true
      i += 1
    }
    cased
  }

  /** Python str.islower: >=1 cased char, no uppercase/titlecase chars. */
  def pyIsLower(s: String): Boolean = pyIsLower(s, 0, s.length)

  /** Range variant — isTitle/isDashTitle classify every token of every
    * sentence; the substring copies were a measurable allocation site
    * (JFR: 1.8 GB/2M docs), offsets make them free. */
  private def pyIsLower(s: String, from: Int, until: Int): Boolean = {
    var cased = false
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (Character.isUpperCase(c) || Character.isTitleCase(c)) return false
      if (Character.isLowerCase(c)) cased = true
      i += 1
    }
    cased
  }

  /** slovnet/shape.py:34-35 */
  def isTitle(word: String): Boolean = isTitle(word, 0, word.length)

  private def isTitle(word: String, from: Int, until: Int): Boolean =
    until - from > 1 && Character.isUpperCase(word.charAt(from)) &&
      pyIsLower(word, from + 1, until)

  /** slovnet/shape.py:38-41 */
  def isDashTitle(word: String): Boolean = {
    val i = word.indexOf('-')
    i >= 0 && isTitle(word, 0, i) && isTitle(word, i + 1, word.length)
  }

  /** slovnet/shape.py:44-60 */
  def wordOutline(word: String): String =
    if (word.length == 1) {
      if (pyIsUpper(word)) X else xS
    } else {
      if (pyIsUpper(word)) XX
      else if (pyIsLower(word)) xx
      else if (isTitle(word)) Xx
      else if (isDashTitle(word)) Xx_Xx
      else OTHER
    }

  /** First-match-at-start classification (slovnet/shape.py:63-69).
    * The regex alternation only ever inspects the first char (plus one
    * lookahead for the NUM sign) — implemented branch-wise, zero-alloc;
    * [[wordTypeRegex]] keeps the literal translation and a property test
    * pins equality.
    */
  def wordType(word: String): String = {
    if (word.isEmpty) return OTHER
    val c = word.charAt(0)
    if (isRuChar(c)) RU
    else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) EN
    else if (c >= '0' && c <= '9') NUM
    else if ((c == '+' || c == '-') && word.length > 1 && {
      val d = word.charAt(1); d >= '0' && d <= '9'
    }) NUM
    else if (PUNCTS.indexOf(c) >= 0) PUNCT
    else OTHER
  }

  @inline private def isRuChar(c: Char): Boolean =
    (c >= 'а' && c <= 'я') || (c >= 'А' && c <= 'Я') || c == 'ё' || c == 'Ё'

  /** literal regex translation, kept as the parity oracle for wordType */
  private[graft] def wordTypeRegex(word: String): String = {
    if (RuRe.findPrefixOf(word).isDefined) RU
    else if (EnRe.findPrefixOf(word).isDefined) EN
    else if (NumRe.findPrefixOf(word).isDefined) NUM
    else if (PunctRe.findPrefixOf(word).isDefined) PUNCT
    else OTHER
  }

  def formatShape(tpe: String, value: String): String = s"${tpe}_$value"

  // interned shape strings — wordShape is called once per token at 32
  // threads, so returning shared constants (not fresh concats) keeps the
  // hot loop allocation-free
  private lazy val ruShapes: Map[String, String] =
    OUTLINES.map(o => o -> s"RU_$o").toMap
  private lazy val enShapes: Map[String, String] =
    OUTLINES.map(o => o -> s"EN_$o").toMap
  private lazy val punctShapes: Map[Char, String] =
    PUNCTS.map(c => c -> s"PUNCT_$c").toMap
  private val PunctOther = "PUNCT_OTHER"

  /** slovnet/shape.py:76-86 */
  def wordShape(word: String): String = {
    val tpe = wordType(word)
    if (tpe == RU) ruShapes(wordOutline(word))
    else if (tpe == EN) enShapes(wordOutline(word))
    else if (tpe == PUNCT) {
      if (word.length > 1 || !punctSet.contains(word.charAt(0))) PunctOther
      else punctShapes(word.charAt(0))
    } else tpe // NUM | OTHER
  }

  private def outlineIdx(word: String): Int =
    if (word.length == 1) { if (pyIsUpper(word)) 0 else 1 }
    else {
      if (pyIsUpper(word)) 2
      else if (pyIsLower(word)) 3
      else if (isTitle(word)) 4
      else if (isDashTitle(word)) 5
      else 6
    }

  private val P = PUNCTS.length

  /** Index of wordShape(word) in [[SHAPES]] — the hot-path form: one int,
    * no string building, no map lookups. SHAPES layout: 7 RU outlines,
    * 7 EN outlines, |PUNCTS| single-punct shapes, PUNCT_OTHER, NUM, OTHER.
    */
  def shapeOrdinal(word: String): Int = {
    val tpe = wordType(word)
    if (tpe eq RU) outlineIdx(word)
    else if (tpe eq EN) 7 + outlineIdx(word)
    else if (tpe eq PUNCT) {
      if (word.length > 1) 14 + P
      else {
        val i = PUNCTS.indexOf(word.charAt(0))
        if (i < 0) 14 + P else 14 + i
      }
    } else if (tpe eq NUM) 14 + P + 1
    else 14 + P + 2 // OTHER
  }

  /** Python str.lower() for vocab lookup; returns the SAME instance when
    * already lowercase (the common case) to avoid per-token garbage.
    */
  def lowerFast(s: String): String = {
    var i = 0
    var needs = false
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      if (c != Character.toLowerCase(c)) needs = true
      i += 1
    }
    if (needs) s.toLowerCase(java.util.Locale.ROOT) else s
  }

  val OUTLINES: Seq[String] = Seq(X, xS, XX, xx, Xx, Xx_Xx, OTHER)

  /** The fixed 81-entry shape vocabulary (slovnet/shape.py:89-95). */
  val SHAPES: Seq[String] =
    OUTLINES.map(formatShape(RU, _)) ++
      OUTLINES.map(formatShape(EN, _)) ++
      PUNCTS.map(c => formatShape(PUNCT, c.toString)) ++
      Seq(formatShape(PUNCT, OTHER), NUM, OTHER)
}
