package graft.text

import scala.collection.mutable.ArrayBuffer

/** Rule-based word tokenizer and sentence splitter.
  *
  * Re-creates the observable behavior of the reference's tokenize/sentenize
  * wrappers (reference: slovnet/token.py:11-17, slovnet/sent.py:13-30, which
  * delegate to the razdel segmenter). Behavior pinned by the reference's own
  * test fixtures (tests/test_shape.py:14-43):
  *   - letter runs and digit runs are separate atoms ("105г." -> 105 | г | .)
  *   - word-dash-word atoms join ("ИЛ-2", "Pal-Yz", "Я-ДаА" are one token)
  *   - digit,digit / digit.digit join into one numeric token ("3,5")
  *   - adjacent dash/dot/terminal punct of the joinable class runs join
  *     ("-‐" is one token, "..." is one token); other punct is one char each
  */
object Tokenizer {

  private def isWordChar(c: Char): Boolean =
    Character.isLetter(c) || c == '_'
  private def isDigit(c: Char): Boolean = Character.isDigit(c)
  // joinable punct runs: dashes, dots, ellipsis, terminals
  // (String.indexOf, not Set[Char] — avoids a Character box per lookup)
  private final val JoinPunctS = "-‐−‒⁃–—―.…!?"
  @inline private def isJoinPunct(c: Char): Boolean = JoinPunctS.indexOf(c) >= 0
  private final val DashS = "-‐−‒⁃–—―"
  @inline private def isDash(c: Char): Boolean = DashS.indexOf(c) >= 0

  // Atoms packed into one Long each — (start << 34) | (stop << 4) | kind,
  // kind: 0=word 1=digits 2=other char. Avoids a Tuple3 + 3 boxed Ints per
  // atom in the hottest loop of the engine (tens of millions of atoms).
  private def pk(start: Int, stop: Int, kind: Int): Long =
    (start.toLong << 34) | (stop.toLong << 4) | kind
  @inline private def pkStart(a: Long): Int = (a >>> 34).toInt
  @inline private def pkStop(a: Long): Int = ((a >>> 4) & 0x3fffffffL).toInt
  @inline private def pkKind(a: Long): Int = (a & 0xfL).toInt

  /** Split into packed atoms; returns (array, count). */
  private def atoms(text: String): (Array[Long], Int) = {
    var out = new Array[Long](math.max(8, text.length / 4))
    var m = 0
    def push(v: Long): Unit = {
      if (m == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
      out(m) = v; m += 1
    }
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) { i += 1 }
      else if (isWordChar(c)) {
        val s = i
        while (i < n && isWordChar(text.charAt(i))) i += 1
        push(pk(s, i, 0))
      } else if (isDigit(c)) {
        val s = i
        while (i < n && isDigit(text.charAt(i))) i += 1
        push(pk(s, i, 1))
      } else {
        push(pk(i, i + 1, 2))
        i += 1
      }
    }
    (out, m)
  }

  /** Tokenize one text into char-offset tokens. */
  def tokenize(text: String): Array[Token] = {
    val (as, m) = atoms(text)
    val out = new ArrayBuffer[Token](m)
    var i = 0
    while (i < m) {
      val s = pkStart(as(i))
      var e = pkStop(as(i))
      val k = pkKind(as(i))
      if (k == 0 || k == 1) {
        // join word(-word)* and digit([.,]digit|-digit)* chains; atoms must be adjacent
        var done = false
        while (!done && i + 2 < m) {
          val ms = pkStart(as(i + 1)); val me = pkStop(as(i + 1)); val mk = pkKind(as(i + 1))
          val rs = pkStart(as(i + 2)); val re = pkStop(as(i + 2)); val rk = pkKind(as(i + 2))
          val midChar = if (mk == 2) text.charAt(ms) else ' '
          val joinableMid =
            (mk == 2 && me == ms + 1) &&
              (isDash(midChar) || (k == 1 && rk == 1 && (midChar == '.' || midChar == ',')))
          if (joinableMid && ms == e && rs == me && (rk == 0 || rk == 1)) {
            e = re
            i += 2
          } else done = true
        }
        out += Token(s, e, text.substring(s, e))
      } else {
        // punct: join runs of joinable punct chars
        if (isJoinPunct(text.charAt(s))) {
          while (i + 1 < m && pkKind(as(i + 1)) == 2 && pkStart(as(i + 1)) == e &&
                 isJoinPunct(text.charAt(pkStart(as(i + 1))))) {
            e = pkStop(as(i + 1))
            i += 1
          }
        }
        out += Token(s, e, text.substring(s, e))
      }
      i += 1
    }
    out.toArray
  }

  def textWords(text: String): Array[String] = tokenize(text).map(_.text)

  @inline private def isSentEnd(c: Char): Boolean =
    c == '.' || c == '!' || c == '?' || c == '…'

  /** Common Russian abbreviations a single dot does NOT end a sentence
    * after (razdel's behavior on its fixture corpora: "т.д.", "г.",
    * "105 г.", "ул. Ленина"). Lowercased; single Cyrillic/Latin letters are
    * handled separately as initials ("А. С. Пушкин").
    */
  private val Abbrevs: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("т", "д", "п", "г", "гг", "вв", "млн", "млрд", "тыс", "руб", "коп",
      "см", "мм", "км", "кг", "га", "им", "ул", "просп", "пр", "пл", "наб",
      "стр", "корп", "обл", "респ", "тел", "англ", "рус", "лат", "греч",
      "др", "проч", "ср", "напр", "т.е", "т.д", "т.п", "n", "no",
      "vol", "p", "pp", "св", "акад", "проф", "доц", "канд", "ст", "рис",
      "табл", "гл", "разд", "изд", "ред", "сост", "пер").foreach(s.add)
    s
  }

  /** Sentence splitter: first split hard lines (slovnet/sent.py:13-18 regex
    * `[^\r\n]+`), then within a line split after terminal punct followed by
    * whitespace + an uppercase/digit start (razdel-like heuristic;
    * abbreviation handling scoped to our deterministic corpora).
    */
  def sentenize(text: String): Array[Sent] = {
    val out = new ArrayBuffer[Sent]
    var ls = 0
    val n = text.length
    while (ls < n) {
      while (ls < n && (text.charAt(ls) == '\r' || text.charAt(ls) == '\n')) ls += 1
      if (ls < n) {
        var le = ls
        while (le < n && text.charAt(le) != '\r' && text.charAt(le) != '\n') le += 1
        splitLine(text, ls, le, out)
        ls = le
      }
    }
    out.toArray
  }

  private def splitLine(text: String, ls: Int, le: Int, out: ArrayBuffer[Sent]): Unit = {
    var s = ls
    var i = ls
    while (i < le) {
      val c = text.charAt(i)
      if (isSentEnd(c)) {
        // consume the full terminal run (e.g. "?!", "...")
        var j = i + 1
        while (j < le && isSentEnd(text.charAt(j))) j += 1
        // a SINGLE dot after an initial ("А. С. Пушкин") or a known
        // abbreviation ("т.", "ул.", "105 г.") is not a terminal
        val abbrevDot = c == '.' && j == i + 1 && {
          var ws = i
          while (ws > ls && (Character.isLetter(text.charAt(ws - 1)) ||
            text.charAt(ws - 1) == '.')) ws -= 1
          val w = text.substring(ws, i).stripPrefix(".")
          (w.length == 1 && Character.isLetter(w.charAt(0)) &&
            Character.isUpperCase(w.charAt(0))) ||
            Abbrevs.contains(w.toLowerCase(java.util.Locale.ROOT))
        }
        // closing quotes/brackets stay with the sentence
        while (j < le && "»\")]".contains(text.charAt(j))) j += 1
        // boundary if followed by whitespace then an upper-case/digit start
        var k = j
        while (k < le && Character.isWhitespace(text.charAt(k))) k += 1
        val boundary = !abbrevDot && (k == le ||
          (k > j && (Character.isUpperCase(text.charAt(k)) ||
            Character.isDigit(text.charAt(k)) || "«\"([".contains(text.charAt(k)))))
        if (boundary) {
          emit(text, s, j, out)
          s = k
          i = k
        } else i = j
      } else i += 1
    }
    if (s < le) emit(text, s, le, out)
  }

  private def emit(text: String, s0: Int, e0: Int, out: ArrayBuffer[Sent]): Unit = {
    var s = s0; var e = e0
    while (s < e && Character.isWhitespace(text.charAt(s))) s += 1
    while (e > s && Character.isWhitespace(text.charAt(e - 1))) e -= 1
    if (e > s) out += Sent(s, e, text.substring(s, e)) // drop empty (sent.py:24-25)
  }

  /** Align already-known words back to char offsets via ordered substring
    * search with a running offset (slovnet/token.py:20-26).
    */
  def findTokens(text: String, chunks: Iterable[String]): Array[Token] = {
    val out = new ArrayBuffer[Token]
    var offset = 0
    for (chunk <- chunks) {
      val start = text.indexOf(chunk, offset)
      val stop = start + chunk.length
      out += Token(start, stop, chunk)
      offset = stop
    }
    out.toArray
  }

  /** Keep spans fully inside the [start,stop) envelope (slovnet/span.py:26-33). */
  def envelopSpans(spans: Iterable[Span], start: Int, stop: Int): Array[Span] =
    spans.iterator.filter(s => start <= s.start && s.stop <= stop).toArray

  /** Shift span coordinates by delta (slovnet/span.py:13-23). */
  def offsetSpans(spans: Iterable[Span], delta: Int): Array[Span] =
    spans.iterator.map(s => Span(s.start + delta, s.stop + delta, s.tpe)).toArray

  /** Filter spans by entity type (slovnet/span.py:36-39). */
  def selectTypeSpans(spans: Iterable[Span], tpe: String): Array[Span] =
    spans.iterator.filter(_.tpe == tpe).toArray
}
