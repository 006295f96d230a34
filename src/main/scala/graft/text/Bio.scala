package graft.text

import scala.collection.mutable.ArrayBuffer

/** BIO / IO tagging codecs (reference: slovnet/bio.py).
  *
  * Invariants assumed, as in the reference: tokens and spans sorted,
  * spans non-overlapping, span bounds aligned with token bounds.
  */
object Bio {
  val B = "B"
  val I = "I"
  val O = "O"

  /** slovnet/bio.py:6-12 */
  def parseBio(tag: String): (String, Option[String]) = {
    val i = tag.indexOf('-')
    if (i >= 0) (tag.substring(0, i), Some(tag.substring(i + 1)))
    else (tag, None)
  }

  /** slovnet/bio.py:15-18 */
  def formatBio(part: String, tpe: Option[String]): String =
    tpe match {
      case Some(t) if t.nonEmpty => s"$part-$t"
      case _                     => part
    }

  /** tokens x spans -> BIO tag per token (ordered interval merge,
    * slovnet/bio.py:85-100).
    */
  def spansBio(tokens: IndexedSeq[Token], spans: IndexedSeq[Span]): Array[String] = {
    val out = new Array[String](tokens.length)
    var si = 0
    var ti = 0
    while (ti < tokens.length) {
      val token = tokens(ti)
      var part = O
      var tpe: Option[String] = None
      if (si < spans.length) {
        val span = spans(si)
        if (token.start >= span.start) {
          tpe = Some(span.tpe)
          part = if (token.start == span.start) B else I
        }
        if (token.stop >= span.stop) si += 1
      }
      out(ti) = formatBio(part, tpe)
      ti += 1
    }
    out
  }

  /** IO variant (slovnet/bio.py:38-50). */
  def spansIo(tokens: IndexedSeq[Token], spans: IndexedSeq[Span]): Array[String] = {
    val out = new Array[String](tokens.length)
    var si = 0
    var ti = 0
    while (ti < tokens.length) {
      val token = tokens(ti)
      var part = O
      var tpe: Option[String] = None
      if (si < spans.length) {
        val span = spans(si)
        if (token.start >= span.start) { part = I; tpe = Some(span.tpe) }
        if (token.stop >= span.stop) si += 1
      }
      out(ti) = formatBio(part, tpe)
      ti += 1
    }
    out
  }

  /** Stateful scan BIO tags + tokens -> entity spans (slovnet/bio.py:103-122). */
  def bioSpans(tokens: IndexedSeq[Token], tags: IndexedSeq[String]): Array[Span] = {
    val out = new ArrayBuffer[Span]
    var previous: Option[String] = None
    var start = 0
    var stop = 0
    var i = 0
    val n = math.min(tokens.length, tags.length)
    while (i < n) {
      val token = tokens(i)
      val (part, tpe) = parseBio(tags(i))
      if (part == O) {
        if (previous.isDefined) {
          out += Span(start, stop, previous.get)
          previous = None
        }
      } else if (part == B) {
        if (previous.isDefined) out += Span(start, stop, previous.get)
        previous = tpe
        start = token.start
        stop = token.stop
      } else if (part == I) {
        stop = token.stop
      }
      i += 1
    }
    if (previous.isDefined) out += Span(start, stop, previous.get)
    out.toArray
  }

  // part codes for the id-based decoder
  val PartO = 0; val PartB = 1; val PartI = 2; val PartOther = 3

  def partCode(part: String): Int =
    if (part == O) PartO else if (part == B) PartB else if (part == I) PartI else PartOther

  /** [[bioSpans]] over tag IDS with the per-id parse precomputed once per
    * vocab (parts/types arrays) — the hot-path form: no string parsing, no
    * Option boxing per token. Same state machine; `null` type = reference's
    * None.
    */
  def bioSpansIds(tokens: Array[Token], tagIds: Array[Int], n: Int,
                  parts: Array[Int], types: Array[String]): Array[Span] = {
    var out: ArrayBuffer[Span] = null
    var previous: String = null
    var prevSet = false
    var start = 0
    var stop = 0
    var i = 0
    val m = math.min(tokens.length, n)
    while (i < m) {
      val part = parts(tagIds(i))
      if (part == PartO) {
        if (prevSet) {
          if (out == null) out = new ArrayBuffer[Span](4)
          out += Span(start, stop, previous)
          prevSet = false; previous = null
        }
      } else if (part == PartB) {
        if (prevSet) {
          if (out == null) out = new ArrayBuffer[Span](4)
          out += Span(start, stop, previous)
        }
        val t = types(tagIds(i))
        previous = t; prevSet = t != null
        start = tokens(i).start
        stop = tokens(i).stop
      } else if (part == PartI) {
        stop = tokens(i).stop
      }
      i += 1
    }
    if (prevSet) {
      if (out == null) out = new ArrayBuffer[Span](4)
      out += Span(start, stop, previous)
    }
    if (out == null) Bio.emptySpans else out.toArray
  }

  private val emptySpans = new Array[Span](0)

  /** IO-scheme recovery: type change or B = boundary (slovnet/bio.py:53-75). */
  def ioSpans(tokens: IndexedSeq[Token], tags: IndexedSeq[String]): Array[Span] = {
    val out = new ArrayBuffer[Span]
    var previous: Option[String] = None
    var start = 0
    var stop = 0
    var i = 0
    val n = math.min(tokens.length, tags.length)
    while (i < n) {
      val token = tokens(i)
      val (part, tpe) = parseBio(tags(i))
      if (previous != tpe || part == B) {
        if (previous.isEmpty && tpe.isDefined) {
          start = token.start
        } else if (previous.isDefined && tpe.isDefined) {
          out += Span(start, stop, previous.get)
          start = token.start
        } else if (previous.isDefined && tpe.isEmpty) {
          out += Span(start, stop, previous.get)
          previous = None
        }
      }
      previous = tpe
      stop = token.stop
      i += 1
    }
    if (previous.isDefined) out += Span(start, stop, previous.get)
    out.toArray
  }

  /** BIO -> IO (slovnet/bio.py:132-137). */
  def bioIo(tags: Iterable[String]): Array[String] =
    tags.iterator.map { tag =>
      val (part, tpe) = parseBio(tag)
      formatBio(if (part == B) I else part, tpe)
    }.toArray

  /** Keep only one entity type (slovnet/bio.py:147-153). */
  def selectTypeTags(tags: Iterable[String], selected: String): Array[String] =
    tags.iterator.map { tag =>
      val (part, tpe) = parseBio(tag)
      if (tpe.contains(selected)) formatBio(part, tpe) else O
    }.toArray
}

/** CoNLL morph-tag string codec (reference: slovnet/conll.py:3-23).
  * Format: `POS|k=v|...` with feature keys sorted.
  */
object Conll {
  def formatTag(pos: String, feats: Map[String, String]): String =
    if (feats.isEmpty) pos
    else pos + "|" + feats.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("|")

  def parseTag(tag: String): (String, Map[String, String]) = {
    val i = tag.indexOf('|')
    if (i < 0) (tag, Map.empty)
    else {
      val pos = tag.substring(0, i)
      val feats = tag
        .substring(i + 1)
        .split('|')
        .iterator
        .map { kv =>
          val j = kv.indexOf('=')
          kv.substring(0, j) -> kv.substring(j + 1)
        }
        .toMap
      (pos, feats)
    }
  }
}
