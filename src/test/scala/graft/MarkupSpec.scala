package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text._

class MarkupSpec extends AnyFunSuite {
  test("envelop/offset/select span ops (span.py:13-39)") {
    val spans = Array(Span(0, 4, "PER"), Span(10, 14, "LOC"), Span(20, 24, "ORG"))
    assert(Tokenizer.envelopSpans(spans, 8, 16).toSeq == Seq(Span(10, 14, "LOC")))
    assert(Tokenizer.offsetSpans(Seq(Span(10, 14, "LOC")), -10).toSeq ==
      Seq(Span(0, 4, "LOC")))
    assert(Tokenizer.selectTypeSpans(spans, "ORG").toSeq == Seq(Span(20, 24, "ORG")))
  }

  test("SpanMarkup.sents re-segments doc markup (markup.py:41-46)") {
    val text = "Иван Петров купил завод. Пётр продал офис в Казани."
    //          0123456789...        ^24
    val doc = Markup.SpanMarkup(text, Array(
      Span(0, 11, "PER"), Span(25, 29, "PER"), Span(44, 50, "LOC")))
    val per = Markup.sents(doc)
    assert(per.length == 2)
    assert(per(0).text == "Иван Петров купил завод.")
    assert(per(0).spans.toSeq == Seq(Span(0, 11, "PER")))
    assert(per(1).text == "Пётр продал офис в Казани.")
    assert(per(1).spans.toSeq == Seq(Span(0, 4, "PER"), Span(19, 25, "LOC")))
    // round trip: to_bio then bio_spans recovers the same spans
    for (m <- per) {
      val tags = Markup.toBio(m)
      val words = Tokenizer.tokenize(m.text).map(_.text)
      assert(Markup.bioToSpans(m.text, words.toIndexedSeq, tags.toIndexedSeq).toSeq ==
        m.spans.toSeq)
    }
  }
}
