package graft.text

/** Markup-level operations (reference: slovnet/markup.py).
  */
object Markup {

  final case class SpanMarkup(text: String, spans: Array[Span])

  /** Re-segment a document-level span markup into per-sentence markups:
    * sentenize, keep spans enveloped by each sentence, shift coordinates
    * to sentence-local (markup.py:41-46 via span.py:13-33).
    */
  def sents(markup: SpanMarkup): Array[SpanMarkup] =
    Tokenizer.sentenize(markup.text).map { sent =>
      val inside = Tokenizer.envelopSpans(markup.spans, sent.start, sent.stop)
      SpanMarkup(sent.text, Tokenizer.offsetSpans(inside, -sent.start))
    }

  /** spans -> BIO tags for a text (training direction, markup.py:48-51). */
  def toBio(markup: SpanMarkup): Array[String] = {
    val tokens = Tokenizer.tokenize(markup.text)
    Bio.spansBio(tokens, markup.spans.sortBy(_.start))
  }

  /** words+tags -> char spans via find_tokens (markup.py:91-95). */
  def bioToSpans(text: String, words: Seq[String], tags: Seq[String]): Array[Span] = {
    val tokens = Tokenizer.findTokens(text, words)
    Bio.bioSpans(tokens, tags.toIndexedSeq)
  }
}
