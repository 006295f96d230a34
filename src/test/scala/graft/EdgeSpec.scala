package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nlp.{Pipeline, SentRow}
import graft.pack.SynthPack

/** Adversarial-input hardening for the inference path: outputs must stay
  * structurally sane (aligned arrays, in-bounds spans, valid head ids) for
  * inputs the planted corpus never produces.
  */
class EdgeSpec extends AnyFunSuite {
  private val pack = SynthPack.build()

  private def check(texts: Seq[String]): Unit = {
    val rows = texts.zipWithIndex.map { case (t, i) =>
      SentRow(s"d$i", 0, 0, 0, t.length, t)
    }
    // one mixed batch (extreme length spread stresses padding) + singles
    val batched = Pipeline.inferBatch(rows, pack)
    val singles = rows.flatMap(r => Pipeline.inferBatch(Seq(r), pack))
    for (p <- batched ++ singles) {
      assert(p.tokens.length == p.morph.length && p.tokens.length == p.syn.length)
      p.nerSpans.foreach { s =>
        assert(s.start >= 0 && s.stop <= p.text.length && s.start < s.stop, p.text.take(40))
      }
      p.syn.zipWithIndex.foreach { case (s, i) =>
        assert(s.id == i + 1 && s.headId >= 0 && s.headId <= p.tokens.length)
      }
      p.tokens.foreach(t => assert(p.text.substring(t.start, t.stop) == t.text))
    }
    // batching must not change results (padding invariance under extremes)
    assert(batched.map(p => (p.nerSpans.toSeq, p.morph.toSeq, p.syn.toSeq)) ==
      singles.map(p => (p.nerSpans.toSeq, p.morph.toSeq, p.syn.toSeq)))
  }

  test("edge inputs: punct-only, unknowns, mixed script, 500-token, 1-token") {
    check(Seq(
      "...",
      "?!…",
      "xyzzy qwerty plugh",
      "42 + 17 - 3,5",
      "a Я 1 . « » № _",
      ("слово " * 500).trim,
      "Я",
      "«»«»«»",
      "Иван Петров купил завод." // a normal one mixed in
    ))
  }

  test("empty and whitespace-only text spans produce no sentences") {
    assert(graft.text.Tokenizer.sentenize("").isEmpty)
    assert(graft.text.Tokenizer.sentenize("   \n\r\n \t ").isEmpty)
    assert(Pipeline.oracleParse(pack, "d", 0, "").isEmpty)
  }
}
