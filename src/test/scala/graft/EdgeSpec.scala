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

  test("50k-token line: chunk-and-rejoin bounds memory, output stays sane") {
    // 4-token repetitions divide the chunk size evenly, so expectations
    // are exact (no PER pair straddles a chunk boundary)
    val text = ("Иван Петров купил . " * 12500).trim // 50k tokens
    val row = SentRow("big", 0, 0, 0, text.length, text)
    val p = Pipeline.inferBatch(Seq(row), pack).head
    assert(p.tokens.length == 50000)
    assert(p.morph.length == 50000 && p.syn.length == 50000)
    // head ids remapped into the global token space
    p.syn.zipWithIndex.foreach { case (s, i) =>
      assert(s.id == i + 1 && s.headId >= 0 && s.headId <= 50000)
    }
    assert(p.syn.count(_.headId == 0) == 12500) // every planted verb -> root
    // char offsets survive the chunking (NER spans index the full text)
    p.nerSpans.foreach { s =>
      assert(s.start >= 0 && s.stop <= text.length && s.start < s.stop)
      assert(text.substring(s.start, s.stop).startsWith("Иван"))
    }
    assert(p.nerSpans.length == 12500) // one PER mention per repetition
    // batch-composition invariance holds for the chunked path too
    val again = Pipeline.inferBatch(Seq(row, row), pack)
    assert(again.forall(q => q.syn.toSeq == p.syn.toSeq))
  }

  test("empty and whitespace-only text spans produce no sentences") {
    assert(graft.text.Tokenizer.sentenize("").isEmpty)
    assert(graft.text.Tokenizer.sentenize("   \n\r\n \t ").isEmpty)
    assert(Pipeline.oracleParse(pack, "d", 0, "").isEmpty)
  }
}
