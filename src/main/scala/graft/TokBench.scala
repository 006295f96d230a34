package graft

/** Single-thread microbench of tokenize+sentenize over corpus-shaped text. */
object TokBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val sents = (0 until 1000).map(i => graft.corpus.RuCorpus.sentence(i, 0).text)
    var sink = 0L
    // warmup
    for (_ <- 1 to 3; s <- sents) sink += graft.text.Tokenizer.tokenize(s).length
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { sink += graft.text.Tokenizer.tokenize(sents(i % 1000)).length; i += 1 }
    val tokNs = (System.nanoTime() - t0).toDouble / n
    val doc = sents.take(4).mkString(" ")
    for (_ <- 1 to 2000) sink += graft.text.Tokenizer.sentenize(doc).length
    val t1 = System.nanoTime()
    i = 0
    while (i < n / 4) { sink += graft.text.Tokenizer.sentenize(doc).length; i += 1 }
    val sentNs = (System.nanoTime() - t1).toDouble / (n / 4)
    println(f"tokenize: $tokNs%.0f ns/sent   sentenize(4-sent doc): $sentNs%.0f ns/doc   sink=$sink")
  }
}
