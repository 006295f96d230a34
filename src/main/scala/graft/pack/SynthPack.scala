package graft.pack

import graft.kernel._
import graft.text.Shape
import graft.corpus.RuCorpus
import graft.corpus.RuCorpus.{M, N, R, WordInfo}

/** Deterministic synthetic model pack, co-designed with [[RuCorpus]].
  *
  * The reference's e2e oracle downloads real released packs
  * (reference: tests/test_api.py:16-52) — zero-egress here, so instead the
  * weights are CONSTRUCTED so that the genuine tensor pipeline
  * (PQ navec lookup -> concat shape emb -> masked CNN -> CRF Viterbi /
  * argmax / biaffine decode) reproduces the dictionary-planted classes
  * exactly:
  *
  *  - each word's navec code stores 12 bits:
  *    dims 0-2 NER tag id, 3-7 morph tag id, 8 is-verb, 9-11 rel id;
  *  - conv layers are center-tap passthroughs selecting the per-task dims,
  *    batchnorm is identity, CRF transitions are zero (Viterbi = per-token
  *    argmax), projections are Hamming decoders
  *    (logit_t = sum_k (2 c_tk - 1) b_k - |c_t|, max 0 iff b == c_t);
  *  - the biaffine arc scorer computes
  *    score(i,j) = isVerb_j + isVerb_i * (2*isRoot_j - isVerb_j), whose
  *    masked argmax is: verbs head to ROOT, everything else to the verb.
  *
  * This makes the distributed pipeline exactly verifiable against the
  * planted annotations with the full kernel stack exercised.
  */
object SynthPack {

  val EmbWordDim = 12 // qdim 4 x chunk 3 (prod 100x3=300, exec/model.py:213-234)
  val ShapeDim = 6    // prod 30
  val EmbDim: Int = EmbWordDim + ShapeDim
  val EncDims: Seq[Int] = Seq(16, 8) // prod [256,128,64], kernel 3
  val Kernel = 3
  val EncOut = 8
  val Hidden: Int = EncOut / 2 // syntax hidden = encoder.dim/2 (07_syntax/pack.ipynb)

  val morphTagItems: Array[String] = Array(
    "X",
    "PROPN|Case=Nom",
    "PROPN|Case=Loc",
    "VERB|Gender=Masc|Number=Sing|Tense=Past",
    "NOUN|Case=Acc|Gender=Masc|Number=Sing",
    "ADP",
    "PUNCT",
    "NUM"
  )
  val relItems: Array[String] = Array(
    "dep", "root", "nsubj", "obj", "obl", "case", "flat:name", "punct")

  private val unkInfo = WordInfo(N.O, M.X, R.DEP, verb = false)

  def wordBits(w: WordInfo): Int =
    (w.ner & 7) | ((w.morph & 31) << 3) | ((if (w.verb) 1 else 0) << 8) | ((w.rel & 7) << 9)

  def build(): ModelPack = {
    val words = RuCorpus.dict.keys.toArray.sorted
    val wordItems = Array(Vocab.UNK, Vocab.PAD) ++ words
    val wordVocab = Vocab(wordItems)
    val shapeVocab = Vocab((Vocab.PAD +: Shape.SHAPES).toArray)
    val nerTags = Vocab.bioTags(Seq("PER", "LOC", "ORG"))
    val morphTags = Vocab(morphTagItems)
    val rels = Vocab(relItems)

    // --- navec: per-word 12-bit code via 4 subquantizers of 8 centroids x3
    val qdim = 4; val centroids = 8; val chunk = 3
    val indexes = new Array[Int](wordItems.length * qdim)
    for (i <- wordItems.indices) {
      val bits =
        if (i == wordVocab.padId) 0
        else wordBits(RuCorpus.dict.getOrElse(wordItems(i), unkInfo))
      for (q <- 0 until qdim) indexes(i * qdim + q) = (bits >> (q * 3)) & 7
    }
    val codes = new Array[Float](qdim * centroids * chunk)
    for (q <- 0 until qdim; c <- 0 until centroids; k <- 0 until chunk)
      codes((q * centroids + c) * chunk + k) = ((c >> k) & 1).toFloat
    val navec = NavecEmbedding(indexes, qdim, codes, centroids, chunk)
    val shapeEmb = Embedding(new Array[Float](shapeVocab.size * ShapeDim), ShapeDim)
    val emb = WordShapeEmbedding(navec, shapeEmb)

    // --- passthrough CNN encoder: output channel f carries emb dim sel(f)
    def encoder(sel: Array[Int]): CNNEncoder = {
      val l1w = new Array[Float](EncDims(0) * EmbDim * Kernel)
      for (f <- sel.indices; if sel(f) >= 0)
        l1w((f * EmbDim + sel(f)) * Kernel + 1) = 1f
      val l1 = CNNEncoderLayer(
        Conv1d(l1w, EncDims(0), EmbDim, Kernel, new Array[Float](EncDims(0)), 1),
        identityNorm(EncDims(0)))
      val l2w = new Array[Float](EncDims(1) * EncDims(0) * Kernel)
      for (f <- 0 until EncDims(1))
        l2w((f * EncDims(0) + f) * Kernel + 1) = 1f
      val l2 = CNNEncoderLayer(
        Conv1d(l2w, EncDims(1), EncDims(0), Kernel, new Array[Float](EncDims(1)), 1),
        identityNorm(EncDims(1)))
      CNNEncoder(Seq(l1, l2))
    }

    // --- Hamming-decode projection over `bits` input channels
    def hammingProj(bits: Int, classes: Int): Linear = {
      val w = new Array[Float](EncOut * classes)
      val b = new Array[Float](classes)
      for (t <- 0 until classes) {
        var ones = 0
        for (k <- 0 until bits) {
          val bit = (t >> k) & 1
          w(k * classes + t) = (2 * bit - 1).toFloat
          ones += bit
        }
        b(t) = -ones.toFloat
      }
      Linear(w, EncOut, classes, b)
    }

    val nerModel = NerModel(
      emb,
      encoder(Array(0, 1, 2, -1, -1, -1, -1, -1)),
      hammingProj(3, nerTags.size),
      CRF(new Array[Float](nerTags.size * nerTags.size), nerTags.size))

    val morphModel = MorphModel(
      emb,
      encoder(Array(3, 4, 5, 6, 7, -1, -1, -1)),
      hammingProj(5, morphTags.size))

    // syntax encoder channels: 0=isVerb(dim8), 1..3=rel bits(dims 9-11),
    // 4 = root-flag channel (only the learned root vector sets it)
    val synEnc = encoder(Array(8, 9, 10, 11, -1, -1, -1, -1))
    val rootVec = new Array[Float](EncOut); rootVec(4) = 1f

    def ff(rows: Seq[(Int, Int, Float)], bias: Seq[(Int, Float)]): FF = {
      val w = new Array[Float](EncOut * Hidden)
      rows.foreach { case (in, out, v) => w(in * Hidden + out) = v }
      val b = new Array[Float](Hidden)
      bias.foreach { case (i, v) => b(i) = v }
      FF(Linear(w, EncOut, Hidden, b))
    }
    // h = [1, isVerb, 0, 0]; t = [isRoot, isVerb, 0, 0]
    val headFF = ff(Seq((0, 1, 1f)), Seq((0, 1f)))
    val tailFF = ff(Seq((4, 0, 1f), (0, 1, 1f)), Nil)
    val headKernel = new Array[Float](Hidden * Hidden)
    headKernel(0 * Hidden + 1) = 1f  // K01: v_j
    headKernel(1 * Hidden + 0) = 2f  // K10: 2*isRoot_j * v_i
    headKernel(1 * Hidden + 1) = -1f // K11: -v_i*v_j
    val synHead = SyntaxHead(headFF, tailFF, rootVec, headKernel, Hidden)

    // rel scorer: h = [1,0,0,0]; t = [relBit0, relBit1, relBit2, 1]
    val relHeadFF = ff(Nil, Seq((0, 1f)))
    val relTailFF = ff(Seq((1, 0, 1f), (2, 1, 1f), (3, 2, 1f)), Seq((3, 1f)))
    val relK = new Array[Float](Hidden * Hidden * rels.size)
    for (r <- rels.items.indices) {
      var ones = 0
      for (k <- 0 until 3) {
        val bit = (r >> k) & 1
        relK(0 * (Hidden * rels.size) + r * Hidden + k) = (2 * bit - 1).toFloat
        ones += bit
      }
      relK(0 * (Hidden * rels.size) + r * Hidden + 3) = -ones.toFloat
    }
    val synRel = SyntaxRel(relHeadFF, relTailFF, rootVec, relK, Hidden, rels.size)
    val syntaxModel = SyntaxModel(emb, synEnc, synHead, synRel)

    ModelPack("graft_synth_v1", wordVocab, shapeVocab, nerTags, morphTags, rels,
      nerModel, morphModel, syntaxModel)
  }

  private def identityNorm(channels: Int): BatchNorm1d = {
    val ones = Array.fill(channels)(1f)
    BatchNorm1d(ones, new Array[Float](channels), new Array[Float](channels), ones)
  }
}
