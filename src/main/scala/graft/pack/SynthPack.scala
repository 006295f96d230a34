package graft.pack

import graft.kernel._
import graft.text.Shape
import graft.corpus.RuCorpus
import graft.corpus.RuCorpus.{AC, M, N, R, SC, WordInfo}

/** Deterministic synthetic model pack, co-designed with [[RuCorpus]].
  *
  * The reference's e2e oracle downloads real released packs
  * (reference: tests/test_api.py:16-52) — zero-egress here, so instead the
  * weights are CONSTRUCTED so that the genuine tensor pipeline
  * (PQ navec lookup -> concat shape emb -> masked CNN -> CRF Viterbi /
  * argmax / biaffine decode) reproduces the dictionary-planted classes
  * exactly:
  *
  *  - each word's navec code stores 18 bits (see [[wordBits]], the truth):
  *    bits 0-2 NER tag id, 3-7 morph tag id, 8-11 rel id, 12-14 the word's
  *    self attachment class (SC), 15-17 the attachment class it accepts as
  *    a dependent (AC) — class semantics in RuCorpus;
  *  - conv layers are center-tap passthroughs selecting the per-task dims,
  *    batchnorm is identity, CRF transitions are zero (Viterbi = per-token
  *    argmax), projections are Hamming decoders
  *    (logit_t = sum_k (2 c_tk - 1) b_k - |c_t|, max 0 iff b == c_t);
  *  - the biaffine arc scorer is a CLASS MATCHER: score(i,j) = 1 iff
  *    selfCls(j) == attCls(i) — token i attaches to the unique candidate
  *    whose self class is the one i accepts (ROOT pseudo-node for root
  *    tokens) — reproducing the planted tree under masked argmax.
  *
  * This makes the distributed pipeline exactly verifiable against the
  * planted annotations with the full kernel stack exercised.
  */
object SynthPack {

  val EmbWordDim = 18 // qdim 6 x chunk 3 (prod 100x3=300, exec/model.py:213-234)
  val ShapeDim = 6    // prod 30
  val EmbDim: Int = EmbWordDim + ShapeDim
  val EncDims: Seq[Int] = Seq(24, 12) // prod [256,128,64], kernel 3
  val Kernel = 3
  val EncOut = 12
  val Hidden: Int = EncOut / 2 // syntax hidden = encoder.dim/2 (07_syntax/pack.ipynb)

  val morphTagItems: Array[String] = Array(
    "X",
    "PROPN|Case=Nom",
    "PROPN|Case=Loc",
    "VERB|Gender=Masc|Number=Sing|Tense=Past",
    "NOUN|Case=Acc|Gender=Masc|Number=Sing",
    "ADP",
    "PUNCT",
    "NUM",
    "NOUN|Case=Nom|Gender=Masc|Number=Sing",
    "PROPN|Case=Gen"
  )
  val relItems: Array[String] = Array(
    "dep", "root", "nsubj", "obj", "obl", "case", "flat:name", "punct",
    "appos", "nmod")

  private val unkInfo = WordInfo(N.O, M.X, R.DEP, SC.NONE, AC.PRED)

  /** 18-bit per-word code: ner(3) | morph(5) | rel(4) | selfCls(3) | attCls(3).
    * Bit k lands in embedding dim k via the PQ codebook below.
    */
  def wordBits(w: WordInfo): Int =
    (w.ner & 7) | ((w.morph & 31) << 3) | ((w.rel & 15) << 8) |
      ((w.selfCls & 7) << 12) | ((w.attCls & 7) << 15)

  def build(): ModelPack = {
    val words = RuCorpus.dict.keys.toArray.sorted
    val wordItems = Array(Vocab.UNK, Vocab.PAD) ++ words
    val wordVocab = Vocab(wordItems)
    val shapeVocab = Vocab((Vocab.PAD +: Shape.SHAPES).toArray)
    val nerTags = Vocab.bioTags(Seq("PER", "LOC", "ORG"))
    val morphTags = Vocab(morphTagItems)
    val rels = Vocab(relItems)

    // --- navec: per-word 18-bit code via 6 subquantizers of 8 centroids x3
    val qdim = 6; val centroids = 8; val chunk = 3
    val indexes = new Array[Byte](wordItems.length * qdim)
    for (i <- wordItems.indices) {
      val bits =
        if (i == wordVocab.padId) 0
        else wordBits(RuCorpus.dict.getOrElse(wordItems(i), unkInfo))
      for (q <- 0 until qdim) indexes(i * qdim + q) = ((bits >> (q * 3)) & 7).toByte
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
      encoder(Array(0, 1, 2)),
      hammingProj(3, nerTags.size),
      CRF(new Array[Float](nerTags.size * nerTags.size), nerTags.size))

    val morphModel = MorphModel(
      emb,
      encoder(Array(3, 4, 5, 6, 7)),
      hammingProj(5, morphTags.size))

    // syntax encoder channels: 0..3 = rel bits (emb dims 8-11),
    // 4..6 = self-class bits (dims 12-14), 7..9 = attach-class bits
    // (dims 15-17), 10 = root flag (set only by the learned root vector)
    val synEnc = encoder(Array(8, 9, 10, 11, 12, 13, 14, 15, 16, 17))
    val rootVec = new Array[Float](EncOut); rootVec(10) = 1f

    def ff(rows: Seq[(Int, Int, Float)], bias: Seq[(Int, Float)]): FF = {
      val w = new Array[Float](EncOut * Hidden)
      rows.foreach { case (in, out, v) => w(in * Hidden + out) = v }
      val b = new Array[Float](Hidden)
      bias.foreach { case (i, v) => b(i) = v }
      FF(Linear(w, EncOut, Hidden, b))
    }
    // Head scorer = class matcher: score(i,j) = 1 iff selfCls(j) == attCls(i)
    // (with the ROOT pseudo-node matching attCls ROOT0), 0 otherwise. Each
    // sentence has exactly one token per non-NONE self class, so the masked
    // argmax yields the planted TREE (not a star).
    // One-hot of a 3-bit class via linear threshold + ReLU:
    //   is(cls) = relu(sum_j (bit_j(cls) ? b_j : 1-b_j) - 2)
    // FF inputs are ENCODER CHANNELS: 0-3 rel bits, 4-6 self bits,
    // 7-9 att bits, 10 root flag.
    // tail t_j = [isRootPos, selfPRED, selfNAME, selfOBL, selfGOV, 0]
    val tailFF = ff(Seq(
      (10, 0, 1f),                           // t0 = root-position flag
      (4, 1, 1f), (5, 1, -1f), (6, 1, -1f),  // t1 = self PRED (1,0,0)
      (4, 2, -1f), (5, 2, 1f), (6, 2, -1f),  // t2 = self NAME (0,1,0)
      (4, 3, 1f), (5, 3, 1f), (6, 3, -1f),   // t3 = self OBL  (1,1,0)
      (4, 4, -1f), (5, 4, -1f), (6, 4, 1f)   // t4 = self GOV  (0,0,1)
    ), Seq((3, -1f)))
    // head h_i = [attROOT0, attPRED, attNAME, attOBL, attGOV, 0]
    val headFF = ff(Seq(
      (7, 0, -1f), (8, 0, -1f), (9, 0, -1f), // h0 = att ROOT0 (0,0,0)
      (7, 1, 1f), (8, 1, -1f), (9, 1, -1f),  // h1 = att PRED
      (7, 2, -1f), (8, 2, 1f), (9, 2, -1f),  // h2 = att NAME
      (7, 3, 1f), (8, 3, 1f), (9, 3, -1f),   // h3 = att OBL
      (7, 4, -1f), (8, 4, -1f), (9, 4, 1f)   // h4 = att GOV
    ), Seq((0, 1f), (3, -1f)))
    val headKernel = new Array[Float](Hidden * Hidden)
    for (i <- 0 until 5) headKernel(i * Hidden + i) = 1f // class-match diagonal
    val synHead = SyntaxHead(headFF, tailFF, rootVec, headKernel, Hidden)

    // rel scorer: h = [1,0,...]; t = [relBit0..relBit3, 1, 0]; Hamming
    // decode over 4 rel bits
    val relHeadFF = ff(Nil, Seq((0, 1f)))
    val relTailFF = ff(Seq((0, 0, 1f), (1, 1, 1f), (2, 2, 1f), (3, 3, 1f)),
      Seq((4, 1f)))
    val relK = new Array[Float](Hidden * Hidden * rels.size)
    for (r <- rels.items.indices) {
      var ones = 0
      for (k <- 0 until 4) {
        val bit = (r >> k) & 1
        relK(0 * (Hidden * rels.size) + r * Hidden + k) = (2 * bit - 1).toFloat
        ones += bit
      }
      relK(0 * (Hidden * rels.size) + r * Hidden + 4) = -ones.toFloat
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

  /** Production-dims config (reference training scripts):
    * navec news_v1_1B_250K_300d_100q = 250K vocab x 100 subquantizers x
    * 256 centroids x 3-float chunks (scripts/05_ner/main.py:85), shape_dim
    * 30, 3 CNN layers [256, 128, 64] kernel 3 (scripts/05_ner/main.py:
    * 105-117), syntax hidden = 64/2 = 32 (07_syntax/pack.ipynb).
    */
  final case class Dims(vocab: Int = 250000, qdim: Int = 100, centroids: Int = 256,
                        chunk: Int = 3, shapeDim: Int = 30,
                        encDims: Seq[Int] = Seq(256, 128, 64), kernel: Int = 3,
                        nerTypes: Seq[String] = Seq("PER", "LOC", "ORG"),
                        morphTags: Int = 60, rels: Int = 40, seed: Long = 7L)

  /** Seeded DENSE random pack at arbitrary (e.g. production) dims. The
    * outputs are meaningless linguistically — this is the honest FLOPs
    * workload for benchmarking the exec engine at reference model scale
    * (every weight nonzero, CRF transitions nonzero so the full T^2
    * Viterbi runs). Deterministic: same seed -> bit-identical pack.
    */
  def buildRandom(d: Dims = Dims()): ModelPack = {
    val rnd = new java.util.Random(d.seed)
    def arr(n: Int, scale: Float = 0.1f): Array[Float] =
      Array.fill(n)((rnd.nextFloat() * 2f - 1f) * scale)

    val wordItems = Array(Vocab.UNK, Vocab.PAD) ++
      Array.tabulate(d.vocab - 2)(i => f"w$i%06d")
    val wordVocab = Vocab(wordItems)
    val shapeVocab = Vocab((Vocab.PAD +: graft.text.Shape.SHAPES).toArray)
    val nerTags = Vocab.bioTags(d.nerTypes)
    // real-looking tag/rel items so decode exercises the same string paths
    val morphTags = Vocab(Array.tabulate(d.morphTags)(i => s"P$i|Feat=V$i"))
    val rels = Vocab(
      (Seq("root", "nsubj", "obj", "obl", "case", "flat:name", "punct",
        "appos", "nmod", "dep") ++
        Seq.tabulate(math.max(0, d.rels - 10))(i => s"rel$i")).toArray)

    // centroid 0 of every subquantizer is the ZERO vector and <pad> maps to
    // it (as navec does) — a zero pad embedding is what makes inference
    // independent of batch composition (the first conv layer reads raw
    // embeddings at pad positions before any mask zeroing)
    val ids = Array.fill(wordItems.length * d.qdim)(1 + rnd.nextInt(d.centroids - 1))
    for (q <- 0 until d.qdim) ids(wordVocab.padId * d.qdim + q) = 0
    val codes = arr(d.qdim * d.centroids * d.chunk, 1f)
    for (q <- 0 until d.qdim; k <- 0 until d.chunk) codes(q * d.centroids * d.chunk + k) = 0f
    val navec =
      if (d.centroids <= 256)
        NavecEmbedding(ids.map(_.toByte), d.qdim, codes, d.centroids, d.chunk)
      else // navec dtype rule: u16 ids above 256 centroids
        NavecEmbedding(null, d.qdim, codes, d.centroids, d.chunk, ids.map(_.toShort))
    val shapeW = arr(shapeVocab.size * d.shapeDim, 1f)
    for (k <- 0 until d.shapeDim) shapeW(shapeVocab.padId * d.shapeDim + k) = 0f
    val emb = WordShapeEmbedding(navec, Embedding(shapeW, d.shapeDim))
    val embDim = navec.dim + d.shapeDim

    def encoder(): CNNEncoder = {
      var in = embDim
      CNNEncoder(d.encDims.map { f =>
        val l = CNNEncoderLayer(
          Conv1d(arr(f * in * d.kernel), f, in, d.kernel, arr(f), d.kernel / 2),
          BatchNorm1d(arr(f, 1f).map(v => 1f + v * 0.1f), arr(f),
            arr(f), arr(f, 1f).map(v => 1f + math.abs(v) * 0.1f)))
        in = f
        l
      })
    }
    val encOut = d.encDims.last
    val hidden = encOut / 2

    val nerModel = NerModel(emb, encoder(),
      Linear(arr(encOut * nerTags.size), encOut, nerTags.size, arr(nerTags.size)),
      CRF(arr(nerTags.size * nerTags.size), nerTags.size))
    val morphModel = MorphModel(emb, encoder(),
      Linear(arr(encOut * morphTags.size), encOut, morphTags.size, arr(morphTags.size)))
    def ff() = FF(Linear(arr(encOut * hidden), encOut, hidden, arr(hidden)))
    val syntaxModel = SyntaxModel(emb, encoder(),
      SyntaxHead(ff(), ff(), arr(encOut), arr(hidden * hidden), hidden),
      SyntaxRel(ff(), ff(), arr(encOut), arr(hidden * hidden * rels.size), hidden, rels.size))

    ModelPack(s"graft_refdims_${d.seed}", wordVocab, shapeVocab, nerTags,
      morphTags, rels, nerModel, morphModel, syntaxModel)
  }
}
