package graft.pack

import graft.kernel._

/** Vocabulary: get-or-unk encode, index decode (reference: slovnet/vocab.py:17-39). */
final case class Vocab(items: Array[String]) extends Serializable {
  @transient lazy val itemIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](items.length * 2)
    var i = 0
    while (i < items.length) { m.put(items(i), i); i += 1 }
    m
  }
  val unkId: Int = items.indexOf(Vocab.UNK)
  val padId: Int = items.indexOf(Vocab.PAD)
  def encode(item: String): Int = {
    val v = itemIds.get(item)
    if (v == null) unkId else v.intValue()
  }
  def decode(id: Int): String = items(id)
  def size: Int = items.length
}

object Vocab {
  val UNK = "<unk>"
  val PAD = "<pad>"

  /** [PAD, O, B-t, I-t, ...] (reference: slovnet/vocab.py:61-70). */
  def bioTags(types: Seq[String]): Vocab =
    Vocab((Seq(PAD, "O") ++ types.flatMap(t => Seq(s"B-$t", s"I-$t"))).toArray)
}

/** NER model: word+shape emb -> masked CNN -> linear proj -> CRF
  * (reference: slovnet/exec/model.py:296-342).
  */
final case class NerModel(emb: WordShapeEmbedding, encoder: CNNEncoder,
                          proj: Linear, crf: CRF) extends Serializable {
  /** emissions [B,S,T] */
  def forward(wordIds: Array[Int], shapeIds: Array[Int], batch: Int, seqLen: Int,
              padMask: Array[Boolean]): Array[Float] = {
    val x = emb(wordIds, shapeIds)
    val enc = encoder(x, batch, seqLen, emb.dim, padMask)
    proj(enc, batch * seqLen)
  }
}

/** Morph model: same trunk, argmax decode (exec/model.py:307-317, 330-342). */
final case class MorphModel(emb: WordShapeEmbedding, encoder: CNNEncoder,
                            proj: Linear) extends Serializable {
  def forward(wordIds: Array[Int], shapeIds: Array[Int], batch: Int, seqLen: Int,
              padMask: Array[Boolean]): Array[Float] = {
    val x = emb(wordIds, shapeIds)
    val enc = encoder(x, batch, seqLen, emb.dim, padMask)
    proj(enc, batch * seqLen)
  }
}

/** Syntax model: trunk + biaffine head/rel; rel consumes DECODED head ids
  * (exec/model.py:465-481).
  */
final case class SyntaxModel(emb: WordShapeEmbedding, encoder: CNNEncoder,
                             head: SyntaxHead, rel: SyntaxRel) extends Serializable {
  /** returns (headIds [B,S] 0=root, relIds [B,S]) for valid positions */
  def forward(wordIds: Array[Int], shapeIds: Array[Int], batch: Int, seqLen: Int,
              padMask: Array[Boolean]): (Array[Int], Array[Int]) = {
    val x = emb(wordIds, shapeIds)
    val enc = encoder(x, batch, seqLen, emb.dim, padMask)
    val valid = new Array[Boolean](padMask.length)
    var i = 0
    while (i < padMask.length) { valid(i) = !padMask(i); i += 1 }
    val dim = encoder.outDim
    val headScores = head(enc, batch, seqLen, dim)
    val headIds = head.decode(headScores, batch, seqLen, valid)
    val relScores = rel(enc, batch, seqLen, dim, headIds)
    val relIds = rel.decode(relScores, batch, seqLen, valid)
    (headIds, relIds)
  }
}

/** The full broadcastable model pack: three task models sharing one navec
  * (weight sharing per exec/model.py:536-557 / api.py:29-31) + vocabs.
  */
final case class ModelPack(
    id: String,
    wordVocab: Vocab,
    shapeVocab: Vocab,
    nerTags: Vocab,
    morphTags: Vocab,
    rels: Vocab,
    ner: NerModel,
    morph: MorphModel,
    syntax: SyntaxModel
) extends Serializable {
  /** tag id -> (pos, feats) parsed once per executor — morph tagsets are
    * tiny, so sharing the Map objects avoids a per-token allocation storm
    * at 32 threads (conll.py:14-23 parse, hoisted).
    */
  @transient lazy val morphParsed: Array[(String, Map[String, String])] =
    morphTags.items.map(graft.text.Conll.parseTag)
}
