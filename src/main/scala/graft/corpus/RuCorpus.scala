package graft.corpus

import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic Russian-like corpus with planted annotations.
  *
  * Role of the reference's nerus/factRuEval corpora + released model packs
  * (reference: tests/test_api.py:16-52 downloads real artifacts; we are
  * zero-egress, so the corpus and the model are co-designed: every word
  * belongs to exactly one grammatical role, so NER tags, morph tags,
  * dependency rels and triples are computable by construction AND by the
  * real tensor pipeline over the rigged pack — see graft.pack.SynthPack).
  *
  * Everything is a pure function of (docId, sentIdx) via splitmix64, so the
  * corpus can be generated distributedly from `spark.range` with no driver
  * loop and regenerated identically by the single-threaded oracle.
  */
object RuCorpus {

  /** splitmix64 — deterministic, allocation-free per-row hash. */
  def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def pick[T](xs: IndexedSeq[T], h: Long): T = xs(((h % xs.length) + xs.length).toInt % xs.length)

  val firstNames = Vector("Иван", "Пётр", "Анна", "Мария", "Олег", "Дмитрий", "Елена", "Сергей")
  val surnames = Vector("Петров", "Иванова", "Сидоров", "Кузнецова", "Смирнов", "Попова", "Волков", "Козлова")
  val cities = Vector("Москве", "Казани", "Самаре", "Туле")
  val orgsSubj = Vector("Газпром", "Яндекс", "Сбербанк", "Роснефть")
  val orgsObj = Vector("Авито", "Магнит", "Лукойл", "Ростех")
  val verbs = Vector("купил", "продал", "открыл", "закрыл", "построил", "возглавил", "посетил", "создал")
  val objectsAcc = Vector("завод", "магазин", "офис", "проект", "филиал", "сервис", "центр", "музей")
  // round-2 template vocab — each list is a distinct grammatical role
  val govNouns = Vector("директор", "глава", "руководитель", "основатель") // nsubj + nmod governor
  val apposNouns = Vector("президент", "инженер", "журналист", "банкир")   // appositive of the name head
  val predNouns = Vector("лидер", "партнёр", "инвестор", "чемпион")        // copular nominal root
  val orgsGen = Vector("Газпрома", "Яндекса", "Сбербанка", "Роснефти")     // genitive nmod dependent

  // morph tag ids into SynthPack.morphTagItems
  object M {
    val X = 0; val PROPN_NOM = 1; val PROPN_LOC = 2; val VERB = 3
    val NOUN_ACC = 4; val ADP = 5; val PUNCT = 6; val NUM = 7
    val NOUN_NOM = 8; val PROPN_GEN = 9
  }
  // rel ids into SynthPack.relItems
  object R {
    val DEP = 0; val ROOT = 1; val NSUBJ = 2; val OBJ = 3
    val OBL = 4; val CASE = 5; val FLAT = 6; val PUNCT = 7
    val APPOS = 8; val NMOD = 9
  }
  // ner tag ids into Vocab.bioTags(PER,LOC,ORG): [<pad>,O,B-PER,I-PER,B-LOC,I-LOC,B-ORG,I-ORG]
  object N {
    val PAD = 0; val O = 1; val B_PER = 2; val I_PER = 3
    val B_LOC = 4; val I_LOC = 5; val B_ORG = 6; val I_ORG = 7
  }
  /** Self-class: what kind of attachment TARGET a token is (at most one
    * token of each non-NONE class per sentence, by template construction).
    */
  object SC { val NONE = 0; val PRED = 1; val NAME = 2; val OBL = 3; val GOV = 4 }
  /** Attach-class: which self-class this token's head carries (ROOT0 =
    * attach to the ROOT pseudo-node, i.e. the token IS the root).
    */
  object AC { val ROOT0 = 0; val PRED = 1; val NAME = 2; val OBL = 3; val GOV = 4 }

  /** Per-word dictionary entry: the planted classes the rigged model emits.
    * selfCls/attCls drive the biaffine head scorer (SynthPack): a token
    * attaches to the unique token whose selfCls equals its attCls, so the
    * planted trees are REAL trees (case -> obl token, flat/appos -> name
    * head, nmod -> governor), not a star around the root.
    */
  final case class WordInfo(ner: Int, morph: Int, rel: Int, selfCls: Int, attCls: Int)

  /** word (lowercased) -> planted classes; every corpus word has exactly one role. */
  val dict: Map[String, WordInfo] = {
    val b = Map.newBuilder[String, WordInfo]
    firstNames.foreach(w => b += w.toLowerCase -> WordInfo(N.B_PER, M.PROPN_NOM, R.NSUBJ, SC.NAME, AC.PRED))
    surnames.foreach(w => b += w.toLowerCase -> WordInfo(N.I_PER, M.PROPN_NOM, R.FLAT, SC.NONE, AC.NAME))
    cities.foreach(w => b += w.toLowerCase -> WordInfo(N.B_LOC, M.PROPN_LOC, R.OBL, SC.OBL, AC.PRED))
    orgsSubj.foreach(w => b += w.toLowerCase -> WordInfo(N.B_ORG, M.PROPN_NOM, R.NSUBJ, SC.NONE, AC.PRED))
    orgsObj.foreach(w => b += w.toLowerCase -> WordInfo(N.B_ORG, M.PROPN_NOM, R.OBJ, SC.NONE, AC.PRED))
    verbs.foreach(w => b += w.toLowerCase -> WordInfo(N.O, M.VERB, R.ROOT, SC.PRED, AC.ROOT0))
    objectsAcc.foreach(w => b += w.toLowerCase -> WordInfo(N.O, M.NOUN_ACC, R.OBJ, SC.NONE, AC.PRED))
    govNouns.foreach(w => b += w.toLowerCase -> WordInfo(N.O, M.NOUN_NOM, R.NSUBJ, SC.GOV, AC.PRED))
    apposNouns.foreach(w => b += w.toLowerCase -> WordInfo(N.O, M.NOUN_NOM, R.APPOS, SC.NONE, AC.NAME))
    predNouns.foreach(w => b += w.toLowerCase -> WordInfo(N.O, M.NOUN_NOM, R.ROOT, SC.PRED, AC.ROOT0))
    orgsGen.foreach(w => b += w.toLowerCase -> WordInfo(N.B_ORG, M.PROPN_GEN, R.NMOD, SC.NONE, AC.GOV))
    b += "в" -> WordInfo(N.O, M.ADP, R.CASE, SC.NONE, AC.OBL)
    Seq(".", "«", "»", ",", "—").foreach(w => b += w -> WordInfo(N.O, M.PUNCT, R.PUNCT, SC.NONE, AC.PRED))
    b.result()
  }

  /** One generated sentence: surface text is `words.mkString(" ")` with
    * punctuation attached by the renderer below.
    */
  final case class GenSent(words: Vector[String], text: String)

  // The distinct-sentence space is small (~37k combinations), so rendered
  // sentences are memoized per executor: cuts the generator's allocation
  // rate at 32 threads without changing any output (key = template +
  // word indices, all derived from the same hash bits as the render).
  // The memo is a PERFECT-INDEXED array, not a hash map: the old packed
  // Long key treeified ConcurrentHashMap bins (Long.hashCode ^ CHM spread
  // XOR-folds nibble 5 onto nibble 1 and the template onto nibble 4, so
  // 229k keys collapsed into ~4k bins of ~56 → red-black walks on every
  // lookup, 2.4% of 32-core pipeline samples in JFR). The key space is
  // dense (7 templates × 8^5 pick fields), so a direct slot per key
  // needs no hashing and no locks; writes race benignly (same slot ⇒
  // same rendered sentence).
  private val sentCache =
    new java.util.concurrent.atomic.AtomicReferenceArray[GenSent](7 * 32768)

  /** Render a sentence for (docId, sentIdx). 7 templates. */
  def sentence(docId: Long, sentIdx: Int): GenSent = {
    val h = mix(docId * 1000003L + sentIdx)
    val idx = (((((((h >>> 8) % 7) * 8 +
      ((h % 8) + 8) % 8) * 8 + (((h >>> 16) % 8) + 8) % 8) * 8 +
      (((h >>> 24) % 8) + 8) % 8) * 8 + (((h >>> 32) % 8) + 8) % 8) * 8 +
      (((h >>> 40) % 8) + 8) % 8).toInt
    val cached = sentCache.get(idx)
    if (cached != null) return cached
    val made = renderSentence(h)
    sentCache.lazySet(idx, made)
    made
  }

  private def renderSentence(h: Long): GenSent = {
    val t = ((h >>> 8) % 7).toInt
    val words: Vector[String] = t match {
      case 0 => // PER V OBJ .
        Vector(pick(firstNames, h), pick(surnames, h >>> 16), pick(verbs, h >>> 24),
          pick(objectsAcc, h >>> 32), ".")
      case 1 => // PER V OBJ в LOC .
        Vector(pick(firstNames, h), pick(surnames, h >>> 16), pick(verbs, h >>> 24),
          pick(objectsAcc, h >>> 32), "в", pick(cities, h >>> 40), ".")
      case 2 => // « ORG » V OBJ .
        Vector("«", pick(orgsSubj, h >>> 16), "»", pick(verbs, h >>> 24),
          pick(objectsAcc, h >>> 32), ".")
      case 3 => // PER V « ORG » .
        Vector(pick(firstNames, h), pick(surnames, h >>> 16), pick(verbs, h >>> 24),
          "«", pick(orgsObj, h >>> 32), "»", ".")
      case 4 => // PER , APPOS-NOUN , V OBJ .   (appositive)
        Vector(pick(firstNames, h), pick(surnames, h >>> 16), ",",
          pick(apposNouns, h >>> 40), ",", pick(verbs, h >>> 24),
          pick(objectsAcc, h >>> 32), ".")
      case 5 => // GOV-NOUN ORG-GEN V OBJ .     (genitive nmod)
        Vector(pick(govNouns, h), pick(orgsGen, h >>> 16), pick(verbs, h >>> 24),
          pick(objectsAcc, h >>> 32), ".")
      case _ => // PER — PRED-NOUN .            (copular, nominal root)
        Vector(pick(firstNames, h), pick(surnames, h >>> 16), "—",
          pick(predNouns, h >>> 24), ".")
    }
    GenSent(words, render(words))
  }

  /** Attach punctuation: no space before `.`/`»`/`,`, none after `«`. */
  def render(words: Vector[String]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (i > 0 && w != "." && w != "»" && w != "," && !(i > 0 && words(i - 1) == "«"))
        sb.append(' ')
      sb.append(w)
      i += 1
    }
    sb.toString
  }

  /** Number of sentences in a doc: 1..4. */
  def nSents(docId: Long): Int = 1 + ((mix(docId) >>> 4) % 4).toInt

  /** Interleaved doc spans: (kind, text, media_ref, offset). Media spans are
    * inserted after sentence k when hash says so; offset is the running char
    * offset in the doc's virtual text (media spans occupy zero chars).
    */
  final case class SpanRow(kind: String, text: String, media_ref: String, offset: Int)

  def docSpans(docId: Long): scala.collection.immutable.ArraySeq[SpanRow] = {
    // array-backed, not Vector: the per-doc span list is tiny and built
    // in every generator task — VectorBuilder.result()'s trie copy was
    // 3% of 32-core pipeline JFR samples; an exact-size array is one
    // allocation and wraps for free
    val n = nSents(docId)
    val buf = new Array[SpanRow](2 * n)
    var m = 0
    var offset = 0
    var k = 0
    while (k < n) {
      val s = sentence(docId, k)
      buf(m) = SpanRow("text", s.text, null, offset); m += 1
      offset += s.text.length + 1 // virtual " " joiner
      val hm = mix(docId * 7919L + k)
      if ((hm & 7) == 0) { // ~1/8 of sentence gaps get a media span
        buf(m) = SpanRow("media", null, s"s3://media/$docId/$k.jpg", offset); m += 1
      }
      k += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      if (m == buf.length) buf else java.util.Arrays.copyOf(buf, m))
  }

  /** Golden triples for one sentence, by construction of the grammar:
    * (subjMention, predicate, objMention). Template 1 also yields the
    * locative triple with predicate `verb + "_в"`.
    */
  final case class GoldenTriple(subj: String, pred: String, obj: String,
                                subjType: String, objType: String)

  def goldenTriples(docId: Long, sentIdx: Int): Seq[GoldenTriple] = {
    val s = sentence(docId, sentIdx)
    val w = s.words
    val h = mix(docId * 1000003L + sentIdx)
    val t = ((h >>> 8) % 7).toInt
    t match {
      case 0 => Seq(GoldenTriple(w(0) + " " + w(1), w(2), w(3), "PER", "NOUN"))
      case 1 => Seq(
        GoldenTriple(w(0) + " " + w(1), w(2), w(3), "PER", "NOUN"),
        GoldenTriple(w(0) + " " + w(1), w(2) + "_в", w(5), "PER", "LOC"))
      case 2 => Seq(GoldenTriple(w(1), w(3), w(4), "ORG", "NOUN"))
      case 3 => Seq(GoldenTriple(w(0) + " " + w(1), w(2), w(4), "PER", "ORG"))
      case 4 => Seq( // appos: verb triple + is-triple from the appositive
        GoldenTriple(w(0) + " " + w(1), w(5), w(6), "PER", "NOUN"),
        GoldenTriple(w(0) + " " + w(1), "is", w(3), "PER", "NOUN"))
      case 5 => Seq( // nmod: verb triple + of-triple from the genitive
        GoldenTriple(w(0), w(2), w(3), "NOUN", "NOUN"),
        GoldenTriple(w(0), "of", w(1), "NOUN", "ORG"))
      case _ => Seq( // copular nominal predicate
        GoldenTriple(w(0) + " " + w(1), "is", w(3), "PER", "NOUN"))
    }
  }

  /** Synthetic Wikidata-slice alias dictionary for entity linking.
    * alias (normalized mention) -> entity id. Even-indexed ORG entities get
    * a second, legacy id sharing the alias, planting same-as edges for the
    * canonicalization stage.
    */
  final case class AliasRow(alias: String, entityId: String, tpe: String)

  def aliasDict: Seq[AliasRow] = {
    val rows = ArrayBuffer[AliasRow]()
    var q = 0
    for (f <- firstNames; s <- surnames) {
      rows += AliasRow((f + " " + s).toLowerCase, s"Q$q", "PER")
      q += 1
    }
    for ((o, i) <- (orgsSubj ++ orgsObj).zipWithIndex) {
      rows += AliasRow(o.toLowerCase, s"Q${q + i}", "ORG")
      if (i % 2 == 0) rows += AliasRow(o.toLowerCase, s"L${q + i}", "ORG") // dup id
    }
    q += orgsSubj.length + orgsObj.length
    for ((c, i) <- cities.zipWithIndex)
      rows += AliasRow(c.toLowerCase, s"Q${q + i}", "LOC")
    rows.toSeq
  }

  /** Scale: docs per sf directory (pure function of the dir name). */
  def docCount(sfDir: String): Long = {
    val name = sfDir.split('/').filter(_.nonEmpty).last // sf0.001
    val sf = name.stripPrefix("sf").toDouble
    math.max(100L, (sf * 1000000).toLong) // sf0.001 -> 1000 docs
  }
}
