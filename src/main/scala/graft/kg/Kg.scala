package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.nlp.ParsedSent
import graft.corpus.RuCorpus
import scala.collection.mutable.ArrayBuffer

/** Candidate triple from dependency-pattern matching (graft stage;
  * tree shape per reference markup.py:162-193).
  */
final case class Triple(
    docId: String, spanOrder: Int, sentIdx: Int,
    subj: String, subjType: String,
    pred: String,
    obj: String, objType: String)

final case class LinkedTriple(
    docId: String, spanOrder: Int, sentIdx: Int,
    subjId: String, subjType: String,
    pred: String,
    objId: String, objType: String)

object Kg {

  /** Dependency-pattern triple extraction over parsed sentences:
    *  - pred   = the root verb (rel == "root")
    *  - subj   = an nsubj token, extended by following contiguous
    *             flat:name tokens (multi-token names)
    *  - obj    = an obj token -> (subj, verb, obj)
    *  - obl    = an obl token with a case marker directly before it
    *             -> (subj, verb_<case>, obl)
    * Entity types come from the NER span covering the token.
    * Pure per-sentence flatMap — no shuffle.
    */
  def extract(p: ParsedSent): Seq[Triple] = {
    val syn = p.syn
    val n = syn.length
    var rootIdx = 0
    while (rootIdx < n && syn(rootIdx).rel != "root") rootIdx += 1
    if (rootIdx == n) return Nil
    val verb = syn(rootIdx).text

    // manual scans — `find`/`filter`/StringBuilder closures were measurable
    // allocation churn at 3M+ triples/sec
    def typeOf(i: Int): String = {
      val spans = p.nerSpans
      val ts = p.tokens(i)
      var k = 0
      while (k < spans.length) {
        val s = spans(k)
        if (s.start <= ts.start && ts.stop <= s.stop) return s.tpe
        k += 1
      }
      "NOUN"
    }

    def mention(i: Int): String = {
      var j = i + 1
      while (j < n && syn(j).rel == "flat:name") j += 1
      if (j == i + 1) p.tokens(i).text // single-token mention: no copy
      else {
        val sb = new java.lang.StringBuilder(p.tokens(i).text)
        var k = i + 1
        while (k < j) { sb.append(' ').append(p.tokens(k).text); k += 1 }
        sb.toString
      }
    }

    var nSubj = 0
    var i = 0
    while (i < n) { if (syn(i).rel == "nsubj") nSubj += 1; i += 1 }
    if (nSubj == 0) return Nil
    val subjM = new Array[String](nSubj)
    val subjT = new Array[String](nSubj)
    i = 0; var k = 0
    while (i < n) {
      if (syn(i).rel == "nsubj") { subjM(k) = mention(i); subjT(k) = typeOf(i); k += 1 }
      i += 1
    }

    val out = new ArrayBuffer[Triple](nSubj * 2)
    i = 0
    while (i < n) {
      val rel = syn(i).rel
      if (rel == "obj") {
        val om = mention(i); val ot = typeOf(i)
        var s = 0
        while (s < nSubj) {
          out += Triple(p.docId, p.spanOrder, p.sentIdx, subjM(s), subjT(s), verb, om, ot)
          s += 1
        }
      } else if (rel == "obl" && i > 0 && syn(i - 1).rel == "case") {
        val om = mention(i); val ot = typeOf(i)
        val pred = verb + "_" + p.tokens(i - 1).text
        var s = 0
        while (s < nSubj) {
          out += Triple(p.docId, p.spanOrder, p.sentIdx, subjM(s), subjT(s), pred, om, ot)
          s += 1
        }
      }
      i += 1
    }
    out.toSeq
  }

  def triples(parsed: Dataset[ParsedSent]): Dataset[Triple] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.flatMap(extract _)
  }

  /** Alias dictionary as a DataFrame (synthetic Wikidata slice). */
  def aliasDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    RuCorpus.aliasDict.toDF("alias", "entity_id", "tpe")
  }

  /** Entity linking: normalized-mention equi-join against the broadcast
    * alias dictionary (blocked scoring: the block key IS the normalized
    * alias; deterministic winner = min entity_id). Unlinkable mentions
    * become literal nodes `M:<norm>`.
    * Dict is broadcast here (small); at a real Wikidata-slice size the same
    * plan works with a shuffled hash join + AQE skew split — nothing in the
    * query pins the strategy.
    */
  def link(spark: SparkSession, triples: Dataset[Triple]): Dataset[LinkedTriple] = {
    import spark.implicits._
    // one alias row per alias: deterministic representative before the join
    val dict = broadcast(
      aliasDf(spark).groupBy("alias").agg(min("entity_id").as("entity_id")))
    val t = triples.toDF()
      .withColumn("subj_norm", lower(col("subj")))
      .withColumn("obj_norm", lower(col("obj")))
    val linked = t
      .join(dict.as("ds"), col("subj_norm") === col("ds.alias"), "left")
      .withColumnRenamed("entity_id", "subj_eid")
      .drop("alias")
      .join(dict.as("do"), col("obj_norm") === col("do.alias"), "left")
      .withColumnRenamed("entity_id", "obj_eid")
      .drop("alias")
    linked.select(
      col("docId"), col("spanOrder"), col("sentIdx"),
      coalesce(col("subj_eid"), concat(lit("M:"), col("subj_norm"))).as("subjId"),
      col("subjType"), col("pred"),
      coalesce(col("obj_eid"), concat(lit("M:"), col("obj_norm"))).as("objId"),
      col("objType")
    ).as[LinkedTriple]
  }

  /** same-as edges: entity ids sharing an alias (self-join on alias key). */
  def aliasEdges(spark: SparkSession): DataFrame = {
    val d = aliasDf(spark)
    d.as("a").join(d.as("b"), col("a.alias") === col("b.alias") &&
        col("a.entity_id") < col("b.entity_id"))
      .select(col("a.entity_id").as("src"), col("b.entity_id").as("dst"))
      .distinct()
  }

  /** entity_id -> canonical_id (component minimum over alias edges).
    * The dictionary is broadcast-scale by assumption, so the adaptive CC
    * solves it driver-side; cached per session (dict-derived, reusable
    * across buckets and queries).
    */
  private val canonCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()
  def canonicalMap(spark: SparkSession): DataFrame =
    canonCache.computeIfAbsent(spark, s => {
      val edges = aliasEdges(s)
      val vertices = aliasDf(s).select(col("entity_id").as("id")).distinct()
      ConnectedComponents.runAdaptive(edges, vertices).cache()
    })

  /** alias -> canonical entity id, composed at the driver: the per-alias
    * representative (min entity) remapped through the connected-component
    * minimum. Lets the fused path do TWO broadcast-join probes per triple
    * instead of four (link probe + canonical probe per side) — the join
    * probes were the top CPU frame once inference went zero-alloc.
    */
  private val aliasCanonCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()
  def aliasCanonicalDf(spark: SparkSession): DataFrame =
    aliasCanonCache.computeIfAbsent(spark, s => {
      val rep = aliasDf(s).groupBy("alias").agg(min("entity_id").as("entity_id"))
      val cm = canonicalMap(s)
      rep.join(cm, col("entity_id") === col("id"), "left")
        .select(col("alias"),
          coalesce(col("component"), col("entity_id")).as("canonical_id"))
        .cache()
    })

  /** link + canonicalize fused: identical output to
    * `canonicalize(spark, link(spark, triples))` (the composition
    * comp(min-entity(alias)) equals the two-step mapping because all
    * entities sharing an alias are in one component; unlinked mentions
    * fall back to M:<norm> literals in both).
    */
  def linkCanonicalize(spark: SparkSession, triples: Dataset[Triple]): DataFrame = {
    val m = broadcast(aliasCanonicalDf(spark))
    triples.toDF()
      .withColumn("subj_norm", lower(col("subj")))
      .withColumn("obj_norm", lower(col("obj")))
      .join(m.as("ms"), col("subj_norm") === col("ms.alias"), "left")
      .withColumnRenamed("canonical_id", "subj_c")
      .drop("alias")
      .join(m.as("mo"), col("obj_norm") === col("mo.alias"), "left")
      .withColumnRenamed("canonical_id", "obj_c")
      .drop("alias")
      .select(col("docId"), col("spanOrder"), col("sentIdx"),
        coalesce(col("subj_c"), concat(lit("M:"), col("subj_norm"))).as("subj_id"),
        col("subjType").as("subj_type"), col("pred"),
        coalesce(col("obj_c"), concat(lit("M:"), col("obj_norm"))).as("obj_id"),
        col("objType").as("obj_type"))
  }

  /** Remap linked triples to canonical entity ids. */
  def canonicalize(spark: SparkSession, linked: Dataset[LinkedTriple]): DataFrame = {
    val cm = broadcast(canonicalMap(spark))
    linked.toDF()
      .join(cm.as("cs"), col("subjId") === col("cs.id"), "left")
      .withColumn("subj_c", coalesce(col("cs.component"), col("subjId")))
      .drop("id", "component")
      .join(cm.as("co"), col("objId") === col("co.id"), "left")
      .withColumn("obj_c", coalesce(col("co.component"), col("objId")))
      .select(col("docId"), col("spanOrder"), col("sentIdx"),
        col("subj_c").as("subj_id"), col("subjType").as("subj_type"),
        col("pred"),
        col("obj_c").as("obj_id"), col("objType").as("obj_type"))
  }
}
