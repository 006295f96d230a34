package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over the materialized canonical triple table — the
  * queries a KG-construction user runs right after the build: degree
  * profiles, PageRank entity salience, co-mention mining, multi-hop
  * reachability. All are expressed on the (subj_id, pred, obj_id) +
  * provenance (docId) schema that `Kg.linkCanonicalize` emits.
  *
  * Scale notes (10^12-doc corpus => 10^10..10^11 triples):
  *  - every op below reduces to equi-joins / hash aggregates on entity
  *    ids — AQE handles the hot-entity skew (high-frequency PER/ORG
  *    canonical ids) by splitting oversized partitions; nothing here
  *    needs a driver-side pass or a cross join.
  *  - PageRank uses FIXED-POINT integer arithmetic (micro-units, floor
  *    division) so results are bit-reproducible across partitionings,
  *    retries, and engines — float PageRank depends on summation order,
  *    which a 1000-executor shuffle does not fix. That determinism is
  *    what lets the driver hash-compare against an independent engine.
  */
object Analytics {

  /** Per-entity degree profile: triple mentions and distinct neighbors
    * on each side. Two hash aggregates + one full-outer equi-join on the
    * entity id; map-side partial aggregation absorbs hot entities.
    */
  def degrees(triples: DataFrame): DataFrame = {
    val out = triples.groupBy(col("subj_id").as("entity_id"))
      .agg(count(lit(1)).as("out_mentions"),
        countDistinct(col("obj_id")).as("out_neighbors"))
    val in = triples.groupBy(col("obj_id").as("entity_id"))
      .agg(count(lit(1)).as("in_mentions"),
        countDistinct(col("subj_id")).as("in_neighbors"))
    out.join(in, Seq("entity_id"), "full_outer")
      .na.fill(0L, Seq("out_mentions", "out_neighbors", "in_mentions", "in_neighbors"))
      .withColumn("total_mentions", col("out_mentions") + col("in_mentions"))
  }

  /** Entity salience: damped PageRank over the distinct directed
    * subj->obj edge set (self-loops dropped), `iters` fixed iterations.
    *
    * Exact fixed-point contract (what the oracle reproduces):
    *   rank_0 = 1_000_000 for every node (micro-units);
    *   contrib(e) = rank(src) div out_degree(src)    [integer floor]
    *   rank_{i+1} = 150_000 + (850 * sum(contribs)) div 1000.
    * Dangling mass is not redistributed (documented simplification — the
    * standard contraction still holds, ranks just sum below N).
    *
    * Physical shape per iteration: one shuffle-hash join ranks><edges on
    * src + one hash aggregate on dst. The edge set (with out-degree
    * pre-joined) is computed ONCE, persisted, and reused by all
    * iterations; rank lineage is truncated every iteration so the plan
    * stays O(1) deep instead of O(iters).
    */
  def pageRank(triples: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val edges = triples
      .select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("odeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("entity_id"))
      .union(edges.select(col("dst").as("entity_id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("entity_id", "src"), "src")
        .select(col("dst").as("entity_id"),
          expr("rank div odeg").as("contrib"))
        .groupBy("entity_id").agg(sum(col("contrib")).as("c"))
      ranks = nodes.join(contribs, Seq("entity_id"), "left")
        .select(col("entity_id"),
          expr("150000L + (850L * coalesce(c, 0L)) div 1000L").as("rank"))
        .localCheckpoint(eager = false)
    }
    val result = ranks
    withDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    result
  }

  /** Co-mention mining: entity pairs appearing in the SAME document (on
    * either side of any triple), with the number of distinct supporting
    * documents. The per-doc distinct mention set is built first (hash
    * aggregate), so the self-join fans out only over each doc's small
    * entity list — never over the raw triple multiplicity.
    */
  def coMentions(triples: DataFrame, minDocs: Long = 1): DataFrame = {
    val mentions = triples.select(col("docId"), col("subj_id").as("e"))
      .union(triples.select(col("docId"), col("obj_id").as("e")))
      .distinct()
    mentions.as("a")
      .join(mentions.as("b"),
        col("a.docId") === col("b.docId") && col("a.e") < col("b.e"))
      .groupBy(col("a.e").as("e1"), col("b.e").as("e2"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
  }

  /** Two-hop reachability with path counts: (a)-[p1]->(x)-[p2]->(c),
    * a != c, over the distinct edge multigraph (predicate kept, so
    * parallel predicates count as distinct paths). The skew-prone KG op:
    * a hot intermediate entity (x) multiplies both sides — the equi-join
    * on x is exactly the AQE skew-join-split shape, and the downstream
    * aggregate is two-phase.
    */
  def twoHopPaths(triples: DataFrame, undirected: Boolean = false): DataFrame = {
    val fwd = triples.select(col("subj_id"), col("pred"), col("obj_id"))
    val e = (if (undirected)
      fwd.union(triples.select(col("obj_id").as("subj_id"), col("pred"),
        col("subj_id").as("obj_id")))
    else fwd).distinct()
    e.as("x")
      .join(e.as("y"), col("x.obj_id") === col("y.subj_id"))
      .where(col("x.subj_id") =!= col("y.obj_id"))
      .groupBy(col("x.subj_id").as("src"), col("y.obj_id").as("dst"))
      .agg(count(lit(1)).as("n_paths"))
  }

  /** Per-predicate profile: triple count, distinct subject/object
    * entities, and distinct supporting documents — the relation-level
    * quality table reviewers read first after a build.
    */
  def predicateStats(triples: DataFrame): DataFrame =
    triples.groupBy(col("pred"))
      .agg(count(lit(1)).as("n_triples"),
        countDistinct(col("subj_id")).as("n_subjects"),
        countDistinct(col("obj_id")).as("n_objects"),
        countDistinct(col("docId")).as("n_docs"))
}
