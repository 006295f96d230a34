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
    * on each side. ONE scan of the triple table (each triple explodes to
    * its two sides), one two-phase hash aggregate with conditional
    * distinct counts — no join, and the source pipeline/scan runs once.
    */
  def degrees(triples: DataFrame): DataFrame =
    triples
      .select(explode(array(
        struct(col("subj_id").as("entity_id"), col("obj_id").as("other"),
          lit(true).as("out")),
        struct(col("obj_id").as("entity_id"), col("subj_id").as("other"),
          lit(false).as("out")))).as("m"))
      .select(col("m.entity_id"), col("m.other"), col("m.out"))
      .groupBy("entity_id")
      .agg(
        count(when(col("out"), 1)).as("out_mentions"),
        countDistinct(when(col("out"), col("other"))).as("out_neighbors"),
        count(when(!col("out"), 1)).as("in_mentions"),
        countDistinct(when(!col("out"), col("other"))).as("in_neighbors"),
        count(lit(1)).as("total_mentions"))

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
  def pageRank(triples: DataFrame, iters: Int = 10,
               maxLocalEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    // edges persisted ONCE: the source (often a live extraction pipeline)
    // is scanned a single time; withDeg/nodes re-derive from the cache.
    val edges = triples
      .select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Size-adaptive, same policy as ConnectedComponents: a distinct edge
    // set that fits the driver iterates locally — at that size the
    // distributed supersteps are pure job-scheduling overhead — while
    // bigger graphs take the Pregel-style loop below. Both paths compute
    // the SAME integer fixed point, so outputs are bit-identical
    // (asserted in KgAnalyticsSpec).
    if (edges.count() <= maxLocalEdges) {
      val spark = triples.sparkSession
      val local = edges.collect().map(r => (r.getString(0), r.getString(1)))
      edges.unpersist(blocking = false)
      val odeg = local.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
      val nodeIds = (local.map(_._1) ++ local.map(_._2)).distinct
      var rank = nodeIds.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val sums = new scala.collection.mutable.HashMap[String, Long]()
        local.foreach { case (s, d) =>
          sums.update(d, sums.getOrElse(d, 0L) + rank(s) / odeg(s))
        }
        rank = nodeIds.map(n =>
          n -> (150000L + 850L * sums.getOrElse(n, 0L) / 1000L)).toMap
      }
      import spark.implicits._
      return spark.createDataset(nodeIds.toSeq.map(n => (n, rank(n))))
        .toDF("entity_id", "rank")
    }
    // both persisted: every superstep probes them, and without the cache
    // each of the `iters` jobs would rebuild the degree join / node set
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("odeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges
      .select(explode(array(col("src"), col("dst"))).as("entity_id"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("entity_id", "src"), "src")
        .select(col("dst").as("entity_id"),
          expr("rank div odeg").as("contrib"))
        .groupBy("entity_id").agg(sum(col("contrib")).as("c"))
      // eager: each iteration materializes (Pregel-style superstep), so
      // the final plan is O(1) deep and edges can be unpersisted on exit
      ranks = nodes.join(contribs, Seq("entity_id"), "left")
        .select(col("entity_id"),
          expr("150000L + (850L * coalesce(c, 0L)) div 1000L").as("rank"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    withDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }

  /** Mention-weighted PageRank: rank flows proportionally to integer
    * edge weights — here the triple-mention count per (src, dst), so an
    * entity pair asserted by 40 documents carries 40× the rank flow of a
    * single-mention pair (plain [[pageRank]] treats both as one edge).
    *
    * Exact fixed-point contract (oracle-mirrored):
    *   w(u,v) = COUNT of triples u→v (parallel predicates and repeat
    *            docs each count; self-loops dropped); W(u) = Σ_v w(u,v);
    *   contrib(u→v) = (rank(u) * w(u,v)) div W(u)   [integer floor]
    *   rank' = 150000 + (850 * Σ contribs) div 1000, rank_0 = 10^6.
    * Overflow bound: rank ≤ 10^6·N and rank·w must fit a Long — fine
    * through w·N ≤ ~9·10^12 (10^10 triples onto 10^8 entities is w·N ≈
    * 10^10); beyond that pre-scale the weights (documented trade).
    *
    * Same physical shape and size-adaptive driver-local fast path as
    * [[pageRank]] (bit-identical, spec-asserted): the weighted edge set
    * with W pre-joined is computed once and persisted; each superstep is
    * one equi-join + one hash aggregate, lineage truncated per iter.
    */
  def weightedPageRank(triples: DataFrame, iters: Int = 10,
                       maxLocalEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1, s"weightedPageRank: iters must be >= 1, got $iters")
    val edges = triples
      .select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (edges.count() <= maxLocalEdges) {
      val spark = triples.sparkSession
      val local = edges.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      edges.unpersist(blocking = false)
      val wsum = local.groupBy(_._1)
        .map { case (s, es) => s -> es.map(_._3).sum }
      val nodeIds = (local.map(_._1) ++ local.map(_._2)).distinct
      var rank = nodeIds.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val sums = new scala.collection.mutable.HashMap[String, Long]()
        local.foreach { case (s, d, w) =>
          sums.update(d, sums.getOrElse(d, 0L) + rank(s) * w / wsum(s))
        }
        rank = nodeIds.map(n =>
          n -> (150000L + 850L * sums.getOrElse(n, 0L) / 1000L)).toMap
      }
      import spark.implicits._
      return spark.createDataset(nodeIds.toSeq.map(n => (n, rank(n))))
        .toDF("entity_id", "rank")
    }
    val withW = edges
      .join(edges.groupBy("src").agg(sum("w").as("wsum")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges
      .select(explode(array(col("src"), col("dst"))).as("entity_id"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contribs = withW
        .join(ranks.withColumnRenamed("entity_id", "src"), "src")
        .select(col("dst").as("entity_id"),
          expr("(rank * w) div wsum").as("contrib"))
        .groupBy("entity_id").agg(sum(col("contrib")).as("c"))
      ranks = nodes.join(contribs, Seq("entity_id"), "left")
        .select(col("entity_id"),
          expr("150000L + (850L * coalesce(c, 0L)) div 1000L").as("rank"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    withW.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }

  /** Personalized PageRank: teleport mass restarts ONLY at `seeds`
    * (entity-centric relevance — "salience as seen from these PER
    * entities"), same fixed-point integer contract as [[pageRank]]:
    * rank_i(v) = (150000 if seed else 0) + 850·Σcontrib div 1000,
    * rank_0 = 10^6 on seeds, 0 elsewhere. Same superstep shape, same
    * size-adaptive driver-local fast path (bit-identical, spec-asserted).
    */
  def personalizedPageRank(triples: DataFrame, seeds: DataFrame,
                           iters: Int = 10,
                           maxLocalEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1, s"personalizedPageRank: iters must be >= 1, got $iters")
    val edges = triples
      .select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedSet = seeds.select(col("entity_id")).distinct()
    if (edges.count() <= maxLocalEdges) {
      val spark = triples.sparkSession
      val local = edges.collect().map(r => (r.getString(0), r.getString(1)))
      edges.unpersist(blocking = false)
      val sd = seedSet.collect().map(_.getString(0)).toSet
      val odeg = local.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
      val nodeIds = (local.map(_._1) ++ local.map(_._2)).distinct
      var rank = nodeIds.map(n => n -> (if (sd(n)) 1000000L else 0L)).toMap
      for (_ <- 1 to iters) {
        val sums = new scala.collection.mutable.HashMap[String, Long]()
        local.foreach { case (s, d) =>
          sums.update(d, sums.getOrElse(d, 0L) + rank(s) / odeg(s))
        }
        rank = nodeIds.map(n =>
          n -> ((if (sd(n)) 150000L else 0L) +
            850L * sums.getOrElse(n, 0L) / 1000L)).toMap
      }
      import spark.implicits._
      return spark.createDataset(nodeIds.toSeq.map(n => (n, rank(n))))
        .toDF("entity_id", "rank")
    }
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("odeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges
      .select(explode(array(col("src"), col("dst"))).as("entity_id"))
      .distinct()
      .join(seedSet.withColumn("sd", lit(1L)), Seq("entity_id"), "left")
      .na.fill(0L, Seq("sd"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("entity_id"),
      (col("sd") * 1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("entity_id", "src"), "src")
        .select(col("dst").as("entity_id"),
          expr("rank div odeg").as("contrib"))
        .groupBy("entity_id").agg(sum(col("contrib")).as("c"))
      ranks = nodes.join(contribs, Seq("entity_id"), "left")
        .select(col("entity_id"),
          expr("sd * 150000L + (850L * coalesce(c, 0L)) div 1000L").as("rank"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    withDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }

  /** Co-mention mining: entity pairs appearing in the SAME document (on
    * either side of any triple), with the number of distinct supporting
    * documents. The per-doc distinct mention set is built first (hash
    * aggregate), so the self-join fans out only over each doc's small
    * entity list — never over the raw triple multiplicity.
    */
  def coMentions(triples: DataFrame, minDocs: Long = 1): DataFrame = {
    // one scan (explode both sides), distinct, persisted for the
    // self-join — without the cache the self-join would recompute the
    // upstream pipeline once per join side
    val mentions = triples
      .select(col("docId"), explode(array(col("subj_id"), col("obj_id"))).as("e"))
      .distinct()
      .localCheckpoint()
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
    // symmetrize with a row-local explode (one source scan), distinct,
    // then persist so the hop self-join reads the cache, not the pipeline
    val e = (if (undirected)
      triples.select(explode(array(
        struct(col("subj_id"), col("pred"), col("obj_id")),
        struct(col("obj_id").as("subj_id"), col("pred"),
          col("subj_id").as("obj_id")))).as("m"))
        .select(col("m.subj_id"), col("m.pred"), col("m.obj_id"))
    else triples.select(col("subj_id"), col("pred"), col("obj_id")))
      .distinct()
      .localCheckpoint()
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

  /** Community detection by synchronous label propagation over the
    * symmetrized distinct entity graph, `iters` fixed rounds.
    *
    * Deterministic contract (what the oracle reproduces): every node
    * starts labeled with its own id; each round every node adopts the
    * most frequent label among its NEIGHBORS, ties broken by smallest
    * label. Synchronous updates + total tie order make the result a pure
    * function of the edge set — no randomized visit order, so two
    * engines (or two cluster sizes) agree bit-for-bit. Fixed `iters`
    * rather than convergence detection: sync LPA can 2-cycle on
    * bipartite-ish regions, so a fixpoint test may never fire.
    *
    * Physical shape per round: one equi-join labels><edges + two hash
    * aggregates (vote count, then arg-max with min-label tie-break) —
    * all AQE-splittable on hot entities. Same size-adaptive driver-local
    * fast path as pageRank (bit-identical, asserted in spec).
    */
  def labelProp(triples: DataFrame, iters: Int = 5,
                maxLocalEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1, s"labelProp: iters must be >= 1, got $iters")
    val edges = triples
      .select(explode(array(
        struct(col("subj_id").as("src"), col("obj_id").as("dst")),
        struct(col("obj_id").as("src"), col("subj_id").as("dst")))).as("m"))
      .select(col("m.src"), col("m.dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (edges.count() <= maxLocalEdges) {
      val spark = triples.sparkSession
      val local = edges.collect().map(r => (r.getString(0), r.getString(1)))
      edges.unpersist(blocking = false)
      val in = local.groupBy(_._2)                      // dst -> incoming srcs
      val nodeIds = local.map(_._1).distinct
      var label = nodeIds.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        label = nodeIds.map { n =>
          val votes = in(n).map(e => label(e._1))
            .groupBy(identity).map { case (l, vs) => (l, vs.length) }
          val mx = votes.values.max
          n -> votes.collect { case (l, c) if c == mx => l }.min
        }.toMap
      }
      import spark.implicits._
      return spark.createDataset(nodeIds.toSeq.map(n => (n, label(n))))
        .toDF("entity_id", "community")
    }
    val nodes = edges.select(col("src").as("entity_id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.withColumn("label", col("entity_id"))
    for (_ <- 1 to iters) {
      val votes = edges
        .join(labels.withColumnRenamed("entity_id", "src"), "src")
        .groupBy(col("dst").as("entity_id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val mx = votes.groupBy("entity_id").agg(max(col("c")).as("mx"))
      labels = votes.join(mx, "entity_id")
        .where(col("c") === col("mx"))
        .groupBy("entity_id").agg(min(col("label")).as("label"))
        .localCheckpoint() // superstep: O(1)-deep plan, edges reused
    }
    edges.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    labels.select(col("entity_id"), col("label").as("community"))
  }

  /** Per-entity triangle counts over an undirected pair table
    * (e1 < e2, distinct) — e.g. the co-mention graph. Classic
    * degree-ordered orientation: every edge points from its
    * lower-(degree, id) endpoint to the higher one, wedges are built
    * only at the lowest vertex of each triangle, and the closing edge is
    * probed with an equi-join. Orientation bounds wedge fan-out by
    * O(arboricity) instead of O(max-degree) — the hot-entity star that
    * would explode a naive wedge join generates NO wedges at its center
    * because all its edges point outward. Output is orientation-free
    * (the triangle set), so an id-ordered oracle reproduces it exactly.
    */
  def triangles(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("e1").as("u"), col("e2").as("v"))
    val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id); carry the head's degree for the wedge order
    val o = e
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"),
        // the head is by construction the greater endpoint in (deg, id)
        // order, so its degree is simply the max of the two
        greatest(col("du"), col("dv")).as("db"))
      .localCheckpoint() // three consumers below; cut the lineage once
    val tri = o.as("x")
      .join(o.as("y"), col("x.a") === col("y.a") &&
        (col("x.db") < col("y.db") ||
          (col("x.db") === col("y.db") && col("x.b") < col("y.b"))))
      .join(o.as("z"),
        col("z.a") === col("x.b") && col("z.b") === col("y.b"))
      .select(col("x.a").as("p"), col("x.b").as("q"), col("y.b").as("r"))
    tri.select(explode(array(col("p"), col("q"), col("r"))).as("entity_id"))
      .groupBy("entity_id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Multi-source BFS: shortest hop distance from any seed entity, up to
    * `maxHops`. Entities unreachable within the horizon are absent from
    * the output (a bounded-frontier contract — at 10^10 edges an
    * "unreachable = NULL for every node" output would materialize the
    * full vertex set for no analytical value).
    *
    * Physical shape per hop: ONE equi-join frontier><edges on src + one
    * min-aggregate — the Pregel superstep. Only the entities settled in
    * the PREVIOUS hop are expanded (a node first reached at hop i can
    * never improve a neighbor below i+1), so per-hop work is proportional
    * to the frontier, not the visited set. Lineage is truncated every
    * hop (eager localCheckpoint) so the plan stays O(1) deep; the edge
    * set is persisted once and reused by every hop.
    *
    * No driver-local fast path here (unlike pageRank/labelProp): with
    * maxHops small the distributed loop is a handful of narrow jobs and
    * the local twin would add a second code path for no measured win.
    */
  def bfsDistances(triples: DataFrame, seeds: DataFrame, maxHops: Int,
                   undirected: Boolean = false): DataFrame = {
    require(maxHops >= 1, s"bfsDistances: maxHops must be >= 1, got $maxHops")
    val base = triples.select(col("subj_id").as("src"), col("obj_id").as("dst"))
    val edges = (if (undirected)
      base.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("m"))
        .select(col("m.src"), col("m.dst"))
    else base)
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.select(col("entity_id")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint()
    for (i <- 1 to maxHops) {
      val frontier = dist.where(col("dist") === i - 1)
      val next = frontier.join(edges, frontier("entity_id") === edges("src"))
        .select(edges("dst").as("entity_id"), lit(i).as("dist"))
      dist = dist.unionByName(next)
        .groupBy("entity_id").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    edges.unpersist()
    dist
  }

  /** Entity similarity by shared neighborhood: Jaccard over undirected
    * neighbor sets — the KG entity-resolution signal ("two entities that
    * connect to the same things are candidates for the same thing").
    *
    * Shape: neighbor pairs -> wedge self-join on the shared neighbor ->
    * two-phase count per (e1,e2) -> set sizes joined back. The wedge join
    * is the skew-prone step (a neighbor shared by k entities emits
    * k(k-1)/2 pairs): `hubCap` drops neighbors above the cap BEFORE the
    * join — a hub like a country entity connects half the graph and its
    * wedges carry no discriminative signal anyway (mirrored exactly by
    * the oracle; both sizes and common counts use the capped sets, so
    * jaccard stays internally consistent). Orientation e1 < e2 halves
    * the output; AQE splits what skew remains below the cap.
    */
  def neighborJaccard(triples: DataFrame, minCommon: Long = 1,
                      hubCap: Long = 10000): DataFrame = {
    val ment = triples.select(explode(array(
        struct(col("subj_id").as("e"), col("obj_id").as("n")),
        struct(col("obj_id").as("e"), col("subj_id").as("n")))).as("m"))
      .select(col("m.e"), col("m.n"))
      .where(col("e") =!= col("n"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val keep = ment.groupBy("n").agg(count(lit(1)).as("nk"))
      .where(col("nk") <= hubCap)
      .select("n")
    val capped = ment.join(keep, "n").select("e", "n")
      .localCheckpoint() // three consumers (sizes + both join sides)
    ment.unpersist()
    val sizes = capped.groupBy("e").agg(count(lit(1)).as("sz"))
    capped.as("a")
      .join(capped.as("b"), col("a.n") === col("b.n") && col("a.e") < col("b.e"))
      .groupBy(col("a.e").as("e1"), col("b.e").as("e2"))
      .agg(count(lit(1)).as("common"))
      .where(col("common") >= minCommon)
      .join(sizes.select(col("e").as("e1"), col("sz").as("sz1")), "e1")
      .join(sizes.select(col("e").as("e2"), col("sz").as("sz2")), "e2")
      .select(col("e1"), col("e2"), col("common"), col("sz1"), col("sz2"),
        (col("common").cast("double") /
          (col("sz1") + col("sz2") - col("common"))).as("jaccard"))
  }

  /** Deterministic "random" walks over the distinct directed edge set —
    * the node2vec/DeepWalk corpus generator, made reproducible: step
    * choice is poly_hash(seed:cur:step:walk_no) mod out-degree over the
    * SORTED neighbor list, so the same graph yields bit-identical walks
    * on any partitioning, any retry, and in the independent oracle
    * engine (pmod semantics on the signed 64-bit hash match Spark's
    * `pmod` and the oracle's ((h % d) + d) % d).
    *
    * Output is long format: (start, walk_no, step, entity_id), one row
    * per visited position; walks stop early at sink nodes (no out-edges).
    *
    * Physical shape per step: hash computed row-locally (codegen
    * PolyHash), then ONE composite equi-join (cur, pick) = (src, idx)
    * against the indexed neighbor table — no range join, no explosion;
    * the neighbor table carries the destination's out-degree so the next
    * step needs no extra join. Neighbor indexing pays one window sort
    * per src partition, once, reused by all steps and walks.
    */
  def randomWalks(triples: DataFrame, walksPerStart: Int = 2,
                  walkLen: Int = 3, seed: Long = 42L): DataFrame = {
    require(walksPerStart >= 1 && walkLen >= 1,
      s"randomWalks: walksPerStart/walkLen must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val edges = triples.select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val withIdx = edges
      .withColumn("idx",
        (row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
          .cast("long"))
      .withColumn("odeg",
        count(lit(1)).over(Window.partitionBy("src")).cast("long"))
    val odeg = withIdx.select(col("src"), col("odeg")).distinct()
    val nbrs = withIdx
      .join(odeg.select(col("src").as("dst"), col("odeg").as("dst_odeg")),
        Seq("dst"), "left")
      .na.fill(0L, Seq("dst_odeg"))
      .select(col("src"), col("idx"), col("dst"), col("odeg"), col("dst_odeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cur = odeg
      .select(col("src").as("start"),
        explode(sequence(lit(0), lit(walksPerStart - 1))).as("walk_no"),
        col("src").as("cur"), col("odeg").as("cur_odeg"))
      .localCheckpoint()
    var out = cur.select(col("start"), col("walk_no"),
      lit(0).as("step"), col("cur").as("entity_id"))
    for (i <- 1 to walkLen) {
      val h = graft.functions.F.poly_hash(concat_ws(":",
        lit(seed.toString), col("cur"), lit(i.toString),
        col("walk_no").cast("string")))
      val stepped = cur.where(col("cur_odeg") > 0)
        .withColumn("pick", pmod(h, col("cur_odeg")))
        .join(nbrs, col("cur") === nbrs("src") && col("pick") === nbrs("idx"))
        .select(col("start"), col("walk_no"),
          nbrs("dst").as("cur"), nbrs("dst_odeg").as("cur_odeg"))
        .localCheckpoint()
      out = out.unionByName(stepped.select(col("start"), col("walk_no"),
        lit(i).as("step"), col("cur").as("entity_id")))
      cur = stepped
    }
    nbrs.unpersist()
    out
  }

  /** HITS hubs & authorities over the directed canonical graph — the
    * complementary salience signal to PageRank (an entity can be a weak
    * authority but a strong hub: a survey-like document entity that
    * points at many authorities).
    *
    * FIXED-POINT integer arithmetic, same rationale as [[pageRank]]:
    * scores live in micro-units; each half-step sums the opposite score
    * over edges and max-normalizes with floor division
    * (`raw * 10^6 div max(raw)`), so the argmax node sits at exactly
    * 10^6 every iteration and results are bit-reproducible across
    * partitionings and engines. Overflow bound: `raw <= 10^6 * degree`
    * and the scale step multiplies by 10^6, so degrees up to ~9*10^6
    * fit in a Long — beyond that, pre-divide the norm instead (documented
    * trade: quantization). The norm rides a broadcast single-row cross
    * join (not a driver collect), so each superstep stays one job.
    *
    * Size-adaptive like [[pageRank]]: small edge sets iterate on the
    * driver, big ones take the superstep loop — bit-identical outputs
    * (asserted in KgAnalyticsSpec).
    */
  def hits(triples: DataFrame, iters: Int = 5,
           maxLocalEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1, s"hits: iters must be >= 1, got $iters")
    val edges = triples
      .select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (edges.count() <= maxLocalEdges) {
      val spark = triples.sparkSession
      val local = edges.collect().map(r => (r.getString(0), r.getString(1)))
      edges.unpersist(blocking = false)
      import spark.implicits._
      // no (non-self) edges: empty graph, empty result — matches the
      // distributed path and pageRank/personalizedPageRank on the same
      // input (and keeps aRaw.values.max from throwing on an empty map)
      if (local.isEmpty)
        return spark.emptyDataset[(String, Long, Long)]
          .toDF("entity_id", "hub", "auth")
      val nodeIds = (local.map(_._1) ++ local.map(_._2)).distinct
      var hub = nodeIds.map(_ -> 1000000L).toMap
      var auth = Map.empty[String, Long]
      for (_ <- 1 to iters) {
        val aRaw = new scala.collection.mutable.HashMap[String, Long]()
        local.foreach { case (s, d) =>
          aRaw.update(d, aRaw.getOrElse(d, 0L) + hub(s)) }
        val aMax = math.max(aRaw.values.max, 1L)
        auth = nodeIds.map(n =>
          n -> aRaw.getOrElse(n, 0L) * 1000000L / aMax).toMap
        val hRaw = new scala.collection.mutable.HashMap[String, Long]()
        local.foreach { case (s, d) =>
          hRaw.update(s, hRaw.getOrElse(s, 0L) + auth(d)) }
        val hMax = math.max(hRaw.values.max, 1L)
        hub = nodeIds.map(n =>
          n -> hRaw.getOrElse(n, 0L) * 1000000L / hMax).toMap
      }
      return spark.createDataset(nodeIds.toSeq.map(n => (n, hub(n), auth(n))))
        .toDF("entity_id", "hub", "auth")
    }
    val nodes = edges
      .select(explode(array(col("src"), col("dst"))).as("entity_id"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one half-step: sum `score` over edges in direction (from -> to),
    // max-normalize to micro-units; left join keeps sink/source nodes at 0
    def halfStep(score: DataFrame, from: String, to: String): DataFrame = {
      val raw = edges
        .join(score.withColumnRenamed("entity_id", from), from)
        .groupBy(col(to).as("entity_id")).agg(sum("score").as("raw"))
      val mx = raw.agg(greatest(max("raw"), lit(1L)).as("mx"))
      nodes.join(raw, Seq("entity_id"), "left")
        .crossJoin(broadcast(mx))
        .select(col("entity_id"),
          expr("(coalesce(raw, 0L) * 1000000L) div mx").as("score"))
        .localCheckpoint() // superstep: O(1)-deep plan, edges reused
    }
    var hub = nodes.withColumn("score", lit(1000000L))
    var auth = hub
    for (_ <- 1 to iters) {
      auth = halfStep(hub, "src", "dst")
      hub = halfStep(auth, "dst", "src")
    }
    val out = nodes
      .join(hub.withColumnRenamed("score", "hub"), "entity_id")
      .join(auth.withColumnRenamed("score", "auth"), "entity_id")
    edges.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** Bounded k-core peeling over the undirected canonical graph: `rounds`
    * rounds of "drop every node with degree < k, then recount". The
    * k-core (maximal subgraph where every node has degree >= k) is this
    * loop's fixpoint; a FIXED round count keeps the operator a pure,
    * engine-independent function of the input (a data-dependent stopping
    * rule would make the oracle unmirrorable), and extra rounds past the
    * fixpoint are no-ops — KgAnalyticsSpec asserts rounds/rounds+1
    * invariance at test scale. Output: surviving entities with their
    * final in-core degree.
    *
    * Shape per round: one two-phase degree aggregate + two semi-joins
    * (src kept, dst kept) — all equi-joins on entity id; AQE splits
    * hot-entity skew; localCheckpoint keeps the iterated plan O(1)-deep.
    */
  def kCore(triples: DataFrame, k: Int = 2, rounds: Int = 4): DataFrame = {
    require(k >= 1 && rounds >= 1, s"kCore: k/rounds must be >= 1")
    var edges = triples
      .select(explode(array(
        struct(col("subj_id").as("src"), col("obj_id").as("dst")),
        struct(col("obj_id").as("src"), col("subj_id").as("dst")))).as("m"))
      .select(col("m.src"), col("m.dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select(col("src").as("kept"))
      edges = edges
        .join(keep.withColumnRenamed("kept", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("kept", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
    }
    edges.groupBy(col("src").as("entity_id"))
      .agg(count(lit(1)).as("degree"))
  }

  /** Adjacency-list export — the GNN / embedding-trainer consumption
    * shape: per entity, the TRUE distinct out-degree plus the sorted
    * distinct out-neighbor ARRAY, capped at `maxDegree` entries
    * (`truncated` flags capped rows). Hub rows are unbounded in a
    * 10^12-doc corpus (a celebrity entity can reach 10^8 distinct
    * neighbors — one row must not hold gigabytes), so the cap is part of
    * the export contract, not an optimization; consumers route
    * `truncated` hubs to a dedicated neighbor sampler.
    *
    * Determinism: the kept slice is the lexicographically FIRST
    * `maxDegree` neighbors (rank over the sorted distinct edge list), so
    * output is reproducible across partitionings.
    *
    * Shape: one distinct on (entity, neighbor), then ONE entity-keyed
    * window pass assigns rank + full degree — the cap filter runs BEFORE
    * collect_list, so no agg buffer ever materializes an uncapped hub
    * list (the difference between this and `sort_array(collect_set(...))
    * [1:maxDegree]`, which builds the 10^8-element set first). Both
    * window functions share the entity_id partitioning: one shuffle, one
    * sort.
    */
  def adjacency(triples: DataFrame, maxDegree: Int = 10000): DataFrame = {
    require(maxDegree >= 1, s"adjacency: maxDegree must be >= 1, got $maxDegree")
    import org.apache.spark.sql.expressions.Window
    val de = triples
      .select(col("subj_id").as("entity_id"), col("obj_id"))
      .where(col("entity_id") =!= col("obj_id"))
      .distinct()
    val byEntity = Window.partitionBy("entity_id")
    de.select(col("entity_id"), col("obj_id"),
        row_number().over(byEntity.orderBy("obj_id")).as("rn"),
        count(lit(1)).over(byEntity).as("deg"))
      .where(col("rn") <= maxDegree)
      .groupBy("entity_id")
      .agg(first("deg").as("out_degree"),
        sort_array(collect_list("obj_id")).as("neighbors"))
      .withColumn("truncated", col("out_degree") > lit(maxDegree.toLong))
  }

  /** KG-embedding training pairs, TransE-style (Bordes et al. 2013): for
    * every distinct (subj, pred, obj) emit `negatives` corrupted copies —
    * even draws corrupt the tail, odd the head (the standard alternating
    * scheme) — with the replacement entity drawn DETERMINISTICALLY from
    * the entity vocabulary, so the sample is reproducible across retries,
    * partitionings, and engines (the [[randomWalks]] hash-pick rule).
    *
    * Draw contract: entities get dense ids by (pmod(poly_hash(e), 64), e)
    * order; draw i for triple t picks id pmod(poly_hash(
    * 'transe'␁subj␁pred␁obj␁i), n); a draw that hits the very entity it
    * would replace moves to (id+1) mod n (needs n >= 2 — a 1-entity graph
    * has no negatives). Collisions with the OTHER side are kept: TransE
    * filtering ("filtered setting") removes corruptions that form REAL
    * triples, a variant left to the caller via anti-join against the base
    * table.
    *
    * Physical shape (10^10 triples, 10^8 entities): dense ids are
    * assigned two-level — per-bucket row_number windows (64 parallel
    * partitions) plus broadcast cumulative bucket offsets — NOT one
    * global-sort window; the corpus then pays one eid-keyed shuffle join
    * of probes against the vocab (vocab not assumed broadcastable; AQE
    * downgrades when it is). The collision re-pick joins only the
    * colliding rows (expected n_triples·negatives/n — vanishing).
    */
  def transeSamples(triples: DataFrame, negatives: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(negatives >= 1, s"transeSamples: negatives must be >= 1")
    val B = 64L
    // ONE scan exploding both triple sides (the old two-branch union
    // doubled the scan partition count and the task launches); the
    // window/offset construction is unchanged, so ids are identical
    val ents = triples
      .select(explode(array(col("subj_id"), col("obj_id"))).as("e")).distinct()
      .withColumn("b", pmod(graft.functions.F.poly_hash(col("e")), lit(B)))
    val inB = ents.withColumn("rn",
      row_number().over(Window.partitionBy("b").orderBy("e")).cast("long"))
    val offs = ents.groupBy("b").agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum("c").over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("b", "off") // B rows — the tiny frame the global window runs on
    // checkpointed: ids feeds THREE consumers (the n-row count, the probe
    // join, and the collision re-pick join) and each re-evaluated the
    // whole distinct + 64-bucket-window vocab DAG from scratch —
    // measured ~3 duplicate evaluations per run at sf0.1 (guide §2.4)
    val ids = inB.join(broadcast(offs), "b")
      .select(col("e"), (col("off") + col("rn") - 1).as("eid"))
      .localCheckpoint()
    val nRow = ids.agg(count(lit(1)).as("n")) // 1 row -> broadcast cross
    val probes = triples.select("subj_id", "pred", "obj_id").distinct()
      .crossJoin(broadcast(nRow))
      .select(col("subj_id"), col("pred"), col("obj_id"), col("n"),
        explode(sequence(lit(0), lit(negatives - 1))).as("neg_no"))
      .withColumn("corrupt",
        when(col("neg_no") % 2 === 0, lit("obj")).otherwise(lit("subj")))
      .withColumn("idx", pmod(graft.functions.F.poly_hash(
        concat_ws("\u0001", lit("transe"), col("subj_id"), col("pred"),
          col("obj_id"), col("neg_no").cast("string"))), col("n")))
    val trueEnt =
      when(col("corrupt") === "obj", col("obj_id")).otherwise(col("subj_id"))
    // checkpointed: j1 feeds BOTH union branches below — without it the
    // whole probe DAG (triples distinct + explode + poly_hash + vocab
    // join) evaluates twice (measured 8.9 s at sf0.1 x 32; ~2x waste)
    val j1 = probes
      .join(ids.select(col("eid").as("idx"), col("e").as("neg0")), "idx")
      .localCheckpoint()
    val out = Seq(col("subj_id"), col("pred"), col("obj_id"),
      col("neg_no").cast("long").as("neg_no"), col("corrupt"))
    j1.where(col("neg0") =!= trueEnt)
      .select(out :+ col("neg0").as("neg_id"): _*)
      .unionByName(j1.where(col("neg0") === trueEnt)
        .withColumn("idx2", pmod(col("idx") + 1, col("n")))
        .join(ids.select(col("eid").as("idx2"), col("e").as("neg1")), "idx2")
        .select(out :+ col("neg1").as("neg_id"): _*))
  }

  /** GraphSAGE-style multi-hop neighbor fan-out sampling (Hamilton et
    * al. 2017): for every entity as a seed, sample up to `fanouts(h-1)`
    * out-neighbors at hop h and emit the sampled computation-graph edges
    * `(seed, hop, parent, child)` — the minibatch expansion a GNN
    * trainer consumes (per-parent multiplicity kept: the same child
    * under two hop-2 parents is two aggregation edges).
    *
    * Sampling is DETERMINISTIC without replacement — the [[randomWalks]]
    * hash-pick rule lifted to top-k: per (hop, src) the out-edges rank by
    * (poly_hash('sample'␁seed␁hop␁src␁dst), dst) and the first k win, so
    * the sample is reproducible across partitionings, retries, and
    * engines, and each hop draws an independent sample (the hash is
    * hop-keyed) exactly as GraphSAGE samples per layer.
    *
    * Physical shape (10^10 triples): the per-hop sampled adjacency is
    * computed ONCE from the edge table — one src-keyed window per hop
    * whose `row_number <= k` filter Spark 4 executes as WindowGroupLimit
    * (per-partition top-k, no full sort of a hub's edge list survives) —
    * giving O(V·k_h) rows per hop; the seed expansion is then pure
    * frontier-keyed equi-joins against those capped tables, so a
    * 10^6-degree hub costs exactly k rows downstream and total output is
    * bounded by V·Πk_h. Frontiers are localCheckpointed per hop like
    * [[randomWalks]] so each level is computed once (it feeds both the
    * output union and the next join).
    */
  def neighborSample(triples: DataFrame, fanouts: Seq[Int] = Seq(3, 2),
                     seed: Long = 42L): DataFrame = {
    require(fanouts.nonEmpty && fanouts.forall(_ >= 1),
      s"neighborSample: fanouts must be non-empty positive, got $fanouts")
    import org.apache.spark.sql.expressions.Window
    val edges = triples
      .select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val sampled = fanouts.zipWithIndex.map { case (k, i) =>
      val h = graft.functions.F.poly_hash(concat_ws("\u0001",
        lit("sample"), lit(seed.toString), lit((i + 1).toString),
        col("src"), col("dst")))
      edges
        .withColumn("rn", row_number().over(
          Window.partitionBy("src").orderBy(h.asc, col("dst").asc)))
        .where(col("rn") <= k)
        .drop("rn")
    }
    var frontier = sampled.head
      .select(col("src").as("seed"), lit(1).as("hop"),
        col("src").as("parent"), col("dst").as("child"))
      .localCheckpoint()
    var out = frontier
    for (i <- 1 until fanouts.length) {
      frontier = frontier.as("f")
        .join(sampled(i).as("s"), col("f.child") === col("s.src"))
        .select(col("f.seed"), lit(i + 1).as("hop"),
          col("f.child").as("parent"), col("s.dst").as("child"))
        .localCheckpoint()
      out = out.unionByName(frontier)
    }
    out
  }

  /** Co-entity story clustering (the news-KG event-detection shape, cf.
    * GDELT/NewsLens): documents sharing >= `minShared` canonical
    * entities are edges, connected components over those edges are
    * stories. Output `(doc_id, story_id, story_size)` with story_id =
    * min doc id in the component — a singleton doc is its own story.
    *
    * This is [[coMentions]] transposed (docs sharing entities instead of
    * entities sharing docs), closed under transitivity by the same
    * large-small-star CC engine that canonicalizes alias edges.
    *
    * Skew: a hub entity appearing in more than `hubCap` docs is excluded
    * from pair generation BEFORE the self-join (the [[neighborJaccard]]
    * cap rationale — a "country"-grade entity in 30% of a 10^12-doc
    * corpus would emit ~10^23 pairs and link everything into one
    * mega-story; capping drops only those wedges, and minShared >= 2
    * already demands a second, rarer shared entity for the edge).
    * Remaining pair volume is Σ_e C(df_e, 2) with df_e <= hubCap, an
    * entity-blocked equi-join AQE can split further.
    */
  def storyClusters(triples: DataFrame, minShared: Long = 2,
                    hubCap: Long = 10000L): DataFrame = {
    require(minShared >= 1, s"storyClusters: minShared must be >= 1")
    require(hubCap >= 1, s"storyClusters: hubCap must be >= 1")
    val mentions = triples
      .select(col("docId"), explode(array(col("subj_id"), col("obj_id"))).as("e"))
      .distinct()
      .localCheckpoint()
    val kept = mentions.join(
      mentions.groupBy("e").agg(count(lit(1)).as("df"))
        .where(col("df") <= hubCap).select("e"), "e")
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.e") === col("b.e") && col("a.docId") < col("b.docId"))
      .groupBy(col("a.docId").as("src"), col("b.docId").as("dst"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .select("src", "dst")
    val verts = mentions.select(col("docId").as("id")).distinct()
    val cc = ConnectedComponents.runAdaptive(pairs, verts)
    cc.join(cc.groupBy("component").agg(count(lit(1)).as("story_size")),
        "component")
      .select(col("id").as("doc_id"), col("component").as("story_id"),
        col("story_size"))
  }

  /** Entity-card export — the per-entity profile a KG serving layer
    * renders (and the first table a reviewer reads after a build):
    * majority type, mention/doc counts, in/out degree, and the top-k
    * predicates on each side as ordered CSV (rank by count desc, then
    * predicate asc — fully deterministic, no float scores).
    *
    * ONE scan of the triple table (each triple explodes to its two
    * sides, checkpointed) feeding four independent aggregates stitched
    * by entity-id equi-joins; the top-k windows run as WindowGroupLimit
    * per (entity, side), so a hub entity's predicate list costs its
    * distinct-predicate count, not its mention count.
    */
  def entityCards(triples: DataFrame, topK: Int = 3): DataFrame = {
    require(topK >= 1, s"entityCards: topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val m = triples.select(explode(array(
        struct(col("subj_id").as("e"), col("subj_type").as("ty"),
          col("docId"), col("pred"), lit(true).as("isout"),
          col("obj_id").as("other")),
        struct(col("obj_id").as("e"), col("obj_type").as("ty"),
          col("docId"), col("pred"), lit(false).as("isout"),
          col("subj_id").as("other")))).as("x"))
      .select("x.*")
      .localCheckpoint()
    val base = m.groupBy("e").agg(
      count(lit(1)).as("n_mentions"),
      countDistinct(col("docId")).as("n_docs"),
      countDistinct(when(col("isout"), col("other"))).as("out_degree"),
      countDistinct(when(!col("isout"), col("other"))).as("in_degree"))
    val ty = m.groupBy("e", "ty").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("e").orderBy(col("c").desc, col("ty").asc)))
      .where(col("rn") === 1)
      .select(col("e"), col("ty").as("entity_type"))
    def topPreds(outSide: Boolean, name: String) = m
      .where(col("isout") === outSide)
      .groupBy("e", "pred").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("e").orderBy(col("c").desc, col("pred").asc)))
      .where(col("rn") <= topK)
      .groupBy("e")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("pred")))),
        x => x.getField("pred")), ",").as(name))
    base.join(ty, "e")
      .join(topPreds(outSide = true, "top_preds_out"), Seq("e"), "left")
      .join(topPreds(outSide = false, "top_preds_in"), Seq("e"), "left")
      .na.fill("", Seq("top_preds_out", "top_preds_in"))
      .select(col("e").as("entity_id"), col("entity_type"),
        col("n_mentions"), col("n_docs"), col("out_degree"),
        col("in_degree"), col("top_preds_out"), col("top_preds_in"))
  }

  /** Second-order (node2vec-style, Grover & Leskovec 2016) biased walks:
    * like [[randomWalks]] but the step distribution depends on the
    * PREVIOUS node — a candidate x from cur weighs `returnWeight` if
    * x = prev (the 1/p return bias), 1000 if edge (prev, x) exists (the
    * BFS-ish d=1 band), else `inOutWeight` (the 1/q DFS-ish band).
    * Weights are integer milli-units, so the whole draw is exact: the
    * pick is the candidate (ordered by id) whose cumulative-weight slot
    * contains pmod(poly_hash('n2v'␁seed␁step␁walk_no␁prev␁cur), Σw) —
    * deterministic across partitionings, retries, and engines. Step 1
    * has no meaningful prev and is uniform (all weights 1000, the
    * standard node2vec first step). A state whose candidates all weigh 0
    * (e.g. returnWeight=0 and the only neighbor is prev) terminates like
    * a sink; walkLen is a cap, not a promise.
    *
    * Physical shape per step: frontier × out-neighbors (one equi-join,
    * volume Σ odeg(cur) over live walks), one left equi-join against the
    * edge set for the d=1 membership test, and two windows keyed by
    * (start, walk_no) — each partition holds ONE state's candidate list,
    * so the window never sees more than a node's out-degree. No
    * driver-side state; frontiers localCheckpoint per step like
    * [[randomWalks]].
    */
  def node2vecWalks(triples: DataFrame, walksPerStart: Int = 2,
                    walkLen: Int = 3, returnWeight: Long = 500L,
                    inOutWeight: Long = 500L, seed: Long = 42L): DataFrame = {
    require(walksPerStart >= 1 && walkLen >= 1,
      s"node2vecWalks: walksPerStart/walkLen must be >= 1")
    require(returnWeight >= 0L && inOutWeight >= 0L,
      s"node2vecWalks: weights must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val edges = triples
      .select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var cur = edges.select(col("src")).distinct()
      .select(col("src").as("start"),
        explode(sequence(lit(0), lit(walksPerStart - 1))).as("walk_no"),
        col("src").as("prev"), col("src").as("cur"))
      .localCheckpoint()
    var out = cur.select(col("start"), col("walk_no"),
      lit(0).as("step"), col("cur").as("entity_id"))
    val byWalk = Window.partitionBy("start", "walk_no")
    for (i <- 1 to walkLen) {
      val cand0 = cur
        .join(edges.select(col("src").as("csrc"), col("dst").as("x")),
          col("cur") === col("csrc"))
        .drop("csrc")
      val mem = edges.select(col("src").as("msrc"), col("dst").as("mx"),
        lit(1).as("has"))
      val cand = cand0
        .join(mem, cand0("prev") === mem("msrc") && cand0("x") === mem("mx"),
          "left")
        .drop("msrc", "mx")
        .withColumn("w",
          if (i == 1) lit(1000L)
          else when(col("x") === col("prev"), lit(returnWeight))
            .when(col("has") === 1, lit(1000L))
            .otherwise(lit(inOutWeight)))
        .withColumn("cum", sum("w").over(byWalk.orderBy("x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum("w").over(byWalk))
        .where(col("tot") > 0L)
        .withColumn("r", pmod(graft.functions.F.poly_hash(concat_ws("\u0001",
          lit("n2v"), lit(seed.toString), lit(i.toString),
          col("walk_no").cast("string"), col("prev"), col("cur"))),
          col("tot")))
      val stepped = cand
        .where(col("cum") - col("w") <= col("r") && col("r") < col("cum"))
        .select(col("start"), col("walk_no"), col("cur").as("prev"),
          col("x").as("cur"))
        .localCheckpoint()
      out = out.unionByName(stepped.select(col("start"), col("walk_no"),
        lit(i).as("step"), col("cur").as("entity_id")))
      cur = stepped
    }
    out
  }

  /** Multi-seed shortest-path FOREST: [[bfsDistances]] plus a
    * deterministic parent pointer, so a consumer can reconstruct an
    * actual shortest path (KG question-answering "how are these entities
    * related" explanations), not just the hop count. parent(v) = the
    * MINIMUM entity id among v's predecessors at dist(v)-1 — a pure
    * function of the edge set; seeds carry parent = ''.
    *
    * Same superstep shape as BFS (frontier equi-join + min-aggregate per
    * hop); the merge keeps min(struct(dist, parent)), so an entity
    * reached at hop i from several frontier nodes records the smallest
    * such parent, and later (longer) discoveries never overwrite.
    */
  def shortestPathForest(triples: DataFrame, seeds: DataFrame,
                         maxHops: Int,
                         undirected: Boolean = false): DataFrame = {
    require(maxHops >= 1, s"shortestPathForest: maxHops must be >= 1")
    val base = triples.select(col("subj_id").as("src"), col("obj_id").as("dst"))
    val edges = (if (undirected)
      base.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("m"))
        .select(col("m.src"), col("m.dst"))
    else base)
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.select(col("entity_id")).distinct()
      .withColumn("dist", lit(0))
      .withColumn("parent", lit(""))
      .localCheckpoint()
    for (i <- 1 to maxHops) {
      val frontier = dist.where(col("dist") === i - 1)
      val next = frontier.join(edges, frontier("entity_id") === edges("src"))
        .select(edges("dst").as("entity_id"), lit(i).as("dist"),
          edges("src").as("parent"))
      dist = dist.unionByName(next)
        .groupBy("entity_id")
        .agg(min(struct(col("dist"), col("parent"))).as("m"))
        .select(col("entity_id"), col("m.dist").as("dist"),
          col("m.parent").as("parent"))
        .localCheckpoint()
    }
    edges.unpersist()
    dist
  }

  /** Strongly connected components over the directed canonical graph —
    * the cycle structure CC cannot see (entity A cites B cites A is one
    * SCC; a DAG of influence is all singletons). scc_id = min entity id
    * in the component, so output is a pure function of the edge set.
    *
    * Size-adaptive like [[pageRank]]: an edge set within
    * `maxLocalEdges` runs iterative Kosaraju on the driver; bigger
    * graphs take the distributed trim + double-min-label loop (the
    * Pregel/GraphX SCC shape):
    *   round := peel-to-fixpoint nodes missing an in- or out-edge
    *            (singleton SCCs — kills all DAG regions), then
    *            F(v) = min id that reaches v (min-label propagation
    *            forward to fixpoint), B(v) = min id v reaches (same on
    *            reversed edges); F(v)=B(v)=m ⟺ v ∈ SCC(m), and F/B are
    *            constant on an SCC, so whole components assign at once;
    *            remove assigned, repeat.
    * The SCC of the globally minimal live id assigns every round, so
    * rounds <= #SCCs; on real KG graphs trim plus the first F/B pass
    * clears almost everything. `maxRounds` is a fail-fast cap
    * (require(converged)), not a truncation.
    *
    * Physical shape per superstep: one equi-join labels><edges + one
    * min hash-aggregate (AQE-splittable on hot entities);
    * localCheckpoint truncates lineage per step like [[bfsDistances]].
    */
  def scc(triples: DataFrame, maxLocalEdges: Long = 2000000L,
          maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, s"scc: maxRounds must be >= 1")
    val spark = triples.sparkSession
    import spark.implicits._
    val edges0 = triples
      .select(col("subj_id").as("src"), col("obj_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    if (edges0.count() <= maxLocalEdges) {
      val es = edges0.as[(String, String)].collect()
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      val adj = es.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
      val radj = es.groupBy(_._2).map { case (d, xs) => d -> xs.map(_._1) }
      // iterative Kosaraju: explicit stacks (no recursion — a 10^6-long
      // path must not overflow), component id fixed to min member after
      val visited = new java.util.HashSet[String]()
      val order = new scala.collection.mutable.ArrayBuffer[String](nodes.length)
      val stack = new scala.collection.mutable.ArrayBuffer[(String, Int)]()
      for (s <- nodes if !visited.contains(s)) {
        visited.add(s); stack += ((s, 0))
        while (stack.nonEmpty) {
          val (v, i) = stack.remove(stack.length - 1)
          val nb = adj.getOrElse(v, Array.empty[String])
          if (i < nb.length) {
            stack += ((v, i + 1))
            val w = nb(i)
            if (!visited.contains(w)) { visited.add(w); stack += ((w, 0)) }
          } else order += v
        }
      }
      val comp = new java.util.HashMap[String, String]()
      val dfs2 = new scala.collection.mutable.ArrayBuffer[String]()
      for (s <- order.reverseIterator if !comp.containsKey(s)) {
        val members = new scala.collection.mutable.ArrayBuffer[String]()
        comp.put(s, s); dfs2 += s
        while (dfs2.nonEmpty) {
          val v = dfs2.remove(dfs2.length - 1); members += v
          for (w <- radj.getOrElse(v, Array.empty[String]))
            if (!comp.containsKey(w)) { comp.put(w, s); dfs2 += w }
        }
        val m = members.min
        members.foreach(comp.put(_, m))
      }
      val sizes = nodes.groupBy(n => comp.get(n))
        .map { case (c, vs) => c -> vs.length.toLong }
      return spark.createDataset(nodes.toSeq.map(n =>
          (n, comp.get(n), sizes(comp.get(n)))))
        .toDF("entity_id", "scc_id", "scc_size")
    }
    var edges = edges0
    var nodes = edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct().localCheckpoint()
    val acc = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var rounds = 0
    var live = nodes.count()
    while (live > 0 && rounds < maxRounds) {
      rounds += 1
      // trim to fixpoint: a node missing an in- OR out-edge is its own SCC
      var trimming = true
      while (trimming && live > 0) {
        val both = nodes
          .join(edges.select(col("src").as("id")).distinct(), "id")
          .join(edges.select(col("dst").as("id")).distinct(), "id")
          .localCheckpoint()
        val single = nodes.join(both, Seq("id"), "left_anti").localCheckpoint()
        if (single.isEmpty) trimming = false
        else {
          acc += single.select(col("id").as("entity_id"),
            col("id").as("scc_id"))
          nodes = both
          edges = edges
            .join(nodes.select(col("id").as("src")), "src")
            .join(nodes.select(col("id").as("dst")), "dst")
            .select("src", "dst").localCheckpoint()
          live = nodes.count()
        }
      }
      if (live > 0) {
        // min-label fixpoints: F forward, B backward
        def fixpoint(e: DataFrame, from: String, to: String): DataFrame = {
          var lab = nodes.select(col("id"), col("id").as("lab"))
            .localCheckpoint()
          var changed = 1L
          while (changed > 0) {
            val nxt = e
              .join(lab.select(col("id").as(from), col("lab")), from)
              .select(col(to).as("id"), col("lab"))
              .unionByName(lab)
              .groupBy("id").agg(min("lab").as("lab"))
              .localCheckpoint()
            changed = nxt.join(lab.withColumnRenamed("lab", "old"), "id")
              .where(col("lab") =!= col("old")).count()
            lab = nxt
          }
          lab
        }
        val f = fixpoint(edges, "src", "dst")
        val b = fixpoint(edges, "dst", "src")
        val assigned = f.join(b.withColumnRenamed("lab", "blab"), "id")
          .where(col("lab") === col("blab"))
          .select(col("id").as("entity_id"), col("lab").as("scc_id"))
          .localCheckpoint()
        acc += assigned
        nodes = nodes.join(assigned.select(col("entity_id").as("id")),
          Seq("id"), "left_anti").localCheckpoint()
        edges = edges
          .join(nodes.select(col("id").as("src")), "src")
          .join(nodes.select(col("id").as("dst")), "dst")
          .select("src", "dst").localCheckpoint()
        live = nodes.count()
      }
    }
    require(live == 0,
      s"scc: did not converge within $maxRounds rounds ($live nodes live)")
    val all = acc.reduce(_ unionByName _)
    all.join(all.groupBy("scc_id").agg(count(lit(1)).as("scc_size")),
        "scc_id")
      .select(col("entity_id"), col("scc_id"), col("scc_size"))
  }

  /** Deterministic annotation batches: up to `k` supporting mentions
    * per canonical entity, picked by hash rank — the export a human-eval
    * loop reads to spot-check linking/extraction quality per entity
    * without any frequency bias (hash order ≈ uniform over the entity's
    * mentions, yet reproducible across retries, partitionings, and
    * engines — the [[neighborSample]] rule on mention rows).
    *
    * One two-sided explode of the triple table, then a single
    * entity-keyed window whose rank≤k filter runs as WindowGroupLimit —
    * a 10^6-mention hub entity costs k output rows and never a full
    * sort of its mention list beyond the per-partition top-k.
    */
  def annotationSample(triples: DataFrame, k: Int = 3,
                       seed: Long = 42L): DataFrame = {
    require(k >= 1, s"annotationSample: k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val m = triples.select(explode(array(
        struct(col("subj_id").as("entity_id"), lit("subj").as("role"),
          col("docId"), col("spanOrder"), col("sentIdx"), col("pred"),
          col("obj_id").as("other_id")),
        struct(col("obj_id").as("entity_id"), lit("obj").as("role"),
          col("docId"), col("spanOrder"), col("sentIdx"), col("pred"),
          col("subj_id").as("other_id")))).as("x"))
      .select("x.*")
      .distinct()
    val h = graft.functions.F.poly_hash(concat_ws("\u0001",
      lit("ann"), lit(seed.toString), col("entity_id"), col("docId"),
      col("spanOrder").cast("string"), col("sentIdx").cast("string"),
      col("pred"), col("other_id"), col("role")))
    m.withColumn("pick", row_number().over(
        Window.partitionBy("entity_id").orderBy(h.asc, col("docId").asc,
          col("spanOrder").asc, col("sentIdx").asc, col("pred").asc,
          col("other_id").asc, col("role").asc)))
      .where(col("pick") <= k)
      .select(col("entity_id"), col("pick").cast("long").as("pick"),
        col("role"), col("docId").as("doc_id"),
        col("spanOrder").as("span_order"),
        col("sentIdx").as("sent_idx"), col("pred"), col("other_id"))
  }

  /** Entity-linking coverage report: per mention type, how many triple
    * mentions resolved to a dictionary canonical vs fell through to the
    * `M:`-prefixed mention-normal fallback (Kg.linkCanonicalize's
    * contract: `coalesce(canonical, 'M:' || norm)` — dictionary keys
    * never carry the prefix) — the first linking-quality table a KG
    * curator reads after a dictionary update, in integer ppm. One
    * two-sided explode + one hash aggregate.
    */
  def linkCoverage(triples: DataFrame): DataFrame =
    triples.select(explode(array(
        struct(col("subj_type").as("tpe"), col("subj_id").as("id")),
        struct(col("obj_type").as("tpe"), col("obj_id").as("id")))).as("x"))
      .select("x.*")
      .groupBy("tpe")
      .agg(count(lit(1)).as("n_mentions"),
        count(when(!col("id").startsWith("M:"), 1)).as("n_linked"))
      .select(col("tpe"), col("n_mentions"), col("n_linked"),
        expr("(n_linked * 1000000) div n_mentions").as("linked_ppm"))

  /** Ontology/schema induction: per (pred, subj_type, obj_type)
    * signature, triple count, distinct (subj, obj) pair count, and the
    * signature's share of its predicate's triples in integer ppm — the
    * table a KG curator reads to fix predicate domains/ranges and spot
    * extraction noise (a `works_at` signature with a LOC subject is a
    * pattern bug, and its ppm share says how bad).
    *
    * One two-phase hash aggregate over the triple table plus a window
    * keyed by pred (predicate cardinality is tiny — the window input is
    * the aggregated signature table, not the corpus).
    */
  def predicateSignatures(triples: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    triples.groupBy("pred", "subj_type", "obj_type")
      .agg(count(lit(1)).as("n_triples"),
        countDistinct(col("subj_id"), col("obj_id")).as("n_pairs"))
      .withColumn("pred_total",
        sum("n_triples").over(Window.partitionBy("pred")))
      .select(col("pred"), col("subj_type"), col("obj_type"),
        col("n_triples"), col("n_pairs"),
        expr("(n_triples * 1000000) div pred_total").as("share_ppm"))
  }
}
