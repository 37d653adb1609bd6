package graft.operators

import graft.functions.VectorFunctions.{l2Sq, vecLit}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Graph ANN — the HNSW-class member of the ANN family, re-shaped for
  * Spark's execution model.
  *
  * Chroma's implicit per-collection index is HNSW (default
  * `hnsw:space=l2`, never overridden by the reference ingester) — a
  * navigable-small-world graph searched greedily. A literal HNSW is a
  * single mutable in-memory graph: the hierarchy's top layers route a
  * query to the right region, layer 0 does the fine search. That shape
  * does not distribute — but its DECOMPOSITION does, and this operator
  * is that decomposition:
  *
  *  - the ROUTING half (HNSW's upper layers) is the deterministic-Lloyd
  *    coarse quantizer the stored-ANN tier already uses
  *    ([[Clustering.trainCentroids]]): a query probes the `nprobe`
  *    nearest cells exactly as IVF does — O(ncells) driver-side work,
  *    no graph needed;
  *  - the FINE half (HNSW's layer 0) is a genuine insertion-built NSW
  *    graph PER CELL: nodes insert in ascending-id order, each new node
  *    beam-searches the graph built so far for its M nearest, links
  *    bidirectionally, and neighbor lists prune back to M by (distance,
  *    id) — the classic NSW construction, O(n · ef · M) per cell
  *    instead of the O(cell²) all-pairs build;
  *  - search beam-walks each probed cell's graph from a deterministic
  *    entry point (the cell's minimum id), evaluating distances ONLY on
  *    nodes the walk touches — the sub-linear property that
  *    distinguishes graph ANN from IVF's scan-the-cell (pinned in
  *    AnnProbeSpec: evaluated nodes are a fraction of probed-cell
  *    population), then the per-cell top-k merge to a global top-k.
  *
  * Graph build and walk are genuinely imperative per-partition logic —
  * the one place `mapPartitions` is the right Spark tool (the
  * relational half: assignment, partitioning, the global top-k, stays
  * declarative). Everything is deterministic: insertion order,
  * (distance, id) orderings, and the min-id entry point are all
  * data-defined, so results are thread-count-invariant like every other
  * operator here.
  *
  * At 100 TB: cells partition the corpus (the graph column rides the
  * same cell-partitioned layout as `ann_ivfsq_store`); per-cell graphs
  * build independently (one `mapPartitions` pass, no shuffle beyond the
  * cell repartition) and a query moves `nprobe` cells × `ef` beam
  * width of work, never the corpus.
  */
object GraphAnn {

  /** One graph node: cell, id, vector, adjacency (ids, ≤ M). */
  final case class Node(cell_id: Int, id: Long, vec: Array[Float],
                        neighbors: Array[Long])

  /** Process-local observability counters for the SEARCH paths (never the
    * build): `cellLoads` counts walk-structure materializations (one per
    * (cell, search) — the thing [[searchMany]] amortizes across a query
    * batch), `beamWalks` counts beam searches. Driver-meaningful under
    * local mode (tests pin single-execution and amortization invariants
    * on them); on a real cluster they are per-executor JVM counters —
    * harmless, not aggregated. */
  object counters {
    val cellLoads = new java.util.concurrent.atomic.AtomicLong
    val beamWalks = new java.util.concurrent.atomic.AtomicLong
    def reset(): Unit = { cellLoads.set(0L); beamWalks.set(0L) }
  }

  /** Left-to-right double accumulation over float inputs — the repo's
    * VectorDistance arithmetic, reproduced for the imperative kernel. */
  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    acc
  }

  private val byDistThenId: Ordering[(Double, Long)] = Ordering.Tuple2

  /** Greedy beam search from `entry` over an adjacency given by
    * accessor functions (so insertion-time searches run on the LIVE
    * build structures — no per-insert graph copies): returns the
    * ef-bounded result set (sorted by (dist, id)) and the number of
    * distance evaluations performed. Classic NSW/HNSW layer-0 search:
    * expand the closest unexpanded candidate; stop when the closest
    * candidate is farther than the worst of a full result set. */
  private[graft] def beamSearch(vecOf: Long => Array[Float],
                         neighborsOf: Long => collection.Seq[Long],
                         entry: Long, qv: Array[Float], ef: Int):
      (Vector[(Double, Long)], Int) = {
    var evals = 0
    def d(id: Long): Double = { evals += 1; l2(vecOf(id), qv) }
    val visited = mutable.Set[Long](entry)
    val e0 = (d(entry), entry)
    // candidates: closest-first; results: farthest-first, capped at ef
    val cand = mutable.PriorityQueue(e0)(byDistThenId.reverse)
    val res = mutable.PriorityQueue(e0)(byDistThenId)
    while (cand.nonEmpty) {
      val c = cand.dequeue()
      if (byDistThenId.gt(c, res.head) && res.size >= ef) { cand.clear() }
      else neighborsOf(c._2).foreach { nb =>
        if (visited.add(nb)) {
          val dn = (d(nb), nb)
          if (res.size < ef || byDistThenId.lt(dn, res.head)) {
            cand.enqueue(dn)
            res.enqueue(dn)
            if (res.size > ef) { res.dequeue(): Unit }
          }
        }
      }
    }
    (res.toVector.sorted(byDistThenId), evals)
  }

  /** HNSW's neighbor-selection heuristic (Malkov & Yashunin 2016,
    * alg. 4): walk candidates closest-first, keep one only if it is
    * closer to the base than to every already-kept neighbor — the
    * diversity rule that keeps edges pointing into DIFFERENT regions
    * (pure distance-k pruning collapses all edges into the local
    * cluster and disconnects the graph), then backfill with the
    * closest rejected candidates if fewer than m survive. */
  private def selectNeighbors(cands: Seq[(Double, Long)], m: Int,
                              vecOf: Long => Array[Float]): Array[Long] = {
    val kept = mutable.ArrayBuffer[(Double, Long)]()
    val rejected = mutable.ArrayBuffer[(Double, Long)]()
    cands.sorted(byDistThenId).foreach { case c @ (dc, id) =>
      if (kept.size < m) {
        if (kept.forall { case (_, kid) => l2(vecOf(id), vecOf(kid)) > dc }) kept += c
        else rejected += c
      }
    }
    (kept ++ rejected.take(m - kept.size)).sorted(byDistThenId).map(_._2).toArray
  }

  /** Insertion-build one cell's NSW graph (ascending-id order, so the
    * graph is a pure function of the cell's content — no RNG, no
    * parallelism dependence). */
  private[graft] def buildCell(cell: Int, members: Array[(Long, Array[Float])],
                        m: Int, efConstruction: Int): Iterator[Node] = {
    val sorted = members.sortBy(_._1)
    val vecs = mutable.LongMap[Array[Float]]()
    val adj = mutable.LongMap[mutable.ArrayBuffer[Long]]()
    def prune(id: Long): Unit = {
      val nb = adj(id)
      if (nb.length > m) {
        val v = vecs(id)
        val kept = selectNeighbors(nb.toSeq.map(o => (l2(v, vecs(o)), o)), m, vecs(_))
        nb.clear(); nb ++= kept
      }
    }
    val entry = sorted.head._1
    sorted.foreach { case (id, vec) =>
      if (vecs.isEmpty) {
        vecs(id) = vec
        adj(id) = mutable.ArrayBuffer()
      } else {
        val (near, _) = beamSearch(vecs(_), adj(_), entry, vec, efConstruction)
        val links = selectNeighbors(near, m, vecs(_))
        vecs(id) = vec
        adj(id) = mutable.ArrayBuffer(links.toIndexedSeq: _*)
        links.foreach { o => adj(o) += id; prune(o) }
      }
    }
    sorted.iterator.map { case (id, _) => Node(cell, id, vecs(id), adj(id).toArray) }
  }

  /** Build the cell-partitioned graph: assign cells with the
    * deterministic quantizer, repartition on cell, build each cell's
    * NSW inside its partition. Returns (graph, centroids — possibly
    * EXTENDED past `ncells` by the giant-cell guard; callers must keep
    * the returned array, not the one they passed in).
    *
    * Giant-cell guard (the graph twin of SemDeDup's `maxClusterSize`,
    * [[Clustering.semanticNearDupFrom]]): `buildCell` materializes a
    * whole cell in one task and runs the O(n·ef·M) NSW insertion
    * serially, so ONE degenerate embedding cluster (boilerplate
    * near-dups) would concentrate unbounded memory and a straggler
    * build in a single task. Cells whose population exceeds
    * `maxCellSize` are therefore recursively sub-quantized
    * ([[refineCells]]): deterministic farthest-point seeds + Lloyd
    * rounds derive child centroids from the cell's own members, the
    * parent centroid slot is replaced by child 0 and the rest append
    * to the centroid array, and the WHOLE collection re-assigns flat
    * against the extended array (so assignment ≡ argmin over the final
    * centroids — the invariant the probe side relies on). Results are
    * bit-identical to the unguarded form whenever no cell exceeds the
    * cap (spec-pinned), and the guard costs one extra column-pruned
    * count scan in that common case.
    *
    * The cap is a SOFT bound: flat re-assignment after a split can
    * churn boundary members back over the cap by a small fraction
    * before the round backstop ends the loop (measured envelope ~1.2x
    * in the engineered mixed-cluster spec) — the guarantee is task
    * memory bounded by cap x a small constant, not an exact
    * population ceiling. */
  def buildGraph(collection: DataFrame, vecCol: String, idCol: String,
                 ncells: Int = 8, iters: Int = 2, m: Int = 8,
                 efConstruction: Int = 32,
                 centroids: Option[Array[Array[Float]]] = None,
                 maxCellSize: Int = 65536): (Dataset[Node], Array[Array[Float]]) = {
    val sp = collection.sparkSession
    import sp.implicits._
    // pre-trained centroids let the caller train the router on the FULL
    // collection while building the graph over a filtered slice (the
    // query holds its probe vector out of the graph but not the router)
    val cents0 = centroids.getOrElse(
      Clustering.trainCentroids(collection, ncells, iters, idCol, vecCol))
    val cents = refineCells(collection, vecCol, idCol, cents0, maxCellSize, iters)
    val assigned = collection
      .withColumn("_a", Clustering.assignStruct(col(vecCol), cents))
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"),
        col("_a").getField("cid").as("cell_id"))
      .repartition(cents.length, col("cell_id"))
      .as[(Long, Array[Float], Int)]
    val graph = assigned.mapPartitions { it =>
      it.toArray.groupBy(_._3).iterator.flatMap { case (cell, rows) =>
        buildCell(cell, rows.map(r => (r._1, r._2)), m, efConstruction)
      }
    }
    (graph, cents)
  }

  /** The guard loop: while any cell holds more than `maxCellSize`
    * members, split each oversized cell (ascending cell id, so child
    * slot allocation is deterministic) and re-assign flat. Progress is
    * tracked PER CELL: a cell whose members admit no second distinct
    * seed (all-identical vectors — no centroid can separate exact
    * duplicates; the dedup tier's job, upstream of indexing) is marked
    * unsplittable by SLOT and excluded from further rounds, so one
    * degenerate cell cannot block the splitting of other oversized,
    * splittable cells. The loop ends when every remaining oversized
    * cell is unsplittable, no split occurred in a round, or the round
    * backstop trips (boundary churn under flat re-assignment could
    * otherwise oscillate a cell around the cap indefinitely). */
  private[graft] def refineCells(collection: DataFrame, vecCol: String,
      idCol: String, cents0: Array[Array[Float]], maxCellSize: Int,
      iters: Int): Array[Array[Float]] = {
    if (maxCellSize == Int.MaxValue) return cents0
    // dominance fast path: if the WHOLE collection fits under the cap, no
    // cell can possibly be oversized — a plain count() (column-pruned to
    // nothing, no distance math) replaces the full assignment scan the
    // guard loop would otherwise pay on every build
    if (collection.count() <= maxCellSize) return cents0
    var cents = cents0
    var unsplittable = Set.empty[Int]
    var rounds = 0
    while (rounds < 8) {
      val assigned = collection
        .withColumn("_c", Clustering.assignStruct(col(vecCol), cents).getField("cid"))
        .select(col(idCol).cast("long").as("id"),
          col(vecCol).cast("array<float>").as("vec"), col("_c").as("cell"))
      val oversized = assigned.groupBy("cell").count()
        .filter(col("count") > maxCellSize)
        .collect().map(r => (r.getInt(0), r.getLong(1)))
        .filterNot { case (c, _) => unsplittable.contains(c) }
        .sortBy(_._1)
      if (oversized.isEmpty) return cents
      // the split passes re-read the assignment several times — pin it
      // (bounded by the collection's (id, vec) projection, and we are on
      // the rare guard path: something IS oversized)
      val pinned = assigned.localCheckpoint(true)
      val next = mutable.ArrayBuffer(cents.toIndexedSeq: _*)
      var didSplit = false
      oversized.foreach { case (cell, n) =>
        val members = pinned.filter(col("cell") === cell).select(col("id"), col("vec"))
        val kChild = math.min(math.max(2, math.ceil(n.toDouble / maxCellSize).toInt), 64)
        val sub = splitCentroids(members, kChild, iters)
        if (sub.length >= 2) {
          next(cell) = sub(0)
          next ++= sub.drop(1)
          didSplit = true
        } else unsplittable += cell // single seed: exact duplicates only
      }
      if (!didSplit) return cents
      cents = next.toArray
      rounds += 1
    }
    cents
  }

  /** Deterministic k-way split centroids for one cell's members:
    * farthest-point (maxmin) seeding — seed 0 is the min-id member's
    * vector, each further seed the member farthest (floor-rounded
    * distance, ties to the lowest id) from the seeds so far, stopping
    * early when the farthest remaining member is at distance 0 (no
    * distinct vectors left — seeding further would only mint dead
    * duplicate centroids) — then `iters` fixed-point Lloyd rounds
    * ([[Clustering.lloydStep]]). Every pass is a bounded TakeOrdered /
    * partial-agg over the member slice; nothing collects more than one
    * row or k·dim sums. */
  private def splitCentroids(members: DataFrame, k: Int, iters: Int): Array[Array[Float]] = {
    val seeds = mutable.ArrayBuffer(
      members.orderBy(col("id")).select(col("vec"))
        .head.getSeq[Float](0).toArray)
    var exhausted = false
    while (seeds.length < k && !exhausted) {
      val d = Clustering.assignStruct(col("vec"), seeds.toArray).getField("dist")
      val far = members.select(col("vec"), d.as("_d"), col("id"))
        .orderBy(col("_d").desc, col("id")).head
      if (far.getDouble(1) <= 0.0) exhausted = true
      else seeds += far.getSeq[Float](0).toArray
    }
    var cs = seeds.toArray
    for (_ <- 0 until iters) cs = Clustering.lloydStep(members, cs, "id", "vec")
    cs
  }

  /** Incremental maintenance of a STORED graph: assign the arriving
    * batch to cells, read back ONLY the touched cells
    * (partition-pruned), union the arrivals, rebuild those cells'
    * graphs, and dynamically overwrite just those partitions. Because
    * each cell's graph is a pure function of its membership
    * (canonical ascending-id insertion), the incrementally-maintained
    * store is BIT-IDENTICAL to a from-scratch build over the full
    * corpus (spec-pinned) — while the work is O(touched cells), never
    * the collection. The incremental-LSH counterpart of
    * `Dedup.appendToSignatureIndex`, for the index tier.
    *
    * CONTRACT: batch ids are NEW (append semantics, like every
    * incremental operator here) — ENFORCED: the batch ids are checked
    * against the touched cells' existing ids (already read back for the
    * rebuild, so the check is bounded by the touched cells, not the
    * collection) and a collision throws rather than silently leaving
    * two nodes with one id in the rebuilt cell.
    *
    * Cap note: `maxCellSize` is a BUILD-time guard; appends do not
    * re-split (a split would change the centroid array the caller
    * persists). A cell pushed over the cap by appends is restored by
    * the next full [[buildGraph]] — same policy as compaction. */
  def insertIntoStored(store: graft.store.VectorStore, name: String,
                       batch: DataFrame, vecCol: String, idCol: String,
                       cents: Array[Array[Float]],
                       m: Int = 8, efConstruction: Int = 32): Seq[Int] = {
    val sp = batch.sparkSession
    import sp.implicits._
    val assigned = batch
      .withColumn("_a", Clustering.assignStruct(col(vecCol), cents))
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"),
        col("_a").getField("cid").as("cell_id"))
      // PIN (lazy): consumed three times (contract/touched agg, collision
      // semi-join, rebuild union) — a nondeterministic batch could pass
      // the contract on one evaluation and rebuild with a different row
      // set. Lazy, not eager: the first action (the agg below) pays the
      // materialization, so pinning costs no extra job.
      .localCheckpoint(false)
    // ONE bounded job for batch count, batch-distinct ids, AND the
    // touched-cell list (≤ ncells values) — previously three jobs
    val head = assigned.agg(count(lit(1)), countDistinct(col("id")),
      sort_array(collect_set(col("cell_id")))).head
    AppendContract.requireUnique(head.getLong(0), head.getLong(1),
      "insertIntoStored")
    val touched = head.getSeq[Int](2).toArray
    // enforce the append contract against the WHOLE index, not just the
    // touched cells: a re-inserted id whose drifted vector assigns to a
    // DIFFERENT cell would otherwise slip past a touched-cells-only
    // check and leave two nodes with one id in two cells. ONE map-only
    // column-pruned pass over the index's slim id column per (nightly)
    // batch — the price of the invariant. It runs CONCURRENTLY with the
    // rebuild materialization below: the contract gates the WRITE (the
    // only store mutation), not the plan — a refusal discards the
    // side-effect-free checkpoint, so correctness is unchanged and the
    // two index reads overlap instead of serializing.
    val contract = scala.concurrent.Future {
      // blocking{}: the body waits on a Spark action — without the
      // marker, many concurrent inserts would pin fork-join workers and
      // starve the shared global pool
      scala.concurrent.blocking {
        AppendContract.requireNoExisting(store, name, assigned, "id",
          head.getLong(0), "insertIntoStored")
      }
    }(scala.concurrent.ExecutionContext.global)
    val existing = store.read(sp, name)
      .filter(col("cell_id").isin(touched.map(Int.box).toIndexedSeq: _*))
      .select(col("id"), col("vec"), col("cell_id"))
    val members = existing.unionByName(assigned)
      .repartition(math.max(touched.length, 1), col("cell_id"))
      .as[(Long, Array[Float], Int)]
    val rebuilt = members.mapPartitions { it =>
      it.toArray.groupBy(_._3).iterator.flatMap { case (cell, rows) =>
        buildCell(cell, rows.map(r => (r._1, r._2)), m, efConstruction)
      }
    }
      // EAGER: the rebuilt cells read from the same path the write below
      // overwrites — the checkpoint severs that lineage (and is bounded
      // by the touched cells, not the collection)
      .localCheckpoint(true)
    scala.concurrent.Await.result(contract, scala.concurrent.duration.Duration.Inf)
    store.overwritePartitions(name, rebuilt.toDF(), Seq("cell_id"))
    touched.toSeq
  }

  /** Deterministic M-NN adjacency as a single-cell [[Node]] graph — the
    * SQL-DERIVABLE graph construction: each node links to its `m`
    * nearest others by (exact double l2², id), neighbor lists kept in
    * that same order (the order the walk offers them in), unlike the
    * inherently sequential NSW insertion build. This is the graph the
    * gate's `ann_graph_walk` anchor walks — its DuckDB oracle
    * re-derives the identical adjacency relationally — and the
    * selectivity spec pins the beam over the SAME construction by
    * calling this method (a drifted copy would pin a different graph
    * than the oracle checks). The whole graph lands in ONE task
    * partition (the walk precondition); intended for bounded slices,
    * not the corpus — at scale the NSW cells are the real index. */
  def knnGraph(collection: DataFrame, vecCol: String, idCol: String,
               m: Int): Dataset[Node] = {
    val sp = collection.sparkSession
    import sp.implicits._
    val corpus = collection.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val adjacency = knnEdges(collection, vecCol, idCol, m)
      .groupBy(col("src"))
      .agg(sort_array(collect_list(struct(col("_r"), col("dst")))).as("_nb"))
      .select(col("src").as("id"),
        transform(col("_nb"), x => x.getField("dst")).as("neighbors"))
    corpus.join(adjacency, Seq("id"))
      .select(lit(0).as("cell_id"), col("id"), col("vec"), col("neighbors"))
      .repartition(1)
      .as[Node]
  }

  /** The M-NN edge relation `(src, dst, _r)` both [[knnGraph]] and
    * [[pageRank]] derive from — ONE definition so the walk oracle, the
    * selectivity spec, and the centrality tier all pin the same graph.
    * All-pairs by construction: bounded slices only (at scale the graph
    * comes from the ANN tiers, not this builder). */
  private[graft] def knnEdges(collection: DataFrame, vecCol: String,
                              idCol: String, m: Int): DataFrame = {
    val corpus = collection.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val pairs = corpus.as("a").join(corpus.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"),
        graft.functions.VectorFunctions.l2Sq(col("a.vec"), col("b.vec")).as("_d"),
        col("b.id").as("dst"))
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("_d"), col("dst"))
    pairs.withColumn("_r", row_number().over(byDist))
      .filter(col("_r") <= m)
      .select("src", "dst", "_r")
  }

  /** In-degree distribution of the M-NN graph — the HUBNESS diagnostic
    * every graph-ANN deployment watches: out-degree is M by
    * construction, but in-degree is data-driven, and a heavy tail
    * (hub vectors half the corpus points at) is exactly what degrades
    * walk recall and concentrates load. One aggregation over the edge
    * relation: per in-degree value, how many nodes have it (nodes
    * nothing points at appear as in-degree 0 via the left join). */
  def degreeStats(collection: DataFrame, vecCol: String, idCol: String,
                  m: Int): DataFrame = {
    val nodes = collection.select(col(idCol).cast("long").as("id"))
    val indeg = knnEdges(collection, vecCol, idCol, m)
      .groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_degree"))
    nodes.join(indeg, Seq("id"), "left")
      .select(coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .groupBy("in_degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("in_degree"))
  }

  /** Connected components of the M-NN graph via iterated min-label
    * propagation over the UNDIRECTED closure (a kNN edge links its
    * endpoints regardless of direction) — the neighborhood-structure
    * audit next to [[pageRank]]: distinct components reveal isolated
    * embedding islands a router or a near-dup pass should know about.
    *
    * Exactly `iters` rounds of `label' = min(label, min over neighbors
    * label)` — after round t every node holds the minimum id within t
    * hops, so with `iters >= diameter` the labels ARE the connected
    * components, and for smaller `iters` the result is still a
    * deterministic, oracle-restatable bounded-hop minimum (no
    * convergence detection to diverge on). Pure min/long arithmetic:
    * order-free, bit-identical at any parallelism.
    *
    * Scale shape: same as [[pageRank]] — slender `(id, label)` joins
    * the edge list per round, map-side partial MIN before one dst-keyed
    * shuffle, lineage truncated per round. (The driver-side union-find
    * in [[Dedup]] serves the bounded-cluster near-dup shape; this is
    * the distributed form for graphs too wide to collect.) */
  def connectedComponents(collection: DataFrame, vecCol: String,
                          idCol: String, m: Int, iters: Int): DataFrame = {
    require(iters >= 1, "at least one propagation round")
    val nodes = collection.select(col(idCol).cast("long").as("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val directed = knnEdges(collection, vecCol, idCol, m).select("src", "dst")
    val edges = directed
      .unionAll(directed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = nodes.withColumn("label", col("id"))
      (1 to iters).foreach { _ =>
        val fromNbrs = edges
          .join(labels.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(min(col("label")).as("_nl"))
        labels = labels.join(fromNbrs, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("_nl"), col("label"))).as("label"))
          .localCheckpoint()
      }
      labels.select(col("id").as(idCol), col("label")).orderBy(col(idCol))
    } finally { nodes.unpersist(); edges.unpersist() }
  }

  /** PageRank centrality over the M-NN graph — the corpus-analytics
    * verb a vector store grows once it holds a graph (hub detection,
    * crawl prioritization, influence-weighted sampling of training
    * data). EXACT integer fixed point so the gate can hash it: ranks
    * live in micro-units (`rank_mu: BIGINT`, 1.0 = 1e6), one iteration
    * is `rank' = (100−d)·1e4 + (d · Σ_in (rank_u div outdeg_u)) div 100`
    * — every step integer division and order-free integer sums, so the
    * result is bit-identical at any parallelism AND in the oracle's
    * unrolled-CTE twin (float PageRank would drift under agg order).
    *
    * Scale shape: per iteration, the slender `(id, rank_mu)` relation
    * joins the edge list on src (ranks are always the small side —
    * 16 bytes/node — so AQE broadcasts them under any realistic node
    * count vs edge count) and partial-aggregates contributions map-side
    * before one shuffle keyed on dst. Lineage is truncated per round
    * (localCheckpoint — the dedup_clusters discipline) so `iters` stays
    * a constant factor, not a plan-depth explosion. */
  def pageRank(collection: DataFrame, vecCol: String, idCol: String,
               m: Int, iters: Int, dampingPct: Int = 85): DataFrame = {
    require(dampingPct > 0 && dampingPct < 100, "dampingPct in (0, 100)")
    require(iters >= 1, "at least one iteration")
    val nodes = collection.select(col(idCol).cast("long").as("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = knnEdges(collection, vecCol, idCol, m)
      .select("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var withOd: DataFrame = null
    try {
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      withOd = edges.join(outdeg, Seq("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val base = (100L - dampingPct) * 10000L // (1−d)·1e6, exact for Scale=1e6
      var ranks = nodes.withColumn("rank_mu", lit(1000000L))
      (1 to iters).foreach { _ =>
        val contrib = withOd
          .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("dst").as("id"),
            expr("rank_mu DIV od").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("s"))
        ranks = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr(s"($dampingPct * coalesce(s, 0L)) DIV 100"))
              .as("rank_mu"))
          .localCheckpoint()
      }
      ranks.select(col("id").as(idCol), col("rank_mu"))
        .orderBy(col("rank_mu").desc, col(idCol))
    } finally {
      nodes.unpersist(); edges.unpersist()
      if (withOd != null) { withOd.unpersist(); () }
    }
  }

  /** Search a graph read back from a cell-partitioned store: the
    * column probe filter lands in PartitionFilters, so only probed
    * cells' files are listed and read — the storage half of the
    * routing tier, same as `ann_ivfsq_store`.
    *
    * The re-colocation repartition is CORRECTNESS, not hygiene: a
    * parquet read partitions by FILE SPLITS, so a cell written as
    * several files (multi-task build, incremental rewrites) or split
    * at `maxPartitionBytes` arrives sliced across tasks — and a beam
    * walk over a PARTIAL cell has dangling adjacency (spec-pinned with
    * an engineered multi-file cell under a tiny split size). Only the
    * probed cells' rows shuffle — nprobe cells, never the collection. */
  def searchStored(stored: DataFrame, cents: Array[Array[Float]],
                   qv: Array[Double], k: Int, nprobe: Int, ef: Int): DataFrame = {
    val sp = stored.sparkSession
    import sp.implicits._
    val probed = Similarity.sqProbeCells(cents, qv, nprobe)
    val colocated = stored
      .filter(col("cell_id").isin(probed.map(Int.box).toIndexedSeq: _*))
      .repartition(math.max(probed.length, 1), col("cell_id"))
    search(colocated.as[Node], cents, qv, k, nprobe, ef)
  }

  /** RETRAIN-AND-REBUILD of a stored graph index — the graph twin of
    * [[Similarity.retrainStoredIvf]], completing the family's lifecycle
    * (build → nightly append → streaming ingest → drift → retrain):
    * retrain the router on the store's OWN content at a (possibly new)
    * geometry, rebuild every cell's NSW graph from scratch, and
    * atomically swap the rewritten layout into place
    * ([[graft.store.VectorStore.replace]] — the compaction-swap
    * discipline). O(collection) by nature, which is exactly why it is a
    * separate scheduled verb: appends stay O(touched cells) and this
    * runs at the cadence drift warrants. The deterministic build
    * (ascending-id insertion, data-defined orderings) makes the result
    * provably equal a from-scratch [[buildGraph]] over the same rows —
    * spec-pinned, and the cell ASSIGNMENT half sits under the gate hash
    * via the geometry-parameterized kmeans oracle. Returns the new
    * centroids — the caller must re-register them (probing with the old
    * router against the new layout would probe the wrong cells). */
  def retrainStored(spark: org.apache.spark.sql.SparkSession,
                    store: graft.store.VectorStore, name: String,
                    ncells: Int = 8, iters: Int = 2, m: Int = 8,
                    efConstruction: Int = 32): Array[Array[Float]] = {
    val data = store.read(spark, name).select(col("id"), col("vec"))
    val (g, cents) = buildGraph(data, "vec", "id", ncells, iters, m,
      efConstruction)
    store.replace(name, g.toDF(), partitionBy = Seq("cell_id"))
    cents
  }

  /** Cost-based FILTERED search over the stored graph — the graph twin
    * of [[Similarity.adaptiveFilteredKnn]]. A graph walk cannot
    * pre-filter (dropping nodes breaks the navigable structure), so the
    * two real plans are:
    *
    *  - '''pre''' (selective filter): skip the walk entirely — score the
    *    survivors EXACTLY with the codegen'd distance over a semi-joined
    *    scan. |survivors| distance evaluations beat any walk when the
    *    filter keeps a sliver of the corpus, and the result is exact
    *    (the fixed-over-fetch shape would need ef ≫ k/selectivity to
    *    even see k survivors);
    *  - '''post''' (broad filter): the published over-fetch shape — the
    *    beam emits its FULL nprobe·ef candidate set, then the filter
    *    and final top-k run relationally over that bounded relation
    *    (selectivity costs recall, never walk correctness).
    *
    * Decision: |allowed| ≤ maxPreFraction · |index| → 'pre'. Both counts
    * are integer jobs the gate oracle replays relationally, so the
    * CHOICE sits under the hash (the `ann_adaptive_prefilter`
    * discipline); the output's `path` column pins which plan ran.
    * `allowed` is a one-column DISTINCT id relation (typically a
    * pushed-down metadata scan). Ranking is the walk's own
    * (floor-rounded dist, id) order in both branches, so the branches
    * compose: on an exhaustive configuration they return identical
    * rows. */
  def adaptiveFilteredSearch(stored: DataFrame, cents: Array[Array[Float]],
                             qv: Array[Double], k: Int, nprobe: Int, ef: Int,
                             allowed: DataFrame,
                             maxPreFraction: Double = 0.05): DataFrame = {
    val ids = allowed.select(col(allowed.columns.head).cast("long").as("_fid"))
    val n = stored.count() // footer-metadata count, no data pages
    val m = ids.count()
    val qf = qv.map(_.toFloat)
    if (m.toDouble <= n * maxPreFraction) {
      stored.join(ids, stored("id") === col("_fid"), "left_semi")
        .select(col("id").as("vec_id"), col("cell_id"),
          (floor(l2Sq(col("vec"), vecLit(qf)) * 1e6 + 0.5) / 1e6).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(k)
        .withColumn("path", lit("pre"))
    } else {
      searchStored(stored, cents, qv, k = nprobe * ef, nprobe, ef)
        .join(ids, col("vec_id") === col("_fid"), "left_semi")
        .orderBy(col("dist"), col("vec_id"))
        .limit(k)
        .withColumn("path", lit("post"))
    }
  }

  /** The walk kernel shared by [[search]] and [[searchWithStats]]:
    * probe, beam-walk each probed cell, emit per-cell candidate rows
    * with observability columns. */
  private def perCellWalk(graph: Dataset[Node], cents: Array[Array[Float]],
                          qv: Array[Double], k: Int, nprobe: Int, ef: Int): DataFrame = {
    val sp = graph.sparkSession
    import sp.implicits._
    val probed = Similarity.sqProbeCells(cents, qv, nprobe)
    val qf = qv.map(_.toFloat)
    // a COLUMN filter, not a typed closure: over a cell-partitioned
    // stored graph this is the partition-pruning probe (the scan lists
    // only probed cells' directories), exactly like the stored-SQ path
    graph
      .filter(col("cell_id").isin(probed.map(Int.box).toIndexedSeq: _*))
      .mapPartitions { it =>
        it.toArray.groupBy(_.cell_id).iterator.flatMap { case (cell, ns) =>
          counters.cellLoads.incrementAndGet()
          val vecs = mutable.LongMap[Array[Float]]()
          val nbs = mutable.LongMap[Array[Long]]()
          ns.foreach { n => vecs(n.id) = n.vec; nbs(n.id) = n.neighbors }
          val entry = ns.iterator.map(_.id).min
          counters.beamWalks.incrementAndGet()
          val (top, evals) = beamSearch(vecs(_), nbs(_).toSeq, entry, qf, ef)
          top.take(k).iterator.map { case (d, id) =>
            (cell, id, d, ns.length, evals)
          }
        }
      }
      .toDF("cell_id", "vec_id", "_d", "n_nodes", "n_evals")
  }

  private def hitsOf(perCell: DataFrame, k: Int): DataFrame = perCell
    .withColumn("dist", floor(col("_d") * 1e6 + 0.5) / 1e6)
    .select(col("vec_id"), col("cell_id"), col("dist"))
    .orderBy(col("dist"), col("vec_id"))
    .limit(k)

  /** Search: probe the `nprobe` nearest cells (same floor-rounded
    * lowest-cid-tie selection as the stored-SQ probe), beam-walk each
    * probed cell's graph, merge to a global top-k. Returns
    * (vec_id, cell_id, dist) with the repo's 6-decimal floor rounding.
    * Single lazy output, plan fully introspectable (the stored-layout
    * pruning spec reads the FileSourceScanExec off it); callers who
    * also want the walk stats use [[searchWithStats]], which pays a
    * lazy checkpoint so both outputs share ONE walk execution.
    *
    * PRECONDITION: every cell's rows are whole within one task
    * partition — true for [[buildGraph]]'s output (repartitioned on
    * cell) and for [[searchStored]] (which re-colocates); a caller
    * handing in an arbitrarily-partitioned Dataset must repartition on
    * cell_id first, or a partial cell walks with dangling adjacency. */
  def search(graph: Dataset[Node], cents: Array[Array[Float]],
             qv: Array[Double], k: Int, nprobe: Int, ef: Int): DataFrame =
    hitsOf(perCellWalk(graph, cents, qv, k, nprobe, ef), k)

  /** [[search]] plus per-cell (n_nodes, n_evals) observability stats.
    * Both frames derive from ONE lazily-checkpointed walk plan: the
    * checkpoint materializes on the first action and the second
    * consumer reads the k·nprobe-row blocks instead of re-executing
    * the graph build + beam walk (single execution pinned on
    * [[counters]] in AnnProbeSpec — the silent double-walk was a real
    * footgun for any caller reading both). */
  def searchWithStats(graph: Dataset[Node], cents: Array[Array[Float]],
                      qv: Array[Double], k: Int, nprobe: Int, ef: Int):
      (DataFrame, DataFrame) = {
    val perCell = perCellWalk(graph, cents, qv, k, nprobe, ef).localCheckpoint(false)
    (hitsOf(perCell, k), perCell.select("cell_id", "n_nodes", "n_evals").distinct())
  }

  /** PROBE-DERIVATION report — the oracle-able HALF of a graph search,
    * factored out so the gate tier can hash-pin everything around the
    * beam: which cells the router probed and in what order (the
    * [[Similarity.sqProbeCells]] arithmetic — SQL-restatable through
    * the kmeans twin), each probed cell's population, and how many
    * candidates the walk EMITTED per cell (= min(k, reachable) — a
    * de-facto connectivity pin: an NSW cell whose insertion build left
    * part of the graph unreachable under-emits and hash-fails). Only
    * the BEAM ORDER itself (which k of the cell surface, `n_evals`)
    * stays rows-only, exactly the irreducible approximate part.
    * Returns (probe_rank, cell_id, n_nodes, n_emitted, n_evals). */
  def probeReport(graph: Dataset[Node], cents: Array[Array[Float]],
                  qv: Array[Double], k: Int, nprobe: Int, ef: Int): DataFrame = {
    val sp = graph.sparkSession
    import sp.implicits._
    val probed = Similarity.sqProbeCells(cents, qv, nprobe)
    val ranks = probed.zipWithIndex
      .map { case (c, r) => (c, r) }.toSeq.toDF("cell_id", "probe_rank")
    perCellWalk(graph, cents, qv, k, nprobe, ef)
      .groupBy("cell_id", "n_nodes", "n_evals")
      .agg(count(lit(1)).as("n_emitted"))
      .join(broadcast(ranks), Seq("cell_id")) // <= nprobe rows
      .select(col("probe_rank").cast("int"), col("cell_id").cast("int"),
        col("n_nodes").cast("long").as("n_nodes"),
        col("n_emitted"), col("n_evals").cast("long").as("n_evals"))
      .orderBy("probe_rank")
  }

  /** Batch-query search — Chroma's `query(query_texts=[...])` shape
    * (/root/reference/src/PDFToChromaIngester.py:229-231) over the graph
    * index, aligned with the relational ANN batch APIs
    * ([[Similarity.ivfTopK]], [[graft.query.Knn.searchMany]]): takes a
    * queries RELATION (qid, qvec) and amortizes one walk-structure load
    * per (cell, batch) across every query probing that cell — a loop of
    * single [[search]] calls re-loads the probed cells once PER QUERY.
    *
    * Shape: probe assignment is a map-only explode over the queries
    * (same floor-rounded lowest-cid arithmetic as the single-query
    * probe); the probed (qid, qvec, cell_id) rows UNION into the node
    * relation and co-partition with it on cell_id — so each task holds
    * its cells' nodes AND the queries probing them, with no driver-side
    * query collect and no broadcast cap on batch size. The only bounded
    * collect is the distinct probed-cell list (≤ ncells rows) that
    * keeps the stored-layout scan partition-pruned. Per-query results
    * equal N single-query runs (spec-pinned), ranked by the same
    * (dist, vec_id) order.
    *
    * Works directly over a stored read ([[searchManyStored]]): the
    * repartition below IS the re-colocation the stored walk needs. */
  def searchMany(graph: Dataset[Node], cents: Array[Array[Float]],
                 queries: DataFrame, qIdCol: String, qVecCol: String,
                 k: Int, nprobe: Int, ef: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    perCellWalkMany(graph, cents, queries, qIdCol, qVecCol, k, nprobe, ef)
      .withColumn("dist", floor(col("_d") * 1e6 + 0.5) / 1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cell_id"), col("dist"), col("rank"))
  }

  /** The shared per-(query, cell) walk relation of the batch path —
    * [[searchMany]]'s kernel, factored so [[probeReportMany]] can
    * aggregate the SAME execution's emissions instead of modeling them.
    * Emits (qid, probe_rank, cell_id, vec_id, _d, n_nodes, n_evals):
    * up to k candidate rows per (query, probed non-empty cell), each
    * carrying the cell's population and the walk's eval count. */
  private[graft] def perCellWalkMany(graph: Dataset[Node],
                                     cents: Array[Array[Float]],
                                     queries: DataFrame, qIdCol: String,
                                     qVecCol: String,
                                     k: Int, nprobe: Int, ef: Int): DataFrame = {
    val sp = graph.sparkSession
    import sp.implicits._
    val probeUdf = udf((v: Seq[Float]) =>
      Similarity.sqProbeCells(cents, v.map(_.toDouble).toArray, nprobe))
    // EAGER checkpoint: the probe projection is consumed twice (the
    // touched-cells collect below AND the union into the node relation)
    // — without it the probe UDF and the whole upstream queries plan
    // re-execute per consumer. Bounded: Q·nprobe slim rows.
    val probes = queries.select(col(qIdCol).cast("long").as("qid"),
      col(qVecCol).cast("array<float>").as("qvec"),
      posexplode(probeUdf(col(qVecCol))).as(Seq("probe_rank", "cell_id")))
      .localCheckpoint(true)
    // bounded collect: at most ncells distinct cells across the batch —
    // the literal IN list is what lands in PartitionFilters on a stored
    // layout (a join-based restriction would not prune partitions)
    val touched = probes.select("cell_id").distinct()
      .collect().map(_.getInt(0)).sorted
    val nodeRows = graph.toDF()
      .filter(col("cell_id").isin(touched.map(Int.box).toIndexedSeq: _*))
      .select(col("cell_id"), lit(false).as("is_q"), col("id"),
        col("vec"), col("neighbors"), lit(0L).as("qid"),
        lit(0).as("probe_rank"))
    val qRows = probes.select(col("cell_id"), lit(true).as("is_q"),
      lit(0L).as("id"), col("qvec").as("vec"),
      lit(null).cast("array<bigint>").as("neighbors"), col("qid"),
      col("probe_rank"))
    nodeRows.unionByName(qRows)
      .repartition(math.max(touched.length, 1), col("cell_id"))
      .as[(Int, Boolean, Long, Array[Float], Array[Long], Long, Int)]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (cell, rows) =>
          val (qs, ns) = rows.partition(_._2)
          if (ns.isEmpty || qs.isEmpty) Iterator.empty // empty cell / no probes
          else {
            counters.cellLoads.incrementAndGet()
            val vecs = mutable.LongMap[Array[Float]]()
            val nbs = mutable.LongMap[Array[Long]]()
            ns.foreach { n => vecs(n._3) = n._4; nbs(n._3) = n._5 }
            val entry = ns.iterator.map(_._3).min
            val nNodes = ns.length.toLong
            qs.sortBy(_._6).iterator.flatMap { q =>
              counters.beamWalks.incrementAndGet()
              val (top, evals) = beamSearch(vecs(_), nbs(_).toSeq, entry, q._4, ef)
              top.take(k).iterator.map { case (d, id) =>
                (q._6, q._7, cell, id, d, nNodes, evals.toLong)
              }
            }
          }
        }
      }
      .toDF("qid", "probe_rank", "cell_id", "vec_id", "_d", "n_nodes", "n_evals")
  }

  /** PROBE-DERIVATION report for the BATCH walk — [[probeReport]]'s
    * shape per query over [[searchMany]]'s co-partitioned execution
    * (same probe assignment UDF, same union + repartition, same beam):
    * for every (query, probed non-empty cell), the probe rank, the
    * cell's population, and how many candidates the walk EMITTED
    * (= min(k, reachable) — the connectivity pin: an insertion build
    * that strands part of a cell under-emits and hash-fails). Only the
    * beam's choice of WHICH k and `n_evals` stay rows-only — the
    * irreducible approximate part, excluded by the gate's projection
    * exactly as in the single-query anchor. */
  def probeReportMany(graph: Dataset[Node], cents: Array[Array[Float]],
                      queries: DataFrame, qIdCol: String, qVecCol: String,
                      k: Int, nprobe: Int, ef: Int): DataFrame =
    perCellWalkMany(graph, cents, queries, qIdCol, qVecCol, k, nprobe, ef)
      .groupBy("qid", "probe_rank", "cell_id", "n_nodes", "n_evals")
      .agg(count(lit(1)).as("n_emitted"))
      .select(col("qid"), col("probe_rank").cast("int"),
        col("cell_id").cast("int"), col("n_nodes"), col("n_emitted"),
        col("n_evals"))
      .orderBy("qid", "probe_rank")

  /** [[searchMany]] over a cell-partitioned stored read — the probe IN
    * filter prunes partitions and the batch repartition re-colocates
    * sliced cells, exactly as [[searchStored]] does for one query. */
  def searchManyStored(stored: DataFrame, cents: Array[Array[Float]],
                       queries: DataFrame, qIdCol: String, qVecCol: String,
                       k: Int, nprobe: Int, ef: Int): DataFrame = {
    val sp = stored.sparkSession
    import sp.implicits._
    searchMany(stored.as[Node], cents, queries, qIdCol, qVecCol, k, nprobe, ef)
  }
}
