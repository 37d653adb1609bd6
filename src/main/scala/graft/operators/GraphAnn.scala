package graft.operators

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
  private def beamSearch(vecOf: Long => Array[Float],
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
  private def buildCell(cell: Int, members: Array[(Long, Array[Float])],
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
    * NSW inside its partition. Returns (graph, centroids). */
  def buildGraph(collection: DataFrame, vecCol: String, idCol: String,
                 ncells: Int = 8, iters: Int = 2, m: Int = 8,
                 efConstruction: Int = 32,
                 centroids: Option[Array[Array[Float]]] = None): (Dataset[Node], Array[Array[Float]]) = {
    val sp = collection.sparkSession
    import sp.implicits._
    // pre-trained centroids let the caller train the router on the FULL
    // collection while building the graph over a filtered slice (the
    // query holds its probe vector out of the graph but not the router)
    val cents = centroids.getOrElse(
      Clustering.trainCentroids(collection, ncells, iters, idCol, vecCol))
    val assigned = collection
      .withColumn("_a", Clustering.assignStruct(col(vecCol), cents))
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"),
        col("_a").getField("cid").as("cell_id"))
      .repartition(ncells, col("cell_id"))
      .as[(Long, Array[Float], Int)]
    val graph = assigned.mapPartitions { it =>
      it.toArray.groupBy(_._3).iterator.flatMap { case (cell, rows) =>
        buildCell(cell, rows.map(r => (r._1, r._2)), m, efConstruction)
      }
    }
    (graph, cents)
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
    * incremental operator here); re-inserting an existing id would
    * leave two nodes with that id in the rebuilt cell. */
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
    // bounded collect: at most ncells rows
    val touched = assigned.select("cell_id").distinct()
      .collect().map(_.getInt(0)).sorted
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
    store.overwritePartitions(name, rebuilt.toDF(), Seq("cell_id"))
    touched.toSeq
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
                   qv: Array[Double], k: Int, nprobe: Int, ef: Int):
      (DataFrame, DataFrame) = {
    val sp = stored.sparkSession
    import sp.implicits._
    val probed = Similarity.sqProbeCells(cents, qv, nprobe)
    val colocated = stored
      .filter(col("cell_id").isin(probed.map(Int.box).toIndexedSeq: _*))
      .repartition(math.max(probed.length, 1), col("cell_id"))
    search(colocated.as[Node], cents, qv, k, nprobe, ef)
  }

  /** Search: probe the `nprobe` nearest cells (same floor-rounded
    * lowest-cid-tie selection as the stored-SQ probe), beam-walk each
    * probed cell's graph, merge to a global top-k. Returns
    * (vec_id, cell_id, dist) with the repo's 6-decimal floor rounding,
    * plus per-cell (n_nodes, n_evals) stats for observability.
    *
    * PRECONDITION: every cell's rows are whole within one task
    * partition — true for [[buildGraph]]'s output (repartitioned on
    * cell) and for [[searchStored]] (which re-colocates); a caller
    * handing in an arbitrarily-partitioned Dataset must repartition on
    * cell_id first, or a partial cell walks with dangling adjacency. */
  def search(graph: Dataset[Node], cents: Array[Array[Float]],
             qv: Array[Double], k: Int, nprobe: Int, ef: Int):
      (DataFrame, DataFrame) = {
    val sp = graph.sparkSession
    import sp.implicits._
    val probed = Similarity.sqProbeCells(cents, qv, nprobe)
    val qf = qv.map(_.toFloat)
    // a COLUMN filter, not a typed closure: over a cell-partitioned
    // stored graph this is the partition-pruning probe (the scan lists
    // only probed cells' directories), exactly like the stored-SQ path
    val perCell = graph
      .filter(col("cell_id").isin(probed.map(Int.box).toIndexedSeq: _*))
      .mapPartitions { it =>
        it.toArray.groupBy(_.cell_id).iterator.flatMap { case (cell, ns) =>
          val vecs = mutable.LongMap[Array[Float]]()
          val nbs = mutable.LongMap[Array[Long]]()
          ns.foreach { n => vecs(n.id) = n.vec; nbs(n.id) = n.neighbors }
          val entry = ns.iterator.map(_.id).min
          val (top, evals) = beamSearch(vecs(_), nbs(_).toSeq, entry, qf, ef)
          top.take(k).iterator.map { case (d, id) =>
            (cell, id, d, ns.length, evals)
          }
        }
      }
      .toDF("cell_id", "vec_id", "_d", "n_nodes", "n_evals")
    val hits = perCell
      .withColumn("dist", floor(col("_d") * 1e6 + 0.5) / 1e6)
      .select(col("vec_id"), col("cell_id"), col("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
    val stats = perCell.select("cell_id", "n_nodes", "n_evals").distinct()
    (hits, stats)
  }
}
