package graft.operators

/** Two-level centroid ROUTER for large-`ncells` IVF/graph indexes — the
  * 100 TB headroom for the routing tier.
  *
  * Below the gate (the common case: ncells ≤ a few thousand), the flat
  * forms are optimal and stay untouched: assignment carries the
  * centroid array in the task closure and argmins linearly
  * ([[Similarity.withCellId]]); probe selection is a driver-side linear
  * scan ([[Similarity.sqProbeCells]]). At 10⁵–10⁶ cells both break
  * down: the closure serializes 100s of MB PER TASK, and every query
  * pays an O(ncells·dim) driver scan.
  *
  * Above the gate, the SAME deterministic quantizer discipline is
  * applied to the centroid set itself: the ncells centroids are
  * clustered driver-side into G ≈ √ncells coarse groups (residue-class
  * seeds over slot order + Lloyd rounds — single-threaded, so
  * deterministic by construction), and
  *
  *  - '''assignment''' = argmin over the nearest coarse group's members
  *    (O(G + ncells/G) per row instead of O(ncells)), with the router
  *    shipped as a TorrentBroadcast — one copy per executor, a
  *    bounded handle per task closure;
  *  - '''probe selection''' = coarse-rank the groups, collect members
  *    group-by-group until `fanout·nprobe` candidates, fine-rank those —
  *    O(G + fanout·nprobe·(ncells/G)) per query.
  *
  * Routing above the gate is APPROXIMATE in the standard IVF sense —
  * a boundary vector may assign to a near-optimal rather than the
  * globally nearest cell — but it is SELF-CONSISTENT: build and probe
  * use the identical coarse rule, so a query at a stored vector's
  * position always reaches that vector's cell first (spec-pinned).
  * Small-ncells answers are unchanged by construction (gate off ⇒ flat
  * path). Beyond ~10⁵ cells the driver-side Lloyd itself grows
  * quadratic-ish (O(ncells·G·iters)); the next tier is an index over
  * the centroids (HNSW-style coarse quantizer), documented here as the
  * follow-on, not built — no current corpus exercises it.
  *
  * Routers memoize per centroid-array identity (weak keys): an index's
  * frozen router array builds its two-level structure once per JVM. */
object CentroidRouter {

  /** Cell-count gate: flat routing below, two-level at or above. */
  val DefaultGate = 4096

  final class Router(val cents: Array[(Int, Array[Float])],
                     val coarse: Array[Array[Float]],
                     val groups: Array[Array[Int]]) extends Serializable {

    private def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }

    /** (distance, group index) ranking of the coarse tier — lowest
      * index wins ties, mirroring the flat argmin's lowest-cid rule. */
    private def coarseOrder(v: Array[Float]): Array[Int] =
      coarse.indices.map(g => (l2(v, coarse(g)), g)).sortBy(identity)
        .map(_._2).toArray

    /** Two-level assignment: argmin over the nearest coarse group's
      * members. Comparisons: G + |group| (counted, spec-pinned). */
    def assign(v: Array[Float]): Int = {
      val g = {
        var best = -1
        var bestD = Double.MaxValue
        var i = 0
        while (i < coarse.length) {
          val d = l2(v, coarse(i))
          if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        best
      }
      var best = -1
      var bestD = Double.MaxValue
      val members = groups(g)
      var j = 0
      while (j < members.length) {
        val (cid, cv) = cents(members(j))
        val d = l2(v, cv)
        if (d < bestD) { bestD = d; best = cid }
        j += 1
      }
      comparisons.addAndGet(coarse.length + members.length)
      best
    }

    /** Two-level probe selection: coarse-rank the groups, collect
      * members until `fanout·nprobe` candidates (or exhaustion),
      * fine-rank with the flat rule's (floor-rounded dist, cid) order. */
    def probe(qv: Array[Double], nprobe: Int, fanout: Int = 4): Array[Int] = {
      val qf = qv.map(_.toFloat)
      val order = coarseOrder(qf)
      val want = math.max(nprobe, fanout * nprobe)
      val cand = scala.collection.mutable.ArrayBuffer[Int]()
      var gi = 0
      while (gi < order.length && cand.length < want) {
        cand ++= groups(order(gi)); gi += 1
      }
      comparisons.addAndGet(coarse.length + cand.length)
      cand.toArray.map { slot =>
        val (cid, cv) = cents(slot)
        var acc = 0.0
        var i = 0
        val n = math.min(qv.length, cv.length)
        while (i < n) { val d = qv(i) - cv(i).toDouble; acc += d * d; i += 1 }
        (math.floor(acc * 1e6 + 0.5) / 1e6, cid)
      }.sortBy(identity).take(nprobe).map(_._2)
    }

    /** Process-local distance-comparison counter (observability; the
      * bounded-work spec pins per-call comparisons ≪ ncells). */
    val comparisons = new java.util.concurrent.atomic.AtomicLong
  }

  /** Deterministic driver-side build: residue-class seeds over SLOT
    * order (the same init rule as [[Clustering.initCentroids]], applied
    * to slots), `iters` Lloyd rounds with slot-order double accumulation
    * (single-threaded ⇒ order-fixed ⇒ deterministic), empty groups keep
    * their previous coarse centroid and drop out of the group table. */
  def build(sortedCents: Array[(Int, Array[Float])], g: Int,
            iters: Int = 2): Router = {
    require(sortedCents.nonEmpty, "empty centroid set")
    val k = math.max(1, math.min(g, sortedCents.length))
    val dim = sortedCents.head._2.length
    var coarse = Array.tabulate(k)(i => sortedCents(i)._2.clone())
    def assignAll(): Array[Int] = sortedCents.map { case (_, v) =>
      var best = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < k) {
        var acc = 0.0
        var j = 0
        while (j < dim) { val d = v(j).toDouble - coarse(i)(j); acc += d * d; j += 1 }
        if (acc < bestD) { bestD = acc; best = i }
        i += 1
      }
      best
    }
    var asg = assignAll()
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val ns = new Array[Long](k)
      sortedCents.indices.foreach { s =>
        val a = asg(s); ns(a) += 1
        val v = sortedCents(s)._2
        var j = 0
        while (j < dim) { sums(a)(j) += v(j).toDouble; j += 1 }
      }
      coarse = Array.tabulate(k)(i =>
        if (ns(i) == 0) coarse(i)
        else Array.tabulate(dim)(j => (sums(i)(j) / ns(i)).toFloat))
      asg = assignAll()
    }
    val groups = Array.tabulate(k)(i =>
      sortedCents.indices.filter(asg(_) == i).toArray)
    // re-point empty groups' coarse centroids far away? No — they keep
    // members.isEmpty and contribute zero candidates; assignment to an
    // empty group cannot happen (its coarse centroid only survives from
    // a seed that lost all members — the member's OWN group is nearer
    // by the Lloyd update)... except in adversarial ties; guard anyway:
    // route an empty-group assignment through the nearest NON-empty
    // group by dropping empties from both tiers.
    val live = groups.indices.filter(groups(_).nonEmpty).toArray
    new Router(sortedCents, live.map(coarse(_)), live.map(groups(_)))
  }

  // Router memo keyed on frozen-array IDENTITY. NOT a WeakHashMap: the
  // Router holds its centroid array (it must — executors score against
  // it), so a weak-keyed map's value would strongly reference its own
  // key and no entry could ever be collected — the classic value→key
  // leak. A small LRU bounds the footprint instead; eviction just means
  // a deterministic rebuild on next use.
  private val MemoCap = 16
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[AnyRef, Router](MemoCap, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, Router]): Boolean = size() > MemoCap
    })

  /** The memoized router for a (sorted) centroid array. */
  def routerFor(sortedCents: Array[(Int, Array[Float])]): Router = {
    val got = memo.get(sortedCents)
    if (got != null) got
    else {
      val r = build(sortedCents, math.max(1, math.sqrt(sortedCents.length.toDouble).toInt))
      memo.put(sortedCents, r)
      r
    }
  }

  /** Memoized router for a centroid array in ANY slot order: keyed on
    * the CALLER's array identity (the value is built from the sorted
    * form, so the router itself is order-independent). This is the
    * assignment-path entry — [[Similarity.withCellId]] sorts its input
    * into a FRESH array per call, so keying on the sorted array would
    * never hit and every build/append/micro-batch above the gate would
    * repeat the O(ncells·√ncells·iters·dim) driver-side Lloyd build. */
  def routerForAnyOrder(cents: Array[(Int, Array[Float])]): Router = {
    val got = memo.get(cents)
    if (got != null) got
    else {
      val sorted = cents.sortBy(_._1)
      val r = build(sorted, math.max(1, math.sqrt(sorted.length.toDouble).toInt))
      memo.put(cents, r)
      r
    }
  }

  /** Memoized router for the slot-indexed form ([[Similarity.sqProbeCells]]'
    * plain centroid array — slot == cell id): keyed on the RAW array's
    * identity so repeated probes over one frozen router build once. */
  def routerForSlots(cents: Array[Array[Float]]): Router = {
    val got = memo.get(cents)
    if (got != null) got
    else {
      val r = build(cents.zipWithIndex.map { case (c, j) => (j, c) },
        math.max(1, math.sqrt(cents.length.toDouble).toInt))
      memo.put(cents, r)
      r
    }
  }
}
