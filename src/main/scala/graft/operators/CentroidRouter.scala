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
  * path).
  *
  * '''Third tier (ncells ≥ [[LshGate]])''': beyond ~10⁵ cells the
  * two-level build ITSELF is the cliff — its driver-side Lloyd is
  * O(ncells·√ncells·iters·dim), ~10¹¹ flops at 10⁶ cells. The third
  * tier is an LSH BUCKET INDEX OVER THE CENTROIDS ([[LshRouter]]) in
  * the E2LSH style (quantized projections — POSITION-sensitive, which
  * an L2 router needs; sign-LSH would bucket by direction only):
  * deterministic sparse ±1 projections (splitmix64-seeded, fixed
  * table/axis/dim order) quantized at a data-derived width hash every
  * centroid into `Tables` bucket maps — an O(ncells·Tables·Axes·dim/4)
  * LINEAR build (~10⁹ flops at 10⁶ cells, two orders cheaper than the
  * Lloyd) — and a query's candidate pool is the union of its own
  * buckets plus every single-axis ±1 NEIGHBOR bucket (standard
  * multiprobe, unconditional so near-boundary neighbors are never
  * bucket luck), fine-ranked with the flat rule's (floor-rounded dist,
  * cid) order. The per-axis bucket count scales as
  * (ncells/64)^(1/Axes), so expected candidates stay ~constant per
  * bucket and probe selection stays SUBLINEAR as ncells grows. Same
  * self-consistency argument as the two-level tier: assignment and
  * probe share one candidate-generation rule, so a query at a stored
  * vector reaches that vector's cell first. The memoized entry points
  * pick the tier by cell count; everything below [[LshGate]] is
  * byte-identical to before.
  *
  * Routers memoize per centroid-array identity (weak keys): an index's
  * frozen router array builds its structure once per JVM. */
object CentroidRouter {

  /** Cell-count gate: flat routing below, two-level at or above. */
  val DefaultGate = 4096

  /** Third-tier gate: at or above this cell count the memoized entry
    * points build the linear-time [[LshRouter]] instead of paying the
    * two-level Lloyd's O(ncells^1.5). */
  val LshGate = 65536

  /** The routing surface every tier implements — callers (assignment
    * UDFs, probe selection) are tier-blind. */
  sealed trait Tiered extends Serializable {
    /** The routed (cid, centroid) set, ascending cid. */
    def cents: Array[(Int, Array[Float])]
    def assign(v: Array[Float]): Int
    def probe(qv: Array[Double], nprobe: Int, fanout: Int = 4): Array[Int]
    /** Process-local distance-comparison counter (observability; the
      * bounded-work specs pin per-call comparisons ≪ ncells). */
    val comparisons = new java.util.concurrent.atomic.AtomicLong
  }

  final class Router(val cents: Array[(Int, Array[Float])],
                     val coarse: Array[Array[Float]],
                     val groups: Array[Array[Int]]) extends Tiered {

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
  }

  /** The third tier: E2LSH-style buckets over the centroid set (see
    * class doc).
    *
    * Hash family: `Tables` independent tables of `Axes` sparse ±1
    * projections (components from splitmix64 — pure integer arithmetic,
    * bit-identical on every JVM — at density 1/4). Per (table, axis)
    * the projection quantizes at width `w = span/B` derived from the
    * centroid set itself (deterministic), B scaling as
    * (ncells/64)^(1/Axes) so buckets stay ~64 deep at any scale. A
    * table key packs the `Axes` quantized coordinates into one Long.
    *
    * Candidate generation (ONE rule shared by assign and probe — the
    * self-consistency seam): the query's own bucket in every table,
    * plus every single-axis ±1 neighbor bucket — UNCONDITIONAL
    * multiprobe (2·Axes·Tables extra map lookups), so a true neighbor
    * one quantization boundary away is never lost to bucket luck. If
    * the pool still comes up empty (adversarially sparse sets), fall
    * back to the full slot range — never wrong, just slow. Fine ranking
    * is the flat rule: raw-double argmin for assignment (ascending-slot
    * scan + strict < = lowest-cid ties), (floor-rounded dist, cid) sort
    * for probe. */
  final class LshRouter(val cents: Array[(Int, Array[Float])],
                        tables: Array[java.util.HashMap[Long, Array[Int]]],
                        widths: Array[Array[Double]],
                        dim: Int) extends Tiered {
    import LshRouter.{Axes, Tables, project}

    /** Structurally wrong-dimensioned probes are TOLERATED (flat-tier
      * parity: zero-pad short, truncate long — spec-pinned) but must
      * stay OBSERVABLE (r15 ADVICE: silent absorption turns a data-
      * shape bug into plausible-but-meaningless neighbors): every
      * mismatched-length probe counts here, and the first one per
      * router logs. [[assign]] — the index-BUILD path, where a shape
      * bug corrupts the layout rather than one answer — asserts
      * instead. */
    val dimMismatches = new java.util.concurrent.atomic.AtomicLong
    private def noteMismatch(got: Int): Unit =
      if (dimMismatches.getAndIncrement() == 0L)
        System.err.println(s"[graft] LshRouter: probe vector length $got " +
          s"!= router dim $dim — padded/truncated (counted in dimMismatches)")

    /** The query's quantized coordinate per (table, axis). */
    private def coords(v: Array[Float], t: Int): Array[Long] =
      Array.tabulate(Axes) { a =>
        math.floor(project(v, t, a, dim) / widths(t)(a)).toLong
      }

    /** Deterministic candidate pool (ascending slot order). */
    private def candidates(v: Array[Float]): Array[Int] = {
      val pool = new java.util.TreeSet[Integer]()
      def addBucket(t: Int, key: Long): Unit = {
        val hit = tables(t).get(key)
        if (hit != null) {
          var i = 0
          while (i < hit.length) { pool.add(hit(i)); i += 1 }
        }
      }
      var t = 0
      while (t < Tables) {
        val c = coords(v, t)
        addBucket(t, LshRouter.pack(c))
        // unconditional single-axis ±1 multiprobe
        var a = 0
        while (a < Axes) {
          val keep = c(a)
          c(a) = keep - 1; addBucket(t, LshRouter.pack(c))
          c(a) = keep + 1; addBucket(t, LshRouter.pack(c))
          c(a) = keep
          a += 1
        }
        t += 1
      }
      if (!pool.isEmpty) {
        val out = new Array[Int](pool.size)
        val it = pool.iterator()
        var i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        out
      } else cents.indices.toArray // exhaustive fallback — never wrong, just slow
    }

    def assign(v: Array[Float]): Int = {
      require(v.length == dim,
        s"LshRouter.assign: vector length ${v.length} != router dim $dim — " +
          "a build-path shape bug must fail loudly, not mis-route the layout")
      val cand = candidates(v)
      var best = -1
      var bestD = Double.MaxValue
      var i = 0
      while (i < cand.length) {
        val (cid, cv) = cents(cand(i))
        var acc = 0.0
        var j = 0
        while (j < dim) { val d = v(j).toDouble - cv(j).toDouble; acc += d * d; j += 1 }
        if (acc < bestD) { bestD = acc; best = cid } // strict < : lowest slot/cid wins ties
        i += 1
      }
      comparisons.addAndGet(Tables.toLong * (1 + 2 * Axes) + cand.length)
      best
    }

    def probe(qv: Array[Double], nprobe: Int, fanout: Int = 4): Array[Int] = {
      val qf = new Array[Float](dim)
      var i = 0
      // length-mismatch tolerance matches the flat tier's fine-rank rule
      // (min-length loop): a short query zero-pads, a long one truncates
      if (qv.length != dim) noteMismatch(qv.length)
      val nCopy = math.min(qv.length, dim)
      while (i < nCopy) { qf(i) = qv(i).toFloat; i += 1 }
      val cand = candidates(qf)
      comparisons.addAndGet(Tables.toLong * (1 + 2 * Axes) + cand.length)
      cand.map { slot =>
        val (cid, cv) = cents(slot)
        var acc = 0.0
        var j = 0
        val n = math.min(qv.length, cv.length)
        while (j < n) { val d = qv(j) - cv(j).toDouble; acc += d * d; j += 1 }
        (math.floor(acc * 1e6 + 0.5) / 1e6, cid)
      }.sortBy(identity).take(nprobe).map(_._2)
    }
  }

  object LshRouter {
    val Tables = 6
    val Axes = 3

    /** splitmix64 — the fixed integer mixer behind the projections. */
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    /** Component of projection (table, axis) at dimension j: +1/-1 with
      * probability 1/8 each, else 0 — sparse, deterministic, identical
      * on every JVM (pure integer arithmetic). */
    private def component(t: Int, a: Int, j: Int): Int = {
      val h = mix((t.toLong << 40) ^ (a.toLong << 20) ^ j.toLong)
      (h & 7L) match {
        case 0L => 1
        case 1L => -1
        case _ => 0
      }
    }

    /** Sparse projection of `v` onto axis (t, a) — fixed ascending-j
      * double accumulation. */
    private[CentroidRouter] def project(v: Array[Float], t: Int, a: Int,
                                        dim: Int): Double = {
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val c = component(t, a, j)
        if (c != 0) acc += c * v(j).toDouble
        j += 1
      }
      acc
    }

    /** Pack `Axes` quantized coordinates into one Long key (21 bits
      * each, offset-shifted — coordinates far outside that range would
      * alias, which only merges buckets: correctness is unaffected,
      * candidates just widen). */
    private[CentroidRouter] def pack(c: Array[Long]): Long = {
      var key = 0L
      var a = 0
      while (a < c.length) {
        key = (key << 21) | ((c(a) + (1L << 20)) & ((1L << 21) - 1))
        a += 1
      }
      key
    }

    /** Linear-time build: project every centroid, derive per-(table,
      * axis) quantization widths from the projection spans (B buckets
      * per axis, B ~ (ncells/64)^(1/Axes)), hash into bucket maps.
      * O(ncells · Tables · Axes · dim/4) flops — no Lloyd. */
    def build(sortedCents: Array[(Int, Array[Float])]): LshRouter = {
      require(sortedCents.nonEmpty, "empty centroid set")
      val n = sortedCents.length
      val dim = sortedCents.head._2.length
      val buckets = math.max(8.0, math.pow(n / 64.0, 1.0 / Axes))
      // one projection pass, kept: spans first, then keys
      val projs = Array.ofDim[Double](Tables, Axes, n)
      var s = 0
      while (s < n) {
        val v = sortedCents(s)._2
        var t = 0
        while (t < Tables) {
          var a = 0
          while (a < Axes) { projs(t)(a)(s) = project(v, t, a, dim); a += 1 }
          t += 1
        }
        s += 1
      }
      val widths = Array.tabulate(Tables, Axes) { (t, a) =>
        val p = projs(t)(a)
        var lo = Double.MaxValue
        var hi = Double.MinValue
        var i = 0
        while (i < n) { if (p(i) < lo) lo = p(i); if (p(i) > hi) hi = p(i); i += 1 }
        math.max((hi - lo) / buckets, 1e-9)
      }
      val tables = Array.fill(Tables)(
        new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Int]]())
      s = 0
      while (s < n) {
        var t = 0
        while (t < Tables) {
          val c = Array.tabulate(Axes) { a =>
            math.floor(projs(t)(a)(s) / widths(t)(a)).toLong
          }
          tables(t).computeIfAbsent(pack(c),
            _ => scala.collection.mutable.ArrayBuffer[Int]()) += s
          t += 1
        }
        s += 1
      }
      val frozen = tables.map { m =>
        val out = new java.util.HashMap[Long, Array[Int]](m.size())
        m.forEach((k, v) => out.put(k, v.toArray): Unit)
        out
      }
      new LshRouter(sortedCents, frozen, widths, dim)
    }
  }

  /** Tier choice for the memoized entry points: linear-build LSH at or
    * above [[LshGate]], two-level Lloyd otherwise. */
  private def buildTiered(sorted: Array[(Int, Array[Float])]): Tiered =
    if (sorted.length >= LshGate) LshRouter.build(sorted)
    else build(sorted, math.max(1, math.sqrt(sorted.length.toDouble).toInt))

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
    new java.util.LinkedHashMap[AnyRef, Tiered](MemoCap, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, Tiered]): Boolean = size() > MemoCap
    })

  /** The memoized router for a (sorted) centroid array. */
  def routerFor(sortedCents: Array[(Int, Array[Float])]): Tiered = {
    val got = memo.get(sortedCents)
    if (got != null) got
    else {
      val r = buildTiered(sortedCents)
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
  def routerForAnyOrder(cents: Array[(Int, Array[Float])]): Tiered = {
    val got = memo.get(cents)
    if (got != null) got
    else {
      val r = buildTiered(cents.sortBy(_._1))
      memo.put(cents, r)
      r
    }
  }

  /** Memoized router for the slot-indexed form ([[Similarity.sqProbeCells]]'
    * plain centroid array — slot == cell id): keyed on the RAW array's
    * identity so repeated probes over one frozen router build once. */
  def routerForSlots(cents: Array[Array[Float]]): Tiered = {
    val got = memo.get(cents)
    if (got != null) got
    else {
      val r = buildTiered(cents.zipWithIndex.map { case (c, j) => (j, c) })
      memo.put(cents, r)
      r
    }
  }
}
