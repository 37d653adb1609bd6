package graft

import graft.operators.{CentroidRouter, Clustering, Similarity}
import org.apache.spark.sql.functions._

/** Two-level centroid router (the large-ncells scale path): determinism,
  * bounded per-call work on an engineered 5000-cell build, build/probe
  * self-consistency, and gate behavior (flat below, broadcast two-level
  * at the gate, flat answers unchanged by the gate's existence). */
class CentroidRouterSpec extends SparkSpec {

  // deterministic synthetic centroid set: `n` cells in `g0` well-separated
  // blobs (the shape a trained quantizer actually has), dim 16
  private def synthCents(n: Int, blobs: Int): Array[(Int, Array[Float])] =
    Array.tabulate(n) { i =>
      val blob = i % blobs
      val v = Array.tabulate(16) { j =>
        (blob * 100.0 + math.sin(i * 0.7 + j * 1.3) * 3.0).toFloat
      }
      (i, v)
    }

  test("router build is deterministic; empty groups dropped; groups partition the cells") {
    val cents = synthCents(5000, 40)
    val a = CentroidRouter.build(cents, 70)
    val b = CentroidRouter.build(cents, 70)
    assert(a.coarse.map(_.toSeq).toSeq == b.coarse.map(_.toSeq).toSeq)
    assert(a.groups.map(_.toSeq).toSeq == b.groups.map(_.toSeq).toSeq)
    assert(a.groups.forall(_.nonEmpty), "empty groups must be dropped")
    assert(a.groups.flatten.sorted.toSeq == cents.indices.toSeq,
      "groups must partition the cell set")
  }

  test("bounded work at 5000 cells: per-call comparisons a small fraction of ncells") {
    val cents = synthCents(5000, 40)
    val r = CentroidRouter.routerFor(cents)
    val probeVec = Array.tabulate(16)(j => 300.0 + j)
    r.comparisons.set(0L)
    r.assign(probeVec.map(_.toFloat))
    val perAssign = r.comparisons.get()
    r.comparisons.set(0L)
    r.probe(probeVec, nprobe = 8)
    val perProbe = r.comparisons.get()
    info(s"per-assign comparisons: $perAssign, per-probe: $perProbe (ncells=5000)")
    // G ≈ 70 coarse + one group (~70-125 members) ≪ 5000; probe adds the
    // fanout·nprobe candidate pool
    assert(perAssign < 500, s"assignment scanned $perAssign of 5000 — not two-level")
    assert(perProbe < 1000, s"probe scanned $perProbe of 5000 — not two-level")
  }

  test("self-consistency: a query at a stored vector reaches its assigned cell") {
    val cents = synthCents(5000, 40)
    val r = CentroidRouter.routerFor(cents)
    // synthetic "stored vectors": jittered copies near centroids
    val hits = (0 until 200).map { s =>
      val base = cents(s * 25 % 5000)._2
      val v = base.zipWithIndex.map { case (x, j) =>
        x + (math.cos(s * 1.1 + j) * 0.05).toFloat }
      val cell = r.assign(v)
      r.probe(v.map(_.toDouble), nprobe = 4).contains(cell)
    }
    val frac = hits.count(identity) / hits.length.toDouble
    info(f"probe(v,4) contains assign(v): $frac%.3f")
    assert(frac >= 0.99,
      f"build/probe self-consistency broke: $frac%.3f of queries miss their own cell")
  }

  test("memo returns the SAME router per array identity; bounded (LRU)") {
    val cents = synthCents(200, 10)
    val a = CentroidRouter.routerFor(cents)
    val b = CentroidRouter.routerFor(cents)
    assert(a eq b, "memo must return the cached router for the same array")
    // a structurally-equal but distinct array builds its own (identity keys)
    val c = CentroidRouter.routerFor(cents.map { case (i, v) => (i, v.clone()) })
    assert(!(c eq a))
  }

  test("assignStruct routes above the gate and keeps the struct contract") {
    val e = Tables.embeddings(spark, sf).limit(300).cache()
    try {
      val trained = Clustering.trainCentroids(e, 8, 2)
      val r = CentroidRouter.routerForSlots(trained)
      val rows = e.select(col("vec_id"), col("embedding"),
          Clustering.assignStruct(col("embedding"), trained, twoLevelGate = 1).as("a"))
        .select(col("vec_id"), col("embedding"),
          col("a").getField("cid").as("cid"), col("a").getField("dist").as("dist"))
        .collect()
      rows.foreach { row =>
        val v = row.getSeq[Float](1).toArray
        val cid = row.getInt(2)
        assert(cid == r.assign(v), "routed assignStruct diverged from the router")
        // dist contract: round6'd left-to-right double l2² to the CHOSEN cell
        val c = trained(cid)
        var acc = 0.0
        var i = 0
        while (i < math.min(v.length, c.length)) {
          val d = v(i).toDouble - c(i).toDouble; acc += d * d; i += 1
        }
        assert(row.getDouble(3) == math.floor(acc * 1e6 + 0.5) / 1e6)
      }
      // routing is approximate in the standard IVF sense: on this REAL
      // (non-separated) embedding set at k=8 the two-level decision may
      // differ from the exact argmin on boundary rows — sanity-bound the
      // agreement rather than demanding equality (exact equality on
      // separated data is pinned by the synthetic self-consistency test)
      val flat = e.select(col("vec_id"),
          Clustering.assignStruct(col("embedding"), trained)
            .getField("cid").as("cid")).collect()
        .map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
      val forced = e.select(col("vec_id"),
          Clustering.assignStruct(col("embedding"), trained, twoLevelGate = 1)
            .getField("cid").as("cid")).collect()
        .map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
      val agree = flat.count { case (id, c) => forced(id) == c } / flat.size.toDouble
      info(f"routed-vs-flat assignment agreement on real embeddings: $agree%.3f")
      assert(agree >= 0.8, f"routed assignment degraded too far: $agree%.3f")
    } finally { e.unpersist(): Unit }
  }

  test("graph probe routes through the two-level router at >= 4096 cells") {
    val n = 4500
    val slots = Array.tabulate(n) { i =>
      val blob = i % 40
      Array.tabulate(16)(j =>
        (blob * 100.0 + math.sin(i * 0.7 + j * 1.3) * 3.0).toFloat)
    }
    // one node per cell, empty adjacency: exercises the routed probe +
    // per-cell walk plumbing without a 4500-task graph build
    val nodes = (0 until n).map(i =>
      graft.operators.GraphAnn.Node(i, i.toLong, slots(i), Array.empty[Long]))
    val stored = spark.createDataFrame(nodes)
    val target = 1234
    val qv = slots(target).map(_.toDouble)
    val r = CentroidRouter.routerForSlots(slots)
    r.comparisons.set(0L)
    val hits = graft.operators.GraphAnn.searchStored(
      stored, slots, qv, k = 3, nprobe = 4, ef = 8).collect()
    val cmp = r.comparisons.get()
    info(s"probe comparisons at ncells=$n: $cmp")
    assert(cmp > 0, "stored-graph probe did not route through the two-level router")
    assert(cmp < 1500, s"probe scanned $cmp of $n centroids — not two-level")
    assert(hits.nonEmpty && hits.head.getLong(0) == target.toLong,
      s"query at a stored node must surface that node first: ${hits.toSeq}")
  }

  test("gated paths agree with the router; flat answers unchanged below the gate") {
    val e = Tables.embeddings(spark, sf).limit(400).cache()
    try {
      val trained = Clustering.trainCentroids(e, 8, 2)
      val cents = trained.zipWithIndex.map { case (c, j) => (j, c) }
      // forced two-level (gate=1): the broadcast UDF path must equal the
      // driver router call row for row
      val r = CentroidRouter.routerFor(cents.sortBy(_._1))
      val viaDf = Similarity.withCellId(e, "embedding", cents, twoLevelGate = 1)
        .select("vec_id", "cell_id").collect()
        .map(row => row.getLong(0) -> row.getInt(1)).toMap
      val viaRouter = e.select("vec_id", "embedding").collect().map { row =>
        row.getLong(0) -> r.assign(row.getSeq[Float](1).toArray)
      }.toMap
      assert(viaDf == viaRouter, "broadcast UDF path diverged from the router")
      // default gate at 8 cells: flat path — equal to a hand argmin
      val flat = Similarity.withCellId(e, "embedding", cents)
        .select("vec_id", "cell_id").collect()
        .map(row => row.getLong(0) -> row.getInt(1)).toMap
      val hand = e.select("vec_id", "embedding").collect().map { row =>
        val v = row.getSeq[Float](1).toArray
        val best = cents.map { case (cid, c) =>
          var acc = 0.0
          var i = 0
          val n = math.min(v.length, c.length)
          while (i < n) { val d = v(i).toDouble - c(i); acc += d * d; i += 1 }
          (acc, cid)
        }.minBy(identity)._2
        row.getLong(0) -> best
      }.toMap
      assert(flat == hand, "flat assignment changed")
      // probe gate: forced two-level probe == router.probe; flat default
      // == the linear floor-rounded rank
      val qv = Array.tabulate(trained(0).length)(j => trained(0)(j).toDouble + 0.01)
      assert(Similarity.sqProbeCells(trained, qv, 4, twoLevelGate = 1).toSeq ==
        CentroidRouter.routerForSlots(trained).probe(qv, 4).toSeq)
      val flatProbe = Similarity.sqProbeCells(trained, qv, 4)
      assert(flatProbe.length == 4 && flatProbe.distinct.length == 4)
    } finally { e.unpersist(): Unit }
  }

  // ---- third tier: the LSH router at >= LshGate cells ----------------

  /** 100k-cell engineered set (the >= 10^5 regime the two-level build's
    * O(ncells^1.5) Lloyd cannot serve): 1000 well-separated blobs of
    * 100 cells, dim 16 — the geometry a trained quantizer over a
    * clustered corpus actually has. */
  private def bigCents(n: Int = 100000, blobs: Int = 1000): Array[(Int, Array[Float])] =
    Array.tabulate(n) { i =>
      val blob = i % blobs
      val v = Array.tabulate(16) { j =>
        // blob center varies PER DIMENSION (sin of blob*dim) so blobs
        // spread in all directions, not along one diagonal ray
        (math.sin(blob * 0.37 + j * 1.7) * 500.0 +
          math.sin(i * 0.7 + j * 1.3) * 3.0).toFloat
      }
      (i, v)
    }

  test("third tier engages at LshGate and builds in linear-ish time") {
    val cents = bigCents()
    val t0 = System.nanoTime()
    val r = CentroidRouter.routerFor(cents)
    val buildSec = (System.nanoTime() - t0) / 1e9
    info(f"LSH router build at 100k cells: $buildSec%.2fs")
    assert(r.isInstanceOf[CentroidRouter.LshRouter],
      "at >= LshGate cells the memo must hand out the LSH tier")
    // the two-level Lloyd at this scale is O(ncells^1.5) ~ 10^10 flops;
    // the linear LSH build must land in single-digit seconds even cold
    assert(buildSec < 30.0, f"LSH build took $buildSec%.1fs — not linear-time")
  }

  test("routed == flat probe parity at 100k cells, with sublinear work") {
    val cents = bigCents()
    val r = CentroidRouter.routerFor(cents)
    val trained = cents.map(_._2) // slot == cid here
    var worstWork = 0L
    var flatNanos = 0L
    var lshNanos = 0L
    (0 until 50).foreach { q =>
      val base = cents(q * 1999 % cents.length)._2
      val qv = base.zipWithIndex.map { case (x, j) =>
        x.toDouble + math.cos(q * 1.1 + j) * 0.5 }
      val t0 = System.nanoTime()
      val flat = Similarity.sqProbeCells(trained, qv, 8,
        twoLevelGate = Int.MaxValue) // forced flat: the exact rank
      flatNanos += System.nanoTime() - t0
      r.comparisons.set(0L)
      val t1 = System.nanoTime()
      val routed = r.probe(qv, 8)
      lshNanos += System.nanoTime() - t1
      worstWork = math.max(worstWork, r.comparisons.get())
      assert(routed.toSeq == flat.toSeq,
        s"query $q: routed ${routed.toSeq} != flat ${flat.toSeq}")
    }
    info(f"probe wall: flat ${flatNanos / 50 / 1e6}%.2fms vs LSH ${lshNanos / 50 / 1e6}%.2fms per query; worst candidates+lookups $worstWork of 100000 cells")
    // sublinear: the candidate pool a probe fine-ranks must be a small
    // fraction of the cell count (the measured speedup follows from it)
    assert(worstWork < 20000, s"probe examined $worstWork of 100000 — not sublinear")
    assert(lshNanos < flatNanos,
      "LSH probe selection must beat the flat O(ncells) scan outright")
  }

  test("third-tier self-consistency and determinism at 100k cells") {
    val cents = bigCents()
    val a = CentroidRouter.routerFor(cents)
    val b = CentroidRouter.LshRouter.build(cents) // fresh, not memoized
    (0 until 100).foreach { s =>
      val base = cents(s * 997 % cents.length)._2
      val v = base.zipWithIndex.map { case (x, j) =>
        x + (math.cos(s * 1.1 + j) * 0.05).toFloat }
      val cell = a.assign(v)
      assert(cell == b.assign(v), s"assignment not deterministic at $s")
      assert(a.probe(v.map(_.toDouble), 4).contains(cell),
        s"query at a stored vector must reach its assigned cell (s=$s)")
    }
  }

  test("third-tier probe tolerates query/centroid length mismatch like the flat tier") {
    val cents = bigCents()
    val r = CentroidRouter.routerFor(cents)
    val full = cents(123)._2.map(_.toDouble)
    // r14 ADVICE: the signature fill read qv(i) unguarded for i < dim,
    // so a short query threw ArrayIndexOutOfBounds above LshGate while
    // the flat tier tolerated it (min-length fine-rank). Pin: a short
    // query probes (signature zero-pads, fine-rank min-lengths — the
    // flat rule), and a LONG query behaves exactly as its truncation.
    val short = full.take(full.length - 4)
    assert(r.probe(short, 8).length == 8)
    assert(r.probe(short, 8).toSeq == r.probe(short, 8).toSeq) // deterministic
    val long = full ++ Array.fill(3)(42.0)
    assert(r.probe(long, 8).toSeq == r.probe(full, 8).toSeq,
      "a long query must probe exactly as its dim-truncated twin")
  }

  test("mismatched shapes are observable: probe counts, assign asserts (r15 ADVICE)") {
    val cents = bigCents()
    val r = CentroidRouter.LshRouter.build(cents) // fresh — counter starts at 0
    val full = cents(321)._2
    val before = r.dimMismatches.get()
    r.probe(full.map(_.toDouble), 4): Unit // well-shaped: not counted
    assert(r.dimMismatches.get() == before)
    r.probe(full.take(full.length - 4).map(_.toDouble), 4): Unit
    r.probe((full.map(_.toDouble) ++ Array(1.0)), 4): Unit
    assert(r.dimMismatches.get() == before + 2,
      "every mismatched-length probe must count")
    // the BUILD path fails loudly instead of mis-routing the layout
    intercept[IllegalArgumentException] { r.assign(full.take(full.length - 4)) }
    intercept[IllegalArgumentException] { r.assign(full ++ Array(1.0f)) }
  }

  /** VERDICT r14 #2: the LSH tier's agreement bound on REALISTIC
    * geometry, not just the engineered quantizer-shaped blobs — >=
    * LshGate centroids seeded from the real sf embedding corpus with
    * deterministic relative jitter (each real point fans out into a
    * tight cluster of centroids, the shape a trained router over a
    * clustered corpus at 10^5 cells has), probed by the real embeddings
    * themselves. Above the gate the tier is approximate by design, so
    * the pin is an agreement FLOOR vs the exact flat probe (the
    * two-level tier's r13 treatment), not parity. */
  test("third-tier routed-vs-flat agreement floor on real embedding geometry") {
    val base = Tables.embeddings(spark, sf).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dim = base(0).length
    val scale = base.map(_.map(math.abs(_).toDouble).sum / dim).sum / base.length
    val n = CentroidRouter.LshGate + 512
    val cents = Array.tabulate(n) { i =>
      val b = base(i % base.length)
      (i, Array.tabulate(dim) { j =>
        (b(j) + math.sin(i * 0.61 + j * 1.37) * 0.5 * scale).toFloat })
    }
    val r = CentroidRouter.routerFor(cents)
    assert(r.isInstanceOf[CentroidRouter.LshRouter])
    val trained = cents.map(_._2) // slot == cid
    val overlaps = (0 until 50).map { q =>
      val qv = base((q * 7919) % base.length).map(_.toDouble)
      val flat = Similarity.sqProbeCells(trained, qv, 8,
        twoLevelGate = Int.MaxValue).toSet // exact rank
      val routed = r.probe(qv, 8).toSet
      (routed & flat).size / 8.0
    }
    val mean = overlaps.sum / overlaps.length
    val worst = overlaps.min
    info(f"LSH routed-vs-flat top-8 agreement on real geometry: mean $mean%.3f, worst $worst%.3f over 50 queries")
    assert(mean >= 0.90, f"mean agreement $mean%.3f fell below the 0.90 floor")
    assert(worst >= 0.50, f"worst-query agreement $worst%.3f fell below 0.50")
  }
}
