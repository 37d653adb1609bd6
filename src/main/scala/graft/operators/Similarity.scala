package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `ARRAY<FLOAT>` embedding
  * column. Three tiers:
  *
  *  1. [[bruteForceTopK]] — exact; broadcast the (small) query set over the
  *     big collection, codegen'd cosine, per-query top-k via window rank.
  *     The baseline every approximate method is measured against.
  *  2. [[ivfTopK]] — IVF-flat: a coarse quantizer (centroids learned by a
  *     few Lloyd iterations over a sample, all in DataFrames) partitions
  *     the collection; queries probe only the `nprobe` nearest cells. At
  *     100 TB this is the difference between scanning everything and
  *     scanning nprobe/ncells of it, with the cell assignment stored as a
  *     partition column.
  *  3. [[cosineLshBuckets]] — random-hyperplane signatures; vectors sharing
  *     a signature land in one bucket, giving a shuffle-key for
  *     bucketed near-dup joins (used by Dedup.embeddingNearDup at scale).
  */
object Similarity {

  /** Exact top-k per query. Queries must be small enough to broadcast —
    * which is the realistic shape: thousands of probes against billions of
    * vectors.
    */
  def bruteForceTopK(collection: DataFrame, vecCol: String, idCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int): DataFrame = {
    val scored = collection.crossJoin(broadcast(queries))
      .withColumn("cosine", round(cosine(col(vecCol), col(qVecCol)), 6))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Deterministic k-means(ish) centroids: seed from the first `ncells`
    * rows by id order, then `iters` Lloyd rounds as DataFrame aggregations
    * (group by nearest centroid, average). Returns (cell_id, centroid).
    */
  /** Deterministic k-means(ish) centroids, returned driver-side (ncells x
    * dim floats is bytes, not data): seed from the first `ncells` rows by
    * id order, then `iters` Lloyd rounds — each round is ONE aggregation
    * job over the collection with literal centroids; nothing in the plan
    * ever re-derives centroid lineage.
    */
  def trainCentroidArrays(collection: DataFrame, vecCol: String, idCol: String,
                          ncells: Int, iters: Int = 1): Array[(Int, Array[Float])] = {
    var cents: Array[(Int, Array[Float])] =
      collection.orderBy(col(idCol)).limit(ncells).select(col(vecCol)).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0).toArray) }
    var it = 0
    while (it < iters) {
      cents = withCellId(collection, vecCol, cents)
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("_pos", "_x")))
        .groupBy("cell_id", "_pos").agg(avg("_x").as("_m"))
        .groupBy("cell_id")
        .agg(array_sort(collect_list(struct(col("_pos"), col("_m")))).as("_pairs"))
        .select(col("cell_id"),
          transform(col("_pairs"), p => p.getField("_m").cast("float")).as("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      it += 1
    }
    cents
  }

  /** Nearest-centroid assignment as one argmin pass — no crossJoin, no
    * shuffle, no window. Centroids travel in the task closure and the
    * argmin is a tight JVM kernel: an expression formulation (array_min
    * over ncells literal-distance structs) generates ncells x dim of
    * source per plan and pays seconds of janino compilation for every
    * distinct plan that embeds it. Ties break to the lowest cell_id.
    */
  def withCellId(collection: DataFrame, vecCol: String,
                 cents: Array[(Int, Array[Float])]): DataFrame = {
    val sorted = cents.sortBy(_._1)
    val assign = udf((v: Seq[Float]) => {
      val arr = v.toArray
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < sorted.length) {
        val cent = sorted(c)._2
        var acc = 0.0
        var i = 0
        val n = math.min(arr.length, cent.length)
        while (i < n) { val d = arr(i).toDouble - cent(i); acc += d * d; i += 1 }
        if (acc < bestD) { bestD = acc; best = sorted(c)._1 }
        c += 1
      }
      best
    })
    collection.withColumn("cell_id", assign(col(vecCol)))
  }

  /** DataFrame facade over [[trainCentroidArrays]] (API compat). */
  def trainCentroids(collection: DataFrame, vecCol: String, idCol: String,
                     ncells: Int, iters: Int = 1): DataFrame = {
    val spark = collection.sparkSession
    import spark.implicits._
    trainCentroidArrays(collection, vecCol, idCol, ncells, iters)
      .toSeq.map { case (id, c) => (id, c.toSeq) }.toDF("cell_id", "centroid")
  }

  /** IVF-flat search: probe the `nprobe` nearest cells per query, exact
    * cosine inside the probed cells, top-k per query. Probe cells are
    * picked with a sorted literal struct array (no window, no join).
    */
  def ivfTopK(collection: DataFrame, vecCol: String, idCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              k: Int, ncells: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = trainCentroidArrays(collection, vecCol, idCol, ncells, iters = 1)
    val indexed = withCellId(collection, vecCol, cents)
    val probeUdf = udf((v: Seq[Float]) => {
      val arr = v.toArray
      cents.map { case (id, c) =>
        var acc = 0.0
        var i = 0
        val n = math.min(arr.length, c.length)
        while (i < n) { val d = arr(i).toDouble - c(i); acc += d * d; i += 1 }
        (acc, id)
      }.sortBy(p => (p._1, p._2)).take(nprobe).map(_._2)
    })
    val probes = queries.select(col(qIdCol), col(qVecCol),
      explode(probeUdf(col(qVecCol))).as("cell_id"))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("cosine").desc, col(idCol))
    indexed.join(broadcast(probes), Seq("cell_id"))
      .withColumn("cosine", round(cosine(col(vecCol), col(qVecCol)), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Random-hyperplane LSH signature: bit i = sign(dot(v, h_i)) where h_i
    * is a deterministic pseudo-random hyperplane derived from (i, seed).
    * Same-signature vectors are cosine-close with high probability.
    */
  def cosineLshBuckets(df: DataFrame, vecCol: String, nBits: Int = 16,
                       seed: Long = 42L, dim: Int = 64): DataFrame = {
    val rng = new scala.util.Random(seed)
    val planes: Array[Array[Float]] =
      Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val bits = (0 until nBits).map { i =>
      when(dot(col(vecCol), vecLit(planes(i))) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    df.withColumn("lsh_bucket", bits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** LSH-bucketed cosine near-dup join — the scale path for
    * [[graft.operators.Dedup.embeddingNearDup]]: `nTables` independent
    * hyperplane signatures; vectors sharing a bucket in ANY table become
    * candidates (recall boosts exponentially with tables), then exact
    * cosine verifies. The shuffle key is (table, bucket) — fixed width —
    * and the quadratic term is confined to per-bucket collision groups.
    */
  def lshNearDupJoin(df: DataFrame, vecCol: String, idCol: String,
                     threshold: Double, nBits: Int = 8, nTables: Int = 8,
                     dim: Int = 64): DataFrame = {
    val base = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    val tables = (0 until nTables).map { t =>
      cosineLshBuckets(base, "_v", nBits, seed = 42L + t, dim = dim)
        .select(col("_id"), lit(t).as("_table"), col("lsh_bucket"))
    }.reduce(_ unionByName _)
    val candidates = tables.as("a")
      .join(tables.as("b"),
        col("a._table") === col("b._table") &&
          col("a.lsh_bucket") === col("b.lsh_bucket") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val v = base
    candidates
      .join(broadcast(v.withColumnRenamed("_id", "id_a").withColumnRenamed("_v", "_va")), "id_a")
      .join(broadcast(v.withColumnRenamed("_id", "id_b").withColumnRenamed("_v", "_vb")), "id_b")
      .withColumn("cosine", round(cosine(col("_va"), col("_vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
