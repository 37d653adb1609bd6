package graft

import graft.operators.Skew
import graft.store.VectorStore
import org.apache.spark.sql.functions._

/** Scale-posture tests: salted-join equivalence, sketch error bounds,
  * partition pruning through the collection store.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition (skew=true in the adaptive plan)") {
    // one hot key owning most rows; thresholds lowered so local-mode sizes
    // qualify — on a cluster the same mechanism splits multi-GB stragglers
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    import s2.implicits._
    val skewed = s2.range(0, 20000)
      .select((when($"id" % 10 === 0, 7L).otherwise($"id")).as("k"),
        concat(lit("payload_payload_payload_"), $"id").as("v"))
    val right = s2.range(0, 2000).select($"id".as("k"), ($"id" * 2).as("w"))
    val joined = skewed.join(right, "k")
    // collect() drives THIS QueryExecution, so its AdaptiveSparkPlan holds
    // the finalized plan (count() would execute a different plan tree)
    assert(joined.collect().nonEmpty)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n${plan.take(2000)}")
  }

  test("salted equi-join returns exactly the plain join result") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val dim = Tables.events(spark, sf).select("user_id").distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))
    val plain = ev.join(dim, Seq("user_id"))
      .select("event_id", "user_tag").as[(Long, String)].collect().toSet
    val salted = Skew.saltedEquiJoin(ev, dim, Seq("user_id"),
        saltSource = col("event_id"), salts = 8)
      .select("event_id", "user_tag").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salted count-distinct equals exact count-distinct") {
    val ev = Tables.events(spark, sf)
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCountDistinct(ev, Seq("event_type"), "user_id",
        saltsource = col("event_id"), salts = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == exact)
  }

  test("approx_count_distinct sketch within declared error of exact") {
    val rows = GraftQueries.q12DistinctSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // drop catalog entries AND their warehouse dirs (a previous killed JVM
    // can leave the directory behind with a fresh in-memory catalog)
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("ev_bucketed", "users_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      val d = new java.io.File(s"$wh/$t")
      if (d.exists()) rm(d)
    }
    Tables.events(spark, sf).select("event_id", "user_id", "value")
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("ev_bucketed")
    Tables.events(spark, sf).select("user_id").distinct()
      .withColumn("tag", concat(lit("u"), col("user_id")))
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("users_bucketed")
    val joined = spark.table("ev_bucketed")
      .join(spark.table("users_bucketed").hint("merge"), Seq("user_id"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides report bucket-compatible output partitioning -> the merge
    // join runs without a shuffle
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == spark.table("ev_bucketed").count())
  }

  test("runtime Bloom-filter pruning engages on selective fact-dim shuffle joins") {
    // at 100 TB a selective dim filter should prune the fact scan at
    // runtime even when the dim is too big to broadcast; Spark's
    // bloom-filter join does exactly that. Cluster defaults engage it
    // automatically (application side >= 10 GB); here the thresholds are
    // scaled down to harness size to pin that OUR join shapes qualify.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join case
    val li = Tables.lineitem(s2, sf)
    val o = Tables.orders(s2, sf)
      .filter(col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(j.queryExecution.optimizedPlan.toString.contains("bloom"),
      "bloom filter not injected into the fact side")
    // and the filtered plan still returns correct results
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderdate") < lit("1995-03-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(_.toString).toSet
    assert(j.collect().map(_.toString).toSet == expected)
  }

  test("z-order clustering bounds BOTH dimensions per file; ts-sort bounds only one") {
    import graft.operators.ZOrder
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts".cast("double").as("tsec"), $"event_id")
    val uGlobal = {
      val r = ev.agg(min("user_id"), max("user_id")).collect()(0)
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    val files = 8
    // per-range user_id spread under each layout = the parquet min/max
    // stat width that decides whether a user_id predicate can skip a file
    def avgUserSpread(df: org.apache.spark.sql.DataFrame): Double = {
      val spreads = df
        .withColumn("_part", org.apache.spark.sql.functions.spark_partition_id())
        .groupBy("_part").agg((max("user_id") - min("user_id")).as("w"))
        .collect().map(_.getLong(1).toDouble)
      spreads.sum / spreads.length
    }
    val zordered = ZOrder.cluster(ev, "user_id", "tsec", numFiles = files)
    val tsSorted = ev.repartitionByRange(files, $"tsec").sortWithinPartitions("tsec")
    val zSpread = avgUserSpread(zordered)
    val tSpread = avgUserSpread(tsSorted)
    info(f"avg per-file user_id spread: zorder=$zSpread%.0f ts-sort=$tSpread%.0f global=$uGlobal%.0f")
    // ts-sorted files see essentially every user; z-ordered files must
    // cover a distinctly narrower user range (the skipping enabler)
    assert(tSpread > 0.9 * uGlobal, "ts-sort baseline unexpectedly narrow")
    assert(zSpread < 0.7 * uGlobal, s"z-order failed to bound user_id: $zSpread vs $uGlobal")
    // clustering is a permutation: nothing lost
    assert(zordered.count() == ev.count())
  }

  test("partitioned collection write enables partition pruning") {
    val root = java.nio.file.Files.createTempDirectory("graft_part").toString
    val store = VectorStore(root)
    store.create("docs", Tables.documents(spark, sf), partitionBy = Seq("lang"))
    val scan = store.read(spark, "docs").filter($"lang" === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
    // pruned scan must read only the en partition's rows
    val enCount = Tables.documents(spark, sf).filter($"lang" === "en").count()
    assert(scan.count() == enCount)
    val partDirs = new java.io.File(s"$root/docs").listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(partDirs.length >= 4) // one dir per language
  }
}
