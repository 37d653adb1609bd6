package graft

import graft.operators.{Dedup, Similarity}
import graft.streaming.Sessionize
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("stateful streaming sessionization equals batch closed-session twin") {
    val streamed = Sessionize.run(spark, s"$sf/events.parquet", "sess_test_parity")
      .select($"user_id",
        date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format($"session_end", "yyyy-MM-dd HH:mm:ss").as("e"),
        $"n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val batch = Sessionize.closedSessionsBatch(Tables.events(spark, sf))
      .select($"user_id",
        date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format($"session_end", "yyyy-MM-dd HH:mm:ss").as("e"),
        $"n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming near-dup equals the batch incremental operator row-for-row") {
    val streamed = graft.streaming.DocStream
      .runStreamingNearDup(spark, s"$sf/documents.parquet")
      .collect().map(_.toSeq).toSet
    val docs = Tables.documents(spark, sf)
    val batch = graft.operators.Dedup.minhashLshIncremental(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 7),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 7),
        "text", "doc_id", threshold = 0.8)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty) // the generator plants near-dups across the slice
  }

  test("streaming upsert converges to the batch latest-version-per-id view") {
    import org.apache.spark.sql.functions.{col, upper, when}
    val streamed = graft.streaming.DocStream
      .runStreamingUpsert(spark, s"$sf/documents.parquet")
      .collect().map(_.toSeq).toSet
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 10 === 3, upper(col("text")))
          .otherwise(col("text")).as("text"))
      .filter(col("doc_id") % 9 =!= 0)
      .collect().map(_.toSeq).toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("drained one-shot streaming queries leave no state-store providers loaded") {
    // r5 bench regression root cause: q.stop() keeps providers registered
    // in the JVM-wide StateStore singleton (+8 providers, +70 threads per
    // stateful run); drainMemorySink now unloads them eagerly
    Sessionize.run(spark, s"$sf/events.parquet", "sess_test_unload")
    assert(SessRepro.loadedProviderCount() == 0,
      s"expected 0 loaded state-store providers, got ${SessRepro.loadedProviderCount()}")
  }

  test("stream-stream interval join equals batch time-range join twin") {
    val streamed = graft.streaming.EventStream
      .runStreamingIntervalJoin(spark, s"$sf/events.parquet", "join_test_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("click_id"))
    val batch = p.join(c, $"user_id" === $"c_user" &&
        $"c_ts" >= $"p_ts" - expr("interval 1 hour") && $"c_ts" <= $"p_ts")
      .select("user_id", "purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("sessionization runs identically on the RocksDB state store backend") {
    // RocksDB is the backend for state larger than memory (100 TB posture:
    // keys spill to disk, snapshot/changelog to the checkpoint); results
    // must be identical to the default HDFS-backed store
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocks = Sessionize.run(s2, s"$sf/events.parquet", "sess_rocksdb")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val default = Sessionize.run(spark, s"$sf/events.parquet", "sess_defaultstore")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(rocks.nonEmpty)
    assert(rocks == default)
  }

  test("checkpoint restart is exactly-once: rerun with same checkpoint adds nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("basePath", sf).option("pathGlobFilter", "events.parquet").parquet(sf)
      val stream2 = graft.streaming.EventStream.convertTs(stream, schema)
      val agg = graft.streaming.EventStream.windowedAgg(
        stream2.withWatermark("ts", "10 minutes"))
      val q = agg.writeStream.outputMode("append")
        .format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val n1 = spark.read.parquet(s"$base/out").count()
    assert(n1 > 0)
    runOnce() // fresh query object, same checkpoint: source offset replay
    val n2 = spark.read.parquet(s"$base/out").count()
    assert(n2 == n1, s"restart reprocessed data: $n1 -> $n2 rows")
  }

  test("sessionizer handles out-of-order events (driven through the engine)") {
    // write an out-of-order event file; state update sorts by (ts, event_id)
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    Seq(
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "click", 1.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/out")
    // the harness events.parquet is a single FILE; reproduce that shape
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/ev.parquet"))
    val out = Sessionize.run(spark, s"$dir/ev.parquet", "sess_test_ooo")
      .select("user_id", "n_events").collect()
    // events 1+2 form a closed session (event 3 is 110min later); the
    // session containing event 3 stays open
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
  }

  test("sessionizer with event-time timeout emits at least the closed sessions") {
    // timeout flushing depends on whether a final microbatch runs after
    // the watermark advance; assert the invariant rather than the engine
    // scheduling detail: closed-by-successor ⊆ emitted ⊆ all sessions
    val emitted = Sessionize.run(spark, s"$sf/events.parquet", "sess_test_timeout",
        useTimeout = true)
      .select($"user_id", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val closed = Sessionize.closedSessionsBatch(Tables.events(spark, sf))
      .select($"user_id", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val emittedCount = emitted.groupBy(identity).view.mapValues(_.size).toMap
    val closedCount = closed.groupBy(identity).view.mapValues(_.size).toMap
    closedCount.foreach { case (k, n) =>
      assert(emittedCount.getOrElse(k, 0) >= n, s"closed session $k missing from timeout run")
    }
  }

  test("streaming agg to a parquet sink with checkpoint (deployment shape)") {
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("basePath", sf).option("pathGlobFilter", "events.parquet").parquet(sf)
    val events = graft.streaming.EventStream.convertTs(raw, schema)
    // append mode to files requires watermark-closed windows; AvailableNow
    // emits the windows the final watermark has passed
    val agg = graft.streaming.EventStream.windowedAgg(
      events.withWatermark("ts", "10 minutes"))
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() > 0)
    // emitted windows are a subset of the batch result, identical values
    val batch = GraftQueries.q8EventsHourly(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val emitted = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(emitted.subsetOf(batch))
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark removes replayed events") {
    // duplicate the events file so the stream sees each event twice
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/a.parquet"))
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/b.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/a.parquet").schema
    val stream = graft.streaming.EventStream
      .convertTs(spark.readStream.schema(schema).parquet(dir), schema)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.table("sdedup_test").count()
    val expected = Tables.events(spark, sf).count()
    assert(n == expected, s"streamed dedup got $n, expected $expected")
  }

  test("LSH near-dup join recall vs exact cosine join") {
    val e = Tables.embeddings(spark, sf)
    val exact = Dedup.embeddingNearDup(e, "embedding", "vec_id", 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshNearDupJoin(e, "embedding", "vec_id", 0.35, nBits = 8, nTables = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no false positives (exact verify step)
    assert(approx.subsetOf(exact))
    // recall: 8 tables x 8 bits at cos>=0.35 — moderate by construction;
    // must be well above the random-bucketing floor
    val recall = if (exact.isEmpty) 1.0 else (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"LSH recall $recall")
  }

  test("stateless quality gate: streamed scores equal batch scores row for row") {
    // sorted-seq compare, not sets: a set would mask duplicate emission
    // if the source ever reprocessed its input
    val batch = GraftQueries.qualityClassifier(spark, sf).collect().map(_.toString).sorted.toSeq
    val streamed = GraftQueries.streamingQuality(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming IVF ingest: exactly-once sink, replay paths, store equals batch build") {
    import graft.store.{StreamCommits, VectorStore}
    import graft.streaming.IndexStream
    val root = java.nio.file.Files.createTempDirectory("graft_sivf_spec").toString
    val store = VectorStore(root)
    try {
      val e = Tables.embeddings(spark, sf)
      val cents = Similarity.trainCentroidArrays(e, "embedding", "vec_id", ncells = 8)
      val standing = e.filter(col("vec_id") % 10 =!= 7)
      store.create("vectors", Similarity.withCellId(standing, "embedding", cents),
        partitionBy = Seq("cell_id"))
      assert(StreamCommits.lastBatchId(store, "vectors") == -1L)
      IndexStream.runStreamingIvfIngest(spark, s"$sf/embeddings.parquet",
        store, "vectors", cents)
      // the harness already drove both replay paths (at-watermark skip
      // and all-duplicate anti-filter); the store must now equal the
      // from-scratch batch build row for row
      val viaStream = store.read(spark, "vectors")
        .select("vec_id", "cell_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val batchBuild = Similarity.withCellId(e, "embedding", cents)
        .select("vec_id", "cell_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(viaStream == batchBuild)
      assert(viaStream.size == e.count())
      val committed = StreamCommits.lastBatchId(store, "vectors")
      assert(committed >= 0L)
      // a third replay shape, explicitly: a fresh batchId re-sending an
      // already-landed id plus one genuinely new id completes the new
      // id only — the self-heal of a crash between append and commit
      val someId = viaStream.head._1
      val replay = e.filter(col("vec_id") === someId)
        .unionByName(e.filter(col("vec_id") === someId).limit(1)
          .withColumn("vec_id", lit(9999999L)))
      IndexStream.ivfBatchSink(store, "vectors", "embedding", "vec_id", cents)(
        replay, committed + 1)
      assert(store.read(spark, "vectors").count() == viaStream.size + 1)
      assert(store.read(spark, "vectors")
        .filter(col("vec_id") === someId).count() == 1)
      assert(StreamCommits.lastBatchId(store, "vectors") == committed + 1)
      // in-batch duplicate ids are refused (data error, not recovery) —
      // duplicate ONE materialized row (two independent limit(1) scans
      // are not guaranteed to pick the same row)
      val row = e.limit(1).collect().head
      val dup = spark.createDataFrame(java.util.Arrays.asList(row, row), e.schema)
      intercept[IllegalArgumentException](
        IndexStream.ivfBatchSink(store, "vectors", "embedding", "vec_id", cents)(
          dup, committed + 2))
    } finally store.destroy()
  }
}
