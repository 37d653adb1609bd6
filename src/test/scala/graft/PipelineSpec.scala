package graft

import graft.embed.HashEmbedder
import graft.ingest.IngestPipeline
import graft.multimodal.Multimodal
import graft.store.VectorStore
import org.apache.spark.sql.functions._

/** End-to-end pipeline tests: ingest -> store -> read-back, embedder
  * determinism, multimodal plumbing, streaming agg parity with batch.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("hash embedder: deterministic, unit-norm, dim-sized") {
    val e = HashEmbedder(dim = 64)
    val v1 = e.encodeOne("hello world of vectors")
    val v2 = e.encodeOne("hello world of vectors")
    assert(v1.sameElements(v2))
    assert(v1.length == 64)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(e.encodeOne("").forall(_ == 0f))
    assert(e.encodeOne(null).forall(_ == 0f))
    // prefix changes the embedding (passage:/query: asymmetry support)
    val p = HashEmbedder(dim = 64, prefix = "passage: ").encodeOne("hello")
    assert(!p.sameElements(e.encodeOne("hello")))
  }

  test("ingest pipeline produces aligned chunk records with embeddings") {
    val docs = Tables.documents(spark, sf).limit(50)
    val out = IngestPipeline.ingestDocuments(docs, HashEmbedder(dim = 32))
    val rows = out.select("doc_id", "chunk_index", "chunk_id", "total_chunks", "id", "embedding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("chunk_id") == s"${r.getAs[Long]("doc_id")}_chunk_${r.getAs[Int]("chunk_index")}")
      assert(r.getAs[scala.collection.Seq[Float]]("embedding").size == 32)
      assert(r.getAs[String]("id").length == 64) // sha256 hex
    }
    // deterministic ids: rerun gives identical ids
    val ids1 = rows.map(_.getAs[String]("id")).sorted
    val ids2 = IngestPipeline.ingestDocuments(docs, HashEmbedder(dim = 32))
      .select("id").as[String].collect().sorted
    assert(ids1.sameElements(ids2))
  }

  test("vector store: create/append/count/list/drop lifecycle") {
    val root = java.nio.file.Files.createTempDirectory("graft_store").toString
    val store = VectorStore(root)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "doc")
    store.create("c1", df)
    assert(store.count(spark, "c1") == 2)
    store.append("c1", df)
    assert(store.count(spark, "c1") == 4) // append semantics (:189-193)
    store.create("c1", df)
    assert(store.count(spark, "c1") == 2) // overwrite semantics (:29-33)
    store.create("c2", df)
    assert(store.list() == Seq("c1", "c2"))
    store.drop("c2")
    assert(store.list() == Seq("c1"))
  }

  test("ingest report: blank docs counted as failures, kept in report") {
    val docs = Seq((1L, "some text", "s1"), (2L, "   ", "s1"), (3L, "", "s2"))
      .toDF("doc_id", "text", "source")
    val rep = IngestPipeline.ingestReport(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rep == Set(("s1", 2L, 1L, 1L), ("s2", 1L, 0L, 1L)))
  }

  test("binaryFile ingest path works on a real directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.pdf"), "hello pdf " * 80)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"), "not a pdf")
    val out = IngestPipeline.ingestBinaryDir(spark, dir, HashEmbedder(dim = 16))
    val files = out.select("filename").distinct().as[String].collect().toSet
    assert(files == Set("a.pdf")) // glob filter excluded b.txt
    assert(out.count() > 0)
  }

  test("multimodal: batched feature extraction over binary payloads") {
    val df = Multimodal.withBinaryPayload(
      Seq((1L, "hello"), (2L, "world!")).toDF("id", "text"), "text")
    val out = Multimodal.extractFeatures(df, "payload")
      .select($"id", $"features.byte_len", $"features.content_sha", $"features.width")
      .collect()
    assert(out.length == 2)
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) == 5L)
    assert(r1.getString(2) == "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    assert(r1.getInt(3) >= 64)
  }

  test("multimodal: real javax.imageio PNG round-trip through the batched decode seam") {
    // encode a known image, decode it distributed, check exact pixels
    val ids = Seq(0L, 1L, 17L, 255L, 1000L)
    val df = ids.toDF("doc_id")
      .withColumn("payload", udf((id: Long) => Multimodal.synthPng(id)).apply($"doc_id"))
    val out = Multimodal.decodeImages(df, "payload")
      .select($"doc_id", $"img.width", $"img.height", $"img.red_sum")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    // closed-form expectation, computed independently of the codec
    val expect = ids.map { id =>
      val w = (8 + Math.floorMod(id, 24L)).toInt
      val h = (8 + Math.floorMod(id * 7L, 24L)).toInt
      val rs = (for { x <- 0 until w; y <- 0 until h }
        yield Math.floorMod(x * 31L + y * 17L + id, 256L)).sum
      (id, w, h, rs)
    }.toSet
    assert(out == expect)
    // undecodable bytes drop the row (fallback-chain semantics), not
    // poison it — both the no-reader-claims path (junk bytes) and the
    // reader-throws path (valid PNG signature, truncated body)
    val truncated = Multimodal.synthPng(9L).take(40)
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, Multimodal.synthPng(2L)),
        (3L, truncated))
      .toDF("doc_id", "payload")
    assert(Multimodal.decodeImages(junk, "payload").count() == 1)
  }

  test("multimodal: JPEG decodes through the same ImageIO seam (dims exact, features sane)") {
    // the decoder is container-agnostic: a JPEG payload rides the same
    // batched path; dimensions survive the lossy codec exactly
    val enc = udf { (id: Long) =>
      val w = (8 + Math.floorMod(id, 24L)).toInt
      val h = (8 + Math.floorMod(id * 7L, 24L)).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (Math.floorMod(x * 31L + y * 17L + id, 256L) << 16).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val ids = Seq(3L, 42L, 99L)
    val df = ids.toDF("doc_id").withColumn("payload", enc($"doc_id"))
    val out = Multimodal.decodeImages(df, "payload")
      .select($"doc_id", $"img.width", $"img.height", $"img.red_sum", $"img.green_sum")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    ids.foreach { id =>
      val (w, h, rs, gs) = out(id)
      assert(w == (8 + Math.floorMod(id, 24L)).toInt)
      assert(h == (8 + Math.floorMod(id * 7L, 24L)).toInt)
      // red channel carries signal (lossy, so approximate); green stays near zero
      val exactRed = (for { x <- 0 until w; y <- 0 until h }
        yield Math.floorMod(x * 31L + y * 17L + id, 256L)).sum
      assert(math.abs(rs - exactRed).toDouble / exactRed < 0.25, s"red_sum $rs vs $exactRed")
      assert(gs < exactRed / 2)
    }
  }

  test("multimodal: real javax.sound WAV round-trip through the batched decode seam") {
    val ids = Seq(0L, 1L, 63L, 500L)
    val df = ids.toDF("doc_id")
      .withColumn("payload", udf((id: Long) => Multimodal.synthWav(id)).apply($"doc_id"))
    val out = Multimodal.decodeAudio(df, "payload")
      .select($"doc_id", $"audio.sample_rate", $"audio.channels",
        $"audio.n_samples", $"audio.sample_sum")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSet
    val expect = ids.map { id =>
      val n = (64 + Math.floorMod(id, 192L)).toInt
      val s = (0 until n).map(i => Math.floorMod(i.toLong * 37L + id * 13L, 4096L) - 2048L).sum
      (id, 8000, 1, n.toLong, s)
    }.toSet
    assert(out == expect)
    // undecodable bytes drop the row, decodable ones survive
    val junk = Seq((1L, Array[Byte](9, 9, 9)), (2L, Multimodal.synthWav(2L)))
      .toDF("doc_id", "payload")
    assert(Multimodal.decodeAudio(junk, "payload").count() == 1)
  }

  test("image near-dup: banded dHash pairs equal brute force; exact dups, variants, unrelated") {
    // 60 images: ids 0..19 bases; 20..39 = EXACT byte dup of base id-20;
    // 40..59 = near variant of base id-40 (4 green-LSB nudges);
    // brute force over the same dHash is the ground truth — banding is
    // exact at hamming <= 3 by pigeonhole, so the sets must be EQUAL
    val payload: Long => Array[Byte] = id =>
      if (id < 20) Multimodal.synthPng(id)
      else if (id < 40) Multimodal.synthPng(id - 20)
      else Multimodal.synthPngVariant(id - 40, 4)
    val sigs = (0L until 60L).map(id => id -> Multimodal.dHashBytes(payload(id)).get)
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    // exact dups are hamming 0 -> guaranteed present
    assert((0L until 20L).forall(i => brute.contains((i, i + 20))),
      "exact duplicate pair missing from ground truth")
    assert(brute.size < 60 * 59 / 2 / 4, "fixture degenerate: most pairs collide")
    val df = sigs.indices.map(i => (sigs(i)._1, payload(sigs(i)._1))).toDF("id", "payload")
    val got = Multimodal.imageNearDup(df, "payload", "id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"banded != brute: missing=${brute -- got} extra=${got -- brute}")
    // undecodable payloads drop out silently
    val withJunk = df.union(Seq((99L, Array[Byte](1, 2, 3))).toDF("id", "payload"))
    val got2 = Multimodal.imageNearDup(withJunk, "payload", "id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == brute)
    // a string id column must fail loudly — a silent long-cast would
    // null every id and suppress every pair
    val strIds = df.withColumn("id", concat(lit("doc-"), $"id"))
    val ex = intercept[IllegalArgumentException] {
      Multimodal.imageNearDup(strIds, "payload", "id")
    }
    assert(ex.getMessage.contains("integral id column"))
  }

  test("frame sampling: frames reassemble to the exact payload bytes") {
    // orderBy before limit: bare limit gives no row-selection guarantee
    // across the two independent actions below
    val docs = Tables.documents(spark, sf).orderBy("doc_id").limit(50)
    val framed = graft.multimodal.Multimodal.frameSample(
      graft.multimodal.Multimodal.withBinaryPayload(docs, "text"), "payload", 64)
    // per doc: concat of frames in index order == original payload
    val rows = framed.select("doc_id", "frame_idx", "frame").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).flatMap(_.getAs[Array[Byte]](2)).toSeq
      }
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").toSeq).toMap
    rows.foreach { case (id, bytes) => assert(bytes == orig(id), s"doc $id") }
    // every non-terminal frame is exactly frameBytes long
    val lens = framed.select("doc_id", "frame_idx", "frame").collect()
      .groupBy(_.getLong(0))
    lens.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      sorted.dropRight(1).foreach(r => assert(r.getAs[Array[Byte]](2).length == 64))
    }
  }

  test("salted count-distinct equals plain count-distinct") {
    val li = Tables.lineitem(spark, sf)
    val salted = graft.operators.Skew.saltedCountDistinct(
        li, Seq("l_returnflag"), "l_partkey", col("l_orderkey"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("collection compaction: many small files -> few, content identical") {
    // the 100 TB ops concern: streaming/incremental appends accumulate
    // small files; compaction = read + repartition + overwrite-rewrite
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val store = graft.store.VectorStore(root)
    val docs = Tables.documents(spark, sf)
    store.create("c", docs.repartition(16)) // fragment: 16 files
    def files(n: String) = new java.io.File(s"$root/$n").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files("c") > 4)
    val before = store.read(spark, "c").collect().map(_.getLong(0)).sorted.toSeq
    // compact in place via a staging collection (never read+overwrite the
    // same path in one job)
    store.create("c_compact", store.read(spark, "c").repartition(2))
    assert(files("c_compact") <= 2)
    val after = store.read(spark, "c_compact").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before)
  }

  test("incremental ingest: delta is refresh-proof and idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_incr_spec").toString
    val store = VectorStore(root)
    val docs = Tables.documents(spark, sf)
    store.create("docs", docs.filter($"doc_id" < 250))
    val existing = store.read(spark, "docs").select("doc_id")
    // the ingest_incremental contract: materialize the delta BEFORE append
    val newDocs = docs.join(existing, Seq("doc_id"), "left_anti").cache()
    val nAdded = newDocs.count()
    store.append("docs", newDocs)
    newDocs.unpersist()
    // force a file-index relisting — the old read-after-append shape
    // returned a wrong n_added exactly here
    spark.catalog.refreshByPath(s"$root/docs")
    assert(nAdded == docs.filter($"doc_id" >= 250).count())
    // post-append the collection is complete: a fresh delta is empty and
    // re-running the ingest adds nothing (idempotence)
    val again = docs.join(store.read(spark, "docs").select("doc_id"), Seq("doc_id"), "left_anti")
    assert(again.count() == 0)
    assert(store.count(spark, "docs") == docs.count())
    store.destroy()
  }

  test("drainMemorySink drops the child-session sink view and localizes rows") {
    // memory sinks register their view in the CHILD session's catalog and
    // pin the materialized result there until dropped; drain must remove
    // the view and hand back a parent-session local relation
    import org.apache.spark.sql.functions.window
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "4")
    val name = "drain_test_sink"
    val src = child.readStream.format("rate").option("rowsPerSecond", "50").load()
    val q = src.withWatermark("timestamp", "0 seconds")
      .groupBy(window(col("timestamp"), "1 second")).count()
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q.awaitTermination()
    assert(child.catalog.tableExists(name), "sink view should exist before drain")
    val drained = graft.streaming.EventStream.drainMemorySink(spark, child, q, name)
    assert(!child.catalog.tableExists(name), "drain must drop the child-session sink view")
    drained.count() // parent-session local relation stays usable after the drop
  }

  test("streaming windowed agg equals batch windowed agg") {
    val batch = GraftQueries.q8EventsHourly(spark, sf).collect().toSet
    val streamed = GraftQueries.streamingHourly(spark, sf).collect().toSet
    assert(streamed == batch)
  }

  test("store compaction: many small files become few, content identical, store stays readable") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    val store = graft.store.VectorStore(tmp)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    store.create("c", docs.repartition(32))
    assert(store.dataFiles("c").size == 32)
    val beforeRows = store.read(spark, "c").orderBy("doc_id").collect().toSeq
    val (nb, na) = store.compact(spark, "c")
    assert(nb == 32 && na == 1, s"got ($nb, $na)")
    val afterRows = store.read(spark, "c").orderBy("doc_id").collect().toSeq
    assert(beforeRows == afterRows)
    // a partitioned store compacts too (files live a directory down)
    store.create("p", Tables.documents(spark, sf).select(col("doc_id"), col("text"), col("lang"))
      .repartition(16), partitionBy = Seq("lang"))
    val nbP = store.dataFiles("p").size
    assert(nbP > 5) // 16 tasks x |langs| leave plenty of small files
    val (b2, a2) = store.compact(spark, "p")
    assert(b2 == nbP && a2 < nbP)
    assert(store.count(spark, "p") == docs.count())
    store.destroy()
  }

  test("compaction crash recovery: a stranded __old collection heals on open") {
    // simulate dying between the two swap renames: data exists ONLY
    // under c__old — list()/read() must rename it back, not lose it
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_crash").toString
    val store = graft.store.VectorStore(tmp)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(20)
    store.create("c", docs)
    val expect = store.read(spark, "c").orderBy("doc_id").collect().toSeq
    assert(new java.io.File(s"$tmp/c").renameTo(new java.io.File(s"$tmp/c__old")))
    assert(store.list() == Seq("c"), "stranded __old must be recovered, not hidden")
    assert(store.read(spark, "c").orderBy("doc_id").collect().toSeq == expect)
    // a lone __old NEVER clobbers a live collection of the same name
    store.create("d", docs.limit(5))
    val dRows = store.read(spark, "d").orderBy("doc_id").collect().toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/d__old"))
    assert(store.list() == Seq("c", "d"))
    assert(store.read(spark, "d").orderBy("doc_id").collect().toSeq == dRows)
    store.destroy()
  }

  test("embedder binding: append contract enforced, manifest survives compaction, corrupt sidecar rejected") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_manifest_spec").toString
    val store = graft.store.VectorStore(tmp)
    val (pe, qe) = graft.embed.Embedders.asymmetric(p => graft.embed.HashEmbedder(16, p))
    val m = graft.store.CollectionManifest.of(pe, qe)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(20)
    store.create("c", docs, manifest = Some(m))
    // an undeclared append to a bound collection is the silent-mixed-space
    // bug the binding exists to prevent — must throw, not write
    val undeclared = intercept[IllegalArgumentException] { store.append("c", docs) }
    assert(undeclared.getMessage.contains("must declare"))
    // a DIFFERENT space is rejected even when declared
    val other = graft.store.CollectionManifest.single(graft.embed.HashEmbedder(32))
    val wrong = intercept[IllegalArgumentException] {
      store.append("c", docs, manifest = Some(other))
    }
    assert(wrong.getMessage.contains("different embedder"))
    assert(store.count(spark, "c") == 20, "rejected appends must not have written rows")
    // the matching manifest appends fine
    store.append("c", docs, manifest = Some(m))
    assert(store.count(spark, "c") == 40)
    // compaction rewrites layout but carries the binding across the swap
    store.compact(spark, "c")
    assert(store.manifest("c").map(_.fingerprint).contains(m.fingerprint))
    // round-trip preserves BPE merges exactly (part of the embedding space)
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"))
    val tm = graft.store.CollectionManifest("transformer", "/graft/toy_transformer.bin",
      48, "passage: ", "query: ", merges)
    store.create("t", docs, manifest = Some(tm))
    val back = store.manifest("t").get
    assert(back == tm && back.fingerprint == tm.fingerprint)
    // a hand-edited sidecar must not silently bind the wrong space
    val f = new java.io.File(s"$tmp/t/${graft.store.CollectionManifest.FileName}")
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    java.nio.file.Files.write(f.toPath, text.replace("dim=48", "dim=24").getBytes("UTF-8"))
    val corrupt = intercept[IllegalArgumentException] { store.manifest("t") }
    assert(corrupt.getMessage.contains("corrupt manifest"))
    store.destroy()
  }

  test("compaction preserves partition pruning: a filtered read scans only the matching partition") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_prune").toString
    val store = graft.store.VectorStore(tmp)
    store.create("p", Tables.documents(spark, sf).select(col("doc_id"), col("text"), col("lang"))
      .repartition(8), partitionBy = Seq("lang"))
    store.compact(spark, "p")
    val plan = store.read(spark, "p").filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    // `lang` must appear INSIDE the PartitionFilters bracket — the scan
    // prints an (empty) PartitionFilters entry and a data filter would
    // mention `lang` even if the layout had been flattened
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
      s"pruned read lost after compaction:\n$plan")
    // and the partition directories really survived the rewrite
    val langs = new java.io.File(s"$tmp/p").listFiles().filter(_.isDirectory).map(_.getName)
    assert(langs.forall(_.startsWith("lang=")), s"layout flattened: ${langs.toSeq}")
    store.destroy()
  }

  test("composed training-data chain: gates cut volume, packing fills sequences, manifest consistent") {
    val rows = GraftQueries.pipelineTrainingData(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val fullBySource = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (src, nd, nt, ns, fill) = (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))
      assert(nd > 0 && nd < fullBySource(src), s"$src: gates+sampling must cut volume ($nd)")
      assert(ns >= 1 && ns <= nd, s"$src: $ns sequences from $nd docs")
      // fill exceeds 1 only when a doc spills its sequence boundary, and
      // a small source may end on one partial sequence — but it is never
      // pathological in either direction
      assert(fill > 0.0 && fill < 2.0, s"$src: fill $fill")
      assert(nt >= (ns - 1) * 512, s"$src: $nt tokens cannot need $ns sequences")
    }
  }

  test("mix sampling: rates bounded by 1, binding source saturates, kept volume under target shares") {
    val rows = GraftQueries.pipelineMixSample(spark, sf).collect()
    assert(rows.length == 20) // every source keeps at least one doc at these rates
    val rates = rows.map(r => r.getAs[String]("source") -> r.getAs[Double]("sample_rate")).toMap
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0 + 1e-9))
    // the binding source saturates its rate; weight rule 1+(src# mod 3)
    // orders rates by weight among same-sized sources
    assert(rates.values.max > 0.999)
    assert(rates("src0") < rates("src1") && rates("src1") < rates("src2"))
    val shares = rows.map(_.getAs[Double]("achieved_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-3)
    // deterministic: a rerun returns the identical report
    val again = GraftQueries.pipelineMixSample(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
