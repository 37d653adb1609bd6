package graft

import graft.text.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainer learns the hand-derivable merge sequence on a tiny corpus") {
    // corpus: aaab x2, ab x1. Pair counts round 1: (a,a)=4, (a,b)=3 ->
    // merge (a,a). Round 2: (aa,a)=2, (a,b)=3 -> merge (a,b). Round 3:
    // (aa,ab)=2 -> merge (aa,ab). Then no pairs remain.
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 10)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")), s"got $merges")
  }

  test("encoder applies merges by rank; unseen pairs stay as characters") {
    val rank = Seq(("a", "a"), ("a", "b"), ("aa", "ab")).zipWithIndex.toMap
    assert(Bpe.encodeWord("aaab", rank).toSeq == Seq("aaab"))
    assert(Bpe.encodeWord("ab", rank).toSeq == Seq("ab"))
    // [a,a,b]: rank-0 (a,a) fires first -> [aa,b]; (aa,b) unranked -> stop
    assert(Bpe.encodeWord("aab", rank).toSeq == Seq("aa", "b"))
    assert(Bpe.encodeWord("xyz", rank).toSeq == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("a", rank).toSeq == Seq("a"))
  }

  test("astral-plane characters stay whole code points, never sheared surrogates") {
    val none = Map.empty[(String, String), Int]
    assert(Bpe.encodeWord("😀", none).toSeq == Seq("😀"))
    assert(Bpe.encodeWord("a😀b", none).toSeq == Seq("a", "😀", "b"))
  }

  test("corpus-trained encoding: invariants and determinism") {
    // orderBy pins WHICH 200 docs both trainings see — a bare limit on a
    // multi-partition source is not a deterministic sample
    val docs = Tables.documents(spark, sf).orderBy("doc_id").limit(200)
    val merges = Bpe.train(docs, "text", numMerges = 30)
    assert(merges.size == 30)
    assert(merges.distinct.size == merges.size, "merges must be unique")
    val rep = Bpe.encodeReport(docs, "text", "doc_id", merges).collect()
    rep.foreach { r =>
      val (nw, ns, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ns >= nw, "cannot have fewer subwords than words")
      assert(ns <= nc, "cannot have more subwords than characters")
    }
    // frequent-word compression actually happened somewhere
    assert(rep.exists(r => r.getLong(2) < r.getLong(3)))
    val again = Bpe.train(docs, "text", numMerges = 30)
    assert(again == merges, "training must be deterministic")
  }
}
