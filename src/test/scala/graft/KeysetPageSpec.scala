package graft

import org.apache.spark.sql.functions._

/** Keyset pagination ([[graft.store.MutableCollection.getAfter]]): the
  * scale contract — page equivalence with the offset form on the same
  * snapshot, and NO single-partition window anywhere in the plan. */
class KeysetPageSpec extends SparkSpec {

  test("getAfter equals getPage on the same snapshot and plans no window") {
    val store = graft.store.VectorStore(
      java.nio.file.Files.createTempDirectory("graft_pagek_spec").toString)
    try {
      val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
      val mc = store.createMutable("vecs", e, "vec_id")
      mc.upsert(e.filter(col("vec_id") % 10 === 3)
        .withColumn("label", col("label") + 10))
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))

      // page 2 of 15: offset form vs keyset form seeded with page 1's max id
      val page1 = mc.getPage(spark, limit = 15)
        .select("vec_id", "label").collect().map(r => (r.getLong(0), r.getInt(1)))
      val last = page1.map(_._1).max
      val offsetPage = mc.getPage(spark, limit = 15, offset = 15)
        .select("vec_id", "label").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      val keyset = mc.getAfter(spark, last, 15)
      val keysetPage = keyset
        .select("vec_id", "label").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(keysetPage == offsetPage,
        s"keyset page must equal the offset page:\n k=$keysetPage\n o=$offsetPage")

      // the keyset plan carries no window — deep pages stay TakeOrdered
      val plan = keyset.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"keyset pagination must not plan a window:\n$plan")
      assert(plan.contains("TakeOrderedAndProject"),
        s"keyset pagination should be a TakeOrdered prefix:\n$plan")
      // ... while the offset form does pay one (the documented trade)
      val offsetPlan = mc.getPage(spark, limit = 15, offset = 15)
        .queryExecution.executedPlan.toString
      assert(offsetPlan.contains("Window"))
    } finally store.destroy()
  }
}
