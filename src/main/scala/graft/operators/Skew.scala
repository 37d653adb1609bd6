package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed probe side into `salts`
  * sub-keys and replicate the build side once per salt, so one hot key
  * spreads over `salts` tasks instead of one straggler.
  *
  * AQE's skew-join handles sort-merge cases adaptively at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting is the static
  * fallback for aggregation-style hot keys and for engines/plans AQE can't
  * split. The salt is derived deterministically from `saltSource` so runs
  * are replayable.
  */
object Skew {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     saltSource: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase (salted partial, then final) aggregation for hot grouping
    * keys: groupBy(keys :+ salt) partial-aggregates the hot key across
    * `salts` reducers, then the tiny salted partials merge. For algebraic
    * aggregates Spark's map-side partial aggregation already does this;
    * use when a non-algebraic aggregate (e.g. collect_list/exact distinct)
    * concentrates one key on one reducer.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], distinctCol: String,
                          saltsource: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(saltsource), lit(salts)).cast("int"))
    salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(collect_set(col(distinctCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(size(array_distinct(flatten(collect_list(col("_partial"))))).cast("long").as(s"n_distinct_$distinctCol"))
  }
}
