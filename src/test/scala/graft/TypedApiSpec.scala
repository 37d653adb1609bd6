package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

// top-level: Dataset encoders can't capture test-class inner scopes
case class Li(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

object QtyStats extends Aggregator[Li, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Li): (Double, Long) =
    (b._1 + a.l_quantity, b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) 0.0 else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Typed Dataset API surface: case-class Datasets + a custom Aggregator
  * (the user-facing typed aggregate form).
  */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset pipeline with a custom Aggregator matches untyped avg") {
    val ds = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Li]
    val typed = ds.groupByKey(_.l_returnflag)
      .agg(QtyStats.toColumn.name("avg_qty"))
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.avg("l_quantity"))
      .as[(String, Double)].collect().toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-9) }
  }

  test("typed filter/map survive the encoder round trip") {
    val ds = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Li]
    val n = ds.filter(_.l_quantity > 25).map(_.l_orderkey).distinct().count()
    val viaSql = Tables.lineitem(spark, sf)
      .filter($"l_quantity" > 25).select("l_orderkey").distinct().count()
    assert(n == viaSql)
  }
}
