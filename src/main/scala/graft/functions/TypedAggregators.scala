package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset Aggregator surface (the Encoder-based twin of the
  * Catalyst-level GraftTopK): quantity-weighted mean price with an exact
  * integer-cents buffer, so the merge is associative-exact and the result
  * is independent of partitioning — the same order-independence rule the
  * untyped tier gets from [[graft.Tables.dsum]]'s decimal routing.
  *
  * Buffer bounds: prices are 2-dp positives up to ~1e6 and weights
  * integral up to ~100, so sum(cents * weight) stays far below 2^53 even
  * at 100 TB per-group volumes; the two final IEEE divisions are a fixed
  * sequence shared with the oracle SQL.
  */
object TypedAggregators {

  case class PricedItem(l_returnflag: String, l_extendedprice: Double, l_quantity: Double)

  object WeightedMeanPrice extends Aggregator[PricedItem, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), r: PricedItem): (Long, Long) =
      (b._1 + math.round(r.l_extendedprice * 100) * r.l_quantity.toLong,
        b._2 + r.l_quantity.toLong)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Long)): Double =
      b._1.toDouble / b._2.toDouble / 100.0
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
