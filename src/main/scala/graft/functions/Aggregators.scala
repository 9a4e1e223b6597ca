package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (SURVEY.md §2.2 UDAF row): used where a
  * built-in doesn't exist; kept deterministic (total-order tie-breaks,
  * no floating accumulation).
  */
object Aggregators {

  /** argmax with deterministic tie-break: returns the key of the row with
    * the maximum value; on equal values the SMALLEST key wins. Buffer is a
    * single (value, key) pair — constant-size, mergeable (partial agg
    * works map-side like any built-in).
    *
    * Values compare under `java.lang.Double.compare`'s TOTAL order (NaN
    * greatest, -0.0 < 0.0) rather than primitive `>`: with IEEE `>` every
    * comparison against NaN is false, so a NaN row would fall into the
    * key tie-break against ANY value and merge would lose associativity —
    * the winning key would depend on partition/merge order. The total
    * order keeps merge associative for every input and agrees with how
    * both Spark and DuckDB sort doubles (NaN last). */
  object MaxByKey extends Aggregator[(Double, Long), (Double, Long), Long] {
    def zero: (Double, Long) = (Double.NegativeInfinity, Long.MaxValue)
    def reduce(b: (Double, Long), a: (Double, Long)): (Double, Long) = merge(b, a)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) = {
      val c = java.lang.Double.compare(x._1, y._1)
      if (c > 0) x
      else if (c < 0) y
      else if (x._2 <= y._2) x else y
    }
    def finish(b: (Double, Long)): Long = b._2
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
