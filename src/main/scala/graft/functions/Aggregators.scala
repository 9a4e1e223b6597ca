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
    * works map-side like any built-in). */
  object MaxByKey extends Aggregator[(Double, Long), (Double, Long), Long] {
    def zero: (Double, Long) = (Double.NegativeInfinity, Long.MaxValue)
    def reduce(b: (Double, Long), a: (Double, Long)): (Double, Long) = merge(b, a)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      if (x._1 > y._1) x
      else if (y._1 > x._1) y
      else if (x._2 <= y._2) x else y
    def finish(b: (Double, Long)): Long = b._2
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
