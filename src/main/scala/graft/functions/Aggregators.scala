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

  /** MERGEABLE Misra-Gries heavy-hitters summary: at most `k` counters of
    * fixed size, with the published guarantee that every recorded count
    * undercounts its item's true frequency by at most N/(k+1) — so every
    * item with true frequency above N/(k+1) is GUARANTEED present in the
    * summary (the candidate-superset property an exact verification pass
    * then filters; see the x103 gate). Unlike `df.stat.freqItems` (a
    * driver-side single-shot) this is a real [[Aggregator]]: it partial-
    * aggregates map-side, merges across partitions (merge = sum counters,
    * then subtract the (k+1)-th largest and drop non-positive — the
    * Agarwal et al. "Mergeable Summaries" reduction, which preserves the
    * additive bound), and therefore drops into groupBy and streaming
    * aggregations. At 100 TB this is the heavy-hitter shape: per-task
    * state is k counters regardless of corpus or vocabulary size, and
    * only k-sized summaries cross the wire. */
  final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, s"k must be > 0, got $k")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1L)
        case None if b.size < k => b.updated(tok, 1L)
        case None => // full: decrement every counter, drop the exhausted
          b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
      if (sum.size <= k) sum
      else {
        val thr = sum.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
        sum.flatMap { case (t, c) => if (c > thr) Some(t -> (c - thr)) else None }
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
