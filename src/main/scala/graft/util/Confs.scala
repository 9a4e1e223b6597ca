package graft.util

import org.apache.spark.sql.SparkSession

/** The one spelling of the save/set/restore session-conf dance. Streaming
  * queries size `spark.sql.shuffle.partitions` to their state (the knob a
  * real deployment sets per stream), and the AQE gates pin skew
  * thresholds — in both cases the previous values must be restored even
  * when the body throws, or the leaked setting skews every subsequent
  * query in the session (a 32-cpu battery running on 8 shuffle
  * partitions). */
object Confs {
  def withConfs[A](spark: SparkSession, confs: (String, String)*)(body: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
