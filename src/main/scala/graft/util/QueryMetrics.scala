package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query observability (the reference's "payload logging" role —
  * dags/etl.py logs raw payload rows — restated as what an engine at scale
  * actually needs logged: per-query physical metrics, not data).
  *
  * [[Listener]] is a `QueryExecutionListener` that, on each successful
  * query, walks the EXECUTED plan (descending through AQE's adaptive root
  * and materialized query stages — the runtime plan, not the static one)
  * and aggregates every SQL metric by name: scan output rows, shuffle
  * bytes written, spill sizes, etc. One [[QueryStats]] record per query,
  * queryable in-process or formatted as a log line — no data rows are ever
  * captured, so the listener is safe on sensitive corpora and costs O(plan
  * nodes), not O(data).
  *
  * Usage:
  * {{{
  * val m = QueryMetrics.register(spark)
  * df.count()
  * m.snapshot.head.metric("numOutputRows")   // summed across ALL operators
  * }}}
  *
  * Listener callbacks fire asynchronously on the listener bus;
  * [[Listener.awaitQueries]] polls until the expected count arrives
  * (deterministic tests, no private Spark APIs).
  */
object QueryMetrics {

  final case class QueryStats(funcName: String, durationNs: Long,
                              metrics: Map[String, Long]) {
    def metric(name: String): Long = metrics.getOrElse(name, 0L)
    /** One log4j-friendly line: the O4 logging outlet. */
    def logLine: String = {
      val picks = Seq("numOutputRows", "numFiles", "filesSize",
        "shuffleBytesWritten", "shuffleRecordsWritten", "spillSize")
        .map(k => s"$k=${metric(k)}").mkString(" ")
      s"query=$funcName durationMs=${durationNs / 1000000} $picks"
    }
  }

  /** All nodes of the runtime plan, descending through the AQE root's
    * current physical plan and into materialized query stages (a plain
    * `children` walk sees only stubs once AQE re-plans). Each node is
    * visited ONCE by identity: a reused query stage / exchange appears
    * under every reuse wrapper, and without the dedup its metrics would
    * be summed once per reuse — double-counted bytes/rows in logLine for
    * any self-join shape. */
  private def allNodes(root: SparkPlan): Seq[SparkPlan] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Seq[SparkPlan] =
      if (!seen.add(p)) Seq.empty
      else {
        val nested = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec        => Seq(s.plan)
          case _                        => Seq.empty
        }
        p +: (p.children ++ nested).flatMap(walk)
      }
    walk(root)
  }

  private[util] def collect(qe: QueryExecution): Map[String, Long] =
    allNodes(qe.executedPlan)
      .flatMap(n => n.metrics.map { case (name, m) => name -> m.value })
      .groupMapReduce(_._1)(_._2)(_ + _)

  final class Listener extends QueryExecutionListener {
    private val q = new ConcurrentLinkedQueue[QueryStats]()
    def snapshot: Seq[QueryStats] = q.asScala.toList
    def clear(): Unit = q.clear()

    /** Poll (listener bus is async) until `n` queries are recorded. */
    def awaitQueries(n: Int, timeoutMs: Long = 30000): Seq[QueryStats] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000
      while (q.size < n && System.nanoTime() < deadline) Thread.sleep(10)
      snapshot
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      q.add(QueryStats(funcName, durationNs, collect(qe)))
    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
  }

  /** Register a fresh listener on the session and return it. */
  def register(spark: org.apache.spark.sql.SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }
}
