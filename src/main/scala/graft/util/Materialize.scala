package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** The one spelling of the materialize-then-reorder idiom the
  * temp-table/stream/checkpoint queries share: collect the (bounded —
  * group counts, top-k; never data-sized) result to the driver BEFORE the
  * caller's finally block deletes the backing temp tree, then rebuild it
  * as a local DataFrame with the deterministic output order. Without the
  * eager collect, the returned frame would lazily re-read files the
  * caller is about to delete. */
object Materialize {
  def sorted(res: DataFrame, by: Column*): DataFrame = {
    val rows = res.collectAsList()
    res.sparkSession.createDataFrame(rows, res.schema).orderBy(by: _*)
  }
}
