package graft.util

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Rows actually read off storage (post row-group pruning) for a block of
  * work, via task input metrics — THE way this engine pins pruning claims,
  * because the plan string cannot show them (`PushedFilters: [In(…)]`
  * prints whether or not parquet stats prune; the In→range threshold
  * degradation is equally invisible). One definition shared by the specs
  * (SessionConfSpec, DocFetchPruneSpec) and the audit tools (FetchProbe) so
  * the drain heuristic can't drift between them. */
object InputMetrics {

  /** Runs `work`, then returns (result, records read by every task that
    * ended during the window). The listener bus drains ASYNCHRONOUSLY and a
    * scan may split across several tasks, so the read-out waits until the
    * counter has been BOTH nonzero and stable for a few polls — not merely
    * past a partial target — bounded by a deadline. Callers must not run
    * concurrent jobs on the session during the window. */
  def rowsRead[T](spark: SparkSession)(work: => T): (T, Long) = {
    @volatile var read = 0L
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        read += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = work
      val deadline = System.nanoTime() + 10e9.toLong
      var last = -1L
      var stable = 0
      while (stable < 4 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        if (read > 0 && read == last) stable += 1 else stable = 0
        last = read
      }
      (r, read)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
