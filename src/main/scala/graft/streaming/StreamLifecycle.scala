package graft.streaming

import java.util.UUID
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** One hardened implementation of "run this cleanup when THAT query
  * terminates" shared by the lease and cache lifecycles (CdcRelay,
  * AnnStream). Two races a naive listener misses:
  *
  *   - the query can terminate BEFORE the listener registers (a stream
  *     that fails during initialization); the post-registration
  *     `isActive` check runs the cleanup in that case;
  *   - both paths can fire; `action` must therefore be idempotent
  *     (lease release and unpersist both are), and the once-guard here
  *     keeps the common path single-shot.
  */
object StreamLifecycle {

  def onTerminated(spark: SparkSession, query: StreamingQuery)(
      action: () => Unit): Unit = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    def runOnce(): Unit = if (fired.compareAndSet(false, true)) action()
    val id: UUID = query.id
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == id) {
          runOnce()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    // closes the register-after-terminate race: if the query died before
    // the listener went in, its event may never be observed — clean up
    // now (the listener then removes itself on any later delivery)
    if (!query.isActive) {
      runOnce()
      spark.streams.removeListener(listener)
    }
  }

  /** Run `action` on every progress event of `query` (e.g. a lease
    * refresh). Errors in `action` propagate to the listener bus, not
    * the query, so a refresh failure is surfaced via `onFailure`.
    */
  def onProgress(spark: SparkSession, query: StreamingQuery)(
      action: () => Unit, onFailure: Throwable => Unit = _ => ()): Unit = {
    val id: UUID = query.id
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == id) {
          try action() catch { case t: Throwable => onFailure(t) }
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == id) spark.streams.removeListener(this)
    }
    spark.streams.addListener(listener)
  }
}
