package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

/** Unpersists relations cached for the lifetime of one streaming query
  * once that query terminates (ADVICE r12: the stream-static components
  * cache their broadcast-side relations per invocation, and bench loops
  * / ScaleRehearsal invoke them repeatedly in one session — without a
  * cleanup hook the storage memory accumulates for the session's life).
  *
  * A daemon thread blocks on the query's own `awaitTermination` and
  * unpersists in a finally, so cleanup runs however the CALLER waits
  * (timeout-bounded awaits, plain awaits, or not at all) and exactly
  * once per query, with no listener-registration race against an
  * AvailableNow query that finishes before a listener could attach.
  */
private[streaming] object StreamCacheCleanup {

  /** Attach cleanup of `cached` to `query`'s termination; returns the
    * query for fluent use at the `start()` site.
    */
  def onTermination(query: StreamingQuery,
      cached: Dataset[_]*): StreamingQuery = {
    val t = new Thread(() => {
      try query.awaitTermination()
      catch { case _: Throwable => () } // failed query still unpersists
      finally cached.foreach(_.unpersist())
    })
    t.setName(s"graft-unpersist-${query.id}")
    t.setDaemon(true)
    t.start()
    query
  }
}
