package org.apache.spark.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.{CleanerListener, SparkContext}

/** Bench-side diagnostic hook on the ContextCleaner (SCALING.md round
  * 18, "curation's slow mode"): the roaming post-batch stream slowdown
  * was adjudicated as an async-cleanup race — checkpoint/shuffle/
  * broadcast debt from the batch phase draining DURING a stream's
  * timed window — but the adjudication rested on elimination (no heap
  * growth, clearCache hygiene already in place, nondeterministic
  * recurrence). This probe makes the cleaner's activity directly
  * observable so a slow rep carries its own diagnosis: counts of
  * completed cleanups per kind plus the time of the last completion,
  * sampled by the bench before/after each measured window.
  *
  * Lives under `org.apache.spark` because [[CleanerListener]] and
  * `SparkContext.cleaner` are `private[spark]` — this is the supported
  * observation surface (the cleaner invokes every attached listener on
  * each completed cleanup; Spark's own tests attach one the same way),
  * not a reflection hack into cleaner internals. Counters only; no
  * behavior change to cleaning itself.
  */
object CleanerProbe {

  /** Monotone counters shared by every sampler; `lastCleanupNanos` is
    * the System.nanoTime of the most recent completion (0 = never).
    */
  final class Counts {
    val rdd = new AtomicLong
    val shuffle = new AtomicLong
    val broadcast = new AtomicLong
    val accum = new AtomicLong
    val checkpoint = new AtomicLong
    val lastCleanupNanos = new AtomicLong(0L)
    def total: Long =
      rdd.get + shuffle.get + broadcast.get + accum.get + checkpoint.get
    override def toString: String =
      s"rdd=${rdd.get} shuffle=${shuffle.get} broadcast=${broadcast.get} " +
        s"accum=${accum.get} checkpoint=${checkpoint.get}"
  }

  /** The installed counters are keyed per SparkContext (ADVICE r19 +
    * r20): a WeakHashMap — not a single last-context slot — so (a)
    * re-attaching to a previously seen context after a different one
    * was installed returns its ORIGINAL counters instead of stacking a
    * second listener on the same cleaner (there is no detach API, so a
    * duplicate would double-count and reset the observed window), and
    * (b) a stopped context isn't pinned by a strong reference — the
    * weak key lets it be collected along with its counters.
    */
  private val installed =
    new java.util.WeakHashMap[SparkContext, Counts]()

  /** Attach (once per SparkContext) and return the shared counters;
    * None when the context runs without a cleaner
    * (`spark.cleaner.referenceTracking=false`), in which case there is
    * no async-cleanup race to observe either.
    */
  def attach(sc: SparkContext): Option[Counts] = synchronized {
    val cur = installed.get(sc)
    if (cur != null) return Some(cur)
    sc.cleaner.map { cleaner =>
      val c = new Counts
      cleaner.attachListener(new CleanerListener {
        private def hit(ctr: AtomicLong): Unit = {
          ctr.incrementAndGet()
          c.lastCleanupNanos.set(System.nanoTime())
          ()
        }
        override def rddCleaned(rddId: Int): Unit = hit(c.rdd)
        override def shuffleCleaned(shuffleId: Int): Unit =
          hit(c.shuffle)
        override def broadcastCleaned(broadcastId: Long): Unit =
          hit(c.broadcast)
        override def accumCleaned(accId: Long): Unit = hit(c.accum)
        override def checkpointCleaned(rddId: Long): Unit =
          hit(c.checkpoint)
      })
      installed.put(sc, c)
      c
    }
  }

  /** Total stop-the-world GC milliseconds since JVM start, summed over
    * collectors — per-window deltas separate "the cleaner was busy"
    * from "the JVM was collecting" in a slow rep's diagnosis.
    */
  def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }
}
