package graft.streaming

/** Microsecond-exact `java.sql.Timestamp` codec shared by the stateful
  * streams. `Timestamp.getTime` is millisecond-truncated, but the batch
  * operators these streams claim row-identity with (`cdc_compact`,
  * `rel_sessionize`) order and diff on `unix_micros(ts)` — two events in
  * the same millisecond differing only in microseconds must compare the
  * same way in both engines, so state machines must carry the full
  * microsecond ordinal, not `getTime * 1000`.
  */
object EventTime {

  /** Epoch microseconds, exactly what Spark's `unix_micros` computes:
    * whole seconds from `getTime` (floor for pre-epoch values) plus the
    * sub-second nanos field truncated to micros.
    */
  def toMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  /** Inverse of [[toMicros]]: reconstructs the timestamp with its
    * sub-millisecond digits intact (the `Timestamp(millis)` constructor
    * only carries millis; the nanos field restores the rest).
    */
  def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
