package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The small-heap plan gate (Stage.smallHeap) must be CONFIG-driven,
  * not a driver-heap guess: on a cluster the driver's Runtime.maxMemory
  * says nothing about executor pressure (VERDICT r17 advisory #1).
  * Pins, with the JVM heap unchanged:
  *
  *   - resolution order: explicit `spark.graft.smallHeap` wins, then
  *     `spark.executor.memory`, then the local-mode runtime fallback;
  *   - the near-dup screen's probe join actually FLIPS plan shape with
  *     the conf — shuffle-hash under the gate, planner's choice
  *     (broadcast for a small index) without it.
  */
class HeapGateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("smallHeap: explicit conf overrides everything, both ways") {
    withConf("spark.graft.smallHeap" -> "true") {
      assert(Stage.smallHeap(spark))
    }
    // spark.executor.memory is a STATIC conf (set at launch, immutable
    // on a live session) — the resolution order is pinned on the pure
    // decision function with the same inputs the session would supply
    val bigDriver = 32L << 30
    assert(!Stage.smallHeapDecision(Some("false"), Some("2g"), 2L << 30),
      "explicit override must beat a small executor size AND heap")
    assert(Stage.smallHeapDecision(Some("true"), Some("64g"), bigDriver),
      "explicit override must beat a large executor size AND heap")
  }

  test("smallHeap: derives from spark.executor.memory when set") {
    val bigDriver = 32L << 30
    assert(Stage.smallHeapDecision(None, Some("2g"), bigDriver),
      "2g executors must gate even under a big driver heap")
    assert(!Stage.smallHeapDecision(None, Some("8g"), 2L << 30),
      "8g executors must not gate even under a small driver heap")
    assert(Stage.smallHeapDecision(None, Some("6144m"), bigDriver),
      "the 6 GiB boundary itself is small (<=)")
    // Spark's EXECUTOR_MEMORY treats a unitless value as MiB — so must
    // the gate, or spark.executor.memory=4096 (a 4 GiB cluster) would
    // silently read as 4096 BYTES and gate into the slow shapes
    assert(!Stage.smallHeapDecision(None, Some("8192"), 2L << 30),
      "unitless executor memory is MiB (8192 = 8 GiB, not 8 KiB)")
    assert(Stage.smallHeapDecision(None, Some("4096"), bigDriver),
      "unitless 4096 = 4 GiB, which gates")
  }

  test("smallHeap: falls back to the driver heap in local mode") {
    // the test JVM runs with multi-GiB heap (build.sbt pins 8g default)
    // and the shared session sets neither conf — the fallback must
    // agree with the live runtime heap, whichever side it is on
    assert(Stage.smallHeap(spark) ===
      (Runtime.getRuntime.maxMemory <= Stage.SmallHeapBytes))
  }

  test("probe join flips shuffle-hash <-> broadcast with the conf") {
    import spark.implicits._
    val batch8 = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "gh")
    val idx = Seq((10L, 7L), (20L, 8L)).toDF("gh", "corpus_doc")
    def plan(small: Boolean): String =
      withConf("spark.graft.smallHeap" -> small.toString) {
        graft.operators.TextQueries.incNearCandProbe(spark, batch8, idx)
          .queryExecution.executedPlan.toString
      }
    val gated = plan(small = true)
    val free = plan(small = false)
    assert(gated.contains("ShuffledHashJoin"),
      s"small-heap gate must force shuffle-hash:\n$gated")
    assert(!free.contains("ShuffledHashJoin") &&
      free.contains("BroadcastHashJoin"),
      s"with heap headroom the tiny index must broadcast:\n$free")
  }
}
