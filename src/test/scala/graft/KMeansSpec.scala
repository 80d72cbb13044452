package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KMeans

/** The convergence properties Lloyd's algorithm guarantees, asserted
  * on the distributed implementation: monotone objective, termination,
  * full coverage, and exact determinism (the reason vectors are summed
  * as micro-unit longs).
  */
class KMeansSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("objective is monotonically non-increasing and the run terminates") {
    val r = KMeans.run(spark, sf, k = 8, maxIters = 15)
    assert(r.objective.nonEmpty && r.iters <= 15)
    r.objective.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"objective rose: ${r.objective}")
      case _ => ()
    }
    val total = graft.Tables.embeddings(spark, sf).count()
    assert(r.sizes.values.sum == total)
    assert(r.sizes.keySet.size <= 8 && r.sizes.values.forall(_ > 0))
  }

  test("the run is exactly deterministic across invocations") {
    val a = KMeans.run(spark, sf, k = 4, maxIters = 6)
    val b = KMeans.run(spark, sf, k = 4, maxIters = 6)
    assert(a.objective == b.objective)
    assert(a.sizes == b.sizes)
    assert(a.iters == b.iters)
  }
}
