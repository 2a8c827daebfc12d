package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** q18's HLL sketch has no cross-engine oracle (sketch internals
  * differ by design); its accuracy contract is asserted here instead:
  * approx_count_distinct's default rsd is 5%, so 3 sigma ≈ 15%.
  */
class SketchSpec extends AnyFunSuite with SparkTestSession {

  test("approx_count_distinct stays within 15% of the exact count") {
    val rows = LlmQueries.all("q18_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
