package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Mechanized `.explain` audit: the plan shapes that matter at 100 TB,
 * asserted on the real driver-contract queries so regressions in
 * pushdown / pruning / broadcast / top-k short-circuiting fail CI
 * rather than surfacing as cluster bills.
 */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q03 LIKE filter is pushed to the parquet scan") {
    val p = plan("q03_filter_like")
    assert(p.contains("PushedFilters: [IsNotNull(p_name), StringContains(p_name,widget)]"),
      s"filter not pushed:\n$p")
  }

  test("q02 scan reads only the projected columns") {
    val p = plan("q02_project_alias_limit")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q06 dimension joins broadcast (no fact-side shuffle for the join)") {
    val p = plan("q06_join_agg_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("q07 top-k uses TakeOrderedAndProject, not a global sort") {
    val p = plan("q07_topk_customers")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q05 aggregation is partial (map-side combine before the shuffle)") {
    val p = plan("q05_agg_pricing")
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"no partial aggregation:\n$p")
  }

  test("whole-stage codegen covers the scan-project-filter pipelines") {
    // executedPlan.toString marks codegen stages with a "*(n)" prefix
    val p = plan("q02_project_alias_limit")
    assert(p.contains("*("), s"no codegen spans:\n$p")
  }
}
