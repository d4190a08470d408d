package graft

import org.apache.spark.sql.functions._

import graft.pipelines.{SlValidation, StatusCleansing}

/** End-to-end pipeline checks on the sf0.001 fixtures: every cascade is
  * total (no row left unclassified), sub-pipelines resolve their
  * sentinels, and the driver's smoke contract (entry rows > 0) holds. */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry (flagship valid_sl) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("apex cascade resolves every sentinel row") {
    val apex = SlValidation.apexCheckedQ(spark, dir)
    assert(apex.count() > 0)
    assert(apex.filter(col("comment").isNull ||
      col("comment") === SlValidation.ApexSentinel).count() === 0L)
  }

  test("intraco cascade is total") {
    val intra = SlValidation.intraCheckedQ(spark, dir)
    assert(intra.count() > 0)
    assert(intra.filter(col("comment").isNull).count() === 0L)
  }

  test("main_final analysis is total and resolves sentinels") {
    val fin = SlValidation.mainFinalQ(spark, dir)
    assert(fin.count() > 0)
    assert(fin.filter(col("analysis").isNull).count() === 0L)
    assert(fin.filter(col("analysis") === SlValidation.ApexSentinel).count() === 0L)
  }

  test("status cascade is total and fires multiple branches") {
    val st = StatusCleansing.marcCheckedQ(spark, dir)
    assert(st.filter(col("comment").isNull).count() === 0L)
    assert(st.select("comment").distinct().count() >= 4)
  }

  test("missing_sl finds active in-scope SKUs without a source list") {
    assert(SlValidation.missingSlQ(spark, dir).count() > 0)
  }
}
