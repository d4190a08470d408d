package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch
import graft.ops.Events

/** Pins the log-histogram quantile sketch: bin math and end-to-end
  * estimate accuracy vs the exact percentiles on the real fixture. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bin boundaries are ascending, distinct, and binOf inverts them") {
    val b = QuantileSketch.Boundaries
    assert(b === b.distinct.sorted)
    // every boundary value must land in its own bin, boundary-1 in the previous
    val probes = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 100L, 1023L, 1024L, 999999L)
    val out = probes.toDF("v")
      .select(col("v"), QuantileSketch.binOf(col("v")).as("bin"))
      .as[(Long, Long)].collect().toMap
    probes.foreach { v =>
      val expected = b.lastIndexWhere(_ <= v)
      assert(out(v) === expected.toLong, s"v=$v")
      assert(b(out(v).toInt) <= v && v < QuantileSketch.upper(out(v).toInt))
    }
  }

  test("sketch estimates land within bin resolution of the exact DISCRETE quantiles") {
    // the sketch's rank = ceil(q·n) is the discrete (order-statistic)
    // quantile; comparing against interpolated quantile_cont would mix
    // semantics (on a 188-sample tail the two differ by far more than
    // the sketch's bin error)
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val cents = ev.select(col("event_type"), Events.valueCents(col("value")).as("cents"))
    val est = QuantileSketch.groupQuantiles(cents, "event_type", "cents")
      .select("event_type", "p50_est", "p90_est", "p99_est")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    val byType = cents.as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    assert(est.keySet === byType.keySet)
    for ((t, vals) <- byType; (q, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val exactDisc = vals(math.ceil(q * vals.length).toInt - 1).toDouble
      val s = est(t)(i)
      // log bins are ≤25% wide; interpolation keeps the estimate inside
      // the value's bin → bounded relative error
      assert(math.abs(s - exactDisc) / math.max(exactDisc, 1.0) <= 0.25,
        s"$t q=$q: sketch $s vs exact-disc $exactDisc")
    }
  }
}
