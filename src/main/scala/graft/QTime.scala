package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.QTime <sfDir> <name>...
  *
  * Round-7 protocol (VERDICT r6 task 2): two passes with the
  * session-lifetime extension memos EVICTED at the pass boundary
  * ([[graft.pipelines.Extensions.clearMemos]] + catalog cache clear +
  * one forced GC so ContextCleaner reaps dead broadcast/shuffle
  * state). Without the eviction, pass 2 at sf1 ran under the
  * accumulated memo residency of pass 1 and collapsed (x25 97.6 →
  * 206.9 s in the r6 table) — each pass is now an independent
  * bounded-residency epoch, so pass-to-pass swings measure warm-up
  * and host noise, not accumulation. Disable with
  * SPARK_GRAFT_QTIME_EVICT=0 to reproduce the accumulation regime.
  *
  * NOTE the deliberate default DIVERGENCE from [[Bench]] (ADVICE r7):
  * Bench defaults to NO eviction between passes (its pass 2 measures
  * the warm regime the driver grades), while QTime defaults to
  * eviction (its job is attribution under bounded residency). The
  * knobs therefore have DIFFERENT names — setting Bench's
  * SPARK_GRAFT_EVICT_BETWEEN_PASSES does not change QTime and vice
  * versa; pass-2 numbers from the two mains are only comparable when
  * the regimes are explicitly matched. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // ADVICE r8 compatibility: QTime's knob was once the same name as
    // Bench's — a harness script still setting only the old name gets
    // it honored (with a note), instead of silently reverting QTime to
    // its eviction default; the new name wins when both are set
    val evict = sys.env.get("SPARK_GRAFT_QTIME_EVICT")
      .orElse(sys.env.get("SPARK_GRAFT_EVICT_BETWEEN_PASSES").map { v =>
        System.err.println("[qtime] note: honoring legacy " +
          s"SPARK_GRAFT_EVICT_BETWEEN_PASSES=$v for the QTime eviction " +
          "knob; set SPARK_GRAFT_QTIME_EVICT to silence this")
        v
      }).getOrElse("1") == "1"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same AQE wide-start posture as Bench — measurements must match
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true") // same as Bench (r13): cached plans keep AQE coalescing
      .config("spark.cleaner.periodicGC.interval", "1min") // same as Bench
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gcMs: Long = Telemetry.gcMsNow
    for (pass <- 1 to 2) {
      for (n <- args.drop(1)) {
        val gc0 = gcMs
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[qtime] pass$pass $n%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
          f"  gc=${gcMs - gc0}%5d ms")
        graft.ops.Caching.reapTemps() // same per-query protocol as Bench
      }
      if (evict && pass == 1) {
        graft.pipelines.Extensions.clearMemos(spark)
        spark.catalog.clearCache()
        System.gc()
        println("[qtime] pass boundary: memos+caches evicted, GC forced")
      }
    }
    spark.stop()
  }
}
