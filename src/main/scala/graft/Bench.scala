package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graftbench.ListenerDrain
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query. Protocol
  * (round-5 hardening):
  *  - queries run in FIXED sorted order so run-to-run profiles are
  *    comparable (map iteration order previously let JIT/cache warm-up
  *    land on a different query each run — a 2x total spread);
  *  - two full passes; pass 1 doubles as the warm-up (JIT compilation
  *    + materialization of the shared persisted subplans), the
  *    reported per-query time is the MIN across passes;
  *  - NOISE PROTOCOL (round 5): queries whose best time is < 1 s get
  *    ONE extra timed pass (min-of-3). Sub-second queries carried the
  *    run-to-run variance in r4 (x40/x42/x43 "regressed" 1.5-1.7x on
  *    GC jitter alone); a third sample halves the odds a real
  *    regression hides in — or is faked by — scheduler noise.
  *  - a query that throws is reported in an "errs" field with its
  *    wall-clock EXCLUDED from the total — silently timing a failed
  *    query at ~0 s used to inflate the apparent throughput;
  *  - the final stdout line is SHORT (≤ ~300 bytes: total + count +
  *    error count + ledger path). Four rounds of harness history show
  *    a long line gets truncated by tail-capture before it is parsed;
  *    the full per-query ledger (seconds, per-pass seconds, shuffle
  *    rows/bytes, spill, post-query storage residency) lives in
  *    `target/bench.json` only.
  *
  * Telemetry: a [[SparkListener]] accumulates per-stage shuffle
  * read/write bytes+records and spill; per (query, pass) deltas are
  * attributed after a listener-bus drain (see
  * [[org.apache.spark.graftbench.ListenerDrain]]) so async stage
  * events land on the query that ran them. Post-query storage
  * residency (`sc.getRDDStorageInfo`) is snapshotted AFTER the
  * operator-local cache reap, so the ledger shows exactly which
  * pipeline-level caches were resident when each query finished —
  * the instrument VERDICT r4 asked for to attribute the x41
  * regression and the suite-head cache-thrash hypothesis.
  */
object Bench {

  /** Suite-lifetime totals from completed stages; snapshot+diff gives
    * per-query attribution. AtomicLong because stage events arrive on
    * the listener-bus dispatch thread, not the bench loop thread. */
  private final class StageTotals extends SparkListener {
    val readBytes    = new AtomicLong
    val readRecords  = new AtomicLong
    val writeBytes   = new AtomicLong
    val writeRecords = new AtomicLong
    val spillBytes   = new AtomicLong
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val m = ev.stageInfo.taskMetrics
      if (m != null) {
        readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        readRecords.addAndGet(m.shuffleReadMetrics.recordsRead)
        writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        writeRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        spillBytes.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
      }
    }
    def snap: Vector[Long] = Vector(readBytes.get, readRecords.get,
      writeBytes.get, writeRecords.get, spillBytes.get)
  }

  /** One query's ledger row: per-pass seconds plus the telemetry of
    * the pass that produced the min. */
  private final case class Row(
      var best: Double = Double.NaN,
      val passSecs: collection.mutable.ArrayBuffer[Double] = collection.mutable.ArrayBuffer(),
      var tele: Vector[Long] = Vector.fill(5)(0L),
      var storageMbAfter: Double = 0.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // spill-aware shuffle sizing: let AQE START wide (8x cores) and
      // coalesce down — parallelismFirst (default true) keeps small
      // shuffles at ~cores partitions, so only data-heavy shuffles
      // (x25's candidate pairs grew 94 GB of spill over 32 fixed
      // buckets at sf1) actually fan out. The cluster analogue of
      // sizing shuffle.partitions to the data, not the core count.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts (ns)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: benign WARN lines (CacheManager re-cache notices,
    // function re-registration) interleave with the one JSON protocol line
    // and have broken downstream parsing of the bench output.
    spark.sparkContext.setLogLevel("ERROR")
    val totals = new StageTotals
    spark.sparkContext.addSparkListener(totals)

    val names = SparkEntry.queries.keys.toSeq.sorted
    val rows = collection.mutable.LinkedHashMap[String, Row](names.map(_ -> Row()): _*)
    val errs = collection.mutable.LinkedHashMap.empty[String, String]

    def runOne(name: String): Unit = {
      ListenerDrain.drain(spark.sparkContext)
      val before = totals.snap
      val t0 = System.nanoTime()
      // noop sink: forces FULL evaluation of every output column —
      // count() would let Catalyst prune projected computations and
      // understate the work
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        ListenerDrain.drain(spark.sparkContext)
        val row = rows(name)
        row.passSecs += dt
        if (row.best.isNaN || dt < row.best) {
          row.best = dt
          row.tele = totals.snap.lazyZip(before).map(_ - _)
        }
      } catch { case e: Throwable =>
        errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.next().take(200)
      } finally {
        // drop this query's operator-local caches (ADVICE r2): pipeline
        // -level shared caches stay; per-query frames must not
        // accumulate for the JVM lifetime across a 111-query suite
        graft.ops.Caching.reapTemps()
        // post-reap residency = the pipeline-level caches alive at this
        // point of the suite (the eviction diagnosis instrument)
        rows(name).storageMbAfter =
          spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e6
      }
    }

    for (_ <- 1 to passes; name <- names) runOne(name)
    // min-of-3 for the noise-dominated sub-second rows
    for (name <- names if !rows(name).best.isNaN && rows(name).best < 1.0) runOne(name)

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    val ok = rows.filterNot { case (_, r) => r.best.isNaN }
    val total = ok.values.map(_.best).sum
    val es = errs.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val qs = ok.map { case (k, r) => s""""${esc(k)}":${r.best}""" }.mkString("{", ",", "}")
    val teleJson = ok.map { case (k, r) =>
      val t = r.tele
      s""""${esc(k)}":{"passes":[${r.passSecs.map(r3).mkString(",")}],""" +
        s""""shuffle_read_mb":${r3(t(0) / 1e6)},"shuffle_read_rows":${t(1)},""" +
        s""""shuffle_write_mb":${r3(t(2) / 1e6)},"shuffle_write_rows":${t(3)},""" +
        s""""spill_mb":${r3(t(4) / 1e6)},"storage_mb_after":${r3(r.storageMbAfter)}}"""
    }.mkString("{", ",", "}")
    val noise = "min over " + passes + " passes; +1 extra pass (min-of-3) for queries under 1s"
    val ledger =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errs":$es,""" +
        s""""passes":$passes,"noise":"${esc(noise)}","telemetry":$teleJson,"sf":"${esc(sfDir)}"}"""
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, ledger + "\n")
    // SHORT protocol line (the full one exceeded the driver's tail
    // capture four rounds running — parsed:null in BENCH_r01–r04),
    // printed AFTER spark.stop() so no shutdown logging lands between
    // it and end-of-stream.
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${ok.size},""" +
        s""""n_errs":${errs.size},"sf":"${esc(sfDir)}","ledger":"target/bench.json"}"""
    spark.stop()
    println(line)
  }
}
