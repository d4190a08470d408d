package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Warm-pass job/stage attribution for single queries (dev tool,
  * round 13). `runMain graft.JobProf <sfDir> <name>...` runs each
  * query once cold (memo materialization + JIT), then once warm with
  * a listener counting jobs / stages / tasks and summing task time —
  * separating "many sequential tiny jobs" (driver/scheduler-bound)
  * from "few jobs, big task time" (executor-bound) for the fat middle
  * of the bench distribution. Same session shape as [[Bench]]. */
object JobProf {
  private final class Counts extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val shufReadMb = new AtomicLong
    override def onJobStart(ev: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = ev.stageInfo.taskMetrics
      if (m != null) shufReadMb.addAndGet(m.shuffleReadMetrics.totalBytesRead / 1000000): Unit
    }
    override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (ev.taskInfo != null) taskMs.addAndGet(ev.taskInfo.duration): Unit
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true"))
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def runOnce(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.ops.Caching.reapTemps()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"query"}%-24s ${"cold_s"}%7s ${"warm_s"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskMs"}%8s ${"shufMB"}%7s")
    for (n <- names) {
      val cold = runOnce(n)
      org.apache.spark.graftbench.ListenerDrain.drain(spark.sparkContext)
      val c = new Counts
      spark.sparkContext.addSparkListener(c)
      val warm = runOnce(n)
      org.apache.spark.graftbench.ListenerDrain.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(c)
      println(f"$n%-24s $cold%7.2f $warm%7.2f ${c.jobs.get}%5d ${c.stages.get}%6d ${c.tasks.get}%6d ${c.taskMs.get}%8d ${c.shufReadMb.get}%7d")
    }
    spark.stop()
  }
}
