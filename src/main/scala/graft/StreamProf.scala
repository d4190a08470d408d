package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-query attribution for the AvailableNow operators (dev
  * tool, round 13). `runMain graft.StreamProf <sfDir> <name>...` runs
  * each query with a [[StreamingQueryListener]] registered and prints
  * every micro-batch's duration breakdown (addBatch / queryPlanning /
  * walCommit / state commit ...), separating engine fixed cost from
  * the operator's own work. Same session shape as [[Bench]]. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(ev: StreamingQueryListener.QueryStartedEvent): Unit =
        println(f"[stream] START  ${ev.name} ${System.nanoTime() / 1e9}%.3f")
      override def onQueryProgress(ev: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = ev.progress
        val dur = p.durationMs
        println(s"[stream] BATCH ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${dur}")
      }
      override def onQueryTerminated(ev: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(f"[stream] STOP   ${System.nanoTime() / 1e9}%.3f")
    }
    spark.streams.addListener(listener)
    for (n <- names; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.ops.Caching.reapTemps()
      println(f"[stream] QUERY $n pass$pass total ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
