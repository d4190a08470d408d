package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.QTime <sfDir> <name>... */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same AQE wide-start posture as Bench — measurements must match
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (pass <- 1 to 2; n <- args.drop(1)) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[qtime] pass$pass $n%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      graft.ops.Caching.reapTemps() // same per-query protocol as Bench
    }
    spark.stop()
  }
}
