package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query and prints ONE
  * JSON line. Protocol (round-2 hardening):
  *  - queries run in FIXED sorted order so run-to-run profiles are
  *    comparable (map iteration order previously let JIT/cache warm-up
  *    land on a different query each run — a 2x total spread);
  *  - two full passes; pass 1 doubles as the warm-up (JIT compilation
  *    + materialization of the shared persisted subplans), the
  *    reported per-query time is the MIN across passes;
  *  - a query that throws is reported in an "errs" field with its
  *    wall-clock EXCLUDED from the total — silently timing a failed
  *    query at ~0 s used to inflate the apparent throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts (ns)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: benign WARN lines (CacheManager re-cache notices,
    // function re-registration) interleave with the one JSON protocol line
    // and have broken downstream parsing of the bench output.
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val best = collection.mutable.LinkedHashMap[String, Double](names.map(_ -> Double.NaN): _*)
    val errs = collection.mutable.LinkedHashMap.empty[String, String]
    for (_ <- 1 to passes; name <- names) {
      val t0 = System.nanoTime()
      // noop sink: forces FULL evaluation of every output column —
      // count() would let Catalyst prune projected computations and
      // understate the work
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val prev = best(name)
        if (prev.isNaN || dt < prev) best(name) = dt
      } catch { case e: Throwable =>
        errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.next().take(200)
      } finally
        // drop this query's operator-local caches (ADVICE r2): pipeline
        // -level shared caches stay; per-query frames must not
        // accumulate for the JVM lifetime across a 57+-query suite
        graft.ops.Caching.reapTemps()
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val ok = best.filterNot { case (_, v) => v.isNaN }
    val qs = ok.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val es = errs.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = ok.values.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errs":$es,"passes":$passes,"sf":"${esc(sfDir)}"}"""
    // belt-and-braces handoff (the stdout line went unparsed three
    // rounds running): persist the protocol JSON to a known file too,
    // and print it AFTER spark.stop() so no shutdown logging can land
    // between it and end-of-stream.
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, line + "\n")
    spark.stop()
    println(line)
  }
}
