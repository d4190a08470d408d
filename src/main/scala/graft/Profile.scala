package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy queries (dev tool). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup._
    import graft.ops.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val rep = docs.repartition(32, col("doc_id"))
    time("A: one-projection shingles")(
      rep.select(col("doc_id"), TextAnalysis.shingles(TextAnalysis.tokens(col("text"))).as("sh"))
        .filter(size(col("sh")) > 0).count())
    time("B: toks col then shingles")(
      rep.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), TextAnalysis.shingles(col("toks")).as("sh"))
        .filter(size(col("sh")) > 0).count())
    time("C: toks only")(
      rep.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")).count())
    time("D: plain count")(rep.count())
    val dsh = time("docShingles")(docShingles(docs)).persist()
    time("docShingles.count")(dsh.count())
    val sig = dsh.select(col("doc_id"), col("sh"), minhashSignature(col("sh")).as("sig")).persist()
    time("signatures.count")(sig.count())
    val bands = sig.select(col("doc_id"), col("sh"),
      posexplode(bandHashes(col("sig"))).as(Seq("band_idx", "band_hash"))).persist()
    time("bands.count")(bands.count())
    val cand = bands.alias("l").join(bands.alias("r"),
      col("l.band_idx") === col("r.band_idx") &&
      col("l.band_hash") === col("r.band_hash") &&
      col("l.doc_id") < col("r.doc_id"))
    time("candidates.count")(cand.count())
    val full = cand.select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
      jaccard(col("l.sh"), col("r.sh")).as("jaccard"))
      .filter(col("jaccard") >= 0.5).distinct()
    time("full.count")(full.count())
    time("query_as_shipped")(SparkEntry.queries("x5_minhash_lsh_dup")(spark, sfDir).count())
    spark.stop()
  }
}
