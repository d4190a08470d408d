package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal LAKEHOUSE COMMIT PROTOCOL over plain parquet — the
  * transaction-log table format that unifies what x83 (merge upsert),
  * x92 (MV refresh), x119 (compaction) and x131 (snapshot diff)
  * each did ad hoc: real parquet data generations under an
  * append-only sequence of numbered manifests, with snapshot-isolated
  * reads and optimistic-concurrency writes (the Delta/Iceberg core,
  * reduced to its invariants).
  *
  * Layout (all under one table directory):
  * {{{
  *   <table>/_log/v000001.txt     one manifest per COMMITTED version
  *   <table>/data/<dir>/…parquet  immutable data generations
  * }}}
  * A manifest is the COMPLETE state of its version (not a delta):
  * {{{
  *   version=3
  *   touched=2
  *   bucket 0 data/g1-b0-4f2a
  *   bucket 2 data/g3-b2-99c1
  * }}}
  * The unit of concurrency is the key BUCKET (hash partition, the
  * Delta partition-level-conflict model): every data file covers
  * exactly one bucket, and a commit replaces whole buckets.
  *
  * Protocol invariants:
  *  - readers resolve the HIGHEST manifest and read exactly its file
  *    list — a snapshot; in-flight writers have no manifest, so their
  *    data dirs are invisible (write-then-commit ordering);
  *  - writers never mutate committed files — data dirs carry a random
  *    nonce and are immutable once a manifest references them;
  *  - the commit point is an ATOMIC CREATE of `v<next>.txt`
  *    (`CREATE_NEW` — exactly one writer can win a version number; on
  *    an object store this single primitive is what a CAS/conditional
  *    -put or a coordination service must supply, everything else is
  *    plain immutable-blob I/O);
  *  - a writer that lost the race validates (optimistic concurrency):
  *    if any manifest committed after its base version touched one of
  *    ITS buckets, the write is stale → [[ConflictException]] (caller
  *    re-reads and re-derives); disjoint buckets → REBASE, i.e. merge
  *    its bucket map onto the new latest and try the next number.
  *
  * Scale: the log is O(versions) tiny text files read by the DRIVER
  * only (the executors only ever see parquet paths); a snapshot read
  * is an ordinary multi-path parquet scan with full
  * pushdown/pruning; commit cost is one file create. The full-state
  * manifest keeps resolution O(1) manifests instead of O(n) deltas —
  * at real version counts a periodic checkpoint plays that role.
  *
  * Driver-side file I/O here is metadata-plane by design — the data
  * plane (parquet write/read) is distributed Spark throughout. */
object TxnLog {

  /** Key buckets (the concurrency granularity of this table). */
  val NumBuckets = 4

  final class ConflictException(msg: String) extends RuntimeException(msg)

  private def logDir(table: String): Path = Paths.get(table, "_log")
  private def manifestPath(table: String, v: Long): Path =
    logDir(table).resolve(f"v$v%06d.txt")

  /** Highest committed version; 0 = empty table. */
  def latestVersion(table: String): Long = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) 0L
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{6}\\.txt") => s.substring(1, 7).toLong }
      .foldLeft(0L)(math.max)
  }

  private final case class Manifest(version: Long, touched: Set[Int],
                                    buckets: Map[Int, String],
                                    txn: Option[(String, Long)])

  private def readManifest(table: String, v: Long): Manifest = {
    val lines = Files.readAllLines(manifestPath(table, v)).asScala
    val touched = lines.collectFirst { case s if s.startsWith("touched=") =>
      s.stripPrefix("touched=").split(",").filter(_.nonEmpty).map(_.toInt).toSet
    }.getOrElse(Set.empty)
    val buckets = lines.collect { case s if s.startsWith("bucket ") =>
      val Array(_, b, dir) = s.split(" ", 3)
      b.toInt -> dir
    }.toMap
    val txn = lines.collectFirst { case s if s.startsWith("txn ") =>
      val Array(_, app, tv) = s.split(" ", 3)
      (app, tv.toLong)
    }
    Manifest(v, touched, buckets, txn)
  }

  /** The version that committed idempotence marker (app, txnV), if
    * any — the Delta `txnAppId`/`txnVersion` writer-dedup primitive:
    * an exactly-once producer (e.g. a Structured Streaming
    * foreachBatch sink replaying a micro-batch after a crash) tags
    * each commit and skips any (app, txnV) already in the log. */
  def txnCommitted(table: String, app: String, txnV: Long): Option[Long] =
    (1L to latestVersion(table)).find(v =>
      readManifest(table, v).txn.contains((app, txnV)))

  /** Optimistically commit `writes` (bucket → rows for that bucket)
    * against `baseVersion`: data is written FIRST (invisible until a
    * manifest lands), then the claim loop above runs. Returns the
    * committed version; throws [[ConflictException]] if a commit
    * after `baseVersion` touched one of these buckets. */
  def commit(table: String, baseVersion: Long,
             writes: Map[Int, DataFrame],
             txn: Option[(String, Long)] = None): Long = {
    require(writes.nonEmpty, "empty commit")
    // idempotent replay (cheap pre-check; re-checked inside the claim
    // loop for the crash-between-write-and-claim race): a marker
    // already in the log means THIS logical write committed — return
    // its version without writing data
    txn.foreach { case (app, tv) =>
      txnCommitted(table, app, tv).foreach(v => return v)
    }
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val written: Map[Int, String] = writes.map { case (b, df) =>
      val rel = s"data/g${baseVersion + 1}-b$b-$nonce"
      df.write.mode("overwrite").parquet(s"$table/$rel")
      b -> rel
    }
    Files.createDirectories(logDir(table))
    var committed = -1L
    while (committed < 0) {
      val latest = latestVersion(table)
      // idempotent replay re-check (a racing writer with the same
      // marker may have claimed a version since the pre-check)
      txn.foreach { case (app, tv) =>
        txnCommitted(table, app, tv).foreach(v => return v)
      }
      // conflict validation against everything that landed since base
      ((baseVersion + 1) to latest).foreach { v =>
        val overlap = readManifest(table, v).touched.intersect(writes.keySet)
        if (overlap.nonEmpty)
          throw new ConflictException(
            s"version $v touched buckets ${overlap.toSeq.sorted.mkString(",")} " +
              s"already written by this transaction (base $baseVersion)")
      }
      val base = if (latest == 0) Map.empty[Int, String]
                 else readManifest(table, latest).buckets
      val merged = base ++ written
      val body = (s"version=${latest + 1}" +:
        s"touched=${writes.keySet.toSeq.sorted.mkString(",")}" +:
        (txn.map { case (app, tv) => s"txn $app $tv" }.toSeq ++
          merged.toSeq.sortBy(_._1).map { case (b, dir) => s"bucket $b $dir" }))
        .mkString("", "\n", "\n")
      try {
        Files.write(manifestPath(table, latest + 1),
          body.getBytes(StandardCharsets.UTF_8), StandardOpenOption.CREATE_NEW)
        committed = latest + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // lost the
        // race to this version number — loop: re-validate, rebase, retry
      }
    }
    committed
  }

  /** APPEND a batch as a merged copy-on-write commit — the micro-batch
    * sink primitive (x219): route `batch` rows to buckets on
    * `keyCol % NumBuckets`, rewrite each TOUCHED bucket as (existing
    * rows ∪ new rows), and commit the touched set with the (app,
    * txnV) idempotence marker — a replayed micro-batch (crash after
    * commit, before the stream checkpoint advanced) is a no-op
    * returning the original version. One driver-side aggregate finds
    * the touched buckets; untouched buckets are carried by manifest
    * reference, never rewritten (the copy-on-write contract).
    *
    * Scale: the rewrite cost is the touched buckets' data, not the
    * table — the bucket count is the append-amplification dial (more
    * buckets → smaller rewrites, more manifest rows), and at real
    * scale the same protocol appends FILES per bucket instead of
    * rewriting (a manifest then lists many files per bucket);
    * full-state manifests keep snapshot resolution O(1) either way. */
  def commitMerged(spark: SparkSession, table: String, batch: DataFrame,
                   keyCol: String, app: String, txnV: Long): Long = {
    txnCommitted(table, app, txnV).foreach(v => return v)
    import org.apache.spark.sql.functions.col
    val tagged = batch.withColumn("__b",
      (col(keyCol) % NumBuckets).cast("int"))
    val touched = tagged.select("__b").distinct()
      .collect().map(_.getInt(0)).sorted // bucket-count-bounded
    val base = latestVersion(table)
    val existing = if (base == 0) Map.empty[Int, String]
                   else readManifest(table, base).buckets
    val writes = touched.map { b =>
      val fresh = tagged.filter(col("__b") === b).drop("__b")
      b -> existing.get(b).map(rel =>
        spark.read.parquet(s"$table/$rel").unionByName(fresh))
        .getOrElse(fresh)
    }.toMap
    commit(table, base, writes, Some((app, txnV)))
  }

  /** Remove the table directory entirely — fixture reset so each
    * x216 run replays the whole protocol from an empty log. */
  def reset(table: String): Unit = {
    val root = Paths.get(table)
    if (Files.exists(root))
      Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
  }

  /** Snapshot-isolated read: the file list of `version` (default the
    * latest), regardless of later commits. */
  def snapshot(spark: SparkSession, table: String,
               version: Long = -1L): DataFrame = {
    val v = if (version > 0) version else latestVersion(table)
    require(v > 0, s"no committed version in $table")
    val dirs = readManifest(table, v).buckets.toSeq.sortBy(_._1)
      .map { case (_, rel) => s"$table/$rel" }
    spark.read.parquet(dirs: _*)
  }
}
