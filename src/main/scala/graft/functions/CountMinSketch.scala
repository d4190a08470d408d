package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One non-empty Count-Min-Sketch cell. */
case class CmsCell(row_idx: Int, bucket: Int, cnt: Long)

/** Deterministic Count-Min Sketch over a string column as a typed
  * [[Aggregator]] — the custom-sketch slot of the beyond-reference
  * track (builder brief; SURVEY.md §7 step 7: "custom
  * `Aggregator[IN,BUF,OUT]` work lives here").
  *
  * Geometry: [[CountMinSketch.Depth]] hash rows × [[CountMinSketch.Width]]
  * buckets. Row `i` hashes a token to
  * `int(md5("i:token")[0:4 hex], 16) % Width` — md5-derived, so the
  * DuckDB oracle reproduces every cell exactly
  * (`('0x'||substr(md5(i||':'||t),1,4))::BIGINT % Width`); estimation
  * error bounds are the classic CMS ε=e/w, δ=e^-d.
  *
  * Scale design: the buffer is one primitive long array of d·w cells
  * per partition; partial aggregation merges element-wise — the
  * shuffle carries d·w longs per partition, independent of input
  * cardinality (the entire point of a sketch at 100 TB).
  */
object CountMinSketch extends Aggregator[String, Array[Long], Seq[CmsCell]] {
  val Depth = 4
  val Width = 256

  // one digest per executor thread — reduce() runs once per token, and
  // a per-call getInstance would allocate on the hottest path
  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Row-i bucket of a token: first 16 bits of md5("i:token") mod width. */
  def bucketOf(i: Int, token: String): Int = {
    val h = digests.get().digest(s"$i:$token".getBytes("UTF-8"))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % Width
  }

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(b: Array[Long], token: String): Array[Long] = {
    var i = 0
    while (i < Depth) { b(i * Width + bucketOf(i, token)) += 1; i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[CmsCell] =
    b.indices.collect {
      case i if b(i) > 0 => CmsCell(i / Width, i % Width, b(i))
    }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[CmsCell]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[CmsCell]]()

  /** Point estimate from materialized cells (min over rows). */
  def estimate(cells: Seq[CmsCell], token: String): Long =
    (0 until Depth).map { i =>
      val b = bucketOf(i, token)
      cells.collectFirst { case CmsCell(`i`, `b`, c) => c }.getOrElse(0L)
    }.min
}
