package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MISRA–GRIES / SpaceSaving heavy-hitters summary over a string
  * column as a typed [[Aggregator]] — the deterministic-guarantee
  * frequent-items sketch beside the estimate-style sketches (CMS x20,
  * HLL x230, KMV x234): with [[MisraGries.Capacity]] counters, every
  * item whose true frequency exceeds N/Capacity is GUARANTEED to
  * survive in the summary, under any partition split and any merge
  * order (Misra & Gries '82; mergeability per Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS '12: merging
  * two summaries and subtracting the (Capacity+1)-th largest count
  * preserves the N/Capacity error bound additively).
  *
  * The x254 audit leans ONLY on that order-independent guarantee: the
  * surviving counter SET (and its residual counts) depends on
  * partition boundaries, so the query never exposes it directly —
  * it outputs the exact heavy hitters (an ordinary groupBy) flagged
  * with sketch MEMBERSHIP, which the guarantee forces to be uniformly
  * true. The DuckDB oracle emits literal TRUE; any summary bug that
  * evicts a true heavy hitter breaks the hash.
  *
  * Scale: the buffer is a ≤ Capacity-entry map per partition — the
  * shuffle carries O(Capacity) entries per partition regardless of
  * input cardinality, and the merged result is model-sized (the
  * legitimate driver collect class, like the BPE merge list). */
object MisraGries
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  /** Counter budget m: guarantees recall of every item with
    * freq > N/m. 128 keeps the summary tiny while the corpus's
    * stopword class sits comfortably above N/128. */
  val Capacity = 128

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < Capacity => b.updated(tok, 1L)
      case None =>
        // classic MG step: a full summary and a new item decrement
        // EVERY counter by one; zeros vacate their slots
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  /** Mergeable-summaries merge: point-wise sum, then if over budget
    * subtract the (Capacity+1)-th largest count from every counter and
    * drop the non-positive — each subtraction is bounded by the two
    * halves' combined error budget, so the N/Capacity guarantee holds
    * for the union stream. */
  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val s = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (s.size <= Capacity) s
    else {
      val cut = s.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(Capacity) // (Capacity+1)-th largest
      s.flatMap { case (k, c) =>
        if (c > cut) Some(k -> (c - cut)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
