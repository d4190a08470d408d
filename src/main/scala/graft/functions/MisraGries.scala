package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable Misra–Gries summary buffer: `m` stores `logical count + d`
  * per key; `d` is the pending decrement (the classic MG
  * decrement-all becomes one offset bump); `minStored` lower-bounds
  * the live stored values so purges run only when an entry can
  * actually be dead. [[MisraGries.reduce]] maintains the invariant
  * that no dead entry (stored ≤ d) survives a call. Top-level (not
  * nested in the object) so the Aggregator's type parameters can name
  * it without a cyclic reference. */
final class MGBuf extends Serializable {
  val m = new java.util.HashMap[String, Long](2 * MisraGries.Capacity)
  var d = 0L
  var minStored = Long.MaxValue

  private[functions] def purge(): Unit = {
    var mn = Long.MaxValue
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove()
      else if (e.getValue < mn) mn = e.getValue
    }
    minStored = mn
  }

  private[functions] def insert(k: String, logical: Long): Unit = {
    val stored = d + logical
    m.put(k, stored)
    if (stored < minStored) minStored = stored
  }

  /** The logical summary (what [[MisraGries.finish]] returns). */
  def toMap: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    m.forEach((k, s) => if (s > d) b += k -> (s - d))
    b.result()
  }
}

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
  * The buffer is MUTABLE with a pending-decrement offset (ADVICE r10:
  * the immutable-Map buffer re-allocated all Capacity entries on every
  * evicting item — the common case for a Zipfian tail). The classic
  * "decrement every counter" step is `d += 1` against stored values
  * that carry `logical + d`; dead entries are purged only when the
  * offset actually crosses the smallest stored value, so tail tokens
  * cost O(1) between purges and the path allocates nothing per token.
  *
  * Scale: the buffer is a ≤ Capacity-entry map per partition — the
  * shuffle carries O(Capacity) entries per partition regardless of
  * input cardinality, and the merged result is model-sized (the
  * legitimate driver collect class, like the BPE merge list). */
object MisraGries extends Aggregator[String, MGBuf, Map[String, Long]] {

  /** Counter budget m: guarantees recall of every item with
    * freq > N/m. 128 keeps the summary tiny while the corpus's
    * stopword class sits comfortably above N/128. */
  val Capacity = 128

  override def zero: MGBuf = new MGBuf

  override def reduce(b: MGBuf, tok: String): MGBuf = {
    val cur = b.m.getOrDefault(tok, Long.MinValue)
    if (cur != Long.MinValue) b.m.put(tok, cur + 1) // hit: O(1)
    else if (b.m.size < Capacity) b.insert(tok, 1L) // free slot: O(1)
    else {
      // classic MG step, offset form: every counter drops by one and
      // the new item is NOT inserted; zeros vacate their slots at the
      // next purge, which runs only when the offset reaches the
      // smallest stored value (amortized against the entries it frees)
      b.d += 1
      if (b.d >= b.minStored) b.purge()
    }
    b
  }

  /** Mergeable-summaries merge: point-wise sum of logical counts, then
    * if over budget subtract the (Capacity+1)-th largest count from
    * every counter and drop the non-positive — each subtraction is
    * bounded by the two halves' combined error budget, so the
    * N/Capacity guarantee holds for the union stream. */
  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue - b.d
      if (c > 0) {
        val cur = a.m.getOrDefault(e.getKey, Long.MinValue)
        if (cur == Long.MinValue) a.insert(e.getKey, c)
        else a.m.put(e.getKey, cur + c)
      }
    }
    if (a.m.size > Capacity) {
      val logs = new Array[Long](a.m.size)
      var i = 0
      val vs = a.m.values().iterator()
      while (vs.hasNext) { logs(i) = vs.next() - a.d; i += 1 }
      java.util.Arrays.sort(logs)
      val cut = logs(logs.length - 1 - Capacity) // (Capacity+1)-th largest
      a.d += cut
      a.purge()
    }
    a
  }

  override def finish(b: MGBuf): Map[String, Long] = b.toMap

  /** Fold a token stream into a summary carried as a plain Map (the
    * GroupState shape of the x258 streaming fold): one buffer per
    * call, mutated per token, one Map built at the end — per-token
    * cost matches the Aggregator path. */
  def foldTokens(init: Map[String, Long],
                 toks: Iterator[String]): Map[String, Long] = {
    val b = fromMap(init)
    toks.foreach(reduce(b, _))
    b.toMap
  }

  /** Map-level merge (spec surface for the merge-tree-independence
    * guarantee): the [[merge]] algebra applied to two finished
    * summaries. */
  def mergeMaps(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    merge(fromMap(a), fromMap(b)).toMap

  private def fromMap(init: Map[String, Long]): MGBuf = {
    val b = new MGBuf
    init.foreach { case (k, c) => if (c > 0) b.insert(k, c) }
    b
  }

  /** The buffer rides kryo (a binary ObjectHashAggregate buffer — the
    * standard typed-Aggregator shape for mutable state); the OUTPUT
    * stays a Catalyst map so downstream SQL can explode it. */
  override def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
