package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch as a typed [[Aggregator]] — the
  * one-pass, fixed-memory answer to "top-k most frequent values" when the
  * key cardinality is too large to groupBy-count exactly (URL hosts, user
  * agents, n-grams over a 100 TB corpus). Each partition folds its rows
  * into k counters; partial sketches merge associatively.
  *
  * Guarantees (Metwally et al., standard Space-Saving bounds):
  *   - any key with true count > n/k is present in the sketch;
  *   - for every reported (key, count, err): trueCount ≤ count and
  *     count − err ≤ trueCount (err bounds the overcount).
  * Counts are exact while distinct keys ≤ k. The reported counts are
  * order-dependent WITHIN those bounds (like any streaming sketch), so the
  * operator is spec-bounded against the exact aggregate rather than
  * hash-matched against a SQL oracle — same verification contract as the
  * streaming tier.
  */
final case class HHCounter(key: String, count: Long, err: Long)

class SpaceSaving(k: Int) extends Aggregator[String, Map[String, (Long, Long)], Seq[HHCounter]] {

  override def zero: Map[String, (Long, Long)] = Map.empty

  private def insert(
      b: Map[String, (Long, Long)], key: String, w: Long, e: Long): Map[String, (Long, Long)] =
    b.get(key) match {
      case Some((c, err)) => b.updated(key, (c + w, err + e))
      case None if b.size < k => b.updated(key, (w, e))
      case None =>
        // evict the minimum counter; the newcomer inherits its count as error
        val (minKey, (minC, _)) = b.minBy { case (kk, (c, _)) => (c, kk) }
        (b - minKey).updated(key, (minC + w, minC + e))
    }

  override def reduce(b: Map[String, (Long, Long)], key: String): Map[String, (Long, Long)] =
    insert(b, key, 1L, 0L)

  /** Sketch merge: re-insert the smaller sketch's counters as weighted
    * items (weight = estimated count, error carried) — associative and the
    * SS error bound is preserved (merged err ≤ sum of parts' errs + evicted
    * minima). */
  override def merge(
      b1: Map[String, (Long, Long)], b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    // deterministic fold order so merge itself is reproducible
    small.toSeq.sortBy(_._1).foldLeft(big) {
      case (acc, (key, (c, e))) => insert(acc, key, c, e)
    }
  }

  override def finish(b: Map[String, (Long, Long)]): Seq[HHCounter] =
    b.toSeq
      .map { case (key, (c, e)) => HHCounter(key, c, e) }
      .sortBy(h => (-h.count, h.key))

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    Encoders.kryo[Map[String, (Long, Long)]]

  override def outputEncoder: Encoder[Seq[HHCounter]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
