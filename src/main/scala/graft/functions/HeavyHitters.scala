package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Final summary: parallel arrays sorted by (est DESC, item ASC). */
case class HHSummary(items: Array[String], ests: Array[Long])

/** Misra–Gries frequent-items summary, k counters (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012 — both
  * public). Guarantees after any sequence of reduces and merges over n
  * items:
  *
  *  - every item with true count > n/(k+1) is present in the summary
  *    (no false negatives for heavy hitters), and
  *  - each reported count est satisfies true - n/(k+1) <= est <= true.
  *
  * The buffer is a bounded k-entry map regardless of vocabulary size, so
  * the shuffle carries O(partitions × k) entries where an exact word count
  * shuffles the full vocabulary — the mergeable-sketch trade the
  * approx-aggregates family (q_approx_stats) documents, here for top-item
  * queries. Deterministic given the data (no randomness), but the
  * SURVIVING below-threshold items depend on arrival order → rows-only
  * check, with the guarantees asserted against exact counts in ScalaTest.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], HHSummary] {

  def zero: mutable.Map[String, Long] = mutable.Map.empty

  def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
    if (b.contains(a) || b.size < k) b.update(a, b.getOrElse(a, 0L) + 1L)
    else {
      // decrement-all: conceptually cancels one occurrence of each of k+1
      // distinct items (the incoming one included); drop zeros. Iterate a
      // SNAPSHOT — updating a mutable.Map while walking its keysIterator
      // can skip or revisit entries (hash-table resize/relink mid-walk).
      b.toArray.foreach { case (key, c0) =>
        val c = c0 - 1L
        if (c == 0L) b.remove(key) else b.update(key, c)
      }
    }
    b
  }

  def merge(b1: mutable.Map[String, Long],
      b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > k) {
      // keep the k largest; subtract the (k+1)-th largest from survivors —
      // the error this introduces stays within the n/(k+1) envelope.
      // Snapshot before mutating (same mid-walk hazard as in reduce).
      val counts = b1.values.toArray.sortBy(-_)
      val cut    = counts(k)
      b1.toArray.foreach { case (key, c0) =>
        val c = c0 - cut
        if (c <= 0L) b1.remove(key) else b1.update(key, c)
      }
      // at most k entries can exceed the (k+1)-th largest value, and ties
      // AT the cut land on exactly 0 and are dropped above — so the
      // summary is provably back within k entries here
      assert(b1.size <= k, s"MG merge invariant broken: ${b1.size} > $k")
    }
    b1
  }

  def finish(b: mutable.Map[String, Long]): HHSummary = {
    val sorted = b.toSeq.sortBy { case (key, c) => (-c, key) }
    HHSummary(sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  def outputEncoder: Encoder[HHSummary] = Encoders.product[HHSummary]
}
