package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row inside the top-k buffer: score + two tie-break ids. */
case class ScoredRow(score: Double, id1: Long, id2: Int)

/** Bounded top-k-per-group aggregator (UDAF surface via the typed
  * `Aggregator` API).
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy(s))`)
  * must shuffle EVERY row of every group and sort whole groups before
  * discarding all but k. This aggregator keeps at most k rows per group in
  * the aggregation buffer, so map-side partial aggregation discards losers
  * before the shuffle — the shuffle carries ≤ k rows per (mapper, group)
  * instead of the full table. Order: score descending, ties broken by
  * (id1, id2) ascending — identical to the window query's ORDER BY, so the
  * two formulations share one oracle.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] {

  private def ord: Ordering[ScoredRow] =
    Ordering.by((r: ScoredRow) => (-r.score, r.id1, r.id2))

  override def zero: Seq[ScoredRow] = Vector.empty

  override def reduce(buf: Seq[ScoredRow], row: ScoredRow): Seq[ScoredRow] =
    // k is small (top-N per group); insert + re-sort of ≤ k+1 elements is
    // cheaper than heap bookkeeping at these sizes
    ((buf :+ row).sorted(ord)).take(k)

  override def merge(a: Seq[ScoredRow], b: Seq[ScoredRow]): Seq[ScoredRow] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[ScoredRow]): Seq[ScoredRow] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[ScoredRow]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[ScoredRow]] = ExpressionEncoder()
}

/** Bounded k-minimum-DISTINCT-values aggregator — the KMV sketch
  * ([[graft.operators.SketchOps.kmvSourceIntersect]]) as an aggregation
  * buffer. The buffer IS the sketch: a sorted distinct array of at most k
  * hash values, so map-side partials discard everything above the local
  * k-th minimum before the shuffle, and — the property the streaming twin
  * exists for — Structured Streaming's per-group state is CONSTANT in the
  * number of distinct inputs (an exact streaming COUNT(DISTINCT) holds
  * every key ever seen; this holds k longs). Merge is the KMV union:
  * distinct-merge, keep the k smallest.
  */
class KMinAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.contains(v)) buf
    else if (buf.length < k) (buf :+ v).sorted
    else if (v >= buf.last) buf
    else ((buf :+ v).sorted).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
