package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass fused form of the reference's avg-time-between-peaks
  * feature (`SURVEY.md` §2 D7, §7.3's "Aggregator fallback"): a typed
  * `Aggregator[(ts, y), buffer, Double]` that collects the window's
  * (ts, y) pairs and computes the exact reference semantics in
  * `finish` — peaks are rows with y > 0.9·max(y), the result is the
  * mean of positive gaps between successive sorted peak timestamps,
  * 0.0 with fewer than two peaks (`ExtractFeature.java:87-116`).
  *
  * Trade-off vs the window-function form in `Features.aggregate`
  * (which needs NO buffering): this buffers one window's samples per
  * group — fine for the reference's bounded windows (≤ a few hundred
  * samples), wrong for unbounded groups. It exists as (a) the
  * single-shuffle fused alternative when the surrounding query has no
  * window pass to piggyback on, and (b) the engine's demonstration of
  * the typed-Aggregator/UDAF extension surface (registrable via
  * `functions.udaf`).
  */
object PeakIntervalAggregator
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Double] {

  override def zero: Seq[(Long, Double)] = Nil

  // PREPEND: the buffer is a List between reduce calls (the object
  // aggregation iterator keeps it live), so `buf :+ row` copies the
  // whole list per row — O(m²) per m-sample group. Order is free to
  // lose: finish sorts the peak timestamps itself.
  override def reduce(buf: Seq[(Long, Double)],
                      row: (Long, Double)): Seq[(Long, Double)] = row +: buf

  override def merge(a: Seq[(Long, Double)],
                     b: Seq[(Long, Double)]): Seq[(Long, Double)] = a ++ b

  override def finish(buf: Seq[(Long, Double)]): Double = {
    if (buf.isEmpty) return 0.0
    val maxY = buf.iterator.map(_._2).max
    val peaks = buf.filter(_._2 > 0.9 * maxY).map(_._1).sorted
    val gaps = peaks.iterator.sliding(2).withPartial(false)
      .map { case Seq(a, b) => b - a }.filter(_ > 0).toSeq
    if (gaps.isEmpty) 0.0 else gaps.sum.toDouble / gaps.size
  }

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
