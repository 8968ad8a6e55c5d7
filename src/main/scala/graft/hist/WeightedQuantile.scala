package graft.hist

import java.util.TreeMap
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Exact weighted quantiles with plateau interpolation — a line-by-line
  * port of the reference's inverse-CDF knot algebra
  * (traces/histogram.py:172-261 `_quantile_function`), which for
  * alpha=0.5, smallest_count=1 reproduces
  * scipy.stats.mstats.mquantiles(alphap=0.5, betap=0.5) exactly
  * (tests/test_histogram_external.py:8-21).
  *
  * Spark's percentile_approx is neither weighted nor exact, so this is a
  * deterministic post-aggregation computation on the (small) per-key
  * histogram map — distinct values per series, not raw rows — applied via
  * a UDF over map_from_entries(collect_list(...)). The histogram itself is
  * produced by a distributed duration-weighted groupBy; only the final
  * knot interpolation runs here.
  */
object WeightedQuantile {

  /** hist: (value -> weight), null values discarded like the reference's
    * _prepare_for_stats (traces/histogram.py:104-108). Returns one result
    * per q, or null for an empty/zero-total histogram.
    */
  def quantiles(
      hist: Map[Double, Double],
      qs: Seq[Double],
      alpha: Double = 0.5,
      smallestCount: Option[Double] = None): Seq[Option[Double]] = {
    val clean = hist.toSeq.sortBy(_._1)
    val total = clean.map(_._2).sum
    if (clean.isEmpty || total == 0.0) return qs.map(_ => None)

    val smallestObserved = clean.map(_._2).min
    val sc = smallestCount.fold(smallestObserved)(c => math.min(c, smallestObserved))
    val beta = alpha * sc

    // inverse CDF knots; later puts overwrite earlier ones at equal q,
    // exactly like the reference's SortedDict assignment order
    // (traces/histogram.py:189-197)
    val inverse = new TreeMap[Double, Double]()
    var cum = 0.0
    for ((value, count) <- clean) {
      inverse.put((cum + beta) / total, value)
      cum += count
      inverse.put((cum - beta) / total, value)
    }
    val qMin = inverse.firstKey()
    val qMax = inverse.lastKey()

    qs.map { q0 =>
      require(q0 >= 0.0 && q0 <= 1.0, s"invalid quantile $q0, need 0 <= q <= 1")
      val q = if (q0 < qMin) qMin else if (q0 > qMax) qMax else q0
      val result: Double =
        if (beta > 0) {
          if (inverse.containsKey(q)) inverse.get(q)
          else {
            val x1 = inverse.floorKey(q) // bisect_left(q)-1 for q not present
            val x2 = inverse.higherKey(q)
            val y1 = inverse.get(x1); val y2 = inverse.get(x2)
            (y2 - y1) * (q - x1) / (x2 - x1) + y1
          }
        } else {
          if (inverse.containsKey(q)) {
            // midpoint at CDF jumps (traces/histogram.py:232-238):
            // y1 = value at the knot before q, y2 = value at q itself.
            // For q == qMin the reference's bisect_left(q)-1 == -1 indexes
            // the LAST key (Python negative indexing) — replicated here.
            val x1 = Option(inverse.lowerKey(q)).getOrElse(inverse.lastKey())
            0.5 * (inverse.get(x1) + inverse.get(q))
          } else {
            // empirical inverse CDF: value at the largest knot below q
            inverse.get(inverse.floorKey(q))
          }
        }
      Some(result)
    }
  }

  def quantile(hist: Map[Double, Double], q: Double, alpha: Double = 0.5,
      smallestCount: Option[Double] = None): Option[Double] =
    quantiles(hist, Seq(q), alpha, smallestCount).head

  /** Column form: weighted quantiles over a map<double,double> histogram
    * column for a fixed q list (deterministic Scala, one call per key).
    */
  /** Build the histogram map with null values (None keys) already filtered
    * out — Spark maps reject null keys, and the reference discards them
    * anyway (_discard_value, traces/histogram.py:150-156).
    */
  def quantilesUdf(
      qs: Seq[Double],
      alpha: Double = 0.5,
      smallestCount: Option[Double] = None): Column => Column = {
    val f = udf { (m: Map[Double, Double]) =>
      if (m == null || m.isEmpty) null
      else quantiles(m, qs, alpha, smallestCount).map(_.map(java.lang.Double.valueOf).orNull)
    }
    (histCol: Column) => f(histCol)
  }
}
