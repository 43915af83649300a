package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distribution aggregates with no Spark native: entropy and mad
  * (reference-dialect parity — DuckDB's aggregate surface). Typed
  * `Aggregator`s like stats.CountingHll: a counting/collecting state is
  * not expressible from built-ins, and a typed udaf still runs
  * partial-aggregate (map-side combine) before one shuffle on the group
  * keys.
  */
object StatAggregates {

  /** Shannon entropy (base 2) of the value distribution, NULLs ignored;
    * an empty/all-NULL group reads 0.0 (DuckDB probed). State is a
    * value→count hash — the same shape DuckDB's own entropy aggregate
    * holds per group; memory is O(ndv of the group), so at scale cap
    * group cardinality upstream (same caveat as any exact
    * distinct-counting aggregate).
    */
  class EntropyAggregator
      extends Aggregator[String, mutable.HashMap[String, Long], Double] {
    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[String, Long],
        a: String): mutable.HashMap[String, Long] = {
      if (a != null) b.update(a, b.getOrElse(a, 0L) + 1L)
      b
    }
    def merge(x: mutable.HashMap[String, Long],
        y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      y.foreach { case (k, v) => x.update(k, x.getOrElse(k, 0L) + v) }
      x
    }
    def finish(b: mutable.HashMap[String, Long]): Double =
      if (b.isEmpty) 0.0
      else {
        val n = b.valuesIterator.sum.toDouble
        // sum in sorted-key order so the result is deterministic across
        // partition merge orders (hash iteration order is not)
        val s = b.toSeq.sortBy(_._1).iterator.map { case (_, c) =>
          val p = c / n
          p * math.log(p)
        }.sum
        -s / math.log(2.0)
      }
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.javaSerialization[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Median absolute deviation: median(|x - median(x)|), both medians
    * interpolated (DuckDB probed: {1,2,4,9} → 1.5). Exact — the state
    * collects the group's values like any exact-percentile aggregate
    * (Spark's own median does the equivalent); all-NULL reads NULL.
    */
  class MadAggregator
      extends Aggregator[java.lang.Double, mutable.ArrayBuffer[Double],
        java.lang.Double] {
    def zero: mutable.ArrayBuffer[Double] = mutable.ArrayBuffer.empty
    def reduce(b: mutable.ArrayBuffer[Double],
        a: java.lang.Double): mutable.ArrayBuffer[Double] = {
      if (a != null) b += a.doubleValue()
      b
    }
    def merge(x: mutable.ArrayBuffer[Double],
        y: mutable.ArrayBuffer[Double]): mutable.ArrayBuffer[Double] = {
      x ++= y; x
    }
    private def medianOf(sorted: IndexedSeq[Double]): Double = {
      val n = sorted.length
      if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    }
    def finish(b: mutable.ArrayBuffer[Double]): java.lang.Double =
      if (b.isEmpty) null
      else {
        val sorted = b.toIndexedSeq.sorted
        val med = medianOf(sorted)
        medianOf(sorted.map(v => math.abs(v - med)).sorted)
      }
    def bufferEncoder: Encoder[mutable.ArrayBuffer[Double]] =
      Encoders.javaSerialization[mutable.ArrayBuffer[Double]]
    def outputEncoder: Encoder[java.lang.Double] =
      Encoders.DOUBLE
  }

  /** product(x): DOUBLE multiply, NULLs skipped, all-NULL reads NULL
    * (DuckDB probed). Partial products multiply across partitions —
    * exact for integer-valued inputs inside double range (FP multiply
    * of exact integers is exact in any order); for general doubles the
    * merge order can differ from a sequential engine in the last ulps.
    */
  class ProductAggregator
      extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
    def zero: (Double, Long) = (1.0, 0L)
    def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
      if (a == null) b else (b._1 * a.doubleValue(), b._2 + 1L)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 * y._1, x._2 + y._2)
    def finish(b: (Double, Long)): java.lang.Double =
      if (b._2 == 0L) null else b._1
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  private lazy val entropyUdaf = udaf(new EntropyAggregator)
  private lazy val madUdaf = udaf(new MadAggregator)
  private lazy val productUdaf = udaf(new ProductAggregator)

  def entropy(c: Column): Column = entropyUdaf(c)
  def mad(c: Column): Column = madUdaf(c)
  def product(c: Column): Column = productUdaf(c)
}
