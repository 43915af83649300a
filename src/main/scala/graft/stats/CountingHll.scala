package graft.stats

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Counting HyperLogLog — functional parity with the reference's statistics
  * sketch (reference statistics/counting_hyperloglog.rs:3-17: 64 buckets ×
  * 59 8-bit counters, probabilistic increments ≥128, supporting add /
  * delete / estimate with linear-counting bias correction :127-162).
  *
  * Unlike a plain HLL (max register per bucket), each bucket keeps a
  * COUNTER per leading-zero rank, so deletions can decrement — that is the
  * property the reference needs for UPDATE/DELETE statistics maintenance,
  * and what `approx_count_distinct` (plain HLL++) cannot do.
  *
  * Our implementation is an independent design from the published
  * counting-HLL idea: counters < SOFT_CAP increment/decrement exactly;
  * above SOFT_CAP they saturate probabilistically, with the probability
  * decision derived deterministically from the value hash so results are
  * reproducible run-to-run (the reference seeds its RNG in tests for the
  * same reason, counting_hyperloglog.rs:185-186).
  *
  * Exposed as a typed `Aggregator` (Spark-idiomatic), registrable via
  * `functions.udaf` for DataFrame `agg`. Sketch size: 64×59 ints.
  */
object CountingHll {
  val NumBuckets = 64     // 2^6
  val NumRanks = 59       // 64 - 6 bits for bucket + 1
  val SoftCap = 128

  type Sketch = Array[Int] // flattened [bucket * NumRanks + rank]

  def emptySketch: Sketch = new Array[Int](NumBuckets * NumRanks)

  private def mix64(z0: Long): Long = {
    // splitmix64 finalizer — public-domain mixing constants
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hash(v: Any): Long = v match {
    case null       => 0L
    case l: Long    => mix64(l)
    case i: Int     => mix64(i.toLong)
    case s: Short   => mix64(s.toLong)
    case s: String  => mix64(s.hashCode.toLong ^ (s.length.toLong << 32))
    case b: Array[Byte] => mix64(java.util.Arrays.hashCode(b).toLong)
    case d: Double  => mix64(java.lang.Double.doubleToLongBits(d))
    case other      => mix64(other.hashCode.toLong)
  }

  private def bucketAndRank(h: Long): (Int, Int) = {
    val bucket = (h & (NumBuckets - 1)).toInt
    val rest = h >>> 6
    val rank = if (rest == 0) NumRanks - 1
      else math.min(java.lang.Long.numberOfTrailingZeros(rest) + 1, NumRanks - 1)
    (bucket, rank)
  }

  /** Deterministic "coin flip" for probabilistic counting above SoftCap:
    * accept with probability 2^-k where k grows with the counter value.
    */
  private def acceptProbabilistic(h: Long, counter: Int): Boolean = {
    val k = (counter - SoftCap) / 64 + 1 // 1,2,3... as counter grows
    (mix64(h ^ counter.toLong) & ((1L << k) - 1)) == 0
  }

  def add(s: Sketch, v: Any): Unit = {
    val h = hash(v)
    val (b, r) = bucketAndRank(h)
    val idx = b * NumRanks + r
    val c = s(idx)
    if (c < SoftCap) s(idx) = c + 1
    else if (c < Int.MaxValue && acceptProbabilistic(h, c)) s(idx) = c + 1
  }

  def delete(s: Sketch, v: Any): Unit = {
    val h = hash(v)
    val (b, r) = bucketAndRank(h)
    val idx = b * NumRanks + r
    val c = s(idx)
    if (c > 0 && (c <= SoftCap || acceptProbabilistic(h, c - 1))) s(idx) = c - 1
  }

  def merge(a: Sketch, b: Sketch): Sketch = {
    val out = emptySketch
    var i = 0
    while (i < out.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }

  /** Standard HLL estimate over per-bucket max occupied rank, with
    * linear-counting small-range correction (the reference applies the same
    * correction, counting_hyperloglog.rs:127-162).
    */
  def estimate(s: Sketch): Long = {
    val m = NumBuckets.toDouble
    var harmonic = 0.0
    var zeros = 0
    var b = 0
    while (b < NumBuckets) {
      var maxRank = 0
      var r = NumRanks - 1
      while (r > 0 && maxRank == 0) {
        if (s(b * NumRanks + r) > 0) maxRank = r
        r -= 1
      }
      if (maxRank == 0 && s(b * NumRanks) == 0) zeros += 1
      harmonic += math.pow(2.0, -maxRank)
      b += 1
    }
    val alpha = 0.709 // alpha_64
    val raw = alpha * m * m / harmonic
    // linear counting while empty buckets remain and raw is in the biased
    // low range (same correction the reference applies,
    // counting_hyperloglog.rs:127-162; window widened to 4m because plain
    // HLL without bias tables overshoots around n ≈ 1.5m)
    val est =
      if (raw <= 4.0 * m && zeros > 0) m * math.log(m / zeros)
      else raw
    math.round(est)
  }

  /** Typed aggregator: NDV sketch over a string column. */
  class HllAggregator extends Aggregator[String, Sketch, Long] {
    def zero: Sketch = emptySketch
    def reduce(buf: Sketch, v: String): Sketch = { add(buf, v); buf }
    def merge(a: Sketch, b: Sketch): Sketch = CountingHll.merge(a, b)
    def finish(buf: Sketch): Long = estimate(buf)
    def bufferEncoder: Encoder[Sketch] = Encoders.javaSerialization[Sketch]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def sketchToBytes(s: Sketch): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(s.length * 4)
    s.foreach(bb.putInt)
    bb.array()
  }

  def sketchFromBytes(b: Array[Byte]): Sketch = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val arr = new Array[Int](b.length / 4)
    arr.indices.foreach(i => arr(i) = bb.getInt())
    arr
  }

  /** Like HllAggregator but surfaces the merged SKETCH (serialized), so a
    * full-table rebuild can recover per-column sketches distributedly.
    */
  class SketchAggregator extends Aggregator[String, Sketch, Array[Byte]] {
    def zero: Sketch = emptySketch
    def reduce(buf: Sketch, v: String): Sketch = { add(buf, v); buf }
    def merge(a: Sketch, b: Sketch): Sketch = CountingHll.merge(a, b)
    def finish(buf: Sketch): Array[Byte] = sketchToBytes(buf)
    def bufferEncoder: Encoder[Sketch] = Encoders.javaSerialization[Sketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `approx_ndv(col)` — distributed NDV estimate via the counting sketch.
    * Partial aggregation (map-side sketches, reduce-side merge) comes from
    * Spark's Aggregator machinery, so at 100 TB only 15 KB sketches cross
    * the shuffle, never values.
    */
  def approx_ndv(c: Column): Column = udaf(new HllAggregator).apply(c)
}
