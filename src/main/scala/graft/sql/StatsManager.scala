package graft.sql

import java.nio.file.{Files, Paths}
import java.util.Base64
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.stats.CountingHll
import Analyzer._

/** Online table statistics, mirroring the reference's statistics subsystem
  * (SURVEY.md §4.3): per-column counting-HLL NDV sketches and a
  * deterministic bottom-k-by-hash sample per table, both maintained on
  * every INSERT (reference access/heap.rs:245-292 updates its sketches and
  * reservoir sample on the same write path). The sample feeds selectivity
  * estimation by executing predicates against it (reference
  * planner/bottomup.rs:111-168); the planner uses the estimates to pick
  * broadcast sides (reference optimizer/optimizer.rs:177-180 picks hash
  * build sides the same way).
  *
  * Replacements for the HOW: the reference's AES-CTR skip-list reservoir
  * becomes bottom-k by md5(row) — equally uniform, but deterministic,
  * mergeable across batches/partitions, and engine-reproducible; sketches
  * persist as base64 ints in a JSON sidecar instead of catalog segments.
  */
final class StatsManager(spark: SparkSession, warehouse: String) {

  val SampleSize = 1024 // reference SAMPLE_SIZE (catalog/mod.rs:37)

  final case class TableStats(
      rowCount: Long,
      sketches: Map[String, CountingHll.Sketch],
      ndvOverride: Map[String, Long] = Map.empty) {
    def ndv(column: String): Option[Long] =
      ndvOverride.get(column.toLowerCase)
        .orElse(sketches.get(column.toLowerCase).map(CountingHll.estimate))
  }

  /** Per-bucket statistics for CLUSTERED BY tables: bucket → (rowcount,
    * bucket-column sketch). Lets a point predicate on the bucket column
    * estimate rows(bucket)/ndv(bucket) — the bucket the scan will prune
    * to — instead of the sample floor (TODO round-3 item: bucket-local
    * sketches for pruning-aware NDV).
    */
  final case class BucketStats(rows: Map[Int, Long],
      sketches: Map[Int, CountingHll.Sketch]) {
    def ndv(bucket: Int): Option[Long] =
      sketches.get(bucket).map(CountingHll.estimate)
  }

  private val stats = mutable.Map.empty[String, TableStats]
  private val bstats = mutable.Map.empty[String, BucketStats]
  // Tables whose sketches/sample predate the last copy-on-write rewrite:
  // the row count is exact, the estimation artifacts are deferred until
  // an estimator needs them (ensureFresh). Persisted, so a reopened
  // warehouse doesn't trust pre-rewrite sketches as fresh.
  private val staleTables = mutable.Set.empty[String]
  // descriptor at markStale time, so name-keyed readers (bucketStats) can
  // run the deferred rebuild too
  private val staleDescs = mutable.Map.empty[String, TableDesc]
  /** Wired by the owning database: how to read a table's current image
    * for a deferred (ensureFresh) rebuild.
    */
  @volatile var tableReader: TableDesc => DataFrame = null
  load()

  def get(table: String): Option[TableStats] = stats.get(table.toLowerCase)

  def isStale(table: String): Boolean = staleTables.contains(table.toLowerCase)

  /** Lazy replacement for rebuild() after a copy-on-write rewrite: keep an
    * EXACT row count (DML notices and before/after affected-row diffs read
    * it) but DEFER the per-column sketch aggregate, the bottom-k sample
    * rewrite and the per-bucket stats — 2-3 Spark jobs per DML statement —
    * until an estimator actually needs them. DML-only statement sequences
    * (the common OLTP shape) never pay for estimation artifacts they never
    * read; the first multi-table SELECT after a rewrite pays once.
    * Returns the fresh row count.
    */
  def markStale(desc: TableDesc, df: DataFrame): Long = {
    val n = df.count()
    val prev = stats.getOrElse(desc.name, TableStats(0L, Map.empty))
    stats(desc.name) = TableStats(n, prev.sketches, prev.ndvOverride)
    staleTables += desc.name
    staleDescs(desc.name) = desc
    save()
    n
  }

  /** Run the deferred rebuild if (and only if) the table is stale. */
  def ensureFresh(desc: TableDesc): Unit =
    if (staleTables.contains(desc.name)) {
      require(tableReader != null,
        "StatsManager.tableReader must be wired before estimator use")
      rebuild(desc, tableReader(desc))
    }

  def bucketStats(table: String): Option[BucketStats] = {
    val key = table.toLowerCase
    staleDescs.get(key) match {
      case Some(d) => ensureFresh(d)
      case None =>
        // after a warehouse reopen the stale FLAG is persisted but the
        // descriptor map is in-memory only: never serve possibly
        // pre-rewrite bucket stats for a table load() marked stale —
        // callers fall back conservatively on None (ADVICE r15)
        if (staleTables.contains(key)) return None
    }
    bstats.get(key)
  }

  /** ANALYZE-style external injection (tests / tuning): override a table's
    * cardinality and per-column NDVs without rescanning. Not persisted.
    */
  def injectStats(table: String, rowCount: Long, ndv: Map[String, Long] = Map.empty): Unit = {
    val prev = stats.getOrElse(table.toLowerCase, TableStats(0L, Map.empty))
    stats(table.toLowerCase) = TableStats(rowCount, prev.sketches,
      prev.ndvOverride ++ ndv.map { case (k, v) => k.toLowerCase -> v })
  }

  def initTable(desc: TableDesc): Unit = {
    stats(desc.name) = TableStats(0L,
      desc.attributes.map(a => a.name.toLowerCase -> CountingHll.emptySketch).toMap)
    save()
  }

  /** DROP TABLE: forget the table's statistics (persisted). */
  def dropTable(name: String): Unit = {
    stats.remove(name.toLowerCase)
    bstats.remove(name.toLowerCase)
    staleTables.remove(name.toLowerCase)
    staleDescs.remove(name.toLowerCase)
    save()
  }

  /** Fold an inserted batch into rowcount + sketches + sample. Batch sizes
    * are REPL-scale here; the per-value add loop is the same cost the
    * reference pays on its write path.
    */
  def recordInsert(desc: TableDesc, rows: Seq[Seq[Any]]): Unit = {
    val prev = stats.getOrElse(desc.name, TableStats(0L,
      desc.attributes.map(a => a.name.toLowerCase -> CountingHll.emptySketch).toMap))
    val sketches = prev.sketches.map { case (k, v) => k -> v.clone() }
    for (row <- rows; (attr, v) <- desc.attributes.zip(row)) {
      // values hash via their string image so incremental sketches stay
      // consistent with full-table rebuilds (which cast columns to string)
      val sv = if (v == null) null else String.valueOf(v)
      sketches.get(attr.name.toLowerCase).foreach(s => CountingHll.add(s, sv))
    }
    stats(desc.name) = TableStats(prev.rowCount + rows.length, sketches)
    updateSample(desc, rows)
    recordBucketInsert(desc, rows)
    save()
  }

  // ---- bucket-local statistics ----

  // (table, rendered value) → bucket id; planning-time lookups reuse it
  private val bucketIdCache = mutable.Map.empty[(String, String), Int]

  /** Spark's bucket id for a value — pmod(murmur3(value), n), evaluated
    * with the engine's own `hash` expression (the same Murmur3/seed-42 the
    * bucketed write used) so the estimate points at the file the scan
    * will actually prune to. Value must already have the column's type.
    */
  def bucketIdOf(desc: TableDesc, value: Any): Int = {
    val (bcol, n) = desc.bucket.get
    bucketIdCache.getOrElseUpdate((desc.name, String.valueOf(value)), {
      val attr = desc.attr(bcol).get
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", attr.sqlType.spark)))
      spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(value)), 1), schema)
        .select(pmod(hash(col("v")), lit(n)).as("b"))
        .head.getInt(0)
    })
  }

  /** Incremental per-bucket fold on the INSERT path: one tiny local job
    * computes the batch's bucket ids; counts and sketches update
    * driver-side (REPL-scale batches, same cost class as recordInsert).
    */
  private def recordBucketInsert(desc: TableDesc, rows: Seq[Seq[Any]]): Unit =
    desc.bucket.foreach { case (bcol, n) =>
      val idx = desc.attributes.indexWhere(_.name.equalsIgnoreCase(bcol))
      val attr = desc.attributes(idx)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", attr.sqlType.spark)))
      val assigned = spark.createDataFrame(
          spark.sparkContext.parallelize(
            rows.map(r => org.apache.spark.sql.Row(r(idx))), 1), schema)
        .select(pmod(hash(col("v")), lit(n)).as("b"), col("v").cast("string").as("s"))
        .collect()
      val prev = bstats.getOrElse(desc.name, BucketStats(Map.empty, Map.empty))
      val rowsM = mutable.Map(prev.rows.toSeq: _*).withDefaultValue(0L)
      val sksM = mutable.Map(prev.sketches.map { case (k, v) => k -> v.clone() }.toSeq: _*)
      assigned.foreach { r =>
        val b = r.getInt(0)
        rowsM(b) = rowsM(b) + 1
        val sk = sksM.getOrElseUpdate(b, CountingHll.emptySketch)
        CountingHll.add(sk, if (r.isNullAt(1)) null else r.getString(1))
      }
      bstats(desc.name) = BucketStats(rowsM.toMap, sksM.toMap)
    }

  /** Distributed per-bucket rebuild (import / copy-on-write rewrites):
    * one (bucket) aggregate — counts plus a merged sketch per bucket
    * cross the shuffle, never rows.
    */
  private def rebuildBucketStats(desc: TableDesc, df: DataFrame): Unit =
    desc.bucket.foreach { case (bcol, n) =>
      import org.apache.spark.sql.functions.udaf
      val agg = df.groupBy(pmod(hash(col(bcol)), lit(n)).as("b"))
        .agg(count(lit(1)).as("n"),
          udaf(new CountingHll.SketchAggregator)
            .apply(col(bcol).cast("string")).as("sk"))
        .collect()
      bstats(desc.name) = BucketStats(
        agg.map(r => r.getInt(0) -> r.getLong(1)).toMap,
        agg.map(r => r.getInt(0) -> CountingHll.sketchFromBytes(r.getAs[Array[Byte]](2))).toMap)
    }

  /** Point-lookup estimate on the bucket column from bucket-local stats:
    * rows(bucket) / ndv(bucket) — the scan prunes to that bucket, and the
    * bucket's own NDV sees local skew the global sample cannot. A value
    * hashing to an empty bucket estimates 1 (the floor; zero would
    * destabilize the join-order DP). None for non-bucketed tables or
    * when bucket stats are absent.
    */
  def estimateBucketPoint(desc: TableDesc, value: Any): Option[Long] =
    desc.bucket.flatMap { _ =>
      ensureFresh(desc)
      bstats.get(desc.name).map { bs =>
        val b = bucketIdOf(desc, value)
        bs.rows.get(b) match {
          case None    => 1L
          case Some(r) =>
            val ndv = bs.ndv(b).filter(_ > 0).getOrElse(1L)
            math.max(1L, math.round(r.toDouble / ndv))
        }
      }
    }

  // ---- deterministic sample ----

  private def samplePath(name: String) = s"$warehouse/_samples/$name"

  /** Bottom-k by md5 over the row's string image: a uniform k-sample that
    * any engine reproduces and that merges associatively (min-k of a union
    * = min-k of min-k's) — the property the reference's reservoir skip
    * machinery exists to provide.
    */
  private def updateSample(desc: TableDesc, rows: Seq[Seq[Any]]): Unit = {
    import org.apache.spark.sql.Row
    val newDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 1), desc.sparkSchema)
    val dir = samplePath(desc.name)
    val existing =
      if (Files.exists(Paths.get(dir)) && Files.list(Paths.get(dir)).findFirst().isPresent)
        spark.read.schema(desc.sparkSchema).parquet(dir)
      else newDf.limit(0)
    val keyed = existing.unionAll(newDf)
      .withColumn("__k", md5(concat_ws("\u0001",
        desc.attributes.map(a => coalesce(col(a.name).cast("string"), lit("\u0000"))): _*)))
      .orderBy("__k")
      .limit(SampleSize)
      .drop("__k")
    val tmp = s"$dir.tmp"
    keyed.coalesce(1).write.mode("overwrite").parquet(tmp)
    // atomic-ish swap (single-process warehouse, same as the reference)
    val dirP = Paths.get(dir)
    if (Files.exists(dirP)) {
      Files.walk(dirP).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.move(Paths.get(tmp), dirP)
  }

  def sample(desc: TableDesc): DataFrame = {
    ensureFresh(desc)
    val dir = samplePath(desc.name)
    if (Files.exists(Paths.get(dir)))
      spark.read.schema(desc.sparkSchema).parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], desc.sparkSchema)
  }

  /** Estimated cardinality of (table WHERE predicate): matching sample
    * fraction × row count, floored at 1 — the reference's estimator
    * (planner/bottomup.rs:111-168, incl. its base/(2·SAMPLE) floor idea).
    */
  def estimateCard(desc: TableDesc, predicate: Option[org.apache.spark.sql.Column]): Long = {
    ensureFresh(desc)
    val total = stats.get(desc.name).map(_.rowCount).getOrElse(0L)
    predicate match {
      case None => total
      case Some(p) =>
        val s = sample(desc)
        val n = s.count()
        if (n == 0) total
        else {
          val hit = s.filter(p).count()
          val frac = if (hit == 0) 1.0 / (2.0 * n) else hit.toDouble / n
          math.max(1L, math.round(frac * total))
        }
    }
  }

  // ---- join selectivity from joined samples ----

  // sample column values collected once per (table, column, rowcount) —
  // ≤ SampleSize strings, invalidated when the table's rowcount moves
  private val colValuesCache = mutable.Map.empty[(String, String, Long), Seq[String]]

  private def sampleColumn(desc: TableDesc, column: String): Seq[String] = {
    val rc = stats.get(desc.name).map(_.rowCount).getOrElse(0L)
    colValuesCache.getOrElseUpdate((desc.name, column.toLowerCase, rc), {
      sample(desc).select(col(column).cast("string")).collect()
        .flatMap(r => Option(r.getString(0))).toSeq
    })
  }

  /** Equi-join selectivity estimated by JOINING the two tables' bottom-k
    * samples: |sampleA ⋈ sampleB| / (|A|·|B|) — an unbiased estimate of
    * P(a.x = b.y) that sees actual key overlap and skew, where the
    * 1/max(NDV) formula assumes containment and uniformity (it reports
    * the same selectivity for disjoint and perfectly-overlapping
    * domains). Zero sample hits floor at half a hit — the reference's
    * zero-hit-floor idea (planner/bottomup.rs:111-168) applied to pairs.
    * None when either sample is missing (caller falls back to NDV).
    * Both samples are driver-sized (≤ SampleSize rows) by construction,
    * so the multiset intersection is an in-process hash lookup — the same
    * place the reference evaluates its reservoir sample.
    */
  def estimateJoinSel(a: TableDesc, colA: String,
      b: TableDesc, colB: String): Option[Double] = {
    ensureFresh(a); ensureFresh(b)
    val va = sampleColumn(a, colA)
    val vb = sampleColumn(b, colB)
    if (va.isEmpty || vb.isEmpty) None
    else {
      val countsA = va.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val hits = vb.iterator.map(countsA.getOrElse(_, 0L)).sum
      val denom = va.size.toDouble * vb.size.toDouble
      Some(if (hits == 0L) 0.5 / denom else hits / denom)
    }
  }

  /** Full rebuild after a copy-on-write rewrite (DELETE/UPDATE): rowcount,
    * per-column sketches (distributed, via SketchAggregator — sketches
    * merge map-side, only ~15 KB per column crosses the shuffle) and the
    * deterministic sample.
    */
  def rebuild(desc: TableDesc, df: DataFrame): Unit = {
    import org.apache.spark.sql.functions.udaf
    val n = df.count()
    val sketchAggs = desc.attributes.map(a =>
      udaf(new graft.stats.CountingHll.SketchAggregator)
        .apply(col(a.name).cast("string")).as(a.name.toLowerCase))
    val sketches: Map[String, CountingHll.Sketch] =
      if (n == 0) desc.attributes.map(a => a.name.toLowerCase -> CountingHll.emptySketch).toMap
      else {
        val row = df.agg(sketchAggs.head, sketchAggs.tail: _*).head()
        desc.attributes.zipWithIndex.map { case (a, i) =>
          a.name.toLowerCase -> CountingHll.sketchFromBytes(row.getAs[Array[Byte]](i))
        }.toMap
      }
    stats(desc.name) = TableStats(n, sketches)
    rewriteSample(desc, df)
    rebuildBucketStats(desc, df)
    staleTables.remove(desc.name)
    staleDescs.remove(desc.name)
    save()
  }

  /** Recompute the bottom-k sample from a full table image. */
  private def rewriteSample(desc: TableDesc, df: DataFrame): Unit = {
    val keyed = df
      .withColumn("__k", md5(concat_ws("",
        desc.attributes.map(a => coalesce(col(a.name).cast("string"), lit(" "))): _*)))
      .orderBy("__k")
      .limit(SampleSize)
      .drop("__k")
    val dir = samplePath(desc.name)
    val tmp = s"$dir.tmp"
    keyed.coalesce(1).write.mode("overwrite").parquet(tmp)
    val dirP = Paths.get(dir)
    if (Files.exists(dirP)) {
      Files.walk(dirP).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.move(Paths.get(tmp), dirP)
  }

  // ---- persistence ----

  private def statsPath = Paths.get(s"$warehouse/stats.json")
  private def bucketStatsPath = Paths.get(s"$warehouse/bucketstats.json")

  private def save(): Unit = {
    val enc = Base64.getEncoder
    def b64(sk: CountingHll.Sketch): String = {
      val bb = java.nio.ByteBuffer.allocate(sk.length * 4)
      sk.foreach(bb.putInt)
      enc.encodeToString(bb.array())
    }
    val lines = stats.map { case (name, ts) =>
      val cols = ts.sketches.map { case (c, sk) => s""""$c":"${b64(sk)}"""" }
        .mkString("{", ",", "}")
      val staleTag = if (staleTables.contains(name)) ""","stale":true""" else ""
      s"""{"table":"$name","rows":${ts.rowCount},"sketches":$cols$staleTag}"""
    }
    Files.createDirectories(statsPath.getParent)
    Files.write(statsPath, lines.mkString("\n").getBytes("UTF-8"))
    val blines = bstats.toSeq.flatMap { case (name, bs) =>
      bs.rows.keys.toSeq.sorted.map { b =>
        val sk = bs.sketches.get(b).map(b64).getOrElse("")
        s"""{"table":"$name","bucket":$b,"rows":${bs.rows(b)},"sketch":"$sk"}"""
      }
    }
    Files.write(bucketStatsPath, blines.mkString("\n").getBytes("UTF-8"))
  }

  private def load(): Unit = {
    val dec = Base64.getDecoder
    def unb64(s: String): CountingHll.Sketch = {
      val bytes = dec.decode(s)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val arr = new Array[Int](bytes.length / 4)
      (0 until arr.length).foreach(i => arr(i) = bb.getInt())
      arr
    }
    if (Files.exists(statsPath)) {
      val tableRe =
        """\{"table":"([^"]+)","rows":(\d+),"sketches":\{(.*)\}(,"stale":true)?\}""".r
      val colRe = """"([^"]+)":"([^"]*)"""".r
      Files.readAllLines(statsPath).forEach {
        case tableRe(name, rows, cols, staleTag) =>
          val sketches = colRe.findAllMatchIn(cols)
            .map(m => m.group(1) -> unb64(m.group(2))).toMap
          stats(name) = TableStats(rows.toLong, sketches)
          if (staleTag != null) staleTables += name
        case line if line.nonEmpty => sys.error(s"bad stats line: $line")
        case _ =>
      }
    }
    if (Files.exists(bucketStatsPath)) {
      val bRe = """\{"table":"([^"]+)","bucket":(\d+),"rows":(\d+),"sketch":"([^"]*)"\}""".r
      val rowsB = mutable.Map.empty[String, mutable.Map[Int, Long]]
      val sksB = mutable.Map.empty[String, mutable.Map[Int, CountingHll.Sketch]]
      Files.readAllLines(bucketStatsPath).forEach {
        case bRe(name, b, rows, sk) =>
          rowsB.getOrElseUpdate(name, mutable.Map.empty)(b.toInt) = rows.toLong
          if (sk.nonEmpty)
            sksB.getOrElseUpdate(name, mutable.Map.empty)(b.toInt) = unb64(sk)
        case line if line.nonEmpty => sys.error(s"bad bucket stats line: $line")
        case _ =>
      }
      rowsB.foreach { case (name, rows) =>
        bstats(name) = BucketStats(rows.toMap,
          sksB.get(name).map(_.toMap).getOrElse(Map.empty))
      }
    }
  }
}
