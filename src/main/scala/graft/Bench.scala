package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet timestamp[ns]; Spark has no nanos timestamp —
      // read as long and let graft.Tables.events() convert to micros.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run every query once at the smallest fixture (if present)
    // so JIT + whole-stage-codegen compilation happen outside the timed
    // runs; the timed numbers then measure the operators, not the JVM.
    val warmDir = {
      val parent = new java.io.File(sfDir).getAbsoluteFile.getParentFile
      val smallest = new java.io.File(parent, "sf0.001")
      if (smallest.isDirectory) smallest.getPath else sfDir
    }
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    graft.queries.Dedup.releaseShingles(spark)
    graft.queries.Vectors.releaseCaches(spark)
    // Per-query MEDIAN over 3 timed passes, so round-over-round deltas are
    // attributable to code, not run noise. The shared shingle cache is
    // released between passes so every pass pays the materialization in
    // the same place (inside the first dedup query it times).
    val Reps = 3
    val runs: Seq[Map[String, Double]] = (1 to Reps).map { _ =>
      val r = SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
      graft.queries.Dedup.releaseShingles(spark)
    graft.queries.Vectors.releaseCaches(spark)
      r
    }
    val medians: Seq[(String, Double)] = SparkEntry.queries.keys.toSeq.map { name =>
      val ts = runs.map(_(name)).sorted
      name -> ts(ts.length / 2)
    }
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$Reps,"agg":"median"}"""
    // The driver's capture truncates long output, which has cut this
    // (multi-KB) line in past rounds. Defend from every side: persist the
    // full JSON to a repo file, print it as the FIRST stdout line (before
    // shutdown logging), flush, then print a SHORT self-contained summary
    // line that parses even if the long line is cut from either end.
    try {
      val p = java.nio.file.Paths.get("/root/repo/BENCH_FULL.json")
      java.nio.file.Files.write(p, line.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(line)
    Console.out.flush()
    // The driver keeps only the LAST ~2000 chars of stdout and its parser
    // requires a complete JSON line with a "queries" key — the full line
    // above is multi-KB so its head gets cut out of that window. The
    // LAST line printed is therefore a bounded one: the top-25 queries by
    // median (3-decimal values), always < 1.5 KB, so it survives the tail
    // window intact even with sbt's trailing "[success]" line after it.
    val top = medians.sortBy(-_._2).take(25)
      .map { case (k, v) => f"""\"$k\":${math.rint(v * 1000) / 1000}%s""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$top,"sf":"$sfDir","reps":$Reps,"agg":"median","queries_shown":"top25_by_median","queries_total":${medians.length},"queries_file":"BENCH_FULL.json"}""")
    Console.out.flush()
    spark.stop()
  }
}
