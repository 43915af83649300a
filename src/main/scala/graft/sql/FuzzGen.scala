package graft.sql

import scala.util.Random

/** Deterministic random-query generator for differential testing against
  * DuckDB (tools/check_fuzz.py replays the same script + queries there
  * and diffs results as sorted multisets).
  *
  * The grammar is the SHARED dialect subset in which both engines are
  * value-deterministic and bit-comparable:
  *   - INT / VARCHAR / DATE columns only — no floating point anywhere
  *     (summation order could differ), no DECIMAL (scale display), no
  *     CAST between numeric families (DuckDB rounds double→int where
  *     Spark truncates);
  *   - arithmetic is + - * %, with multipliers kept to small literals so
  *     no intermediate can overflow INT32 in either engine;
  *   - every aggregate is exact (count/sum/min/max/count DISTINCT);
  *   - windows always carry the unique `id` column as the final ORDER
  *     tiebreak so rank/row_number are single-valued;
  *   - no LIMIT/OFFSET (row order is compared as a multiset).
  *
  * Queries are built TYPED (int expressions only meet int expressions),
  * so near-100% of generated text must analyze — an engine rejection is
  * reported by the harness and a crash fails it.
  */
object FuzzGen {

  /** Engine-side fixture statements (the left of every scriptPaired row). */
  def script(seed: Long): Seq[String] = scriptPaired(seed).map(_._1)

  /** Shared fixture DDL + INSERTs: three tables with NULLs, duplicate
    * keys, negative values and overlapping string values. `id` is unique
    * in fa/fb (window tiebreak); fc is a small dup-heavy lookup.
    *
    * PAIRED form: (engine statement, DuckDB replay statements). Almost
    * every row is identical on both sides; the exceptions are the MERGE
    * sequences — DuckDB 1.0 has no MERGE INTO, so each generated MERGE
    * carries its exact UPDATE…FROM / DELETE…USING / INSERT…NOT EXISTS
    * translation (clause shapes are restricted so the sequential
    * translation is semantics-preserving: ON keys never modified, source
    * keys distinct, never MATCHED-DELETE combined with NOT-MATCHED-INSERT).
    */
  def scriptPaired(seed: Long): Seq[(String, Seq[String])] = {
    val r = new Random(seed ^ 0x5eedL)
    val strs = Seq("alpha", "beta", "gamma", "delta", "Alp", "bet%a", "x_y")
    val dates = Seq("1994-01-15", "1995-03-07", "1995-06-17", "1996-11-30")
    def intOrNull(lo: Int, hi: Int, pNull: Int): String =
      if (r.nextInt(100) < pNull) "NULL" else (lo + r.nextInt(hi - lo + 1)).toString
    def strOrNull(pNull: Int): String =
      if (r.nextInt(100) < pNull) "NULL" else s"'${strs(r.nextInt(strs.length))}'"
    def dateOrNull(pNull: Int): String =
      if (r.nextInt(100) < pNull) "NULL" else s"DATE '${dates(r.nextInt(dates.length))}'"

    val fa = (1 to 60).map(i =>
      s"($i, ${intOrNull(-5, 15, 10)}, ${intOrNull(0, 100, 10)}, " +
        s"${strOrNull(15)}, ${dateOrNull(15)})")
    val fb = (1 to 40).map(i =>
      s"($i, ${intOrNull(-5, 15, 10)}, ${strOrNull(15)})")
    val fc = (1 to 25).map(_ =>
      s"(${intOrNull(-2, 8, 8)}, ${intOrNull(0, 50, 8)})")
    // DML sequences: three tables each built by CREATE → INSERT →
    // UPDATE (self-referencing SET expressions) → DELETE (incl. one
    // subquery predicate, the row-id-rewrite path) → INSERT → UPDATE.
    // Both engines execute the identical statements; the dmlProbe query
    // shape then diffs the final table states.
    val dml = (0 until 3).flatMap { j =>
      val t = s"fd$j"
      val rows = (1 to 30).map(i =>
        s"($i, ${intOrNull(0, 50, 10)}, ${strOrNull(15)})")
      val rows2 = (31 to 40).map(i =>
        s"($i, ${intOrNull(0, 50, 10)}, ${strOrNull(15)})")
      val upd = Seq("v + k", "v * 2", "coalesce(v, 0) - 3")(r.nextInt(3))
      Seq(
        s"CREATE TABLE $t (k INT, v INT, s VARCHAR(12))",
        s"INSERT INTO $t VALUES ${rows.mkString(", ")}",
        s"UPDATE $t SET v = $upd WHERE ${pred(r, Seq("k", "v"), Seq("s"), 1)}",
        s"DELETE FROM $t WHERE ${pred(r, Seq("k", "v"), Seq("s"), 1)}",
        s"INSERT INTO $t VALUES ${rows2.mkString(", ")}",
        s"UPDATE $t SET s = upper(s) WHERE ${pred(r, Seq("k", "v"), Nil, 0)}",
        s"DELETE FROM $t WHERE k IN (SELECT (k + ${r.nextInt(5)}) AS ks FROM fc " +
          s"WHERE ${pred(r, Seq("k", "v"), Nil, 0)})")
    }
    // MERGE sequences (engine) with exact DuckDB-1.0 translations. The
    // grouped source guarantees distinct keys (no multi-match error);
    // no clause modifies the ON key, so sequential replay sees the same
    // match set the atomic MERGE does.
    val src = "(SELECT k, min(v) AS v FROM fc WHERE k IS NOT NULL GROUP BY k)"
    val mrg: Seq[(String, Seq[String])] = (0 until 3).flatMap { j =>
      val t = s"fd$j"
      val c1 = r.nextInt(30); val c2 = 5 + r.nextInt(40)
      val kc = 20 + r.nextInt(15)
      r.nextInt(6) match {
        case 0 => Seq((
          s"MERGE INTO $t USING $src s ON $t.k = s.k " +
            s"WHEN MATCHED AND s.v > $c1 THEN UPDATE SET v = coalesce($t.v, 0) + s.v " +
            s"WHEN NOT MATCHED AND s.v < $c2 THEN INSERT (k, v, s) VALUES (s.k, s.v, 'mrg')",
          Seq(
            s"UPDATE $t SET v = coalesce($t.v, 0) + s.v FROM $src s " +
              s"WHERE $t.k = s.k AND s.v > $c1",
            s"INSERT INTO $t SELECT s.k, s.v, 'mrg' FROM $src s " +
              s"WHERE s.v < $c2 AND NOT EXISTS (SELECT 1 FROM $t WHERE $t.k = s.k)")))
        case 1 => Seq((
          s"MERGE INTO $t USING $src s ON $t.k = s.k " +
            s"WHEN MATCHED AND $t.v > $c2 THEN DELETE",
          Seq(s"DELETE FROM $t USING $src s WHERE $t.k = s.k AND $t.v > $c2")))
        case 2 => Seq((
          s"MERGE INTO $t USING $src s ON $t.k = s.k " +
            s"WHEN NOT MATCHED BY SOURCE AND $t.k > $kc THEN UPDATE SET s = lower(s)",
          Seq(s"UPDATE $t SET s = lower(s) WHERE $t.k > $kc AND " +
            s"NOT EXISTS (SELECT 1 FROM $src s WHERE s.k = $t.k)")))
        // subquery WHEN condition (reads fc only — identical pre/post
        // state on both engines, so the sequential replay is exact)
        case 3 => Seq((
          s"MERGE INTO $t USING $src s ON $t.k = s.k " +
            s"WHEN MATCHED AND $t.v < (SELECT avg(x.v) AS m FROM fc x) " +
            s"THEN UPDATE SET v = coalesce($t.v, 0) + 1",
          Seq(s"UPDATE $t SET v = coalesce($t.v, 0) + 1 FROM $src s " +
            s"WHERE $t.k = s.k AND $t.v < (SELECT avg(x.v) FROM fc x)")))
        // multi-arm MATCHED with conditions — FIRST MATCH WINS. The
        // translation materializes the arm assignment on the ORIGINAL
        // state (one CASE over the matched join into a scratch table,
        // first-true arm per key), then applies each arm to its keys:
        // sequential replay can't leak a row into a later arm or
        // re-evaluate a condition against mutated state. The NOT
        // MATCHED arm tests membership in the scratch table — every
        // matched source key is in it (ELSE arm), so post-DELETE keys
        // stay "matched", exactly the atomic MERGE's match set. Later
        // arms' SET expressions never read columns earlier arms write.
        case 4 =>
          val arm = s"fzarm$j"
          Seq((
            s"MERGE INTO $t USING $src s ON $t.k = s.k " +
              s"WHEN MATCHED AND s.v > $c1 THEN UPDATE SET v = coalesce($t.v, 0) + s.v " +
              s"WHEN MATCHED AND $t.v < $c2 THEN DELETE " +
              s"WHEN MATCHED THEN UPDATE SET s = 'm$j' " +
              s"WHEN NOT MATCHED AND s.v < $kc THEN INSERT (k, v, s) VALUES (s.k, s.v, 'mm$j')",
            Seq(
              s"CREATE TABLE $arm AS SELECT t.k AS kk, " +
                s"CASE WHEN s.v > $c1 THEN 1 WHEN t.v < $c2 THEN 2 ELSE 3 END AS arm " +
                s"FROM $t t JOIN $src s ON t.k = s.k",
              s"UPDATE $t SET v = coalesce($t.v, 0) + s.v FROM $src s, $arm a " +
                s"WHERE $t.k = s.k AND a.kk = $t.k AND a.arm = 1",
              s"DELETE FROM $t USING $arm a WHERE a.kk = $t.k AND a.arm = 2",
              s"UPDATE $t SET s = 'm$j' FROM $arm a WHERE a.kk = $t.k AND a.arm = 3",
              s"INSERT INTO $t SELECT s.k, s.v, 'mm$j' FROM $src s WHERE s.v < $kc " +
                s"AND NOT EXISTS (SELECT 1 FROM $arm a WHERE a.kk = s.k)",
              s"DROP TABLE $arm")))
        // multi-arm NOT MATCHED: the insert set is independent of the
        // matched arms, so first-match-wins folds into one CASE-shaped
        // INSERT…SELECT (a NULL s.v fails every comparison and falls to
        // the unconditioned arm on both engines)
        case _ => Seq((
          s"MERGE INTO $t USING $src s ON $t.k = s.k " +
            s"WHEN NOT MATCHED AND s.v < $c1 THEN INSERT (k, v, s) VALUES (s.k, s.v, 'n1') " +
            s"WHEN NOT MATCHED AND s.v < $c2 THEN INSERT (k, v, s) VALUES (s.k, 0, 'n2') " +
            s"WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (s.k, -1, 'n3')",
          Seq(
            s"INSERT INTO $t SELECT s.k, " +
              s"CASE WHEN s.v < $c1 THEN s.v WHEN s.v < $c2 THEN 0 ELSE -1 END, " +
              s"CASE WHEN s.v < $c1 THEN 'n1' WHEN s.v < $c2 THEN 'n2' ELSE 'n3' END " +
              s"FROM $src s WHERE NOT EXISTS (SELECT 1 FROM $t WHERE $t.k = s.k)")))
      }
    }
    // Session-state fixture: a schema with its own table, prepared
    // statements (positional $n and ? placeholders; resolution of the
    // unqualified fc falls back to main on BOTH engines after USE), and
    // USE as the LAST statement so every fuzz query runs under the
    // non-default schema with main-fallback resolution in play.
    val fg = (1 to 18).map(i =>
      s"(${intOrNull(-3, 9, 12)}, ${intOrNull(0, 60, 12)}, " +
        s"${if (r.nextInt(100) < 15) "NULL"
           else s"'${Seq("elon", "Elön", "ELÖN", "gamma", "x_y")(r.nextInt(5))}'"})")
    val session: Seq[String] = Seq(
      "CREATE SCHEMA fs1",
      "CREATE TABLE fs1.fg (g INT, h INT, s VARCHAR(12))",
      s"INSERT INTO fs1.fg VALUES ${fg.mkString(", ")}",
      "PREPARE fzp1 AS SELECT k AS c0, count(*) AS c1, sum(v) AS c2 " +
        "FROM fc WHERE v > $1 GROUP BY k",
      "PREPARE fzp2 AS SELECT ? * 10 + ? AS c0",
      "PREPARE fzp3 AS SELECT id AS c0, s AS c1 FROM fa " +
        "WHERE s = $1 AND id < $2",
      // DEALLOCATE + re-PREPARE under the SAME name: later EXECUTEs
      // must bind the second body on both engines
      "PREPARE fzp4 AS SELECT k AS c0, v AS c1 FROM fc WHERE v > $1",
      "DEALLOCATE fzp4",
      "PREPARE fzp4 AS SELECT k AS c0, count(*) AS c1 FROM fc " +
        "WHERE v < $1 GROUP BY k",
      "USE fs1")
    // Attached-warehouse fixture: @att-prefixed statements build a
    // SECOND warehouse (loadFixture routes them to a scratch
    // GraftDatabase and substitutes its path into the ATTACH); DuckDB
    // models the attached alias as a schema. ATTACH precedes USE, and
    // every fuzz query then resolves att1.* cross-warehouse while
    // unqualified names walk fs1 → main — the trickiest resolve map.
    val fh = (1 to 20).map(i =>
      s"($i, ${intOrNull(0, 30, 10)}, ${strOrNull(15)})")
    val attached: Seq[(String, Seq[String])] = Seq(
      ("@att CREATE TABLE fh (k INT, w INT, s VARCHAR(12))",
        Seq("CREATE SCHEMA att1",
          "CREATE TABLE att1.fh (k INT, w INT, s VARCHAR(12))")),
      (s"@att INSERT INTO fh VALUES ${fh.mkString(", ")}",
        Seq(s"INSERT INTO att1.fh VALUES ${fh.mkString(", ")}")),
      ("ATTACH '__ATTDIR__' AS att1", Seq()))
    (Seq(
      "CREATE TABLE fa (id INT, a INT, b INT, s VARCHAR(12), d DATE)",
      "CREATE TABLE fb (id INT, x INT, t VARCHAR(12))",
      "CREATE TABLE fc (k INT, v INT)",
      // deliberately EMPTY: grand-total patch rows over empty input
      "CREATE TABLE fe (k INT, v INT, s VARCHAR(12))",
      s"INSERT INTO fa VALUES ${fa.mkString(", ")}",
      s"INSERT INTO fb VALUES ${fb.mkString(", ")}",
      s"INSERT INTO fc VALUES ${fc.mkString(", ")}") ++ dml)
      .map(s => (s, Seq(s))) ++ mrg ++ attached ++ session.map(s => (s, Seq(s)))
  }

  /** Load the paired fixture into `db`: `@att `-prefixed statements
    * build the attached warehouse in a scratch GraftDatabase whose path
    * substitutes into the `__ATTDIR__` placeholder of the ATTACH
    * statement. Shared by FuzzDump and FuzzSpec so the engine-side
    * execution of the fixture has exactly one definition.
    */
  def loadFixture(spark: org.apache.spark.sql.SparkSession,
      db: GraftDatabase, seed: Long): Unit = {
    val attDir = java.nio.file.Files
      .createTempDirectory("graft-fuzz-att").toString
    val attDb = new GraftDatabase(spark, attDir)
    scriptPaired(seed).foreach { case (stmt, _) =>
      val res =
        if (stmt.startsWith("@att ")) attDb.query(stmt.stripPrefix("@att "))
        else db.query(stmt.replace("__ATTDIR__", attDir))
      res.left.foreach(e => sys.error(s"fixture: $stmt -> ${e.msg}"))
    }
  }

  // ---- typed expression generators -------------------------------------

  private val faInts = Seq("a", "b", "id")
  private val strLits = Seq("'alpha'", "'beta'", "'gamma'", "'Alp'")

  private def lit(r: Random): String = (r.nextInt(41) - 20).toString

  /** Integer-valued expression over the given int/string columns. */
  def intExpr(r: Random, ints: Seq[String], strs: Seq[String], depth: Int): String =
    if (depth <= 0) {
      if (r.nextBoolean()) ints(r.nextInt(ints.length)) else lit(r)
    } else r.nextInt(8) match {
      case 0 => s"(${intExpr(r, ints, strs, depth - 1)} + ${intExpr(r, ints, strs, depth - 1)})"
      case 1 => s"(${intExpr(r, ints, strs, depth - 1)} - ${intExpr(r, ints, strs, depth - 1)})"
      case 2 => s"(${ints(r.nextInt(ints.length))} * ${1 + r.nextInt(5)})"
      case 3 => s"abs(${intExpr(r, ints, strs, depth - 1)})"
      case 4 => s"coalesce(${ints(r.nextInt(ints.length))}, ${lit(r)})"
      case 5 if strs.nonEmpty => s"length(${strExpr(r, strs, 0)})"
      case 6 => s"(${ints(r.nextInt(ints.length))} % ${2 + r.nextInt(6)})"
      case _ =>
        s"(CASE WHEN ${pred(r, ints, strs, depth - 1)} THEN " +
          s"${intExpr(r, ints, strs, 0)} ELSE ${intExpr(r, ints, strs, 0)} END)"
    }

  /** String-valued expression. */
  def strExpr(r: Random, strs: Seq[String], depth: Int): String =
    if (depth <= 0 || strs.isEmpty) {
      if (strs.nonEmpty && r.nextInt(4) > 0) strs(r.nextInt(strs.length))
      else strLits(r.nextInt(strLits.length))
    } else r.nextInt(4) match {
      case 0 => s"upper(${strExpr(r, strs, 0)})"
      case 1 => s"lower(${strExpr(r, strs, 0)})"
      case 2 => s"(${strExpr(r, strs, 0)} || ${strExpr(r, strs, 0)})"
      case _ => s"coalesce(${strs(r.nextInt(strs.length))}, '~')"
    }

  private val cmps = Seq("=", "<>", "<", "<=", ">", ">=")

  /** Boolean predicate over the given columns. */
  def pred(r: Random, ints: Seq[String], strs: Seq[String], depth: Int): String =
    if (depth <= 0) r.nextInt(6) match {
      case 0 | 1 =>
        s"${intExpr(r, ints, strs, 0)} ${cmps(r.nextInt(cmps.length))} ${intExpr(r, ints, strs, 0)}"
      case 2 if strs.nonEmpty =>
        s"${strs(r.nextInt(strs.length))} ${cmps(r.nextInt(cmps.length))} ${strLits(r.nextInt(strLits.length))}"
      case 3 =>
        s"${ints(r.nextInt(ints.length))} IS ${if (r.nextBoolean()) "" else "NOT "}NULL"
      case 4 if strs.nonEmpty =>
        val pat = Seq("'al%'", "'%a'", "'%mm%'", "'_e%'")(r.nextInt(4))
        s"${strs(r.nextInt(strs.length))} LIKE $pat"
      case _ =>
        val ls = Seq.fill(2 + r.nextInt(3))(lit(r)).mkString(", ")
        s"${ints(r.nextInt(ints.length))} ${if (r.nextBoolean()) "" else "NOT "}IN ($ls)"
    } else r.nextInt(4) match {
      case 0 => s"(${pred(r, ints, strs, depth - 1)} AND ${pred(r, ints, strs, depth - 1)})"
      case 1 => s"(${pred(r, ints, strs, depth - 1)} OR ${pred(r, ints, strs, depth - 1)})"
      case 2 => s"(NOT ${pred(r, ints, strs, depth - 1)})"
      case _ =>
        s"${intExpr(r, ints, strs, depth - 1)} BETWEEN ${lit(r)} AND ${lit(r).toInt.abs + 5}"
    }

  // ---- query shapes ----------------------------------------------------

  private def items(r: Random, ints: Seq[String], strs: Seq[String]): String = {
    val n = 1 + r.nextInt(3)
    (0 until n).map { i =>
      if (strs.nonEmpty && r.nextInt(4) == 0)
        s"${strExpr(r, strs, 1)} AS c$i"
      else s"${intExpr(r, ints, strs, 2)} AS c$i"
    }.mkString(", ")
  }

  private def simple(r: Random): String =
    s"SELECT ${items(r, faInts, Seq("s"))} FROM fa WHERE ${pred(r, faInts, Seq("s"), 2)}"

  private def joined(r: Random): String = {
    val jt = Seq("JOIN", "LEFT JOIN")(r.nextInt(2))
    val on = Seq("fa.id = fb.id", "fa.a = fb.x")(r.nextInt(2))
    val ints = Seq("fa.a", "fa.b", "fb.x", "fa.id")
    val strs = Seq("fa.s", "fb.t")
    s"SELECT ${items(r, ints, strs)} FROM fa $jt fb ON $on " +
      s"WHERE ${pred(r, ints, strs, 1)}"
  }

  private def grouped(r: Random): String = {
    val key = Seq("s", "a", "(b % 7)")(r.nextInt(3))
    val aggs = Seq(
      "count(*)", "count(b)", "count(DISTINCT a)",
      s"sum(${intExpr(r, Seq("a", "b"), Nil, 1)})",
      s"min(${intExpr(r, Seq("a", "b"), Nil, 0)})",
      s"max(${intExpr(r, Seq("a", "b"), Nil, 0)})")
    val n = 1 + r.nextInt(3)
    val picked = (0 until n).map(i => s"${aggs(r.nextInt(aggs.length))} AS g$i")
    val having =
      if (r.nextBoolean()) ""
      else s" HAVING count(*) ${cmps(r.nextInt(cmps.length))} ${1 + r.nextInt(5)}"
    s"SELECT $key AS k0, ${picked.mkString(", ")} FROM fa " +
      s"WHERE ${pred(r, faInts, Seq("s"), 1)} GROUP BY $key$having"
  }

  private def subq(r: Random): String = r.nextInt(6) match {
    // inequality-correlated scalar items — row scope (case 4) and over
    // an aggregated outer (case 5, correlates on the group key); both
    // lower as the union-merge running aggregate, and NULL outer values
    // must yield count 0 / sum NULL on both engines
    case 4 =>
      val f = Seq("count(v)", "sum(v)", "min(v)", "max(v)")(r.nextInt(4))
      val op = Seq("<", "<=", ">", ">=")(r.nextInt(4))
      s"SELECT id AS c0, (SELECT $f FROM fc WHERE fc.v $op fa.a) AS c1 " +
        s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"
    case 5 =>
      val f = Seq("count(v)", "sum(v)")(r.nextInt(2))
      val op = Seq("<", ">=")(r.nextInt(2))
      s"SELECT a AS k0, count(*) AS c0, " +
        s"(SELECT $f FROM fc WHERE fc.v $op a * 2) AS c1 " +
        s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)} GROUP BY a"
    case 0 =>
      s"SELECT ${items(r, faInts, Seq("s"))} FROM fa WHERE a " +
        s"${if (r.nextBoolean()) "" else "NOT "}IN " +
        s"(SELECT k FROM fc WHERE ${pred(r, Seq("k", "v"), Nil, 1)})"
    case 1 =>
      s"SELECT ${items(r, faInts, Seq("s"))} FROM fa WHERE " +
        s"${if (r.nextBoolean()) "" else "NOT "}EXISTS " +
        s"(SELECT 1 AS one FROM fc WHERE fc.k = fa.a AND ${pred(r, Seq("v"), Nil, 0)})"
    case 2 =>
      s"SELECT id AS c0, a AS c1, (SELECT ${Seq("max", "min")(r.nextInt(2))}(v) " +
        s"FROM fc WHERE ${pred(r, Seq("k", "v"), Nil, 1)}) AS c2 " +
        s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"
    case _ =>
      s"SELECT id AS c0, (SELECT count(*) FROM fc WHERE fc.k = fa.a) AS c1 " +
        s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"
  }

  private def setop(r: Random): String = {
    val op = Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT")(r.nextInt(4))
    s"SELECT a AS c0, b AS c1 FROM fa WHERE ${pred(r, faInts, Nil, 1)} " +
      s"$op SELECT x AS c0, id AS c1 FROM fb WHERE ${pred(r, Seq("x", "id"), Nil, 1)}"
  }

  private def windowed(r: Random): String = {
    val part = Seq("s", "a", "(a % 3)", "coalesce(a, -99)")(r.nextInt(4))
    // explicit null order now binds natively on the sort expression, so
    // RANGE frames compose with NULLS FIRST/LAST (no marker key) —
    // cases 7-8 exercise the combination on the nullable key `a`
    val nord = Seq("NULLS FIRST", "NULLS LAST")(r.nextInt(2))
    val dir = Seq("", " DESC")(r.nextInt(2))
    val win = r.nextInt(16) match {
      case 6 => s"${Seq("sum", "min", "max", "count")(r.nextInt(4))}(b) OVER ()"
      // unpartitioned DISTINCT: look-ahead prefix frames (mask over the
      // lead-ghost hybrid), whole-input frames and OVER () (broadcast
      // global distinct aggregate), fully bounded frames (ghosted
      // collect_set fold) — the last single-partition window classes
      case 14 =>
        val fd = Seq("count", "sum")(r.nextInt(2))
        r.nextInt(3) match {
          case 0 => s"$fd(DISTINCT a) OVER (ORDER BY id ROWS BETWEEN " +
            s"UNBOUNDED PRECEDING AND ${1 + r.nextInt(4)} FOLLOWING)"
          case 1 => s"$fd(DISTINCT a) OVER ${Seq("()",
            "(ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
              "UNBOUNDED FOLLOWING)")(r.nextInt(2))}"
          case _ => s"$fd(DISTINCT a) OVER (ORDER BY id ROWS BETWEEN " +
            s"${1 + r.nextInt(3)} PRECEDING AND ${r.nextInt(3)} FOLLOWING)"
        }
      // unpartitioned whole-input frames WITHOUT exclusion (the
      // broadcast rewrite under an ORDER BY)
      case 15 => s"${Seq("sum", "min", "max", "count")(r.nextInt(4))}(b) " +
        s"OVER (ORDER BY a $nord, id ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND UNBOUNDED FOLLOWING)"
      // INTERVAL RANGE over the nullable DATE key (time-windowed count;
      // NULL dates form their own peer group on both engines)
      case 9 => s"count(b) OVER (ORDER BY d RANGE BETWEEN " +
        s"INTERVAL ${10 + r.nextInt(40)} DAY PRECEDING AND CURRENT ROW)"
      // DISTINCT aggregate over a prefix frame (the scalable
      // first-occurrence-mask lowering)
      case 10 => s"${Seq("count", "sum")(r.nextInt(2))}(DISTINCT a) " +
        s"OVER (PARTITION BY $part ORDER BY id)"
      // UNPARTITIONED ordered windows — the distributed-prefix-scan
      // lowering (global ranks, running aggregates, distribution stats)
      case 11 => s"${Seq("rank()", "dense_rank()", "row_number()",
        "percent_rank()", "cume_dist()")(r.nextInt(5))} " +
        s"OVER (ORDER BY a $nord, id)"
      case 12 => s"${Seq("sum", "count", "min", "max")(r.nextInt(4))}(b) " +
        s"OVER (ORDER BY id${Seq("", " DESC")(r.nextInt(2))})"
      // unpartitioned lag/lead (the ghost-row path): literal offsets,
      // with and without defaults, over the nullable value column
      case 13 =>
        val f = Seq("lag", "lead")(r.nextInt(2))
        val k = 1 + r.nextInt(3)
        val d = Seq("", s", ${lit(r)}")(r.nextInt(2))
        s"$f(a, $k$d) OVER (ORDER BY ${Seq("id", "b, id")(r.nextInt(2))})"
      case 0 => s"rank() OVER (PARTITION BY $part ORDER BY b, id)"
      case 1 => s"row_number() OVER (PARTITION BY $part ORDER BY a, id)"
      case 2 => s"sum(b) OVER (PARTITION BY $part)"
      case 3 => s"row_number() OVER (PARTITION BY $part ORDER BY a NULLS FIRST, id)"
      case 4 => s"rank() OVER (PARTITION BY $part ORDER BY b DESC NULLS LAST, id)"
      case 7 => s"sum(b) OVER (PARTITION BY $part ORDER BY a$dir $nord " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
      case 8 => s"count(b) OVER (PARTITION BY $part ORDER BY a$dir $nord " +
        s"RANGE BETWEEN ${1 + r.nextInt(3)} PRECEDING AND CURRENT ROW)"
      case _ => s"sum(a) OVER (PARTITION BY $part ORDER BY id)"
    }
    s"SELECT id AS c0, $win AS c1 FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"
  }

  private def derived(r: Random): String =
    s"SELECT ${items(r, Seq("a1", "b1"), Seq("s1"))} FROM " +
      s"(SELECT a AS a1, b AS b1, s AS s1, id AS id1 FROM fa " +
      s"WHERE ${pred(r, faInts, Seq("s"), 1)}) dt " +
      s"WHERE ${pred(r, Seq("a1", "b1"), Seq("s1"), 1)}"

  private def distinctQ(r: Random): String =
    s"SELECT DISTINCT ${intExpr(r, Seq("a", "b"), Nil, 1)} AS c0" +
      (if (r.nextBoolean()) ", s AS c1" else "") +
      s" FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"

  /** Scalar-function parity sweep: curated calls whose semantics are
    * deterministic and DuckDB-comparable (1-based substr positions
    * only — substr(s, 0, n) differs between the engines' native
    * functions; no date_trunc — DuckDB narrows date→date where Spark
    * widens to timestamp, a representation difference, not a value one).
    */
  private val funcCalls: Seq[String] = Seq(
    "greatest(a, b)", "least(a, b)", "mod(a, 5)", "abs(a)", "sign(a)",
    "length(s)", "instr(s, 'a')", "strpos(s, 'al')",
    "levenshtein(coalesce(s, ''), 'alpha')",
    "substr(s, 2, 3)", "substr(s, 1, 50)", "replace(s, 'a', 'xx')",
    "reverse(s)", "repeat(s, 2)", "lpad(s, 6, '.')", "rpad(s, 6, '.')",
    "left(s, 2)", "right(s, 2)", "translate(s, 'ab', 'xy')",
    "split_part(s, 'a', 1)", "split_part(s, 'a', 9)", "md5(s)",
    "concat(s, '-', s)", "(s || '!')", "trim(s)", "upper(s)", "lower(s)",
    "year(d)", "month(d)", "day(d)", "quarter(d)", "last_day(d)",
    "nullif(a, 1)", "ifnull(a, -1)", "coalesce(s, 'zz')",
    "(CASE WHEN starts_with(s, 'a') THEN 1 ELSE 0 END)",
    "(CASE WHEN ends_with(s, 'a') THEN 1 ELSE 0 END)",
    "(CASE WHEN contains(s, 'mm') THEN 1 ELSE 0 END)")

  private def funcs(r: Random): String = {
    val n = 2 + r.nextInt(3)
    val items = (0 until n).map(i =>
      s"${funcCalls(r.nextInt(funcCalls.length))} AS c$i").mkString(", ")
    s"SELECT id AS c_id, $items FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"
  }

  /** Windows over aggregated frames — the round-13 surface: direct
    * window items over GROUP BY, windows nested in expressions
    * (rank() - 1, count vs grand total), scalar-subquery items over
    * aggregates, and QUALIFY on the aggregated window. Every window
    * carries a total ORDER tiebreak so ranks are single-valued.
    */
  private def groupedWin(r: Random): String = {
    val key = Seq("s", "a")(r.nextInt(2))
    r.nextInt(6) match {
      case 5 =>
        s"SELECT a AS k0, count(*) AS c0, " +
          s"(SELECT count(*) FROM fc WHERE fc.k = fa.a) AS c1 " +
          s"FROM fa GROUP BY a"
      case 0 =>
        s"SELECT $key AS k0, count(*) AS c0, " +
          s"rank() OVER (ORDER BY count(*) DESC, $key) AS c1 " +
          s"FROM fa GROUP BY $key"
      case 1 =>
        s"SELECT $key AS k0, count(*) AS c0, " +
          s"(rank() OVER (ORDER BY count(*) DESC, $key) - 1) AS c1, " +
          s"(count(*) * 100 - sum(count(*)) OVER ()) AS c2 " +
          s"FROM fa GROUP BY $key"
      case 2 =>
        s"SELECT $key AS k0, sum(b) AS c0, (SELECT max(v) FROM fc " +
          s"WHERE ${pred(r, Seq("k", "v"), Nil, 0)}) AS c1 " +
          s"FROM fa GROUP BY $key"
      case 3 =>
        s"SELECT $key AS k0, sum(count(*)) OVER () AS c1 FROM fa GROUP BY $key"
      case _ =>
        s"SELECT $key AS k0, count(*) AS c0 FROM fa GROUP BY $key " +
          s"QUALIFY rank() OVER (ORDER BY count(*) DESC, $key) <= ${1 + r.nextInt(4)}"
    }
  }

  /** CTE pipeline: filter → aggregate → filter, exercising derived-table
    * chains at reference depth 2.
    */
  private def cte(r: Random): String =
    s"WITH c1 AS (SELECT a, b, s, id FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}), " +
      s"c2 AS (SELECT a AS a2, count(*) AS n, min(b) AS mb FROM c1 GROUP BY a) " +
      s"SELECT a2 AS c0, n AS c1, mb AS c2 FROM c2 " +
      s"WHERE ${pred(r, Seq("a2", "n", "mb"), Nil, 1)}"

  /** Outer join feeding an aggregate: null-extended rows flow into
    * count(col)/min (count skips them, min null-extends empty groups).
    */
  private def outerAgg(r: Random): String = {
    val jt = Seq("LEFT JOIN", "JOIN")(r.nextInt(2))
    s"SELECT fb.t AS k0, count(fa.a) AS c0, min(fa.b) AS c1, count(*) AS c2 " +
      s"FROM fb $jt fa ON fb.x = fa.a " +
      s"WHERE ${pred(r, Seq("fb.id", "fb.x"), Seq("fb.t"), 1)} GROUP BY fb.t"
  }

  /** DISTINCT ON first-row-per-key selection — row scope (unique id
    * tiebreak) and aggregate scope (first group per key under the
    * ON-key-led ORDER BY).
    */
  private def distinctOn(r: Random): String =
    if (r.nextBoolean())
      s"SELECT DISTINCT ON (s) s AS c0, a AS c1, id AS c2 FROM fa " +
        s"WHERE ${pred(r, faInts, Seq("s"), 1)} ORDER BY s, id"
    else
      s"SELECT DISTINCT ON (s) s AS k0, a AS k1, count(*) AS c0 FROM fa " +
        s"GROUP BY s, a ORDER BY s, c0 DESC, a"

  /** ROLLUP subtotals with grouping() markers (the markers disambiguate
    * subtotal NULLs from data NULLs in the multiset compare).
    */
  private def rollup(r: Random): String = r.nextInt(4) match {
    case 0 =>
      s"SELECT s AS k0, b AS k1, count(*) AS c0, " +
        s"grouping(s) AS g0, grouping(b) AS g1 " +
        s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)} GROUP BY ROLLUP (s, b)"
    // grouping_id(): the bitmask form (first key = MSB) — must agree
    // with DuckDB's GROUPING_ID at every ROLLUP level
    case 1 =>
      s"SELECT s AS k0, b AS k1, count(*) AS c0, " +
        s"grouping_id(s, b) AS g0 " +
        s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)} GROUP BY ROLLUP (s, b)"
    // ordered aggregates under grouping sets — string_agg needs an
    // explicit ORDER BY for cross-engine determinism
    case 2 =>
      s"SELECT s AS k0, count(*) AS c0, " +
        s"string_agg(coalesce(s, '∅'), ',' ORDER BY id) AS c1, " +
        s"min(b) AS c2 " + // no median: DOUBLE leaves the no-floats subset
        s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)} GROUP BY ROLLUP (s)"
    // the same ordered aggregates over the EMPTY fixture table: the
    // grand-total patch row must synthesize each aggregate's
    // empty-input value (count 0, everything else NULL)
    case _ =>
      s"SELECT s AS k0, count(*) AS c0, count(v) AS c1, " +
        s"string_agg(s, ',' ORDER BY k) AS c2, min(v) AS c3, " +
        s"sum(v) AS c4, grouping_id(s) AS g0 " +
        s"FROM fe GROUP BY ROLLUP (s)"
  }

  /** Framed running windows over a unique total order (deterministic
    * frame contents at every row).
    */
  private def framed(r: Random): String = {
    val lo = 1 + r.nextInt(3)
    val f = r.nextInt(3) match {
      case 0 => s"sum(b) OVER (ORDER BY id ROWS BETWEEN $lo PRECEDING AND CURRENT ROW)"
      case 1 => s"min(a) OVER (ORDER BY id ROWS BETWEEN $lo PRECEDING AND $lo FOLLOWING)"
      case _ => s"count(b) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    }
    s"SELECT id AS c0, $f AS c1 FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"
  }

  /** Probe the DML-built tables: the final state after the scripted
    * CREATE/INSERT/UPDATE/DELETE sequence must match row-for-row.
    */
  private def dmlProbe(r: Random): String = {
    val t = s"fd${r.nextInt(3)}"
    if (r.nextBoolean())
      s"SELECT k AS c0, v AS c1, s AS c2 FROM $t " +
        s"WHERE ${pred(r, Seq("k", "v"), Seq("s"), 1)}"
    else
      s"SELECT s AS k0, count(*) AS c0, sum(v) AS c1, min(v) AS c2 " +
        s"FROM $t GROUP BY s"
  }

  /** Prepared-statement round trips: positional, arithmetic-?, and a
    * quote-bearing string parameter (the textual-splice hazard path).
    */
  private def executeProbe(r: Random): String = r.nextInt(4) match {
    case 0 => s"EXECUTE fzp1(${r.nextInt(40)})"
    case 1 => s"EXECUTE fzp2(${lit(r)}, ${lit(r)})"
    case 2 =>
      val sarg = Seq("'alpha'", "'Alp'", "'bet%a'", "'it''s'", "'x_y'")(r.nextInt(5))
      s"EXECUTE fzp3($sarg, ${10 + r.nextInt(50)})"
    // fzp4 was DEALLOCATEd and re-PREPAREd with a different body in the
    // fixture — EXECUTE must bind the second body on both engines
    case _ => s"EXECUTE fzp4(${r.nextInt(50)})"
  }

  /** Name resolution under USE fs1: the schema's own table unqualified,
    * a cross-schema join, and the explicit main-qualified fallback.
    */
  private def schemaProbe(r: Random): String = r.nextInt(3) match {
    case 0 => s"SELECT g AS k0, count(*) AS c0, sum(h) AS c1 FROM fg " +
      s"WHERE ${pred(r, Seq("g", "h"), Seq("s"), 1)} GROUP BY g"
    case 1 => s"SELECT fa.id AS c0, fg.h AS c1 FROM fa JOIN fg ON fa.a = fg.g " +
      s"WHERE ${pred(r, Seq("fa.id", "fg.h"), Nil, 1)}"
    case _ => s"SELECT id AS c0, a AS c1 FROM main.fa " +
      s"WHERE ${pred(r, faInts, Seq("s"), 1)}"
  }

  /** COLLATE comparisons vs DuckDB's ICU collations. Inequalities stay
    * on literals whose first letter decides (ICU punctuation weighting
    * of '%'/'_' vs codepoint order never comes into play).
    */
  private def collateProbe(r: Random): String = r.nextInt(4) match {
    case 0 =>
      val lit0 = Seq("'ALPHA'", "'alp'", "'BET%A'", "'X_y'", "'Delta'")(r.nextInt(5))
      s"SELECT id AS c0, s AS c1 FROM fa WHERE s COLLATE NOCASE = $lit0"
    case 1 => s"SELECT id AS c0 FROM fa WHERE s COLLATE NOCASE <> 'GAMMA' " +
      s"AND id < ${20 + r.nextInt(40)}"
    case 2 => s"SELECT count(*) AS c0 FROM fa WHERE s COLLATE NOCASE >= 'delta'"
    case _ => s"SELECT g AS c0, s AS c1 FROM fg " +
      s"WHERE s COLLATE NOCASE.NOACCENT = ${Seq("'ELON'", "'elön'")(r.nextInt(2))}"
  }

  /** DML RETURNING probes — these MUTATE the fd tables, in the same
    * sequence on both engines (check_fuzz replays ok-status queries in
    * entry order), so later dmlProbe state diffs stay in sync. UPDATE
    * and ON-CONFLICT return post-image rows, DELETE the pre-image —
    * identical contracts on both engines.
    */
  private def returningProbe(r: Random): String = {
    val t = s"fd${r.nextInt(3)}"
    r.nextInt(3) match {
      case 0 => s"UPDATE $t SET v = coalesce(v, 0) + ${1 + r.nextInt(5)} " +
        s"WHERE k % ${3 + r.nextInt(5)} = ${r.nextInt(3)} RETURNING k AS c0, v AS c1"
      case 1 => s"DELETE FROM $t WHERE k = ${30 + r.nextInt(15)} RETURNING *"
      case _ => s"UPDATE $t SET s = upper(s) " +
        s"WHERE coalesce(v, 0) % ${4 + r.nextInt(4)} = ${r.nextInt(4)} " +
        s"RETURNING k AS c0, s AS c1"
    }
  }

  /** Frame EXCLUDE over ROWS frames (bounded, EXCLUDE CURRENT ROW) and
    * over WHOLE-INPUT frames without PARTITION BY — the distributed
    * totals±peer lowering: all three EXCLUDE modes on RANGE (GROUP/TIES
    * are RANGE-only by the analyzer), the nullable key `a` exercising
    * the null peer group (whose Spark range-frame semantics the
    * dense_rank split corrects), EXCLUDE CURRENT ROW on ROWS.
    */
  private def excludeWin(r: Random): String = {
    val f = Seq("sum", "count", "min", "max")(r.nextInt(4))
    val w = r.nextInt(4) match {
      case 0 =>
        val lo = 1 + r.nextInt(3); val hi = 1 + r.nextInt(3)
        s"$f(b) OVER (ORDER BY id ROWS BETWEEN $lo PRECEDING " +
          s"AND $hi FOLLOWING EXCLUDE CURRENT ROW)"
      case 1 =>
        s"$f(b) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING " +
          "AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW)"
      case _ =>
        val key = Seq("a", "(b % 5)")(r.nextInt(2))
        val mode = Seq("CURRENT ROW", "GROUP", "TIES")(r.nextInt(3))
        s"$f(b) OVER (ORDER BY $key RANGE BETWEEN UNBOUNDED PRECEDING " +
          s"AND UNBOUNDED FOLLOWING EXCLUDE $mode)"
    }
    s"SELECT id AS c0, $w AS c1 " +
      s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"
  }

  /** QUALIFY over a ranked window (alias reference). */
  private def qualifyProbe(r: Random): String = {
    val part = Seq("s", "(a % 3)")(r.nextInt(2))
    s"SELECT id AS c0, ${Seq("rank()", "row_number()")(r.nextInt(2))} " +
      s"OVER (PARTITION BY $part ORDER BY b, id) AS c1 " +
      s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)} " +
      s"QUALIFY c1 <= ${1 + r.nextInt(4)}"
  }

  /** Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL keep duplicate
    * multiplicity — a multiset diff catches an off-by-one-copy).
    */
  private def setopAll(r: Random): String = {
    val op = Seq("INTERSECT ALL", "EXCEPT ALL")(r.nextInt(2))
    s"SELECT a AS c0 FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)} " +
      s"$op SELECT k AS c0 FROM fc WHERE ${pred(r, Seq("k", "v"), Nil, 1)}"
  }

  /** Equality-correlated aggregate LATERAL — empty groups must surface
    * count 0 / NULL max on both engines.
    */
  private def lateralProbe(r: Random): String =
    s"SELECT fa.id AS c0, l.m AS c1, l.n AS c2 FROM fa, " +
      s"LATERAL (SELECT max(v) AS m, count(*) AS n FROM fc " +
      s"WHERE fc.k = fa.a AND ${pred(r, Seq("v"), Nil, 0)}) l " +
      s"WHERE ${pred(r, Seq("fa.id", "fa.b"), Nil, 1)}"

  /** IGNORE NULLS shift/positional windows (the LOCF idiom). */
  private def ignoreNullsWin(r: Random): String = {
    val f = Seq("lag(a IGNORE NULLS)", "lead(a IGNORE NULLS)",
      "first_value(a IGNORE NULLS)", "last_value(a IGNORE NULLS)")(r.nextInt(4))
    s"SELECT id AS c0, $f OVER (ORDER BY id) AS c1 " +
      s"FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)}"
  }

  /** GROUP BY ALL / ORDER BY ALL (order irrelevant to the multiset
    * compare — this exercises grouping-key inference).
    */
  private def byAll(r: Random): String =
    s"SELECT s AS k0, (a % ${2 + r.nextInt(4)}) AS k1, count(*) AS c0, " +
      s"sum(b) AS c1 FROM fa WHERE ${pred(r, faInts, Seq("s"), 1)} " +
      s"GROUP BY ALL ORDER BY ALL"

  /** Inline VALUES as a derived table, joined against the fixture. */
  private def valuesProbe(r: Random): String = {
    val rows = (0 until 2 + r.nextInt(3)).map(_ =>
      s"(${r.nextInt(12)}, '${Seq("p", "q", "rr")(r.nextInt(3))}')").mkString(", ")
    s"SELECT v.x AS c0, v.y AS c1, count(fa.id) AS c2 " +
      s"FROM (VALUES $rows) v(x, y) LEFT JOIN fa ON fa.a = v.x " +
      s"GROUP BY v.x, v.y"
  }

  /** Small recursive-CTE fixpoint joined back to the fixture. */
  private def recCte(r: Random): String = {
    val n = 5 + r.nextInt(10)
    s"WITH RECURSIVE g AS (SELECT 1 AS x UNION ALL " +  // engine grammar: no column-alias list
      s"SELECT x + 1 AS x FROM g WHERE x < $n) " +
      s"SELECT g.x AS c0, count(fa.id) AS c1, min(fa.b) AS c2 " +
      s"FROM g LEFT JOIN fa ON fa.a = g.x GROUP BY g.x"
  }

  /** Cross-warehouse resolution under USE fs1: the attached alias reads
    * like a schema on DuckDB's side; the shapes join the attached table
    * against the main-fallback (fc/fa) and session-schema (fg) names in
    * the same query.
    */
  private def attachProbe(r: Random): String = r.nextInt(4) match {
    case 0 => s"SELECT a.k AS c0, a.w AS c1, c.v AS c2 FROM att1.fh a " +
      s"JOIN fc c ON a.k = c.k WHERE ${pred(r, Seq("a.w", "c.v"), Nil, 1)}"
    case 1 => s"SELECT s AS k0, count(*) AS c0, sum(w) AS c1 FROM att1.fh " +
      s"WHERE ${pred(r, Seq("k", "w"), Seq("s"), 1)} GROUP BY s"
    case 2 => s"SELECT g AS c0, h AS c1 FROM fg WHERE g IN " +
      s"(SELECT k AS kk FROM att1.fh WHERE ${pred(r, Seq("w"), Nil, 0)})"
    case _ => s"SELECT a.k AS c0, a.s AS c1, f.s AS c2 FROM att1.fh a " +
      s"LEFT JOIN main.fa f ON f.id = a.k WHERE a.k < ${5 + r.nextInt(15)}"
  }

  /** One random query; shape mix weighted toward the compositional forms. */
  def query(r: Random): String = r.nextInt(32) match {
    case 31      => attachProbe(r)
    case 19      => executeProbe(r)
    case 20      => schemaProbe(r)
    case 21      => collateProbe(r)
    case 22      => returningProbe(r)
    case 23      => excludeWin(r)
    case 24      => qualifyProbe(r)
    case 25      => setopAll(r)
    case 26      => lateralProbe(r)
    case 27      => ignoreNullsWin(r)
    case 28      => byAll(r)
    case 29      => valuesProbe(r)
    case 30      => recCte(r)
    case 16       => rollup(r)
    case 17       => framed(r)
    case 18       => dmlProbe(r)
    case 12       => groupedWin(r)
    case 13       => cte(r)
    case 14       => outerAgg(r)
    case 15       => distinctOn(r)
    case 0 | 1    => simple(r)
    case 2 | 3    => joined(r)
    case 4 | 5    => grouped(r)
    case 6        => subq(r)
    case 7        => setop(r)
    case 8        => windowed(r)
    case 9        => if (r.nextBoolean()) derived(r) else distinctQ(r)
    case _        => funcs(r)
  }
}
