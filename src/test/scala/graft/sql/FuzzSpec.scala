package graft.sql

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Engine-side fuzz smoke: every generated query must parse + analyze +
  * execute (or reject with a clean error — never crash). The cross-engine
  * value diff runs out-of-band (FuzzDump + tools/check_fuzz.py, wired
  * into the verify skill); this spec pins the generator's validity rate
  * so grammar drift is caught in-tree.
  */
class FuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("fuzz generator: 60 random queries execute cleanly") {
    val db = new GraftDatabase(spark,
      Files.createTempDirectory("graft-fuzz-spec").toString)
    FuzzGen.loadFixture(spark, db, 20260816L)
    val r = new Random(20260816L)
    var rejects = List.empty[String]
    (0 until 60).foreach { _ =>
      val sql = FuzzGen.query(r)
      try db.select(sql) match {
        case Left(err) => rejects ::= s"$sql -> ${err.msg}"
        case Right(df) => df.collect() // execution must not throw either
      } catch {
        case t: Throwable => fail(s"CRASH on: $sql -> $t")
      }
    }
    // the typed generator should produce (near-)zero rejections; a few
    // would mean grammar drift between FuzzGen and the engine
    assert(rejects.isEmpty, s"${rejects.length} rejected:\n${rejects.take(5).mkString("\n")}")
  }
}
