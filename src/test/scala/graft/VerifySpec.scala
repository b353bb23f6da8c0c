package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Verify's post-run self-check: the driver's CORRECTNESS artifact came
  * back literally `{}` in rounds 14 and 18 with no builder-side signal.
  * selfCheck is the loud guard — these specs pin its failure modes,
  * including the judge's sabotage case (delete one dump → run fails).
  */
class VerifySpec extends AnyFunSuite {

  private def mkOut(gates: Seq[String], oracleKeys: Seq[String]): String = {
    val out = Files.createTempDirectory("graft_verifyspec").toString
    gates.foreach { g =>
      val d = new java.io.File(s"$out/$g"); d.mkdirs()
      Files.writeString(new java.io.File(d, "part-00000-c000.snappy.parquet").toPath, "x")
    }
    val json = oracleKeys.map(k => s""""$k": "SELECT 1"""").mkString("{", ",", "}")
    Files.writeString(new java.io.File(out, "oracle_sql.json").toPath, json)
    out
  }

  test("clean dump directory passes") {
    val out = mkOut(Seq("g_a", "g_b"), Seq("g_a", "g_b"))
    assert(Verify.selfCheck(out, Seq("g_a", "g_b"), Seq("g_a", "g_b")).isEmpty)
  }

  test("sabotage: deleting one gate's dump fails the check and names it") {
    val out = mkOut(Seq("g_a", "g_b"), Seq("g_a", "g_b"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$out/g_b"))
    val failure = Verify.selfCheck(out, Seq("g_a", "g_b"), Seq("g_a", "g_b"))
    assert(failure.exists(_.contains("g_b")), failure.toString)
  }

  test("a dump dir that exists but holds no parquet part files fails") {
    val out = mkOut(Seq("g_a"), Seq("g_a"))
    val empty = new java.io.File(s"$out/g_empty"); empty.mkdirs()
    val failure = Verify.selfCheck(out, Seq("g_a", "g_empty"), Seq("g_a"))
    assert(failure.exists(_.contains("g_empty")), failure.toString)
  }

  test("an oracle key missing from the written JSON fails") {
    val out = mkOut(Seq("g_a", "g_b"), Seq("g_a")) // JSON lacks g_b
    val failure = Verify.selfCheck(out, Seq("g_a", "g_b"), Seq("g_a", "g_b"))
    assert(failure.exists(_.contains("g_b")), failure.toString)
  }

  test("a missing or truncated oracle_sql.json fails") {
    val out = mkOut(Seq("g_a"), Seq("g_a"))
    Files.writeString(new java.io.File(out, "oracle_sql.json").toPath, """{"g_a": "SELECT 1"""")
    assert(Verify.selfCheck(out, Seq("g_a"), Seq("g_a")).nonEmpty)
    new java.io.File(out, "oracle_sql.json").delete()
    assert(Verify.selfCheck(out, Seq("g_a"), Seq("g_a")).nonEmpty)
  }
}
