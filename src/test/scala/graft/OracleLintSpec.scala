package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** The standing oracle type-lint gate (round-9 verdict item 2): every
  * `SparkEntry.oracleSql` entry is DESCRIBEd by DuckDB against sf0.001
  * and FAILS the suite if any output column types as something Spark
  * cannot emit (HUGEINT from bare `sum(BIGINT)` being the repeat
  * offender — it killed d29/d30 in round 5 and s43/s44 in round 9 with
  * value-identical results, because the driver's hash is
  * type-sensitive). Automation, not discipline: a missing
  * `CAST(sum(...) AS BIGINT)` now fails `sbt test` instead of
  * surfacing a round later in the driver's gate.
  *
  * The lint itself is `tools/oracle_lint.py` (DuckDB lives on the
  * driver side of the toolchain only, never in library code); this
  * spec feeds it the exact JSON `Verify` dumps. On a host without
  * python3+duckdb the test cancels rather than fails — the gate is
  * strict where the driver's gate runs, and inert elsewhere. */
class OracleLintSpec extends AnyFunSuite {

  private val sf = TestSession.sf
  private def repoRoot = {
    // tests run with cwd = repo root under sbt; fall back to marker walk
    val cwd = java.nio.file.Paths.get("").toAbsolutePath
    Iterator.iterate(cwd)(_.getParent).takeWhile(_ != null)
      .find(p => java.nio.file.Files.exists(p.resolve("tools/oracle_lint.py")))
      .getOrElse(cwd)
  }

  test("every declared oracle DESCRIBEs to Spark-representable types") {
    // Try: a host with no python3 binary at all makes Process.! throw
    // IOException before any exit code exists — that must cancel too
    val probe = scala.util.Try(
      Process(Seq("python3", "-c", "import duckdb")).!(
        ProcessLogger(_ => ()))).getOrElse(-1)
    assume(probe == 0, "python3+duckdb unavailable — driver-side lint " +
      "skipped on this host")
    val json = Verify.oracleJson(SparkEntry.oracleSql)
    val tmp = java.nio.file.Files.createTempFile("graft_oracle_lint", ".json")
    java.nio.file.Files.writeString(tmp, json)
    val out = new StringBuilder
    val rc = Process(
      Seq("python3", repoRoot.resolve("tools/oracle_lint.py").toString,
        sf, tmp.toString)).!(
      ProcessLogger(l => out.append(l).append('\n')))
    java.nio.file.Files.deleteIfExists(tmp)
    assert(rc == 0, s"oracle lint failed:\n$out")
  }
}
