package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated gate for the postgres merge arm (no pg server exists in
  * this sandbox, so the closest executable check is the DuckDB replay):
  * dump the GENERATED pg-dialect SQL via [[graft.sink.MergeSqlDump]]
  * and run `tools/pg_check.py` on it — merge convergence, replay
  * idempotency, full-sync prune, and the ROW_NUMBER dedup insert all
  * execute VERBATIM and must reach the Derby-verified state. Until
  * round 13 this replay was a manual step a regression could silently
  * skip; as a spec it reds the build instead.
  *
  * Cancels (not fails) when python3/duckdb are absent — they are
  * driver-side tooling, present in this sandbox but not a library
  * dependency. */
class PgCheckGateSpec extends AnyFunSuite {

  test("generated postgres merge SQL converges under the DuckDB " +
      "replay (tools/pg_check.py exit 0 on a fresh MergeSqlDump)") {
    val hasDuck =
      try new ProcessBuilder("python3", "-c", "import duckdb")
        .start().waitFor() == 0
      catch { case _: Throwable => false }
    assume(hasDuck, "python3+duckdb unavailable (driver-side tooling)")
    assume(new java.io.File("tools/pg_check.py").exists,
      "not running from the repo root")
    val out = java.nio.file.Files.createTempFile("merge_sql", ".json")
    graft.sink.MergeSqlDump.main(Array(out.toString))
    val pb = new ProcessBuilder("python3", "tools/pg_check.py",
      out.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes, "UTF-8")
    assert(p.waitFor() == 0, s"pg_check.py failed:\n$log")
  }
}
