package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.JdbcMergeSink
import graft.sink.JdbcMergeSink._

/** SQL generation for the transactional merge sink (no database in the
  * test environment — statement text is the tested contract; the
  * execution path shares the generators). */
class JdbcSinkSpec extends AnyFunSuite {

  private val cfg = SinkConfig(url = "jdbc:postgresql://x/db",
    table = "write_tbl", stagingTable = "stage_tbl",
    keys = Seq("href", "path"))

  test("D1 delete semi-join, both dialects") {
    assert(deleteSql(cfg, "del_tbl") ===
      "DELETE FROM write_tbl w USING del_tbl t " +
        "WHERE w.href = t.href AND w.path = t.path")
    assert(deleteSql(cfg.copy(dialect = MsSql), "del_tbl") ===
      "DELETE w FROM write_tbl w WHERE EXISTS " +
        "(SELECT 1 FROM del_tbl t WHERE w.href = t.href AND w.path = t.path)")
  }

  test("D2 prune anti-join") {
    assert(pruneSql(cfg) ===
      "DELETE FROM write_tbl w WHERE NOT EXISTS " +
        "(SELECT 1 FROM stage_tbl i WHERE i.href = w.href AND i.path = w.path)")
  }

  test("U1 update is null-safe change-detecting (P5)") {
    val pg = updateSql(cfg)
    assert(pg.contains("IS DISTINCT FROM"))
    assert(pg.contains("t.href = w.href AND t.path = w.path"))
    val ms = updateSql(cfg.copy(dialect = MsSql))
    assert(ms.contains("t.jsondata <> w.jsondata"))
    assert(ms.contains("IS NULL AND w.jsondata IS NOT NULL"))
  }

  test("I1 insert dedups by window before anti-join (A1)") {
    val sql = insertSql(cfg, Seq("href", "path", "modified_ms", "jsondata"))
    assert(sql.contains("ROW_NUMBER() OVER (PARTITION BY href, path"))
    assert(sql.contains("ORDER BY modified_ms DESC"))
    assert(sql.contains("t.rn = 1 AND NOT EXISTS"))
  }

  test("W5 state upsert is delete+insert") {
    val stmts = stateSql(cfg, "t1", "DELTA", 123L, 456L)
    assert(stmts.length === 2)
    assert(stmts.head.startsWith("DELETE FROM sri2db_synctimes"))
    assert(stmts(1).contains("VALUES ('t1', 'DELTA', 123, 456)"))
  }
}
