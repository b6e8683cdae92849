package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Config load + validation — semantics of ConfigLoader.java:16-27 and
  * TaskConfigChecker.java:15-34 (three reject branches).
  */
class ConfigSpec extends AnyFunSuite {

  private def res(name: String) = getClass.getResourceAsStream(s"/$name")

  test("task YAML loads into the reference shape") {
    val cfg = ConfigLoader.loadTask(res("application-demo.yaml"))
    assert(cfg.dbAlias === "demo")
    assert(cfg.tables === Seq("t_orders", "t_loan_order"))
    assert(cfg.sources.map(_.instanceName) === Seq("src-a", "src-b"))
    assert(cfg.sources.head.port === 3306)
    assert(cfg.sources.head.fbNo === "FBA")
    assert(cfg.sources.head.serverId === "80001001-80001999")
  }

  test("sink YAML loads with defaults applied") {
    val sink = ConfigLoader.loadSink(res("sink-demo.yaml"))
    assert(sink.batchSize === 20)
    assert(sink.flushIntervalMs === 5000L)
    assert(sink.dbName === "archive")
  }

  test("valid config passes the checker") {
    val cfg = ConfigLoader.loadTask(res("application-demo.yaml"))
    assert(TaskConfigChecker.check(cfg) eq cfg)
  }

  test("reject: empty tables") {
    val cfg = ConfigLoader.loadTask(res("application-demo.yaml")).copy(tables = Seq.empty)
    val e = intercept[IllegalArgumentException](TaskConfigChecker.check(cfg))
    assert(e.getMessage.contains("tables"))
  }

  test("reject: empty sources") {
    val cfg = ConfigLoader.loadTask(res("application-demo.yaml")).copy(sources = Seq.empty)
    val e = intercept[IllegalArgumentException](TaskConfigChecker.check(cfg))
    assert(e.getMessage.contains("sources"))
  }

  test("reject: duplicate instanceName") {
    val base = ConfigLoader.loadTask(res("application-demo.yaml"))
    val cfg = base.copy(sources = base.sources :+ base.sources.head)
    val e = intercept[IllegalArgumentException](TaskConfigChecker.check(cfg))
    assert(e.getMessage.contains("src-a"))
  }
}
