package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM unit specs for streaming plumbing that needs no SparkSession:
  * the Prometheus exposition escaper and the TOML-subset value splitter
  * (both ADVICE-round-2 hardening items). */
class StreamingUnitSpec extends AnyFunSuite {

  test("Prometheus label values escape backslash, quote, and newline") {
    val mon = new Monitoring
    // registers a stats entry under a hostile query name
    mon.rowsProcessed("q\"uo\\te\nnl")
    val text = new ControlPlane(mon).metricsText
    // the exposition must contain the escaped form...
    assert(text.contains("""graft_query_rows_total{query="q\"uo\\te\nnl"} 0"""))
    // ...and no line may carry a raw (unescaped) quote or newline inside
    // a label value: every line must have an even structure of
    // name{...} value — i.e. still parse as one metric per line
    text.linesIterator.filterNot(_.startsWith("#")).filter(_.nonEmpty).foreach { l =>
      assert(l.matches("""\S+\{[^}]*\} \S+"""), s"unparseable exposition line: $l")
    }
  }

  test("TOML subset: commas inside quoted strings do not split arrays or inline tables") {
    val parsed = TopologyConfig.parse(
      """[sink.s1]
        |topics = [ "a,b", "c" ]
        |mapping = { users = "t.users,v1", orders = "plain" }
        |""".stripMargin)
    val s1 = parsed("sink.s1")
    assert(s1("topics") === Seq("a,b", "c"))
    assert(s1("mapping") === Map("users" -> "t.users,v1", "orders" -> "plain"))
  }
}
