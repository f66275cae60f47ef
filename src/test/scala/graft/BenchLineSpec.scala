package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the bench metric line from a 2000-char stdout tail;
  * [[Bench.compactLine]] must stay under 1500 chars and remain valid JSON
  * for ANY query count — including far more queries than exist today, and
  * error entries (which are never rolled into `_others`).
  */
class BenchLineSpec extends AnyFunSuite {

  private def parseable(line: String): Boolean =
    line.startsWith("{\"metric\":") && line.endsWith("}") &&
      line.count(_ == '{') == line.count(_ == '}')

  test("line stays under 1500 chars for 300 queries") {
    val results = (1 to 300).map(i =>
      s"some_rather_long_query_name_$i" -> Some(i * 0.0137))
    val line = Bench.compactLine(results, "/root/testdata/sf0.1")
    assert(line.length < 1500, s"line is ${line.length} chars")
    assert(parseable(line))
    assert(line.contains("\"_others\":"))
    assert(line.contains("\"n_queries\":300"))
  }

  test("errors always survive into the line; slowest queries listed first") {
    val results: Seq[(String, Option[Double])] =
      Seq("fast" -> Some(0.1), "slow" -> Some(9.9), "broken" -> None)
    val line = Bench.compactLine(results, "sf")
    assert(line.contains("\"broken\":\"error\""))
    assert(line.indexOf("\"slow\":") < line.indexOf("\"fast\":"))
    assert(line.contains("\"errors\":1"))
    assert(!line.contains("\"_others\":"), "nothing rolled at tiny counts")
  }

  test("current declared inventory fits without rolling more than the tail") {
    val results = SparkEntry.declared.map(q => q.name -> Some(0.123))
    val line = Bench.compactLine(results, "/root/testdata/sf0.1")
    assert(line.length < 1500, s"line is ${line.length} chars")
    assert(parseable(line))
  }

  test("artifact build accounting lands in the line and respects the budget") {
    val results = (1 to 300).map(i =>
      s"some_rather_long_query_name_$i" -> Some(i * 0.0137))
    val line = Bench.compactLine(results, "/root/testdata/sf0.1", (27, 12.3456))
    assert(line.length < 1500, s"line is ${line.length} chars")
    assert(parseable(line))
    assert(line.contains("\"artifacts\":{\"n\":27,\"build_sec\":12.346}"))
  }
}
