package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the timeout-proof bench artifact (VERDICT r15 #1): a kill at any
  * point after the cold pass must leave a parseable BENCH.out carrying
  * the gated fields. The contract under test: [[Bench.render]] on a
  * cold-only [[Bench.State]] is valid one-line JSON with "value" and
  * "failed", and [[Bench.writeOut]] replaces the file atomically. */
class BenchEmitSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def coldOnly(): Bench.State = {
    val st = new Bench.State("/root/testdata/sf0.1", "/root/testdata/sf0.01")
    st.cold = Seq(("q_a", 1.25, 100L), ("q_b", -0.5, 0L))
    st.failed = List("q_b")
    st.passesDone = List("cold")
    st
  }

  test("cold-only state renders one parseable JSON line with the gated fields") {
    val line = Bench.render(coldOnly())
    assert(!line.contains("\n"))
    val node = mapper.readTree(line) // throws on malformed JSON
    assert(node.get("value").asDouble() === 1.25) // failed q_b's -0.5 excluded
    assert(node.get("failed").toString === """["q_b"]""")
    assert(node.get("queries").get("q_a").asDouble() === 1.25)
    assert(node.get("queries").get("q_b").asDouble() === -0.5)
    assert(node.get("shuffle_bytes").get("q_a").asLong() === 100L)
    // not-yet-run passes render as the shapes the skip paths always used
    assert(node.get("total_warm").asDouble() === 0.0)
    assert(node.get("queries_warm").size() === 0)
    assert(node.get("calib_cpu").asDouble() === -1.0)
    assert(node.get("passes_done").toString === """["cold"]""")
  }

  test("later passes enrich the same line and stay parseable") {
    val st = coldOnly()
    st.warm = Seq(("q_a", 0.8))
    st.sf2Results = Seq(("q_a", 0.1), ("q_b", -0.2))
    st.calCpu = 0.3
    st.passesDone = List("sf2", "warm", "cold")
    val node = mapper.readTree(Bench.render(st))
    assert(node.get("total_warm").asDouble() === 0.8)
    assert(node.get("total_sf2").asDouble() === 0.1) // failed -0.2 excluded
    assert(node.get("passes_done").toString === """["cold","warm","sf2"]""")
    assert(node.get("value").asDouble() === 1.25) // cold headline unchanged
  }

  test("writeOut atomically replaces the artifact, newest line wins") {
    val dir = java.nio.file.Files.createTempDirectory("benchemit")
    val out = dir.resolve("BENCH.out")
    Bench.writeOut(Bench.render(coldOnly()), out)
    val first = java.nio.file.Files.readString(out)
    assert(mapper.readTree(first).get("value").asDouble() === 1.25)
    val st2 = coldOnly(); st2.warm = Seq(("q_a", 0.8)); st2.passesDone ::= "warm"
    Bench.writeOut(Bench.render(st2), out)
    val second = java.nio.file.Files.readString(out)
    assert(mapper.readTree(second).get("total_warm").asDouble() === 0.8)
    assert(second.linesIterator.size === 1)
  }
}
