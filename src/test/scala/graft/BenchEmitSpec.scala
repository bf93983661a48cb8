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

  test("boundedPass bails mid-pass on budget, keeping the completed prefix") {
    var calls = 0
    var bailedPass = ""
    // budget trips after the second item completes
    val out = Bench.boundedPass("cold", Seq(1, 2, 3, 4),
      () => calls >= 2, p => bailedPass = p) { i => calls += 1; i * 10 }
    assert(out === Seq(10, 20), "completed prefix only")
    assert(bailedPass === "cold", "onBail must name the pass")
    // a budget blown from the START still runs at least one item — a
    // cold pass can never emit an empty query map
    var bailed2 = ""
    val one = Bench.boundedPass("warm", Seq(1, 2), () => true,
      p => bailed2 = p) { i => i }
    assert(one === Seq(1) && bailed2 === "warm")
    // under budget throughout: no bail, full map
    var bailed3 = ""
    val all = Bench.boundedPass("sf2", Seq(1, 2, 3), () => false,
      p => bailed3 = p) { i => i }
    assert(all === Seq(1, 2, 3) && bailed3 === "")
  }

  test("bailed passes and host telemetry render into the JSON line") {
    val st = coldOnly()
    st.bailed = List("cold")
    st.calCpuPre = 0.29
    st.telemetry = List(("cold", "6.01 5.77 5.20 4/903 12345"),
      ("start", "0.52 0.61 0.70 1/880 12000")) // newest first
    val node = mapper.readTree(Bench.render(st))
    assert(node.get("bailed").toString === """["cold"]""")
    assert(node.get("calib_cpu_pre").asDouble() === 0.29)
    assert(node.get("loadavg").get("start").asText().startsWith("0.52"))
    assert(node.get("loadavg").get("cold").asText().startsWith("6.01"))
    // defaults stay parseable when telemetry never ran
    val bare = mapper.readTree(Bench.render(coldOnly()))
    assert(bare.get("bailed").size() === 0)
    assert(bare.get("calib_cpu_pre").asDouble() === -1.0)
    assert(bare.get("loadavg").size() === 0)
  }

  test("readLoadavg returns the live three-load line on this host") {
    val la = Bench.readLoadavg()
    assert(la.split("\\s+").length >= 3, s"unexpected loadavg shape: '$la'")
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
