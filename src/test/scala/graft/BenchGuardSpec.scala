package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchGuard

class BenchGuardSpec extends AnyFunSuite {

  private val line =
    """{"medians":{"q01":0.545,"q19":0.293,"x02b":0.455,"x16":3.597},"total":95.314,"sf":"/root/testdata/sf0.1"}"""

  test("parses the exact one-line format Bench emits") {
    val m = BenchGuard.parseMedians(line)
    assert(m == Map("q01" -> 0.545, "q19" -> 0.293, "x02b" -> 0.455, "x16" -> 3.597))
    assert(BenchGuard.parseSf(line).contains("/root/testdata/sf0.1"))
    assert(BenchGuard.parseSf("""{"medians":{"a":1.0}}""").isEmpty)
    intercept[RuntimeException](BenchGuard.parseMedians("""{"queries":{}}"""))
  }

  test("flags only moves beyond BOTH the ratio bar and the absolute floor") {
    val snap = Map("small" -> 0.2, "mid" -> 1.0, "big" -> 3.0, "gone" -> 1.0)
    val fresh = Map(
      "small" -> 0.5, // 2.5x but only +0.3s — NOT a violation (<= floor is strict >)
      "mid" -> 1.45,  // +0.45s but only 1.45x... both bars exceeded → violation
      "big" -> 3.5,   // +0.5s but 1.17x — under the ratio bar → ok
      "new" -> 9.9)   // no baseline → ok
    val vs = BenchGuard.compare(fresh, snap)
    assert(vs.map(_.name) == Seq("mid"), s"got $vs")
    assert(math.abs(vs.head.ratio - 1.45) < 1e-9)
  }

  test("absolute floor suppresses tiny-entry ratio noise") {
    // q19-style: 0.29s entry reading 2.8x on identical bytes stays green
    val snap = Map("q19" -> 0.293)
    assert(BenchGuard.compare(Map("q19" -> 0.52), snap).isEmpty)
    // but a genuine blowup on the same entry trips both bars
    assert(BenchGuard.compare(Map("q19" -> 0.82), snap).map(_.name) == Seq("q19"))
  }

  test("parses the committed snapshot and finds every gate entry") {
    val snap = BenchGuard.parseMedians(java.nio.file.Files.readString(
      java.nio.file.Path.of("BENCH_MEDIANS.json")))
    assert(snap.size > 100, s"snapshot should carry all gate entries, got ${snap.size}")
    assert(snap.contains("q01") && snap.contains("x29b"))
    assert(snap.values.forall(v => v > 0 && v < 60))
  }
}
