package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's validity stamping. Round 10's archived record
  * carried 5-11× inflated mins for five queries with
  * load_suspect=false: the co-tenant load ended before the single
  * end-of-run calibration probe, which therefore measured an idle
  * machine. The fix compares EVERY headline min to its own committed
  * idle floor. The "synthetic load" here is an injected measurement
  * function — deterministic where a real CPU-burn thread is racy — that
  * inflates exactly two queries mid-run and returns to idle timings
  * before the probe would run, reproducing the round-10 blind spot
  * shape precisely. */
class BenchSpec extends AnyFunSuite {

  test("parseFloors reads the committed bench_floor.json (every bench query has a floor)") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_floor.json")), "UTF-8")
    val floors = Bench.parseFloors(txt)
    val benchNames = Registry.benchSet.map(_.name)
    benchNames.foreach { n =>
      assert(floors.contains(n), s"bench query $n has no committed floor")
      assert(floors(n) > 0.0 && floors(n) < 60.0, s"$n floor ${floors(n)} implausible")
    }
    assert(!floors.contains("_comment"))
  }

  test("a mid-run load that ends before the probe flags exactly the affected queries") {
    val floors = Map("q_a" -> 0.10, "q_b" -> 0.50, "q_c" -> 0.20, "q_d" -> 1.0)
    // co-tenant burns CPU while q_b and q_c run: their every sample
    // (min included) lands >2x floor; q_a ran before the load began and
    // q_d after it ended
    val loaded = Map(
      "q_a" -> 0.11, "q_b" -> 2.60, "q_c" -> 1.15, "q_d" -> 1.05)
    val mins = Bench.robustTimes(Seq("q_a", "q_b", "q_c", "q_d"), loaded)
      .map { case (k, ts) => k -> ts.min }.toMap
    assert(Bench.floorSuspects(mins, floors) == Seq("q_b", "q_c"),
      "exactly the two loaded queries must be flagged")
    // and the same record measured idle flags nothing
    val idle = floors.map { case (k, f) => k -> f * 1.3 }
    assert(Bench.floorSuspects(idle, floors).isEmpty)
  }

  test("boundary: exactly 2x floor is not suspect; just above is; unknown queries never flag") {
    val floors = Map("q_x" -> 0.25)
    assert(Bench.floorSuspects(Map("q_x" -> 0.50), floors).isEmpty)
    assert(Bench.floorSuspects(Map("q_x" -> 0.5001), floors) == Seq("q_x"))
    assert(Bench.floorSuspects(Map("q_new" -> 99.0), floors).isEmpty,
      "a query with no committed floor must not be flagged")
  }

  test("robustTimes retries an outlier run and keeps the honest min") {
    // one GC-hit sample among fast ones: retry fires (max > 2x min),
    // at most 2 extra runs, min survives
    var calls = Map.empty[String, Int].withDefaultValue(0)
    val times = Map("q" -> Seq(0.9, 0.1, 0.11, 0.1, 0.1))
    def measure(name: String): Double = {
      val i = calls(name); calls += name -> (i + 1); times(name)(i)
    }
    val out = Bench.robustTimes(Seq("q"), measure)
    assert(out.head._2.min == 0.1)
    assert(out.head._2.size == 5, "expected 3 base runs + 2 retries")
  }
}
