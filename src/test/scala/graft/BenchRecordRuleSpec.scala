package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the structural bench-record rule ([[Bench.recordWritePath]]):
  * BENCH_full.json is the committed full-suite RECORD, and a tainted,
  * slower, or different-sf full run must land in BENCH_last.json instead
  * of displacing it — the r17/r18 clobber race (a driver post-snapshot
  * run at 97.53 s / 77.43 s silently overwriting a committed 73.9 s /
  * 73.057 s untainted record in the working tree) made structurally
  * impossible. Only an equal-or-faster untainted same-sf run writes
  * BENCH_full.json over an existing untainted record.
  */
class BenchRecordRuleSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private val record = Some((73.057, false, sf))

  test("slower run is refused: BENCH_last.json with adjudication") {
    val (path, why) = Bench.recordWritePath(record, sf, 77.432, curTainted = false)
    assert(path === "BENCH_last.json")
    assert(why.contains("slower"))
  }

  test("tainted run is refused even if faster") {
    val (path, why) = Bench.recordWritePath(record, sf, 70.0, curTainted = true)
    assert(path === "BENCH_last.json")
    assert(why.contains("tainted"))
  }

  test("faster untainted run displaces the record") {
    val (path, why) = Bench.recordWritePath(record, sf, 72.5, curTainted = false)
    assert(path === "BENCH_full.json")
    assert(why.contains("new record"))
  }

  test("equal total displaces (record rule is strictly-slower refusal)") {
    val (path, _) = Bench.recordWritePath(record, sf, 73.057, curTainted = false)
    assert(path === "BENCH_full.json")
  }

  test("different sf never displaces, regardless of speed") {
    val (path, why) =
      Bench.recordWritePath(record, "/root/testdata/sf0.01", 50.0, curTainted = false)
    assert(path === "BENCH_last.json")
    assert(why.contains("sf="))
  }

  test("no committed record: write BENCH_full.json silently") {
    assert(Bench.recordWritePath(None, sf, 80.0, curTainted = true) ===
      (("BENCH_full.json", "")))
  }

  test("tainted committed record can be displaced by any run") {
    val taintedRec = Some((77.432, true, sf))
    assert(Bench.recordWritePath(taintedRec, sf, 90.0, curTainted = true)._1 ===
      "BENCH_full.json")
  }

  test("malformed record value (<= 0) does not block the write") {
    assert(Bench.recordWritePath(Some((-1.0, false, sf)), sf, 80.0,
      curTainted = false)._1 === "BENCH_full.json")
  }
}
