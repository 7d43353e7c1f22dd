package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scaling-protocol pair-validity rule and pair-of-record selection
  * (`graft.Bench.Sample` / `Bench.pairOfRecord`) — the in-run defense against
  * committing a congestion-garbage window as the round's number of record
  * (VERDICT r4 Next #1). Pure logic, no Spark session.
  */
class BenchValiditySpec extends AnyFunSuite {

  /** A healthy window: 32-core leg ~3.2× faster, probes scale ~2.8-3.2×. */
  private def healthy(s8: Double = 64.0, s32: Double = 20.0) = Bench.Sample(
    u8 = 600000L, s8 = s8, u32 = 600000L, s32 = s32,
    lcg8 = 10.0, lcg32 = 32.0,   // cpu ceiling 0.80
    mem8 = 40.0, mem32 = 120.0,  // read-bw ceiling 0.75
    wrt8 = 10.0, wrt32 = 28.0,   // write-bw ceiling 0.70
    alloc8 = 160.0, alloc32 = 170.0)

  test("healthy pair is valid, eff and window ceiling computed as documented") {
    val s = healthy()
    assert(s.valid && s.rejectReason == null)
    // eff = (600000/20) / (4 * 600000/64) = 64 / (4*20) = 0.8
    assert(math.abs(s.eff - 0.8) < 1e-9)
    // binding window ceiling = min(0.80, 0.75, 0.70) = 0.70
    assert(math.abs(s.windowCeiling - 0.70) < 1e-9)
    // windowed normalized clamps at 1.0 (0.8/0.7 > 1)
    assert(s.effNormalizedWindow == 1.0)
  }

  test("inverted pair (secs_32 >= secs_8) is rejected as 'inverted'") {
    val s = healthy(s8 = 60.0, s32 = 104.4) // the BENCH_r04 shape
    assert(!s.valid && s.rejectReason == "inverted")
    val tie = healthy(s8 = 50.0, s32 = 50.0)
    assert(tie.rejectReason == "inverted") // >= : a no-speedup step is unmeasurable too
  }

  test("window whose own binding ceiling is < 0.2 is rejected as 'congested_window'") {
    // probes certify the window offered only 0.19 of the 4x step on the
    // write path; the crawl reading anything there is weather, not engine
    val s = healthy().copy(wrt8 = 10.0, wrt32 = 7.6) // wrt ceiling 0.19
    assert(s.s32 < s.s8) // not inverted — rejected on the ceiling alone
    assert(!s.valid && s.rejectReason == "congested_window")
    // boundary: exactly 0.2 stays valid (rule is strict-below)
    val border = healthy().copy(wrt8 = 10.0, wrt32 = 8.0)
    assert(border.valid)
  }

  test("windowCeiling and effNormalizedWindow clamp at 1.0") {
    val aliased = healthy().copy(lcg8 = 5.0, lcg32 = 32.0,
      mem8 = 20.0, mem32 = 120.0, wrt8 = 5.0, wrt32 = 28.0)
    assert(aliased.windowCeiling == 1.0)
    assert(aliased.effNormalizedWindow <= 1.0)
  }

  test("pair of record: cleanest VALID window wins, not max efficiency") {
    val cleanValid = healthy(s8 = 56.0, s32 = 19.0)             // combined 75
    val slowerButHigherEff = healthy(s8 = 90.0, s32 = 24.0)     // eff higher, combined 114
    val inverted = healthy(s8 = 31.8, s32 = 39.8)               // fastest combined but invalid
    assert(inverted.s8 + inverted.s32 < cleanValid.s8 + cleanValid.s32)
    assert(slowerButHigherEff.eff > cleanValid.eff)
    val best = Bench.pairOfRecord(Seq(slowerButHigherEff, inverted, cleanValid))
    assert(best == cleanValid)
  }

  test("pair of record: all-invalid run falls back to cleanest pair (caller flags pair_valid=false)") {
    val a = healthy(s8 = 60.0, s32 = 104.4)
    val b = healthy(s8 = 55.0, s32 = 83.8)
    assert(!a.valid && !b.valid)
    assert(Bench.pairOfRecord(Seq(a, b)) == b)
  }
}
