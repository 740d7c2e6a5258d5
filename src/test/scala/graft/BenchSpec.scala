package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the v5 contention verdict ([[Bench.riseSpread]]) against the
  * round-17 calibration dataset: ten full-suite runs on one noisy
  * afternoon whose ground truth is known from their totals (quiet sf0.01
  * ≈ 50 s; contended 59–94 s). The rule must flag every contended run
  * (rise > 2) and no quiet one — the property every max/min variant
  * (v1–v4) failed, because quiet small-scale runs carry a monotone
  * warm-decay envelope whose start-to-floor amplitude exceeds 2×.
  * Series are (interior calibration probes :+ post) verbatim from the
  * recorded artifacts; SCALING.md "spread rule v5" documents the study.
  */
class BenchSpec extends AnyFunSuite {

  private def rise(series: Seq[Double], post: Double): Double =
    Bench.riseSpread(series :+ post)

  test("v5 rise verdict: pure shapes") {
    // monotone decay NEVER flags, whatever its amplitude
    assert(Bench.riseSpread(Seq(1.0, 0.5, 0.3, 0.1, 0.05)) === 1.0)
    // flat floor with small wobble stays ~1
    assert(Bench.riseSpread(Seq(0.2, 0.22, 0.19, 0.21)) < 1.16)
    // a spike above a witnessed floor flags
    assert(Bench.riseSpread(Seq(0.2, 0.2, 0.9, 0.2)) === 4.5)
    // a SUSTAINED pulse flags identically (round 9's failure mode)
    assert(Bench.riseSpread(Seq(0.2, 0.2, 0.6, 0.62, 0.61, 0.2)) > 3.0)
    // failed probes (-1 sentinels) are ignored, not treated as floors
    assert(Bench.riseSpread(Seq(0.2, -1.0, 0.21)) < 1.1)
    // degenerate inputs
    assert(Bench.riseSpread(Seq.empty) === 1.0)
    assert(Bench.riseSpread(Seq(0.3)) === 1.0)
  }

  test("v5 rise verdict: the round-17 ten-run calibration dataset") {
    // (label, interior series, post, totalSec, contended?)
    val runs: Seq[(String, Seq[Double], Double, Boolean)] = Seq(
      ("sf0.01 quiet 50.35s",
        Seq(0.218, 0.183, 0.187, 0.178, 0.166, 0.198, 0.185, 0.148, 0.143,
          0.141, 0.138, 0.162, 0.129, 0.139, 0.17), 0.149, false),
      ("sf0.01 sustained pulse 93.8s",
        Seq(0.294, 0.227, 0.272, 0.25, 0.194, 0.275, 0.212, 0.21, 0.246,
          0.503, 0.636, 0.993, 0.746, 0.743, 0.762, 0.555), 0.47, true),
      ("sf0.01 pulse 65.1s",
        Seq(0.267, 0.205, 0.203, 0.226, 0.164, 0.187, 0.18, 0.159, 0.189,
          0.208, 0.186, 0.21, 0.158, 0.333, 0.257, 0.183), 0.182, true),
      ("sf0.01 pulse 59.5s",
        Seq(0.271, 0.246, 0.24, 0.211, 0.264, 0.445, 0.229, 0.373, 0.244,
          0.232, 0.177, 0.181, 0.17, 0.194, 0.192, 0.167), 0.141, true),
      ("sf0.01 quiet decay 49.9s",
        Seq(0.265, 0.186, 0.169, 0.161, 0.162, 0.14, 0.165, 0.133, 0.151,
          0.144, 0.173, 0.142, 0.161, 0.182, 0.121, 0.137), 0.142, false),
      ("sf0.1 record 73.9s",
        Seq(0.278, 0.263, 0.248, 0.219, 0.225, 0.236, 0.21, 0.222, 0.218,
          0.203, 0.216, 0.25, 0.231, 0.195, 0.233), 0.248, false),
      ("sf0.1 80.4s",
        Seq(0.389, 0.265, 0.323, 0.299, 0.22, 0.248, 0.21, 0.21, 0.246,
          0.255, 0.231, 0.223, 0.199, 0.258, 0.236, 0.255), 0.239, false),
      ("span pulse 105.1s",
        Seq(0.27, 0.253, 0.227, 0.201, 0.233, 0.254, 0.277, 0.346, 0.227,
          0.191, 0.183, 0.197, 0.196, 0.399, 0.239, 0.273), 0.245, true),
      ("span quiet 113.9s",
        Seq(0.306, 0.323, 0.314, 0.269, 0.233, 0.241, 0.224, 0.241, 0.227,
          0.273, 0.239, 0.244, 0.235, 0.223, 0.381, 0.219), 0.232, false),
      ("sf0.01 quiet v5-final 53.1s",
        Seq(0.325, 0.249, 0.155, 0.152, 0.152, 0.183, 0.163, 0.178, 0.157,
          0.166, 0.151, 0.159, 0.16, 0.228, 0.205, 0.183), 0.168, false))
    runs.foreach { case (label, series, post, contended) =>
      val r = rise(series, post)
      assert((r > 2.0) === contended,
        f"$label: rise $r%.3f must ${if (contended) "" else "NOT "}flag")
    }
  }
}
