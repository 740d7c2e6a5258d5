package graft

/** [[ScaleGen.generate]]'s cross-machine determinism contract, pinned.
  *
  * Round 13 made generation machine-independent (every `spark.range` pins
  * its partition count, because `rand` seeds are per-partition and an
  * unpinned range follows the machine's core count) — but nothing ASSERTED
  * the output, so the scaling legs remained same-box artifacts: a future
  * edit that silently re-introduced core-count dependence would change the
  * sf1e corpora under the benchmarks with no gate noticing. This spec
  * generates a factor-1 set from the smallest driver testdata and asserts
  * recorded order-independent row digests (same digest machinery as
  * [[SpillRehearsal]]) for all three regenerated tables — same
  * (srcDir, factor, spanFactor) must mean same rows on ANY machine, which
  * is what makes `BENCH_scaling.json`'s sf1e/sf1e_span legs reproducible
  * evidence rather than local folklore.
  *
  * The recorded digests depend on the driver's seed-42 sf0.001 parquet
  * (TESTDATA.md); `TestdataCanarySpec` fails first if that drifts.
  */
class ScaleGenDigestSpec extends SparkSpec {

  test("factor-1 generation from sf0.001 reproduces the recorded row digests") {
    val out = java.nio.file.Files.createTempDirectory("scalegen-digest-").toString
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 1L, 1L)
    def dig(table: String): String =
      SpillRehearsal.digest(spark.read.parquet(s"$out/$table.parquet").collect())
    val got = Map(
      "events" -> dig("events"),
      "documents" -> dig("documents"),
      "customer" -> dig("customer"))
    val expected = Map(
      "events" -> "c8e03332ec03821cfe3dcee6c36d8947c873fcfbfebc8bb9014370308929d0ff",
      "documents" -> "fad70d9f41b113b12e6bfe91469a7888964f1d77bdb905c539090d2f4415deed",
      "customer" -> "0feb2f94badfe51d4fe63a41aed0fc7e9b5ae09f8d7835d37b9f1663d29105ea")
    got.foreach { case (t, d) =>
      assert(d === expected(t),
        s"ScaleGen $t digest drifted — generation is no longer " +
          "machine/run-deterministic (or the recipe changed: re-record " +
          "the digest AND re-run the scaling legs, they measure a " +
          "different corpus now)")
    }
  }
}
