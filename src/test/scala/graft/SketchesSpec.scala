package graft

import org.apache.spark.sql.functions._

import graft.expressions.StableHashBucket
import graft.ops.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val sk = Sketches.bitsetDistinct(4096, 2)

  test("bitset distinct is exact-ish at low load and tracks the true count") {
    val df = Seq.tabulate(500)(i => ("g", s"v$i")).toDF("g", "v")
    val Array((nSet, est)) = df.groupBy("g").agg(sk(col("v")).as("s"))
      .select(col("s.n_set"), col("s.est_distinct"))
      .as[(Long, Double)].collect()
    // 1000 positions drawn into 4096 bits: n_set close to 1000 minus collisions
    assert(nSet > 800 && nSet <= 1000)
    // linear-counting estimate of 2n (k=2 positions per value) within 10%
    assert(math.abs(est / 2 - 500) < 50, s"est=$est")
  }

  test("result is identical under any partitioning (merge order independence)") {
    val df = Seq.tabulate(300)(i => (s"g${i % 3}", s"v${i % 97}")).toDF("g", "v")
    def run(parts: Int) =
      df.repartition(parts).groupBy("g").agg(sk(col("v")).as("s"))
        .select(col("g"), col("s.n_set"), col("s.est_distinct"))
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(7))
    assert(run(7) === run(32))
  }

  test("duplicate values set no new bits") {
    val once = Seq(("g", "x")).toDF("g", "v")
    val many = Seq.fill(50)(("g", "x")).toDF("g", "v")
    def nSet(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(sk(col("v")).as("s"))
        .select(col("s.n_set")).as[Long].head()
    assert(nSet(once) === nSet(many))
    assert(nSet(once) <= 2) // k=2 positions, possibly colliding
  }

  test("histogram sketch: fixed bins, under/overflow slots, nulls uncounted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sk = graft.ops.Sketches.histogramSketch(0.0, 10.0, 5)
    val df = Seq[Option[Double]](
      Some(-1.0),           // underflow
      Some(0.0), Some(1.9), // bin 0
      Some(2.0),            // bin 1 (boundary goes up)
      Some(9.99),           // bin 4
      Some(10.0), Some(42.0), // overflow (hi exclusive)
      None                  // null → uncounted
    ).map(v => ("g", v)).toDF("g", "v")
    val h = df.groupBy("g").agg(sk(col("v")).as("h"))
      .select("h").as[Seq[Long]].head()
    assert(h === Seq(1L, 2L, 1L, 0L, 0L, 1L, 2L))
    assert(h.sum === 7L) // everything but the null
  }

  test("histogram sketch: NaN counts in overflow, never corrupts bin 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sk = graft.ops.Sketches.histogramSketch(0.0, 10.0, 5)
    val df = Seq(1.0, Double.NaN).map(v => ("g", v)).toDF("g", "v")
    val h = df.groupBy("g").agg(sk(col("v")).as("h"))
      .select("h").as[Seq[Long]].head()
    assert(h === Seq(0L, 1L, 0L, 0L, 0L, 0L, 1L))
  }

  test("histogram sketch is identical under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sk = graft.ops.Sketches.histogramSketch(0.0, 100.0, 10)
    val vals = (1 to 500).map(i => ("g", (i * 37 % 120).toDouble))
    def run(parts: Int) = vals.toDF("g", "v").repartition(parts)
      .groupBy("g").agg(sk(col("v")).as("h")).select("h").as[Seq[Long]].head()
    assert(run(1) === run(7))
  }

  test("bit positions are the engine's stable sha256 bucket (cross-engine contract)") {
    // the oracle recomputes positions as sha256("<value>#<j>") mod m — assert
    // the Aggregator uses exactly that, via the shared StableHashBucket
    val df = Seq(("g", "abc")).toDF("g", "v")
    val nSet = df.groupBy("g").agg(sk(col("v")).as("s"))
      .select(col("s.n_set")).as[Long].head()
    val expected = Set(StableHashBucket.bucket("abc#0", 4096),
      StableHashBucket.bucket("abc#1", 4096)).size
    assert(nSet === expected.toLong)
  }

  test("count-min: estimates never undercount and are exact sans collisions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sk = graft.ops.Sketches.countMin(4, 256)
    // 3 values with known multiplicities, tiny load → no collisions expected
    val data = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val m = data.map(("g", _)).toDF("g", "v")
      .groupBy("g").agg(sk(col("v")).as("m")).select("m").as[Seq[Long]].head()
    def est(v: String): Long = (0 until 4).map(j =>
      m(j * 256 + StableHashBucket.bucket(v + "#" + j, 256).toInt)).min
    assert(est("a") === 5L && est("b") === 3L && est("c") === 1L)
    // total mass per matrix row is the stream length — the CMS invariant
    (0 until 4).foreach(j => assert(m.slice(j * 256, (j + 1) * 256).sum === 9L))
  }

  test("count-min matrix is identical under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sk = graft.ops.Sketches.countMin(2, 64)
    val vals = (1 to 300).map(i => ("g", s"u${i % 23}"))
    def run(parts: Int) = vals.toDF("g", "v").repartition(parts)
      .groupBy("g").agg(sk(col("v")).as("m")).select("m").as[Seq[Long]].head()
    assert(run(1) === run(8))
  }

  test("space-saving: guaranteed hitters tracked, bounds hold under any partitioning") {
    // 60× "hot", 30× "warm", 45 singletons; n=135, k=8 -> n/k ≈ 17, so hot
    // and warm are GUARANTEED tracked under every partitioning
    val vals = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 45).map(i => s"one$i")
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ss = Sketches.spaceSaving(8)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.map(("g", _)).toDF("g", "v").repartition(parts)
        .groupBy("g").agg(ss(col("v")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"), col("e.err"))
        .as[(String, Long, Long)].collect()
      assert(got.length <= 8)
      val items = got.map(_._1).toSet
      assert(items.contains("hot") && items.contains("warm"),
        s"parts=$parts must track guaranteed hitters, got $items")
      got.foreach { case (item, est, err) =>
        val t = truth.getOrElse(item, 0L)
        assert(est >= t, s"parts=$parts $item: est $est undercounts true $t")
        assert(est - err <= t, s"parts=$parts $item: floor ${est - err} overcounts $t")
      }
      // the guaranteed hitters dominate the report order
      assert(got.head._1 === "hot" && got(1)._1 === "warm")
    }
  }

  test("space-saving: below capacity the counts are exact with zero error") {
    val vals = Seq("a", "a", "a", "b", "b", "c")
    val got = vals.map(("g", _)).toDF("g", "v").repartition(4)
      .groupBy("g").agg(Sketches.spaceSaving(10)(col("v")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }

  test("space-saving: eviction inherits the victim's count as floor and error") {
    // single partition, k=2: a a b, then c evicts b (count 1) -> c: est 2, err 1
    val vals = Seq("a", "a", "b", "c")
    val got = vals.map(("g", _)).toDF("g", "v").coalesce(1)
      .groupBy("g").agg(Sketches.spaceSaving(2)(col("v")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 2L, 0L), ("c", 2L, 1L)))
  }

  test("bitset union over stored partials ≡ one direct build over the union") {
    val m = 256
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map(_ => (s"g${rnd.nextInt(3)}", s"u${rnd.nextInt(80)}"))
    val df = rows.toDF("part", "v").repartition(7)
    // partials per part, then merged across parts
    val merged = df.groupBy("part")
      .agg(Sketches.bitsetBuild(m, 2)(col("v")).as("sk"))
      .agg(Sketches.bitsetUnion(m)(col("sk")).as("r"))
      .select(col("r.n_set"), col("r.est_distinct"))
      .as[(Long, Double)].head()
    val direct = df.agg(Sketches.bitsetDistinct(m, 2)(col("v")).as("r"))
      .select(col("r.n_set"), col("r.est_distinct"))
      .as[(Long, Double)].head()
    assert(merged === direct,
      "merge(build(parts)) must equal build(all) bit-for-bit")
  }

  test("slidingDistinct: window membership and exact counts by hand") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      (ts("2025-01-01 10:00:00"), 1L), (ts("2025-01-01 11:00:00"), 2L),
      (ts("2025-01-03 09:00:00"), 2L), (ts("2025-01-03 10:00:00"), 3L),
      (ts("2025-01-10 08:00:00"), 9L) // > 3 days after the others
    ).toDF("ts", "user_id")
    val out = Sketches.slidingDistinct(df, "ts", "user_id",
        windowDays = 3, m = 256, k = 2)
      .select("day", "n_exact").as[(java.sql.Date, Long)]
      .collect().map(r => r._1.toString -> r._2).toMap
    // Jan 1: {1,2}; Jan 3 window [Jan 1..3]: {1,2,3}; Jan 10: {9} alone;
    // Jan 2/4/… are not observed days → no row
    assert(out === Map("2025-01-01" -> 2L, "2025-01-03" -> 3L,
      "2025-01-10" -> 1L))
  }

  test("bloom: no false negatives ever, pruning actually prunes, semi-join result exact") {
    import spark.implicits._
    val small = (0 until 40).map(i => i * 7).toDF("k")          // members
    val big = (0 until 4000).map(i => i % 1000).toDF("k")       // fact side
    val bits = Sketches.bloomBits(small, "k", 4096, 2)
    val flags = big.select(col("k"),
      Sketches.bloomMightContain(col("k"), bits, 4096, 2).as("hit"))
      .collect().map(r => (r.getInt(0), r.getBoolean(1)))
    val members = (0 until 40).map(_ * 7).toSet
    // the filter's contract: a member NEVER reads absent
    assert(flags.filter { case (k, _) => members(k) }.forall(_._2),
      "false negative — the one thing a Bloom filter may never do")
    // and it prunes: non-members overwhelmingly read absent at this load
    val nonMemberHits = flags.count { case (k, h) => h && !members(k) }
    assert(nonMemberHits < flags.length / 10,
      s"filter passes too much ($nonMemberHits) — position math suspect")
    // end-to-end: pruned semi-join == plain semi-join, exactly
    val pruned = Sketches.bloomSemiJoin(big, "k", small, "k", 4096, 2)
      .collect().map(_.getInt(0)).sorted
    val plain = big.join(small.distinct(), Seq("k"), "left_semi")
      .collect().map(_.getInt(0)).sorted
    assert(pruned.toSeq === plain.toSeq)
  }

  test("HLL: estimate within the p=10 error envelope, registers partition-independent") {
    import spark.implicits._
    val p = 10
    val n = 20000
    val df = (0 until n).map(i => ("g", s"user-$i")).toDF("g", "v")
    val est = Sketches.hllEstimate(
      Sketches.hllDistinct(df, Seq("g"), "v", p), p)
      .select("est_distinct").as[Double].head()
    // 1.04/sqrt(1024) ≈ 3.25% standard error; 4 sigma ≈ 13%
    assert(math.abs(est - n) / n < 0.13,
      s"HLL estimate $est vs exact $n out of envelope")

    // registers identical under any partitioning (max is order-independent)
    val r1 = Sketches.hllRegisters(df.repartition(1), Seq("g"), "v", p)
      .collect().map(_.toString).sorted
    val r16 = Sketches.hllRegisters(df.repartition(16), Seq("g"), "v", p)
      .collect().map(_.toString).sorted
    assert(r1.toSeq === r16.toSeq)
  }

  test("HLL: small-range linear-counting correction engages and is near-exact") {
    import spark.implicits._
    val df = (0 until 50).map(i => ("g", s"u$i")).toDF("g", "v")
    val est = Sketches.hllEstimate(
      Sketches.hllDistinct(df, Seq("g"), "v", 10), 10)
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - 50.0) < 3.0,
      s"linear-counting range should be near-exact, got $est")
  }

  test("HLL sliding: W=1 equals per-day state; a covering window equals the global sketch") {
    import spark.implicits._
    val rows = (0 until 3000).map { i =>
      (java.sql.Timestamp.valueOf(f"2025-01-${i % 5 + 1}%02d 08:00:00"),
        s"u${i % 900}")
    }.toDF("ts", "v")
    val p = 8
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("day").cast("string"), col("n_buckets"), col("v_zero"),
        col("denom_scaled").cast("string"))
        .collect().map(_.toString).sorted.toSeq
    val w1 = Sketches.hllSliding(rows, "ts", "v", 1, p)
    val perDay = Sketches.hllDistinct(
      rows.select(to_date(col("ts")).as("day"), col("v")), Seq("day"), "v", p)
    assert(key(w1) === key(perDay))
    // a window covering all 5 days: every day's state == the global sketch
    val wAll = Sketches.hllSliding(rows, "ts", "v", 10, p)
    val global = Sketches.hllDistinct(
      rows.select(lit(1).as("g"), col("v")), Seq("g"), "v", p)
      .select(col("n_buckets"), col("v_zero"),
        col("denom_scaled").cast("string"))
      .collect().map(_.toString).head
    val lastDay = wAll.orderBy(col("day").desc)
      .select(col("n_buckets"), col("v_zero"),
        col("denom_scaled").cast("string"))
      .collect().map(_.toString).head
    assert(lastDay === global,
      "the last day's covering window must equal the all-data sketch")
  }

  test("HLL: typed Aggregator state is interchangeable with the built-ins path") {
    import spark.implicits._
    val p = 8
    val df = (0 until 5000).map(i => (s"d${i % 3}", s"v${i % 1700}"))
      .toDF("g", "v")
    val viaBuiltins = Sketches.hllDistinct(df, Seq("g"), "v", p)
      .select(col("g"), col("n_buckets"), col("v_zero"),
        col("denom_scaled").cast("string"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val sk = Sketches.hllSketch(p)
    val viaAgg = df.groupBy("g").agg(sk(col("v")).as("s"))
      .select(col("g"), col("s.n_buckets"), col("s.v_zero"),
        col("s.denom_scaled"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(viaAgg === viaBuiltins,
      "the Aggregator and the pure-built-ins path must produce identical exact state")
    // and the Aggregator is partitioning-independent too
    val viaAgg1 = df.repartition(1).groupBy("g").agg(sk(col("v")).as("s"))
      .select(col("g"), col("s.n_buckets"), col("s.v_zero"), col("s.denom_scaled"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(viaAgg1 === viaAgg)
  }

  test("KMV: bounded aggregator ≡ naive bottom-k over all distinct hashes, partition-independent") {
    import org.apache.spark.sql.expressions.Window
    val k = 32
    val df = (0 until 4000).map(i => (s"g${i % 3}", s"u${i % 1100}"))
      .toDF("g", "v")
    def viaAgg(parts: Int) =
      Sketches.kmvMinhashes(df.repartition(parts), Seq("g"), "v", k)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .sorted.toSeq
    // the naive form the oracle runs: rank over ALL distinct hashes
    val naive = df.select(col("g"), Sketches.kmvHash(col("v")).as("hv"))
      .distinct()
      .withColumn("rank", row_number()
        .over(Window.partitionBy("g").orderBy("hv")).cast("int"))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getLong(1)))
      .sorted.toSeq
    assert(viaAgg(16) === naive,
      "the k-long bounded state must equal the k smallest of the full distinct set")
    assert(viaAgg(1) === viaAgg(16),
      "sorted-merge-dedup-truncate must be partitioning-independent")
  }

  test("KMV: estimate within the error envelope when full, EXACT below k") {
    val k = 256
    val n = 20000
    val big = (0 until n).map(i => ("g", s"user-$i")).toDF("g", "v")
    val est = Sketches.kmvEstimate(
      Sketches.kmvDistinct(big, Seq("g"), "v", k), k)
      .select("est_distinct").as[Double].head()
    // 1/sqrt(k-1) ≈ 6.3% standard error; 4 sigma ≈ 25%
    assert(math.abs(est - n) / n < 0.25,
      s"KMV estimate $est vs exact $n out of envelope")
    // a sketch that never filled holds every distinct hash: count is exact
    val small = (0 until 100).map(i => ("g", s"u$i")).toDF("g", "v")
    val exact = Sketches.kmvEstimate(
      Sketches.kmvDistinct(small, Seq("g"), "v", k), k)
      .select(col("n_kept"), col("est_distinct")).collect().head
    assert(exact.getLong(0) === 100L && exact.getDouble(1) === 100.0,
      "below k the KMV sketch IS the distinct set")
  }

  test("KMV overlap: union-of-sketches is a valid union sketch; Jaccard/intersection estimates track truth") {
    val k = 128
    // A = u0..u999, B = u500..u1499: |A|=|B|=1000, inter=500, union=1500,
    // true Jaccard = 1/3
    val rows = ((0 until 1000).map(i => ("A", s"u$i")) ++
      (500 until 1500).map(i => ("B", s"u$i"))).toDF("seg", "v")
    val ov = Sketches.kmvOverlapEstimate(
      Sketches.kmvOverlap(rows, "seg", "v", k), k).collect()
    assert(ov.length === 1)
    val r = ov.head
    assert(r.getAs[String]("seg_a") === "A" && r.getAs[String]("seg_b") === "B")
    // structural exactness: the k smallest of (Sa ∪ Sb) must equal the k
    // smallest hashes of the TRUE union — the property that makes a KMV
    // union sketch valid (cheap to verify directly here)
    val directUnion = (0 until 1500).map(i => ("U", s"u$i")).toDF("seg", "v")
    val direct = Sketches.kmvDistinct(directUnion, Seq("seg"), "v", k)
      .select(col("n_kept"), col("kth_scaled")).collect().head
    assert(r.getAs[Long]("k_union") === direct.getLong(0) &&
      r.getAs[Long]("kth_union") === direct.getLong(1),
      "union-of-sketches must equal the sketch of the union")
    // estimator accuracy (deterministic data — these are fixed numbers):
    // Jaccard std err ≈ sqrt(J(1-J)/k) ≈ 0.042, envelope 4σ
    assert(math.abs(r.getAs[Double]("est_jaccard") - 1.0 / 3) < 0.17,
      s"Jaccard estimate ${r.getAs[Double]("est_jaccard")} vs 1/3")
    assert(math.abs(r.getAs[Double]("est_union") - 1500) / 1500 < 0.35,
      s"union estimate ${r.getAs[Double]("est_union")} vs 1500")
    assert(math.abs(r.getAs[Double]("est_inter") - 500) / 500 < 0.5,
      s"intersection estimate ${r.getAs[Double]("est_inter")} vs 500")
  }

  test("KMV aggregator kernel: dedup, truncation at k, commutative merge") {
    val sk = new graft.ops.KmvSketch(4)
    val a = Seq(7L, 3L, 9L, 3L, 1L, 9L).foldLeft(sk.zero)(sk.reduce)
    assert(a.toSeq === Seq(1L, 3L, 7L, 9L), "sorted distinct inserts")
    val b = Seq(2L, 8L, 1L, 5L, 6L).foldLeft(sk.zero)(sk.reduce)
    assert(b.toSeq === Seq(1L, 2L, 5L, 6L), "insert past k evicts the max")
    val ab = sk.merge(a.clone(), b.clone()).toSeq
    val ba = sk.merge(b.clone(), a.clone()).toSeq
    assert(ab === Seq(1L, 2L, 3L, 5L) && ab === ba,
      "merge = sorted-merge + dedup + truncate, commutative")
    assert(sk.merge(a.clone(), a.clone()).toSeq === a.toSeq,
      "merge is idempotent (retry replays cannot change state)")
    assert(sk.merge(a.clone(), sk.zero).toSeq === a.toSeq)
  }

  test("KMV overlap maxSegments guard: fails loudly above the cap, 0 disables, results unchanged under the cap") {
    val k = 16
    // 8 segments x 20 values
    val rows = (0 until 160).map(i => (s"s${i % 8}", s"u$i")).toDF("seg", "v")
    // construction is LAZY even above the cap (the r17 guard ran an eager
    // count action here — adjudicated round 18, probes/r18/): the raise
    // fires at the FIRST action, from inside the broadcast-side plan
    val overCap = Sketches.kmvOverlap(rows, "seg", "v", k, maxSegments = 4)
    val e = intercept[Exception] { overCap.count() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("maxSegments=4"),
      s"guard message must name the cap: $msgs")
    // at the cap exactly: allowed (the bound is inclusive)
    assert(Sketches.kmvOverlap(rows, "seg", "v", k, maxSegments = 8)
      .count() === 8L * 7 / 2)
    // 0 disables the guard entirely — the documented escape hatch
    val off = Sketches.kmvOverlap(rows, "seg", "v", k, maxSegments = 0)
    val guarded = Sketches.kmvOverlap(rows, "seg", "v", k, maxSegments = 8)
    assert(off.orderBy("seg_a", "seg_b").collect().toSeq ===
      guarded.orderBy("seg_a", "seg_b").collect().toSeq,
      "the guard must never change results, only bound cost")
    spark.catalog.clearCache()
  }
}
