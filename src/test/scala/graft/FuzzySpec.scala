package graft

import org.apache.spark.sql.functions._

import graft.ops.Fuzzy

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1L, "cat"), (2L, "cap"), (3L, "cart"),     // block c: dists 1|2, 1|3 = 1
    (4L, "dog"), (5L, "dig"),                   // block d: dist 1
    (6L, "dodge"),                              // block d: len prune vs dog/dig
    (7L, "zebra")                               // singleton block — no pairs
  ).toDF("id", "name")

  test("editDistancePairs: within-block verify at the distance cap") {
    val out = Fuzzy.editDistancePairs(fixture, "id", "name",
        substring(col("name"), 1, 1), maxDist = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._2))
    // (cat,cap)=1, (cat,cart)=1, (cap,cart)=2 dropped, (dog,dig)=1,
    // dodge pruned by |len| > 1 before levenshtein, zebra has no block peer
    assert(out.toSeq === Seq((1L, 2L, 1), (1L, 3L, 1), (4L, 5L, 1)))
  }

  test("editDistancePairs: id_a < id_b — no self or symmetric duplicates") {
    val out = Fuzzy.editDistancePairs(fixture, "id", "name",
        substring(col("name"), 1, 1), maxDist = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.forall { case (a, b) => a < b })
    assert(out.distinct.length === out.length)
  }

  test("editDistancePairs: exact duplicates surface at dist 0") {
    val dups = Seq((1L, "same"), (2L, "same")).toDF("id", "name")
    val out = Fuzzy.editDistancePairs(dups, "id", "name", lit("b"), maxDist = 0)
      .as[(Long, Long, Int)].collect()
    assert(out.toSeq === Seq((1L, 2L, 0)))
  }

  test("editDistancePairs agree with brute force within blocks on random strings") {
    val rnd = new scala.util.Random(7)
    def word() = (1 to 3 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val rows = (1L to 120L).map(i => (i, word()))
    val df = rows.toDF("id", "name")
    val got = Fuzzy.editDistancePairs(df, "id", "name",
        substring(col("name"), 1, 1), maxDist = 2)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.head == sb.head && math.abs(sa.length - sb.length) <= 2
      dist = lev(sa, sb) if dist <= 2
    } yield (ia, ib) -> dist).toMap
    assert(got === want)
  }

  test("sortedNeighborhoodPairs: hand-computed window over the sort order") {
    // name order: cap(2) cart(3) cat(1) dig(5) dodge(6) dog(4) zebra(7);
    // window 3 pairs each row with its next two — (cap,cart) dist 2 drops,
    // (cap,cat)=1, (cart,cat)=1, (cart,dig) dist 3 drops, (cat,dodge) len
    // prune, (dig,dodge) len prune, (dig,dog)=1, (dodge,dog) dist 2 drops,
    // (dodge,zebra)/(dog,zebra) drop
    val out = Fuzzy.sortedNeighborhoodPairs(fixture, "id", "name",
        col("name"), window = 3, maxDist = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq((1L, 2L, 1), (1L, 3L, 1), (4L, 5L, 1)))
  }

  test("sortedNeighborhoodPairs ≡ brute-force window scan on random strings") {
    val rnd = new scala.util.Random(11)
    def word() = (1 to 3 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val rows = (1L to 150L).map(i => (i, word()))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val got = Fuzzy.sortedNeighborhoodPairs(rows.toDF("id", "name"),
        "id", "name", col("name"), window = 4, maxDist = 2)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val sorted = rows.sortBy { case (i, s) => (s, i) }
    val want = (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + 4, sorted.length)
      (ia, sa) = sorted(i); (ib, sb) = sorted(j)
      if math.abs(sa.length - sb.length) <= 2
      d = lev(sa, sb) if d <= 2
    } yield (math.min(ia, ib), math.max(ia, ib)) -> d).toMap
    assert(got === want)
  }
}
