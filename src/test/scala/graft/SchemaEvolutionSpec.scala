package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SchemaEvolution
import graft.ops.SchemaEvolution.Finding

/** Pure-metadata specs for the schema-evolution contract checker. */
class SchemaEvolutionSpec extends AnyFunSuite {

  private def s(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nl) => StructField(n, t, nl) })

  test("identical schemas diff to nothing and are compatible") {
    val a = s(("id", LongType, false), ("text", StringType, true))
    assert(SchemaEvolution.diff(a, a).isEmpty)
    assert(SchemaEvolution.compatible(a, a))
  }

  test("nullable add is compatible; non-nullable add breaks old-shard readers") {
    val old = s(("id", LongType, false))
    val okAdd = s(("id", LongType, false), ("lang", StringType, true))
    assert(SchemaEvolution.compatible(old, okAdd))
    val badAdd = s(("id", LongType, false), ("lang", StringType, false))
    val f = SchemaEvolution.diff(old, badAdd)
    assert(f === Seq(Finding("lang", "added", "", "string", breaking = true)))
    assert(!SchemaEvolution.compatible(old, badAdd))
  }

  test("drop breaks; safe numeric widening does not; narrowing and retype do") {
    val old = s(("id", IntegerType, false), ("score", FloatType, true))
    assert(!SchemaEvolution.compatible(old, s(("id", IntegerType, false))),
      "dropped column must break")
    val widened = s(("id", LongType, false), ("score", DoubleType, true))
    assert(SchemaEvolution.diff(old, widened).forall(!_.breaking))
    assert(SchemaEvolution.compatible(old, widened))
    val narrowed = s(("id", ShortType, false), ("score", FloatType, true))
    assert(!SchemaEvolution.compatible(old, narrowed), "narrowing must break")
    val retyped = s(("id", StringType, false), ("score", FloatType, true))
    assert(SchemaEvolution.diff(old, retyped)
      .exists(f => f.path == "id" && f.change == "retyped" && f.breaking))
  }

  test("nullability: tightening breaks, loosening does not") {
    val old = s(("v", StringType, true))
    assert(!SchemaEvolution.compatible(old, s(("v", StringType, false))))
    assert(SchemaEvolution.compatible(s(("v", StringType, false)), old))
  }

  test("array containsNull / map valueContainsNull tightening breaks like field nullability") {
    val oldA = s(("tags", ArrayType(StringType, containsNull = true), true))
    val tightA = s(("tags", ArrayType(StringType, containsNull = false), true))
    val f = SchemaEvolution.diff(oldA, tightA)
    assert(f === Seq(Finding("tags[]", "tightened", "nullable", "not null",
      breaking = true)),
      s"old shards may hold null elements — tightening must break: $f")
    assert(SchemaEvolution.compatible(tightA, oldA), "loosening is fine")
    val oldM = s(("m", MapType(StringType, LongType, valueContainsNull = true), true))
    val tightM = s(("m", MapType(StringType, LongType, valueContainsNull = false), true))
    assert(!SchemaEvolution.compatible(oldM, tightM))
  }

  test("nested structs report dotted paths; array element changes carry []") {
    val old = s(("meta", s(("w", IntegerType, true)), true),
      ("tags", ArrayType(IntegerType), true))
    val next = s(("meta", s(("w", StringType, true)), true),
      ("tags", ArrayType(LongType), true))
    val f = SchemaEvolution.diff(old, next)
    assert(f.exists(x => x.path == "meta.w" && x.change == "retyped" && x.breaking))
    assert(f.exists(x => x.path == "tags[]" && x.change == "widened" && !x.breaking))
  }

  test("container rules apply at ANY nesting depth, not just the outermost level") {
    // array<array<int>> → array<array<long>>: safe widening two levels down
    val old2 = s(("xs", ArrayType(ArrayType(IntegerType, false), true), true))
    val wide2 = s(("xs", ArrayType(ArrayType(LongType, false), true), true))
    val fw = SchemaEvolution.diff(old2, wide2)
    assert(fw === Seq(Finding("xs[][]", "widened", "int", "bigint",
      breaking = false)), s"nested widening must not read as a retype: $fw")
    assert(SchemaEvolution.compatible(old2, wide2))
    // inner containsNull loosening is compatible; tightening breaks
    val loose2 = s(("xs", ArrayType(ArrayType(IntegerType, true), true), true))
    assert(SchemaEvolution.compatible(old2, loose2), "inner loosening is fine")
    assert(!SchemaEvolution.compatible(loose2, old2), "inner tightening breaks")
    // map<string, array<int>> value-element widening
    val oldM = s(("m", MapType(StringType, ArrayType(IntegerType, false)), true))
    val wideM = s(("m", MapType(StringType, ArrayType(LongType, false)), true))
    assert(SchemaEvolution.compatible(oldM, wideM))
  }
}

/** The verdicts grounded in the ENGINE: a `compatible` evolution must
  * actually read old parquet shards under the new schema, and a `breaking`
  * one must actually fail — the model is worth nothing if it diverges from
  * what Spark's reader does.
  */
class SchemaEvolutionEngineSpec extends SparkSpec {
  import org.apache.spark.sql.types._
  import spark.implicits._

  test("a compatible evolution (widen + nullable add) reads old shards; a retype fails") {
    val dir = java.nio.file.Files.createTempDirectory("schema_evo").toString + "/t"
    Seq((1, 1.5f), (2, 2.5f)).toDF("id", "score").write.parquet(dir)
    val next = StructType(Seq(
      StructField("id", LongType),        // int → long: safe widening
      StructField("score", DoubleType),   // float → double: safe widening
      StructField("lang", StringType)))   // nullable add
    val old = spark.read.parquet(dir).schema
    assert(graft.ops.SchemaEvolution.compatible(old, next),
      "the model must call this evolution compatible")
    val rows = spark.read.schema(next).parquet(dir)
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 1.5), (2L, 2.5)), "old values embed losslessly")
    assert(rows.forall(_.isNullAt(2)), "the added column reads as null")
    // negative control: the model calls id STRING breaking — and the
    // engine agrees (the read cannot produce the rows)
    val retyped = StructType(Seq(
      StructField("id", StringType), StructField("score", FloatType)))
    assert(!graft.ops.SchemaEvolution.compatible(old, retyped))
    intercept[Exception] {
      spark.read.schema(retyped).parquet(dir).collect()
    }
  }

  test("gold refresh gate: an incompatible append is rejected BEFORE any file lands") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("schema_gate").toString + "/gold"
    def frame(xCast: String) = Seq(("u1", "2024-01-01", 0, 7L))
      .toDF("uid", "dt", "hr", "x")
      .withColumn("dt", col("dt").cast("date"))
      .withColumn("x", col("x").cast(xCast))
    graft.ops.GoldPipeline.refreshUidHourly(
      frame("long"), root, "2024-01-01", "2024-01-01")
    val filesBefore = new java.io.File(s"$root/dt=2024-01-01/hr=0")
      .listFiles().map(_.getName).toSet
    // retyping x long -> string is a contract break: reject pre-write
    intercept[graft.ops.SchemaEvolution.ContractViolation] {
      graft.ops.GoldPipeline.refreshUidHourly(
        frame("string"), root, "2024-01-01", "2024-01-01")
    }
    assert(new java.io.File(s"$root/dt=2024-01-01/hr=0")
      .listFiles().map(_.getName).toSet === filesBefore,
      "the rejected refresh must not have touched a single file")
    assert(spark.read.parquet(root).select("x").as[Long].collect().toSeq
      === Seq(7L), "the committed data is intact")
    // additive evolution (nullable add) still refreshes; opt-out also works
    graft.ops.GoldPipeline.refreshUidHourly(
      frame("long").withColumn("extra", lit("e")),
      root, "2024-01-01", "2024-01-01")
    graft.ops.GoldPipeline.refreshUidHourly(
      frame("string"), root, "2024-01-01", "2024-01-01",
      enforceContract = false)
  }

  test("snapshot publish gate: a contract-breaking publish fails with the pointer unmoved") {
    val root = java.nio.file.Files.createTempDirectory("snap_gate").toString + "/c"
    graft.ops.Snapshots.publish(Seq((1L, "a")).toDF("id", "t"), root)
    intercept[graft.ops.SchemaEvolution.ContractViolation] {
      graft.ops.Snapshots.publish(Seq("x").toDF("id"), root) // id retyped, t dropped
    }
    assert(graft.ops.Snapshots.versions(spark, root) === Seq(1L),
      "no version number consumed, no staging promoted")
    assert(graft.ops.Snapshots.latestVersion(spark, root) === Some(1L))
    // widening long->? no — ADDITIVE evolution publishes fine
    val v2 = graft.ops.Snapshots.publish(
      Seq((2L, "b", 0.5)).toDF("id", "t", "score"), root)
    assert(v2 === 2L)
    // an intentional break goes through the explicit opt-out
    val v3 = graft.ops.Snapshots.publish(
      Seq("x").toDF("id"), root, enforceContract = false)
    assert(v3 === 3L)
  }

  test("standing-store append gate: a store from an older deploy with an evolved schema is refused") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("store_gate").toString
    val store = root + "/store"
    // "older build" wrote signatures keyed by a LONG doc_id
    Seq(1L).toDF("doc_id").write.parquet(store)
    // this build declares doc_id STRING — silently misreading the standing
    // set would corrupt every later dedup decision; refuse the append
    intercept[graft.ops.SchemaEvolution.ContractViolation] {
      graft.streaming.StandingStore.append(Seq("d1").toDF("doc_id"), store)
    }
    assert(spark.read.parquet(store).count() === 1L, "store untouched")
    // the violating store stays unchecked: a retry fails again (the gate
    // is memoized only on SUCCESS)
    intercept[graft.ops.SchemaEvolution.ContractViolation] {
      graft.streaming.StandingStore.append(Seq("d2").toDF("doc_id"), store)
    }
    // a compatible append (same schema) passes and memoizes
    graft.streaming.StandingStore.append(Seq(2L).toDF("doc_id"), store)
    assert(spark.read.parquet(store).count() === 2L)
  }
}
