package graft.ops

import org.apache.spark.sql.types._

/** Schema-evolution compatibility checking — the data-contract primitive a
  * long-lived lakehouse needs before any writer ships a new shard schema.
  * The reference's tables evolve implicitly (its gold DDL is re-run by
  * hand, the DDL files under `sql/gold/`); at 100 TB an incompatible shard poisons a
  * partitioned table silently until a reader hits it, so the check belongs
  * in the engine, before the write.
  *
  * Compatibility model (the common lakehouse/Avro-style rules):
  *   - ADD of a nullable column: compatible (old shards read it as null).
  *   - ADD of a non-nullable column: breaking for readers of old shards —
  *     there is no value to materialize.
  *   - DROP: breaking for readers that project the column.
  *   - TYPE WIDENING along the safe numeric ladder (byte→short→int→long,
  *     float→double, and integer→long-range decimal style promotions):
  *     compatible — every old value embeds losslessly.
  *   - Any other type change, or NARROWING: breaking.
  *   - nullable→non-nullable tightening: breaking (old nulls violate it);
  *     non-nullable→nullable loosening: compatible.
  *
  * Pure metadata — no data pass. Nested structs recurse with dotted paths;
  * arrays/maps compare element/value types by the same rules.
  */
object SchemaEvolution {

  /** One finding per changed path. `change` ∈ added / dropped / retyped /
    * tightened / loosened / widened; `breaking` is the verdict.
    */
  final case class Finding(path: String, change: String,
                           from: String, to: String, breaking: Boolean)

  private val widenings: Set[(DataType, DataType)] = Set(
    (ByteType, ShortType), (ByteType, IntegerType), (ByteType, LongType),
    (ShortType, IntegerType), (ShortType, LongType),
    (IntegerType, LongType),
    (FloatType, DoubleType))

  /** Full diff of `old` → `next`. Empty = identical contracts. */
  def diff(old: StructType, next: StructType, prefix: String = ""): Seq[Finding] = {
    val oldF = old.fields.map(f => f.name -> f).toMap
    val nextF = next.fields.map(f => f.name -> f).toMap
    val added = next.fields.filterNot(f => oldF.contains(f.name)).map { f =>
      Finding(prefix + f.name, "added", "", f.dataType.simpleString,
        breaking = !f.nullable)
    }
    val dropped = old.fields.filterNot(f => nextF.contains(f.name)).map { f =>
      Finding(prefix + f.name, "dropped", f.dataType.simpleString, "",
        breaking = true)
    }
    val changed = old.fields.filter(f => nextF.contains(f.name)).flatMap { f =>
      val n = nextF(f.name)
      val path = prefix + f.name
      val typeFindings = typeChange(path, f.dataType, n.dataType)
      val nullFindings =
        if (f.nullable == n.nullable) Nil
        else if (f.nullable && !n.nullable)
          Seq(Finding(path, "tightened", "nullable", "not null", breaking = true))
        else
          Seq(Finding(path, "loosened", "not null", "nullable", breaking = false))
      typeFindings ++ nullFindings
    }
    (added ++ dropped ++ changed).toSeq
  }

  /** Element/value null-permission change — the same tightening/loosening
    * rule as field nullability: old data may hold null elements, so
    * `containsNull`/`valueContainsNull` going false is breaking.
    */
  private def nullFlagChange(path: String, old: Boolean,
                             next: Boolean): Seq[Finding] =
    if (old == next) Nil
    else if (old && !next)
      Seq(Finding(path, "tightened", "nullable", "not null", breaking = true))
    else
      Seq(Finding(path, "loosened", "not null", "nullable", breaking = false))

  /** Recursive type comparison — containers recurse HERE (not one level
    * up in [[diff]]), so an array-inside-array widening or a nested
    * element-nullability change resolves by the same rules at any depth
    * instead of collapsing to a blanket "retyped".
    */
  private def typeChange(path: String, a: DataType, b: DataType): Seq[Finding] =
    if (a == b) Nil
    else if (widenings((a, b)))
      Seq(Finding(path, "widened", a.simpleString, b.simpleString, breaking = false))
    else (a, b) match {
      case (sa: StructType, sb: StructType) => diff(sa, sb, path + ".")
      case (ArrayType(ea, an), ArrayType(eb, bn)) =>
        typeChange(path + "[]", ea, eb) ++ nullFlagChange(path + "[]", an, bn)
      case (MapType(ka, va, van), MapType(kb, vb, vbn)) =>
        typeChange(path + ".key", ka, kb) ++
          typeChange(path + ".value", va, vb) ++
          nullFlagChange(path + ".value", van, vbn)
      case _ =>
        Seq(Finding(path, "retyped", a.simpleString, b.simpleString, breaking = true))
    }

  /** Reader-compatibility verdict: can a reader of `next`-shaped data still
    * consume every shard written under `old`?
    */
  def compatible(old: StructType, next: StructType): Boolean =
    !diff(old, next).exists(_.breaking)

  /** Raised by [[checkCompatible]] when an incoming write would break the
    * existing dataset's contract — BEFORE any file lands.
    */
  final class ContractViolation(val target: String, val findings: Seq[Finding])
    extends IllegalStateException(
      s"incompatible schema change for $target: " +
        findings.map(f => s"${f.path} ${f.change} ${f.from}->${f.to}")
          .mkString("; "))

  /** Schema of the dataset already at `dir`; None when nothing committed
    * is there (missing dir, or only an uncommitted `_temporary`). Metadata
    * only — parquet footer read, no data pass.
    */
  def existingSchema(spark: org.apache.spark.sql.SparkSession,
                     dir: String): Option[StructType] =
    try Some(spark.read.parquet(dir).schema)
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** The pre-write contract gate: diff the dataset already at `dir`
    * against `incoming` and THROW ([[ContractViolation]]) on any breaking
    * change, before the caller writes a byte. First write (nothing at
    * `dir`) always passes — there is no contract yet.
    *
    * Nullability is normalized away here (unlike the raw [[diff]]):
    * parquet footers read back all-nullable regardless of what the writer
    * declared, so at a WRITE gate nullability diffs are round-trip noise,
    * not contract signal — the add/drop/type rules carry the real
    * contract. Returns the full (non-breaking) diff for callers that log
    * evolution.
    */
  def checkCompatible(spark: org.apache.spark.sql.SparkSession, dir: String,
                      incoming: StructType): Seq[Finding] =
    existingSchema(spark, dir) match {
      case None => Nil
      case Some(old) =>
        val findings = diff(normalize(old), normalize(incoming))
        val breaking = findings.filter(_.breaking)
        if (breaking.nonEmpty) throw new ContractViolation(dir, breaking)
        findings
    }

  /** All-nullable copy of a schema (recursing through containers) — the
    * shape parquet hands back on read, used to keep the write gate free of
    * round-trip nullability noise.
    */
  private def normalize(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, normalize(f.dataType), nullable = true, f.metadata)))
    case ArrayType(e, _) => ArrayType(normalize(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(normalize(k), normalize(v), valueContainsNull = true)
    case other => other
  }

  private def normalize(s: StructType): StructType =
    normalize(s: DataType).asInstanceOf[StructType]
}
