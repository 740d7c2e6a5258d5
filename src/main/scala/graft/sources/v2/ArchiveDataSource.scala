package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ArchiveSource

/** DataSource V2 face of [[graft.sources.ArchiveSource]]:
  * `spark.read.format("graft-archive").load(glob)` yields the
  * (path, member, line) rows of every `.zip` / `.csv.zst` / plain archive
  * under the glob — the reference's S4/S5 extraction (`ais_pipeline
  * .py:399-432`) as a first-class Spark source instead of a helper method.
  *
  * Scale/planning contract:
  *   - listing happens once on the driver (`globStatus`, dirs expanded one
  *     level) — no archive bytes move at planning time;
  *   - ONE InputPartition per archive: a zip member is not splittable, so
  *     file granularity is the parallelism unit, exactly like the helper;
  *   - each reader streams its archive through the same constant-memory
  *     [[ArchiveSource.decodeStream]] decode the helper uses;
  *   - required-column pushdown: a `select(line)` plan carries only the
  *     line through the scan (`SupportsPushDownRequiredColumns`).
  */
class ArchiveDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-archive"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArchiveDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // a user-supplied .schema(...) is honored only as a (name, type) subset
    // of the fixed layout — anything else would silently misread
    val bad = schema.fields.filterNot(f =>
      ArchiveDataSource.Schema.fields.exists(g =>
        g.name == f.name && g.dataType == f.dataType))
    require(bad.isEmpty,
      s"graft-archive columns are ${ArchiveDataSource.Schema.simpleString}; " +
        s"unsupported: ${bad.map(_.name).mkString(", ")}")
    new ArchiveTable(Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-archive requires a path: spark.read.format(\"graft-archive\").load(glob)")),
      schema)
  }
}

object ArchiveDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("line", StringType, nullable = false)))
}

private[v2] class ArchiveTable(glob: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-archive($glob)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // .option("permissive", true): same contract as the helper — a corrupt
    // archive keeps its decoded prefix and emits one _corrupt marker row
    new ArchiveScanBuilder(glob, tableSchema,
      options.getBoolean("permissive", false))
}

private[v2] class ArchiveScanBuilder(glob: String, tableSchema: StructType,
                                     permissive: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ArchiveScan(glob, required, permissive)
}

private[v2] case class ArchivePartition(path: String) extends InputPartition

private[v2] class ArchiveScan(glob: String, required: StructType,
                              permissive: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-archive $glob ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new HadoopPath(glob)
    val fs = p.getFileSystem(hconf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }
    files.sortBy(_.getPath.toString)
      .map(st => ArchivePartition(st.getPath.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ONE broadcast copy of the Hadoop conf for the whole scan — partitions
    // carry only their path (a conf inside every partition would ship
    // O(n_files × conf size) task bytes)
    val spark = SparkSession.active
    val bc = spark.sparkContext.broadcast(
      org.apache.spark.sql.graftbridge.bridge.serializableConf(
        spark.sparkContext.hadoopConfiguration))
    new ArchiveReaderFactory(required.fieldNames, bc, permissive)
  }
}

private[v2] class ArchiveReaderFactory(
    fields: Array[String],
    conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.sql.graftbridge.bridge.SerConf],
    permissive: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ap = partition.asInstanceOf[ArchivePartition]
    new PartitionReader[InternalRow] {
      private val hp = new HadoopPath(ap.path)
      private var stream: java.io.InputStream = _
      private val it = {
        val decoded = ArchiveSource.decodeStream(ap.path, () => {
          stream = hp.getFileSystem(conf.value.value).open(hp)
          stream
        })
        // on trip the stream is closed by this reader's close()
        if (permissive) ArchiveSource.truncateOnCorruption(decoded, () => ())
        else decoded
      }
      private val pathUtf = UTF8String.fromString(ap.path)
      private var current: (String, String) = _
      // resolve field names to slots ONCE — the row loop is the scan's hot
      // path and must not pattern-match strings or allocate Seqs per row
      private val slots: Array[Int] = fields.map {
        case "path" => 0
        case "member" => 1
        case "line" => 2
      }
      private val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(slots.length)

      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false

      override def get(): InternalRow = {
        var i = 0
        while (i < slots.length) {
          row.update(i, slots(i) match {
            case 0 => pathUtf
            case 1 => UTF8String.fromString(current._1)
            case 2 => UTF8String.fromString(current._2)
          })
          i += 1
        }
        row
      }

      override def close(): Unit = if (stream != null) stream.close()
    }
  }
}
