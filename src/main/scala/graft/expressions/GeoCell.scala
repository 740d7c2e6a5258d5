package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic grid-cell quantizer: the Spark-native stand-in for the
  * reference's remote H3 Lambda UDF `lat_lng_to_cell_address(lat, lon, res)`
  * (declared `sql/gold/create_uid_hourly_h3.sql:24-26`, applied at `:61` on
  * post-aggregation AVG(lat)/AVG(lon)).
  *
  * Role parity, not bit parity: the H3 cell's only job in the reference is to
  * be an *equi-joinable spatial key* ("equality on cell id instead of distance
  * math", `README.md:130`). We quantize to a square grid where
  * `width = 1 / 2^res` degrees and emit `"res:floor(lat*2^res):floor(lon*2^res)"`.
  * This is SQL-expressible (`concat(res, ':', floor(lat*pow(2,res)), ':', ...)`)
  * so the DuckDB oracle can compute the identical key. Divergence from true
  * hexagonal adjacency is documented in SURVEY.md §7.5.
  *
  * Implemented as a native Catalyst Expression with codegen (no UDF): stays
  * inside WholeStageCodegen at full scan width.
  */
case class GeoCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql], not nameable here
  override def inputTypes = Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = StringType
  override def prettyName: String = "geo_cell"

  override def nullSafeEval(lat: Any, lon: Any, res: Any): Any =
    UTF8String.fromString(
      GeoCell.cellId(lat.asInstanceOf[Double], lon.asInstanceOf[Double], res.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon, res) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.expressions.GeoCell.cellId($lat, $lon, $res));""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GeoCell {
  /** width = 1/2^res degrees; floor-quantize each axis. Pure, deterministic. */
  def cellId(lat: Double, lon: Double, res: Int): String = {
    val scale = (1L << res).toDouble
    val y = math.floor(lat * scale).toLong
    val x = math.floor(lon * scale).toLong
    s"$res:$y:$x"
  }
}
