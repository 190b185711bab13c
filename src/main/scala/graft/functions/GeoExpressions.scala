package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `nearest_entry(lat, lon, cands)` — argmin-by-haversine over a
  * candidate array of (lat, lon, city, country) structs, returning the
  * winning (city, country) struct; ties break on (city, country) like the
  * declarative `array_min(transform(...))` form it replaces.
  *
  * The composable form runs interpreted (higher-order functions are
  * CodegenFallback) and allocates a scored struct per candidate per row;
  * this expression is ONE codegen'd loop with no allocation until the
  * result — the hot-path shape for `Geo.reverseGeocodeBucketed` where
  * every grid point of a 100 TB ETL pass evaluates it. The distance
  * formula replicates `Geo.haversineKm` operation-for-operation, so both
  * paths pick identical winners on well-formed candidates.
  *
  * Degenerate candidates are SKIPPED rather than crashed on or scored:
  * null array elements, null lat/lon/city/country fields, and NaN
  * distances (NaN probe or candidate coordinates) never win; if no valid
  * candidate remains the result is null. (The array_min form it replaces
  * NPE-free but nondeterministically ranked NaN-scored structs; skipping
  * is the deliberate, saner contract.)
  */
case class NearestEntry(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  private val candType = StructType(Seq(
    StructField("lat", DoubleType), StructField("lon", DoubleType),
    StructField("city", StringType), StructField("country", StringType)))

  override def dataType: DataType = StructType(Seq(
    StructField("city", StringType), StructField("country", StringType)))
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, ArrayType(candType))
  override def nullable: Boolean = true

  override def nullSafeEval(latV: Any, lonV: Any, candsV: Any): Any = {
    val lat = latV.asInstanceOf[Double]
    val lon = lonV.asInstanceOf[Double]
    val arr = candsV.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      var bestD = Double.PositiveInfinity
      var bestCity: UTF8String = null
      var bestCountry: UTF8String = null
      var i = 0
      while (i < n) {
        val skip = arr.isNullAt(i) || {
          val c = arr.getStruct(i, 4)
          c.isNullAt(0) || c.isNullAt(1) || c.isNullAt(2) || c.isNullAt(3)
        }
        if (!skip) {
          val c = arr.getStruct(i, 4)
          val d = NearestEntry.haversineKm(lat, lon, c.getDouble(0), c.getDouble(1))
          if (!java.lang.Double.isNaN(d)) {
            val city = c.getUTF8String(2)
            val country = c.getUTF8String(3)
            val better =
              if (bestCity == null) true
              else if (d != bestD) d < bestD
              else {
                val cc = city.compareTo(bestCity)
                cc < 0 || (cc == 0 && country.compareTo(bestCountry) < 0)
              }
            if (better) {
              bestD = d
              bestCity = city.clone() // detach from possibly-reused buffers
              bestCountry = country.clone()
            }
          }
        }
        i += 1
      }
      if (bestCity == null) null
      else new GenericInternalRow(Array[Any](bestCity, bestCountry))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon, cands) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestCity = ctx.freshName("bestCity")
      val bestCountry = ctx.freshName("bestCountry")
      val city = ctx.freshName("city")
      val country = ctx.freshName("country")
      val better = ctx.freshName("better")
      val cmp = ctx.freshName("cmp")
      val utf8 = classOf[UTF8String].getName
      val row = classOf[InternalRow].getName
      val generic = classOf[GenericInternalRow].getName
      s"""
         |final int $n = $cands.numElements();
         |double $bestD = Double.POSITIVE_INFINITY;
         |$utf8 $bestCity = null;
         |$utf8 $bestCountry = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($cands.isNullAt($i)) continue;
         |  final $row $c = $cands.getStruct($i, 4);
         |  if ($c.isNullAt(0) || $c.isNullAt(1) || $c.isNullAt(2) || $c.isNullAt(3)) continue;
         |  final double $d = graft.functions.NearestEntry.haversineKm(
         |    $lat, $lon, $c.getDouble(0), $c.getDouble(1));
         |  if (Double.isNaN($d)) continue;
         |  final $utf8 $city = $c.getUTF8String(2);
         |  final $utf8 $country = $c.getUTF8String(3);
         |  boolean $better;
         |  if ($bestCity == null) { $better = true; }
         |  else if ($d != $bestD) { $better = $d < $bestD; }
         |  else {
         |    final int $cmp = $city.compareTo($bestCity);
         |    $better = $cmp < 0 ||
         |      ($cmp == 0 && $country.compareTo($bestCountry) < 0);
         |  }
         |  if ($better) {
         |    $bestD = $d;
         |    $bestCity = $city.clone();
         |    $bestCountry = $country.clone();
         |  }
         |}
         |if ($bestCity == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new $generic(new Object[]{$bestCity, $bestCountry});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestEntry =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "nearest_entry"
}

object NearestEntry {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.call_function

  /** Same ops in the same order as the declarative `Geo.haversineKm`
    * (Spark's sin/cos/pow/asin/sqrt lower to java.lang.Math), so the
    * expression and Column forms are bit-identical. */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    6371.0 * 2.0 * math.asin(math.sqrt(a))
  }

  val info: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("nearest_entry"),
    new ExpressionInfo(classOf[NearestEntry].getName, "nearest_entry"),
    (children: Seq[Expression]) => NearestEntry(children(0), children(1), children(2)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)

  def nearestEntry(lat: Column, lon: Column, cands: Column): Column =
    call_function("nearest_entry", lat, lon, cands)
}
