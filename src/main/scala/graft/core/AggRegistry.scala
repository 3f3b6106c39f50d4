package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Named aggregate-function registry.
 *
 * The reference passes Python callables `List[str] -> scalar` to
 * `aggregate` (reference: dataframe.py:977, udfs.py throughout); output
 * columns are named `inputcol:funcname` (dataframe.py:1024). Here every
 * named function compiles to a native Catalyst aggregate expression so it
 * runs as a partial (map-side) aggregation with codegen — no collect_list
 * funnel, which is what makes the same API survive 100 TB group-bys.
 */
object AggRegistry {

  /** User-registered aggregate functions (§2.14 extension surface: the
    * reference accepts arbitrary Python callables; here custom names map
    * to Column-expression builders and run as native aggregates). */
  private val custom =
    new java.util.concurrent.ConcurrentHashMap[String, Column => Column]()

  def register(name: String, builder: Column => Column): Unit = {
    // refuse to shadow a builtin: the registry is JVM-global and a
    // redefined "sum" would silently change every session's aggregates
    val isBuiltin =
      try { builtinExpr(name, lit(1)); true }
      catch { case _: IllegalArgumentException => false }
    require(!isBuiltin, s"cannot override builtin aggregate '$name'")
    custom.put(name, builder)
  }

  /** Build the aggregate expression for a named function over a column.
    * Covers the reference udfs.py function library (udfs.py:9-413). */
  def expr(funcName: String, c: Column): Column =
    Option(custom.get(funcName)).map(_(c)).getOrElse(builtinExpr(funcName, c))

  private def builtinExpr(funcName: String, c: Column): Column = funcName match {
    case "count" | "get_len" | "get_array_len" => count(c)
    case "get_non_empty_len" => count(when(c.cast(StringType) =!= "", 1))
    case "uniq_count"        => countDistinct(c)
    case "approx_uniq_count" => approx_count_distinct(c)
    // distinct count over comma-split cell values (udfs.py:39-45)
    case "uniq_len" =>
      size(array_distinct(flatten(collect_list(split(c.cast(StringType), ",")))))
    case "sum" | "sumfloat" => sum(c.cast(DoubleType))
    // sumint truncates each value like int(float(x)) (udfs.py:195-199)
    case "sumint"  => sum(c.cast(DoubleType).cast(LongType))
    case "min" | "minfloat" | "minfloat_failsafe" => min(c.cast(DoubleType))
    case "max" | "maxfloat" | "maxfloat_failsafe" => max(c.cast(DoubleType))
    case "minint" | "minint_failsafe" => min(c.cast(DoubleType).cast(LongType))
    case "maxint" | "maxint_failsafe" => max(c.cast(DoubleType).cast(LongType))
    case "minstr" => min(c.cast(StringType))
    case "maxstr" => max(c.cast(StringType))
    case "mean" | "avg" => avg(c.cast(DoubleType))
    // stdev, 0 when n < 2 (udfs.py:67-75)
    case "std_dev" => coalesce(stddev_samp(c.cast(DoubleType)), lit(0.0))
    // mkstr family drops blank cells like the reference (udfs.py:77-83
    // filters len(strip())==0); `when` without otherwise -> null, which
    // collect_list skips
    case "mkstr" =>
      concat_ws(",", collect_list(when(trim(c.cast(StringType)) =!= "", c.cast(StringType))))
    case "sorted_mkstr" =>
      array_join(array_sort(collect_list(
        when(trim(c.cast(StringType)) =!= "", c.cast(StringType)))), ",")
    // %.4f formatting - format_number would insert thousands separators
    // that collide with the list separator
    case "mkstr4f" =>
      concat_ws(",", collect_list(when(trim(c.cast(StringType)) =!= "",
        format_string("%.4f", c.cast(DoubleType)))))
    case "uniq_mkstr" =>
      array_join(array_sort(array_distinct(collect_list(
        when(trim(c.cast(StringType)) =!= "", c.cast(StringType))))), ",")
    // comma-split aware distinct merge (udfs.py:47-61, 212-219)
    case "merge_uniq" | "split_merge_uniq_mkstr" =>
      array_join(
        array_sort(array_remove(array_distinct(
          flatten(collect_list(split(c.cast(StringType), ",")))), "")),
        ",")
    case "first" => first(c, ignoreNulls = false)
    case "last"  => last(c, ignoreNulls = false)
    // exact interpolated percentiles, matching the reference's
    // sorted-list quantiles (udfs.py:227-248); `median`/`percentile` are
    // exact builtins (linear interpolation, same as quantile_cont)
    case "median" | "quantile2" => median(c.cast(DoubleType))
    // multi-quantile results render as CSV cells, keeping the string-cell
    // convention (reference quantile4/10 return joined strings)
    case "quantile4" =>
      array_join(transform(
        percentile(c.cast(DoubleType), array(lit(0.25), lit(0.5), lit(0.75))),
        v => v.cast(StringType)), ",")
    case "quantile10" =>
      array_join(transform(
        percentile(c.cast(DoubleType),
          array((1 to 9).map(i => lit(i / 10.0)): _*)),
        v => v.cast(StringType)), ",")
    case "approx_median" =>
      percentile_approx(c.cast(DoubleType), lit(0.5), lit(10000))
    case "get_range_int" =>
      max(c.cast(DoubleType).cast(LongType)) - min(c.cast(DoubleType).cast(LongType))
    case other =>
      throw new IllegalArgumentException(s"unknown aggregate function '$other'")
  }

  /** Output column name convention `inputcol:funcname` (dataframe.py:1024). */
  def outputName(aggCol: String, funcName: String): String =
    s"$aggCol:$funcName"
}
