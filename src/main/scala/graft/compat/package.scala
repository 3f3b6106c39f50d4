package graft

import org.apache.spark.sql.Column
import graft.core.XDF

/**
 * snake_case compatibility surface: `import graft.compat._` lets code
 * written against the reference API (reference: python-packages/core/src/
 * omigo_core/dataframe.py method names) read unchanged on XDF. Pure
 * delegation — every alias compiles to the same Catalyst plan.
 */
package object compat {

  implicit class SnakeCaseXDF(val x: XDF) extends AnyVal {
    // projections / columns
    def not_select(cols: String*): XDF = x.notSelect(cols: _*)
    def drop_cols(cols: String*): XDF = x.dropCols(cols: _*)
    def drop_cols_if_exists(cols: String*): XDF = x.dropColsIfExists(cols: _*)
    def drop_empty_cols(): XDF = x.dropEmptyCols()
    def drop_empty_rows(): XDF = x.dropEmptyRows()
    def add_prefix(p: String): XDF = x.addPrefix(p)
    def add_suffix(s: String): XDF = x.addSuffix(s)
    def remove_prefix(p: String): XDF = x.removePrefix(p)
    def remove_suffix(s: String): XDF = x.removeSuffix(s)
    def rename_prefix(o: String, n: String): XDF = x.renamePrefix(o, n)
    def rename_suffix(o: String, n: String): XDF = x.renameSuffix(o, n)
    def reverse_reorder(cols: String*): XDF = x.reverseReorder(cols: _*)
    def add_const(name: String, v: Any): XDF = x.addConst(name, v)
    def add_const_if_missing(name: String, v: Any): XDF = x.addConstIfMissing(name, v)
    def add_seq_num(name: String, orderCols: Seq[String]): XDF = x.addSeqNum(name, orderCols)
    def add_row(values: Seq[Any]): XDF = x.addRow(values)
    def assign_value(name: String, v: Any): XDF = x.assignValue(name, v)

    // filters
    def eq_str(c: String, v: String): XDF = x.eqStr(c, v)
    def not_eq_str(c: String, v: String): XDF = x.notEqStr(c, v)
    def eq_int(c: String, v: Long): XDF = x.eqInt(c, v)
    def not_eq_int(c: String, v: Long): XDF = x.notEqInt(c, v)
    def eq_float(c: String, v: Double): XDF = x.eqFloat(c, v)
    def not_eq_float(c: String, v: Double): XDF = x.notEqFloat(c, v)
    def lt_int(c: String, v: Long): XDF = x.ltInt(c, v)
    def le_int(c: String, v: Long): XDF = x.leInt(c, v)
    def gt_int(c: String, v: Long): XDF = x.gtInt(c, v)
    def ge_int(c: String, v: Long): XDF = x.geInt(c, v)
    def lt_float(c: String, v: Double): XDF = x.ltFloat(c, v)
    def le_float(c: String, v: Double): XDF = x.leFloat(c, v)
    def gt_float(c: String, v: Double): XDF = x.gtFloat(c, v)
    def ge_float(c: String, v: Double): XDF = x.geFloat(c, v)
    def is_nonzero_int(c: String): XDF = x.isNonzeroInt(c)
    def is_empty_str(c: String): XDF = x.isEmptyStr(c)
    def is_nonempty_str(c: String): XDF = x.isNonemptyStr(c)
    def values_in(c: String, vs: Seq[Any]): XDF = x.valuesIn(c, vs)
    def values_not_in(c: String, vs: Seq[Any]): XDF = x.valuesNotIn(c, vs)
    def regex_match(c: String, p: String): XDF = x.regexMatch(c, p)
    def not_regex_match(c: String, p: String): XDF = x.notRegexMatch(c, p)
    def array_matches(c: String, pred: Column => Column): XDF = x.arrayMatches(c, pred)
    def array_value_exists(c: String, v: Any): XDF = x.arrayValueExists(c, v)
    def array_value_find(c: String, v: Any): XDF = x.arrayValueFind(c, v)
    def nested_array_matches(c: String, pred: Column => Column): XDF = x.nestedArrayMatches(c, pred)
    def nested_array_value_exists(c: String, v: Any): XDF = x.nestedArrayValueExists(c, v)
    def nested_array_value_find(c: String, v: Any): XDF = x.nestedArrayValueFind(c, v)

    // transforms
    def transform_inline(cols: Seq[String], f: Column => Column): XDF =
      x.transformInline(cols, f)
    def apply_precision(c: String, p: Int): XDF = x.applyPrecision(c, p)
    def to_int(cols: String*): XDF = x.toInt(cols: _*)
    def to_numeric(cols: String*): XDF = x.toNumeric(cols: _*)
    def cap_min_inline(c: String, v: Double): XDF = x.capMinInline(c, v)
    def cap_max_inline(c: String, v: Double): XDF = x.capMaxInline(c, v)
    def replace_str_inline(cols: Seq[String], from: String, to: String): XDF =
      x.replaceStrInline(cols, from, to)
    def set_missing_values(cols: Seq[String], d: String): XDF = x.setMissingValues(cols, d)
    def url_encode_inline(cols: String*): XDF = x.urlEncodeInline(cols: _*)
    def url_decode_inline(cols: String*): XDF = x.urlDecodeInline(cols: _*)
    def resolve_all_url_encoded_cols(): XDF = x.resolveAllUrlEncodedCols()
    def generate_key_hash(name: String, cols: Seq[String]): XDF =
      x.generateKeyHash(name, cols)
    def resolve_template_col(tpl: String, out: String): XDF = x.resolveTemplateCol(tpl, out)

    // aggregation / group
    def group_count(cols: String*): XDF = x.groupCount(cols: _*)
    def group_by_key(g: Seq[String], a: Seq[String],
                     f: Seq[Map[String, String]] => Map[String, String],
                     outPrefix: String): XDF = x.groupByKey(g, a, f, outPrefix)
    def arg_max(g: Seq[String], s: String, a: Seq[String]): XDF = x.argMax(g, s, a)
    def arg_min(g: Seq[String], s: String, a: Seq[String]): XDF = x.argMin(g, s, a)
    def distinct_cols(cols: String*): XDF = x.distinctCols(cols: _*)
    def cumulative_sum(c: String, n: String, o: Seq[String]): XDF =
      x.cumulativeSum(c, n, o)

    // joins / set ops
    def inner_join(o: XDF, lk: Seq[String], rk: Seq[String] = Nil): XDF =
      x.innerJoin(o, lk, rk)
    def left_join(o: XDF, lk: Seq[String], rk: Seq[String] = Nil): XDF =
      x.leftJoin(o, lk, rk)
    def right_join(o: XDF, lk: Seq[String], rk: Seq[String] = Nil): XDF =
      x.rightJoin(o, lk, rk)
    def outer_join(o: XDF, lk: Seq[String], rk: Seq[String] = Nil): XDF =
      x.outerJoin(o, lk, rk)
    def inner_map_join(o: XDF, lk: Seq[String], rk: Seq[String] = Nil): XDF =
      x.innerMapJoin(o, lk, rk)
    def left_map_join(o: XDF, lk: Seq[String], rk: Seq[String] = Nil): XDF =
      x.leftMapJoin(o, lk, rk)
    def natural_join(o: XDF): XDF = x.naturalJoin(o)
    def merge_union(os: Seq[XDF]): XDF = x.mergeUnion(os)
    def merge_intersect(os: Seq[XDF]): XDF = x.mergeIntersect(os)

    // sorts / limits / collect
    def reverse_sort(cols: String*): XDF = x.reverseSort(cols: _*)
    def numerical_sort(cols: String*): XDF = x.numericalSort(cols: _*)
    def skip_rows(n: Int): XDF = x.skipRows(n)
    def sample_group_by_topk(g: Seq[String], s: String, k: Int): XDF =
      x.sampleGroupByTopk(g, s, k)
    def to_tuples(): Seq[Seq[String]] = x.toTuples()
    def cols_as_map(k: String, v: String): Map[String, String] = x.colsAsMap(k, v)
    def col_as_array(c: String): Seq[String] = x.colAsArray(c)
    def col_as_array_uniq(c: String): Seq[String] = x.colAsArrayUniq(c)
    def to_json_records(): XDF = x.toJsonRecords()
    def num_rows(): Long = x.numRows()
    def num_cols: Int = x.numCols
  }
}
