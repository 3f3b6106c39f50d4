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

    // remaining multi-word verbs (single-word names — sort, take, union,
    // select, distinct, aggregate, transform, ... — delegate by identical
    // spelling and need no alias)
    def add_col_prefix(p: String, cols: String*): XDF = x.addColPrefix(p, cols: _*)
    def add_empty_cols_if_missing(cols: String*): XDF = x.addEmptyColsIfMissing(cols: _*)
    def add_map_as_row(mp: Map[String, String], defaultVal: String = null): XDF =
      x.addMapAsRow(mp, defaultVal)
    def base64_encode_inline(cols: String*): XDF = x.base64EncodeInline(cols: _*)
    def base64_decode_inline(cols: String*): XDF = x.base64DecodeInline(cols: _*)
    def concat_as_cols(o: XDF, oc: Seq[String], ooc: Seq[String]): XDF =
      x.concatAsCols(o, oc, ooc)
    def custom_func(f: XDF => XDF): XDF = x.customFunc(f)
    def drop_cols_with_prefix(p: String): XDF = x.dropColsWithPrefix(p)
    def drop_cols_with_prefix_except(p: String, keep: String*): XDF =
      x.dropColsWithPrefixExcept(p, keep: _*)
    def drop_cols_with_suffix(s: String): XDF = x.dropColsWithSuffix(s)
    def filter_json_by_xpath(c: String, path: String, pred: Column => Column): XDF =
      x.filterJsonByXpath(c, path, pred)
    def gt_str(c: String, v: String): XDF = x.gtStr(c, v)
    def lt_str(c: String, v: String): XDF = x.ltStr(c, v)
    def is_nonzero_float(c: String): XDF = x.isNonzeroFloat(c)
    def not_startswith(c: String, v: String): XDF = x.notStartswith(c, v)
    def not_endswith(c: String, v: String): XDF = x.notEndswith(c, v)
    def ratio_const(n: String, num: String, den: Double, default: Double = 0.0): XDF =
      x.ratioConst(n, num, den, default)
    def replace_prefix(o: String, n: String): XDF = x.replacePrefix(o, n)
    def replace_suffix(o: String, n: String): XDF = x.replaceSuffix(o, n)
    def resolve_url_encoded_cols(cols: String*): XDF = x.resolveUrlEncodedCols(cols: _*)
    def reverse_numerical_sort(cols: String*): XDF = x.reverseNumericalSort(cols: _*)
    def sample_group_by_topk_if_reached_limit(limit: Long, g: Seq[String],
                                              s: String, k: Int): XDF =
      x.sampleGroupByTopkIfReachedLimit(limit, g, s, k)
    def select_and_add_empty_cols_if_missing(cols: String*): XDF =
      x.selectAndAddEmptyColsIfMissing(cols: _*)
    def select_cols_with_cond_exists(pred: Column => Column,
                                     keep: Seq[String] = Nil): XDF =
      x.selectColsWithCondExists(pred, keep)
    def select_rows_with_cond_exists(cols: Seq[String],
                                     pred: Column => Column): XDF =
      x.selectRowsWithCondExists(cols, pred)
    def show_group_count(cols: Seq[String], n: Int = 20): XDF =
      x.showGroupCount(cols, n)
    def to_csv_text(): XDF = x.toCsvText()
    def to_maps(): Seq[Map[String, String]] = x.toMaps()
    def transform_inline_log(cols: String*): XDF = x.transformInlineLog(cols: _*)
    def transform_inline_log2(cols: String*): XDF = x.transformInlineLog2(cols: _*)
    def transform_inline_log10(cols: String*): XDF = x.transformInlineLog10(cols: _*)
    def transform_inline_log1p(cols: String*): XDF = x.transformInlineLog1p(cols: _*)

    // filters / predicates (reference single-arg callback forms)
    def filter(c: String, pred: Column => Column): XDF =
      x.filterAnyCols(Seq(c), pred)
    def exclude_filter(c: String, pred: Column => Column): XDF =
      x.filterAnyCols(Seq(c), col => !pred(col))
    def ge_str(c: String, v: String): XDF = x.geStr(c, v)
    def le_str(c: String, v: String): XDF = x.leStr(c, v)
    def not_eq(c: String, v: String): XDF = x.notEqStr(c, v)
    // Deprecated in the reference (dataframe.py:304-307) and delegates to
    // the FLOAT test there — the int path would truncate "0.5" to 0 and drop it.
    def is_nonzero(c: String): XDF = x.isNonzeroFloat(c)
    def not_match(c: String, p: String): XDF = x.notRegexMatch(c, p)
    def cap_min(c: String, v: Double): XDF = x.capMinInline(c, v)
    def cap_max(c: String, v: Double): XDF = x.capMaxInline(c, v)
    def has_col(c: String): Boolean = x.getHeader.contains(c)
    def get_header_fields(): Seq[String] = x.getHeader
    def get_columns(): Seq[String] = x.getHeader
    def get_col_index(c: String): Int = x.getHeader.indexOf(c)
    def is_empty(): Boolean = x.toDF.isEmpty
    def first_value_with_default_if_missing(c: String, default: String = ""): String =
      if (x.getHeader.contains(c)) x.firstValueWithDefault(c, default) else default

    // sampling family (core.Sampling delegations, chainable)
    private def S = graft.core.Sampling
    def sample(ratio: Double, seed: Long = 0L): XDF = XDF(S.sample(x.toDF, ratio, seed))
    def sample_n(n: Int, seed: Long = 0L): XDF = XDF(S.sampleN(x.toDF, n, seed))
    def sample_rows(n: Int, seed: Long = 0L): XDF = sample_n(n, seed)
    def sample_n_with_replacement(n: Int, seed: Long = 0L): XDF =
      XDF(S.sampleNWithReplacement(x.toDF, n, seed))
    def sample_n_without_replacement(n: Int, seed: Long = 0L): XDF = sample_n(n, seed)
    // The reference forms take a sampling RATIO and delegate to sample()
    // (dataframe.py:2860-2866); with_replacement=True raises there
    // (dataframe.py:2838-2839) — mirror both so a port keeps its meaning.
    def sample_without_replacement(ratio: Double, seed: Long = 0L): XDF =
      sample(ratio, seed)
    def sample_with_replacement(ratio: Double, seed: Long = 0L): XDF =
      throw new UnsupportedOperationException(
        "sample_with_replacement: ratio-based sampling with replacement is " +
          "not implemented (matches the reference); use sample_n_with_replacement(n)")
    def sample_n_with_warn(limit: Int, seed: Long = 0L): XDF =
      XDF(S.sampleNWithWarn(x.toDF, limit, seed))
    def sample_class(c: String, v: String, ratio: Double, seed: Long,
                     gateCols: Seq[String]): XDF =
      XDF(S.sampleClass(x.toDF, c, v, ratio, seed, gateCols))
    def sample_class_by_max_values(c: String, n: Int, seed: Long = 0L): XDF =
      XDF(S.sampleClassByMaxValues(x.toDF, c, n, seed))
    def sample_class_by_min_class_count(c: String, seed: Long = 0L): XDF =
      XDF(S.sampleClassByMinClassCount(x.toDF, c, seed))
    def sample_column_by_max_uniq_values(c: String, maxUniq: Int, seed: Long = 0L): XDF =
      XDF(S.sampleColumnByMaxUniqValues(x.toDF, c, maxUniq, seed))
    def sample_group_by_col_value(g: Seq[String], c: String, v: String,
                                  ratio: Double, seed: Long = 0L): XDF =
      XDF(S.sampleGroupByColValue(x.toDF, g, c, v, ratio, seed))
    def sample_group_by_key(g: Seq[String], ratio: Double, seed: Long = 0L): XDF =
      XDF(S.sampleGroupByKey(x.toDF, g, ratio, seed))
    // The reference defaults use_approx=True and dispatches to the approx
    // variant (dataframe.py:3181-3189); the exact path is opt-out.
    def sample_group_by_max_uniq_values(g: Seq[String], c: String, maxUniq: Int,
                                        seed: Long = 0L,
                                        use_approx: Boolean = true): XDF =
      if (use_approx) XDF(S.sampleGroupByMaxUniqValuesApprox(x.toDF, g, c, maxUniq, seed))
      else XDF(S.sampleGroupByMaxUniqValues(x.toDF, g, c, maxUniq, seed))
    def sample_group_by_max_uniq_values_exact(g: Seq[String], c: String,
                                              maxUniq: Int, seed: Long = 0L): XDF =
      XDF(S.sampleGroupByMaxUniqValues(x.toDF, g, c, maxUniq, seed))
    def sample_group_by_max_uniq_values_approx(g: Seq[String], c: String,
                                               maxUniq: Int, seed: Long = 0L): XDF =
      XDF(S.sampleGroupByMaxUniqValuesApprox(x.toDF, g, c, maxUniq, seed))
    def sample_group_by_max_uniq_values_per_class(g: Seq[String], classCol: String,
        c: String, caps: Map[String, Int], defMaxUniq: Option[Int] = None): XDF =
      XDF(S.sampleGroupByMaxUniqValuesPerClass(x.toDF, g, classCol, c, caps, defMaxUniq))
    def split_batches(cols: Seq[String], n: Int, seed: Long = 0L): Seq[XDF] =
      S.splitBatches(x.toDF, cols, n, seed).map(XDF(_))

    // reshaping (core.Reshape / JsonFlattener delegations)
    private def R = graft.core.Reshape
    def split_str(cols: Seq[String], sep: String, prefix: String): XDF =
      XDF(R.splitStr(x.toDF, cols, sep, prefix))
    def replicate_rows(countCol: String, maxRepl: Int = 10000): XDF =
      XDF(R.replicateRows(x.toDF, countCol, maxRepl))
    def transpose(n: Int = 1): XDF = XDF(R.transpose(x.toDF, n))
    def reverse_transpose(g: Seq[String], keyCol: String, valCol: String): XDF =
      XDF(R.reverseTranspose(x.toDF, g, keyCol, valCol))
    def explode_json(jsonCol: String, prefix: String): XDF =
      XDF(graft.core.JsonFlattener.explodeJson(x.toDF, jsonCol, prefix))
    def explode_json_v2(jsonCol: String, prefix: String): XDF =
      explode_json(jsonCol, prefix)

    // windows (core.WindowOps delegation)
    def window_aggregate(winCol: String, aggCols: Seq[String],
                         aggFuncs: Seq[String], winSize: Int): XDF =
      XDF(graft.core.WindowOps.windowAggregate(x.toDF, winCol, aggCols,
        aggFuncs, winSize))

    // diagnostics (core.Display delegations; chainable like the reference)
    def print_stats(msg: String = ""): XDF = {
      graft.core.Display.printStats(x.toDF, msg); x
    }
    def show_transpose(n: Int = 3): XDF = {
      graft.core.Display.showTranspose(x.toDF, n); x
    }
    def size_in_bytes(): Long = graft.core.Display.sizeInBytes(x.toDF)
    def size_in_mb(): Long = size_in_bytes() / (1024L * 1024L)
    def size_in_gb(): Long = size_in_bytes() / (1024L * 1024L * 1024L)

    // deprecated-in-reference aliases, kept for drop-in parity
    def eq(c: String, v: String): XDF = x.eqStr(c, v)
    def lt(c: String, v: Double): XDF = x.ltFloat(c, v)
    def le(c: String, v: Double): XDF = x.leFloat(c, v)
    def gt(c: String, v: Double): XDF = x.gtFloat(c, v)
    def ge(c: String, v: Double): XDF = x.geFloat(c, v)
    def `match`(c: String, p: String): XDF = x.regexMatch(c, p)
    def drop(cols: String*): XDF = x.dropCols(cols: _*)
    def drop_if_exists(cols: String*): XDF = x.dropColsIfExists(cols: _*)
    def skip(n: Int): XDF = x.skipRows(n)
    def last(n: Int): XDF = x.lastRows(n)
    def copy(c: String, newCol: String): XDF = x.copyCol(c, newCol)
    def reorder_reverse(cols: String*): XDF = x.reverseReorder(cols: _*)

    // new-column codec variants (reference url_encode(col, newcol) family)
    private def F = org.apache.spark.sql.functions
    def url_encode(c: String, newCol: String): XDF =
      XDF(x.toDF.withColumn(newCol, F.url_encode(F.col(c).cast("string"))))
    def url_decode(c: String, newCol: String): XDF =
      XDF(x.toDF.withColumn(newCol, F.url_decode(F.col(c).cast("string"))))
    def base64_encode(c: String, newCol: String): XDF =
      XDF(x.toDF.withColumn(newCol,
        F.base64(F.col(c).cast("string").cast("binary"))))
    def base64_decode(c: String, newCol: String): XDF =
      XDF(x.toDF.withColumn(newCol, F.unbase64(F.col(c)).cast("string")))

    // typed column extraction + content accessors
    def col_as_float_array(c: String): Seq[Double] =
      x.colAsArray(c).map(_.toDouble)
    def col_as_int_array(c: String): Seq[Long] =
      x.colAsArray(c).map(v => v.toDouble.toLong)
    def col_as_array_uniq_non_empty(c: String): Seq[String] =
      x.colAsArrayUniq(c).filter(v => v != null && v.nonEmpty)
    def get_column(c: String): Seq[String] = x.colAsArray(c)
    def get_column_index(c: String): Int = x.getHeader.indexOf(c)
    def get_header_map(): Map[String, Int] = x.getHeader.zipWithIndex.toMap
    def get_hash(): String = graft.core.Display.contentHash(x.toDF).toString
    def get_size_in_bytes(): Long = size_in_bytes()
    def has_empty_header(): Boolean = x.getHeader.isEmpty
    def to_string(): String =
      s"Header: ${x.getHeader}, Data: ${x.numRows()}"
    def to_maps_with_empty_data(): Seq[Map[String, String]] =
      if (x.toDF.isEmpty) Seq.empty else x.toMaps()

    // multi-col exists family (reference select_rows_with_cols_cond_exists
    // = keep rows where ANY/ALL matching col satisfies the predicate)
    def select_rows_with_cols_cond_exists(cols: Seq[String],
                                          pred: Column => Column): XDF =
      x.filterAnyCols(cols, pred)
    def select_any_cols_with_cond_exists_filter(cols: Seq[String],
                                                pred: Column => Column): XDF =
      x.filterAnyCols(cols, pred)
    def select_any_cols_with_cond_exists_exclude_filter(cols: Seq[String],
                                                        pred: Column => Column): XDF =
      x.where(!graft.core.ColumnResolver.resolve(cols, x.getHeader)
        .map(c => pred(F.col(c))).reduce(_ || _))
    def select_all_cols_with_cond_exists_filter(cols: Seq[String],
                                                pred: Column => Column): XDF =
      x.filterAllCols(cols, pred)
    def select_all_cols_with_cond_exists_exclude_filter(cols: Seq[String],
                                                        pred: Column => Column): XDF =
      x.where(!graft.core.ColumnResolver.resolve(cols, x.getHeader)
        .map(c => pred(F.col(c))).reduce(_ && _))

    // remaining log transforms
    def transform_inline_log1p_base2(cols: String*): XDF =
      x.transformInline(cols, c =>
        org.apache.spark.sql.functions.log1p(c.cast("double")) /
          math.log(2.0))
    def transform_inline_log1p_base10(cols: String*): XDF =
      x.transformInline(cols, c =>
        org.apache.spark.sql.functions.log1p(c.cast("double")) /
          math.log(10.0))

    // generic join (reference join(..., join_type)); the typed verbs
    // (inner_join/left_join/...) remain the first-class API
    def join(o: XDF, lk: Seq[String], rk: Seq[String] = Nil,
             join_type: String = "inner"): XDF = join_type match {
      case "inner" => x.innerJoin(o, lk, rk)
      case "left" | "left_outer" => x.leftJoin(o, lk, rk)
      case "right" | "right_outer" => x.rightJoin(o, lk, rk)
      case "outer" | "full" | "full_outer" => x.outerJoin(o, lk, rk)
      case other => throw new IllegalArgumentException(
        s"join: unknown join_type: $other")
    }

    // reshape escape hatches + deprecated spellings
    def explode(cols: Seq[String],
                f: Map[String, String] => Seq[Map[String, String]],
                prefix: String, collapse: Boolean = true): XDF =
      XDF(R.explodeMaps(x.toDF, cols, f, prefix, collapse))
    def flatmap(arrayExpr: Column, newCol: String): XDF =
      XDF(R.flatmapCol(x.toDF, arrayExpr, newCol))
    def split(cols: Seq[String], sep: String, prefix: String): XDF =
      split_str(cols, sep, prefix)
    def resolve_template_col_inline(templateCol: String, newCol: String): XDF =
      x.resolveTemplateCol(templateCol, newCol)

    // IO / export
    def write(path: String, sep: String = "\t"): XDF = {
      graft.sources.TsvIO.write(x.toDF, path, sep); x
    }
    def export_to_maps(): Seq[Map[String, String]] = x.toMaps()
    def to_simple_df(): XDF = x
    def columns(): Seq[String] = x.getHeader
    def get_data_fields(): Seq[Seq[String]] = x.toTuples()
    def get_content_as_string(): String =
      x.toTuples().map(_.mkString("\t")).mkString(
        x.getHeader.mkString("\t") + "\n", "\n", "\n")
    def get_max_size_cols_stats(topN: Int = 10): Seq[(String, Int)] =
      graft.core.Display.maxSizeColsStats(x.toDF, topN)

    // console / logging chainables (reference debug utilities)
    def show_sample(n: Int = 100): XDF = { x.show(n); x }
    def show_transpose_non_empty(n: Int = 3): XDF = {
      graft.core.Display.showTranspose(
        graft.core.XDF(x.toDF).dropEmptyCols().toDF, n); x
    }
    def print(msg: String): XDF = { Console.println(msg); x }
    def warn(msg: String): XDF = { graft.core.Log.warn(msg); x }
    def warn_once(msg: String): XDF = { graft.core.Log.warnOnce(msg); x }
    def warn_if_limit_reached(limit: Long, msg: String): XDF = {
      if (x.numRows() > limit) graft.core.Log.warn(msg); x
    }
    def sleep(ms: Long): XDF = { Thread.sleep(ms); x }
    def validate(): XDF = x.noop()
    def enable_trace_mode(): XDF = { graft.core.Log.level = 0; x }
    def enable_debug_mode(): XDF = { graft.core.Log.level = 1; x }
    def enable_info_mode(): XDF = { graft.core.Log.level = 2; x }
    def disable_trace_mode(): XDF = { graft.core.Log.level = 1; x }
    def disable_debug_mode(): XDF = { graft.core.Log.level = 2; x }
    def disable_info_mode(): XDF = { graft.core.Log.level = 3; x }
    def show_select_func(pred: String => Boolean, n: Int = 20): XDF = {
      x.select(x.getHeader.filter(pred): _*).show(n); x
    }
    def show_custom_func(f: XDF => XDF, n: Int = 20): XDF = { f(x).show(n); x }
    def show_transpose_custom_func(f: XDF => XDF, n: Int = 3): XDF = {
      graft.core.Display.showTranspose(f(x).toDF, n); x
    }
    def show_transpose_sort_cols(n: Int = 3): XDF = {
      graft.core.Display.showTranspose(
        x.select(x.getHeader.sorted: _*).toDF, n); x
    }
    def show_transpose_non_empty_sort_cols(n: Int = 3): XDF = {
      graft.core.Display.showTranspose(graft.core.XDF(x.toDF)
        .dropEmptyCols().customFunc(d =>
          d.select(d.getHeader.sorted: _*)).toDF, n); x
    }
    def serialize_as_string(): String =
      x.getHeader.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString("\t") +
        "\n" + x.toTuples().map(_.map(v =>
          java.net.URLEncoder.encode(if (v == null) "" else v, "UTF-8"))
          .mkString("\t")).mkString("\n")
    def select_rows_and_cols_with_cond_exists(cols: Seq[String],
                                              pred: Column => Column): XDF =
      x.filterAnyCols(cols, pred).selectColsWithCondExists(pred)
    def resolve_url_encoded_list_cols(): XDF = {
      val targets = x.getHeader.filter(c =>
        c.endsWith(":url_encoded:uniq_mkstr") || c.endsWith(":url_encoded:mkstr"))
      val decoded = targets.foldLeft(x)((d, c) =>
        d.transformInline(Seq(c), v =>
          F.concat_ws(",", F.transform(F.split(v.cast("string"), ","),
            e => F.url_decode(e)))))
      decoded.getHeader.filter(c => c.endsWith(":url_encoded:uniq_mkstr") ||
          c.endsWith(":url_encoded:mkstr"))
        .foldLeft(decoded)((d, c) => XDF(d.toDF.withColumnRenamed(c,
          c.replace(":url_encoded:", ":"))))
    }
  }
}
