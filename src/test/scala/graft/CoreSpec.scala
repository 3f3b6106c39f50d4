package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** Specs for ColumnResolver, XDF verbs and AggRegistry on tiny literal
  * tables — the per-operator unit layer under the DuckDB differential gate. */
class CoreSpec extends SparkTestBase {
  import spark.implicits._

  private def iris = XDF(Seq(
    ("5.1", "3.5", "1.4", "0.2", "Iris-setosa"),
    ("4.9", "3.0", "1.4", "0.2", "Iris-setosa"),
    ("6.2", "3.4", "5.4", "2.3", "Iris-virginica"),
    ("5.9", "3.0", "5.1", "1.8", "Iris-virginica"),
    ("5.7", "2.8", "4.1", "1.3", "Iris-versicolor"),
  ).toDF("sepal_length", "sepal_width", "petal_length", "petal_width", "class"))

  test("resolver: exact, regex, not, missing") {
    val h = Seq("sepal_length", "sepal_width", "petal_length", "petal_width", "class")
    assert(ColumnResolver.resolve(Seq("class"), h) == Seq("class"))
    assert(ColumnResolver.resolve(Seq("sepal.*"), h) == Seq("sepal_length", "sepal_width"))
    assert(ColumnResolver.resolve(Seq(".*_width"), h) == Seq("sepal_width", "petal_width"))
    assert(ColumnResolver.resolveNot(Seq("sepal.*"), h) ==
      Seq("petal_length", "petal_width", "class"))
    intercept[IllegalArgumentException] { ColumnResolver.resolve(Seq("nope"), h) }
    assert(ColumnResolver.resolve(Seq("nope"), h, ignoreIfMissing = true).isEmpty)
  }

  test("resolver: prefix/suffix algebra") {
    assert(ColumnResolver.withPrefix("a", "p") == "p:a")
    assert(ColumnResolver.hasPrefix("p:a", "p"))
    assert(ColumnResolver.stripPrefix("p:a", "p") == "a")
    assert(ColumnResolver.withSuffix("a", "s") == "a:s")
    assert(ColumnResolver.stripSuffix("a:s", "s") == "a")
  }

  test("README iris query: eq_str + gt_float + select") {
    val out = iris.eqStr("class", "Iris-setosa").gtFloat("sepal_width", 3.1)
      .select("sepal_width", "sepal_length").toDF.collect()
    assert(out.map(_.toSeq).toSet == Set(Seq("3.5", "5.1")))
  }

  test("snake_case compat surface reads like the reference API") {
    import graft.compat._
    val out = iris.eq_str("class", "Iris-setosa").gt_float("sepal_width", 3.1)
      .select("sepal_width", "sepal_length")
    assert(out.to_tuples() == Seq(Seq("3.5", "5.1")))
    assert(iris.group_count("class").num_rows() == 3)
    assert(iris.distinct_cols("class").num_rows() == 3)
  }

  test("compat: sampling / reshape / diagnostics verbs chain off the frame") {
    import graft.compat._
    import org.apache.spark.sql.Column
    // callback filter pair
    assert(iris.filter("class", (c: Column) => c.endsWith("setosa")).num_rows() == 2)
    assert(iris.exclude_filter("class", (c: Column) => c.endsWith("setosa")).num_rows() == 3)
    // sampling family delegations stay exact-n / deterministic
    assert(iris.sample_n(2, seed = 7).num_rows() == 2)
    assert(iris.sample_class_by_max_values("class", 1, seed = 7).num_rows() == 3)
    assert(iris.split_batches(Seq("class"), 2, seed = 7)
      .map(_.numRows()).sum == 5)
    // reshape: one row per split token, prefixed output col
    val s = XDF(Seq(("a b", 1)).toDF("t", "i"))
    assert(s.split_str(Seq("t"), " ", "p").num_rows() == 2)
    assert(s.split_str(Seq("t"), " ", "p").getHeader.contains("p:t"))
    // header accessors + scalar verb
    assert(iris.has_col("class") && iris.get_col_index("class") >= 0)
    assert(iris.first_value_with_default_if_missing("nope", "dflt") == "dflt")
    assert(!iris.is_empty())
    assert(iris.size_in_bytes() > 0)
    // ge/le string comparisons added for reference parity
    assert(iris.ge_str("class", "Iris-versicolor").num_rows() == 3)
    assert(iris.le_str("class", "Iris-setosa").num_rows() == 2)
  }

  test("compat: join / codecs / reshape / serialize round-trips") {
    import graft.compat._
    import org.apache.spark.sql.Column
    val l = XDF(Seq((1, "a"), (2, "b")).toDF("k", "lv"))
    val r = XDF(Seq((1, "x"), (3, "y")).toDF("k", "rv"))
    assert(l.join(r, Seq("k")).num_rows() == 1)
    assert(l.join(r, Seq("k"), join_type = "left").num_rows() == 2)
    assert(l.join(r, Seq("k"), join_type = "outer").num_rows() == 3)
    // codec new-column variants invert each other
    val enc = XDF(Seq(Tuple1("a b&c")).toDF("t"))
      .url_encode("t", "e").url_decode("e", "d")
    assert(enc.toDF.select("d").head().getString(0) == "a b&c")
    val b64 = XDF(Seq(Tuple1("payload")).toDF("t"))
      .base64_encode("t", "e").base64_decode("e", "d")
    assert(b64.toDF.select("d").head().getString(0) == "payload")
    // split alias == split_str; flatmap explodes the array expr
    val s = XDF(Seq(("a,b", 1)).toDF("t", "i"))
    assert(s.split(Seq("t"), ",", "p").num_rows() == 2)
    assert(s.flatmap(org.apache.spark.sql.functions.split(
      org.apache.spark.sql.functions.col("t"), ","), "tok").num_rows() == 2)
    // rows-and-cols pruning: rows where any col matches, then cols kept
    val m = XDF(Seq(("x", ""), ("", "")).toDF("a", "b"))
    val pruned = m.select_rows_and_cols_with_cond_exists(Seq("a", "b"),
      (c: Column) => c === "x")
    assert(pruned.num_rows() == 1 && pruned.getHeader == Seq("a"))
    // serialize: url-encoded header + rows
    assert(XDF(Seq(Tuple1("v 1")).toDF("c o l")).serialize_as_string()
      == "c+o+l\nv+1")
    // list-col decode strips the :url_encoded: tag and decodes elements
    val lst = XDF(Seq(Tuple1("a%20x,b%26y")).toDF("c:url_encoded:mkstr"))
      .resolve_url_encoded_list_cols()
    assert(lst.getHeader == Seq("c:mkstr"))
    assert(lst.toDF.head().getString(0) == "a x,b&y")
    // window_aggregate delegation
    val w = XDF(Seq(("t1", 1.0), ("t2", 2.0), ("t3", 3.0), ("t4", 4.0))
      .toDF("w", "v")).window_aggregate("w", Seq("v"), Seq("sum"), 2)
    assert(w.num_rows() == 2)
  }

  test("string-typed eq_int matches 3.0 as 3") {
    val df = XDF(Seq(("3.0", "a"), ("3", "b"), ("4", "c")).toDF("x", "tag"))
    assert(df.eqInt("x", 3).toDF.count() == 2)
  }

  test("aggregate: api-doc example, output naming col:func") {
    val out = iris.aggregate(Seq("class"), Seq("petal_length"), Seq("min"))
      .sort(Seq("class")).toDF
    assert(out.columns.toSeq == Seq("class", "petal_length:min"))
    val rows = out.collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("Iris-setosa", 1.4), ("Iris-versicolor", 4.1),
      ("Iris-virginica", 5.1)))
  }

  test("aggregate collapse=false broadcasts group values to rows") {
    val out = iris.aggregate(Seq("class"), Seq("petal_length"), Seq("count"),
      collapse = false).toDF
    assert(out.count() == 5) // row count preserved
    assert(out.filter(col("class") === "Iris-setosa")
      .select("petal_length:count").distinct().head().getLong(0) == 2)
  }

  test("groupByKey multi-out with empty-probe schema") {
    val out = iris.groupByKey(Seq("class"), Seq("petal_length"),
      rows => Map(
        "n" -> rows.length.toString,
        "max" -> (if (rows.isEmpty) "" else rows.map(_("petal_length").toDouble).max.toString)),
      outPrefix = "s").sort(Seq("class")).toDF
    assert(out.columns.toSet == Set("class", "s:max", "s:n"))
    val setosa = out.filter(col("class") === "Iris-setosa").head()
    assert(setosa.getAs[String]("s:n") == "2")
    assert(setosa.getAs[String]("s:max") == "1.4")
  }

  test("agg registry: uniq/mkstr/failsafe/quantile families") {
    val df = Seq(("g", "b,a"), ("g", "a"), ("g", "c")).toDF("k", "v")
    val out = df.groupBy("k").agg(
      AggRegistry.expr("uniq_len", col("v")).as("ul"),
      AggRegistry.expr("merge_uniq", col("v")).as("mu"),
      AggRegistry.expr("uniq_count", col("v")).as("uc"))
      .head()
    assert(out.getAs[Int]("ul") == 3)       // a, b, c after comma-split
    assert(out.getAs[String]("mu") == "a,b,c")
    assert(out.getAs[Long]("uc") == 3)      // "b,a", "a", "c" distinct cells
  }

  test("join suffix semantics and rkey copy") {
    val l = XDF(Seq(("1", "x1"), ("2", "x2")).toDF("id", "val"))
    val r = XDF(Seq(("1", "y1"), ("3", "y3")).toDF("rid", "val"))
    val out = l.leftJoin(r, Seq("id"), Seq("rid"), lsuffix = "l", rsuffix = "r").toDF
    assert(out.columns.toSet == Set("id", "val:l", "val:r", "rid"))
    val m = out.collect().map(r => r.getAs[String]("id") ->
      (r.getAs[String]("val:r"), r.getAs[String]("rid"))).toMap
    assert(m("1") == (("y1", "1")))
    assert(m("2") == ((null, null)))
  }

  test("join: left non-key clashing with a differently-named right KEY") {
    // left's non-key "k2" collides with the rkey copy column — it must be
    // suffixed, not silently duplicated into an ambiguous output
    val l = XDF(Seq(("1", "a"), ("2", "b")).toDF("id", "k2"))
    val r = XDF(Seq(("1", "y1")).toDF("k2", "v"))
    val out = l.leftJoin(r, Seq("id"), Seq("k2"), lsuffix = "l", rsuffix = "r").toDF
    assert(out.columns.toSet == Set("id", "k2:l", "v", "k2"))
    assert(out.columns.count(_ == "k2") == 1)
    val m = out.collect().map(x => x.getAs[String]("id") ->
      (x.getAs[String]("k2:l"), x.getAs[String]("k2"))).toMap
    assert(m("1") == (("a", "1")) && m("2") == (("b", null)))
  }

  test("regexMatch anchors the WHOLE pattern including alternations") {
    val df = XDF(Seq(("foo1"), ("xxbar"), ("bar2")).toDF("s"))
    val out = df.regexMatch("s", "foo|bar").toDF
      .collect().map(_.getString(0)).toSet
    assert(out == Set("foo1", "bar2"), "xxbar must not match ^(foo|bar)")
  }

  test("mergeUnion schema evolution with defaults") {
    val a = XDF(Seq(("1", "a")).toDF("id", "x"))
    val b = XDF(Seq(("2", "b")).toDF("id", "y"))
    val out = a.mergeUnion(Seq(b), defValMap = Map("x" -> "-", "y" -> "-")).toDF
    assert(out.columns.toSet == Set("id", "x", "y"))
    val rows = out.collect().map(r =>
      (r.getAs[String]("id"), r.getAs[String]("x"), r.getAs[String]("y"))).toSet
    assert(rows == Set(("1", "a", "-"), ("2", "-", "b")))
  }

  test("sort auto-numeric vs lexicographic") {
    val df = XDF(Seq("10", "9", "100").toDF("x"))
    assert(df.sort(Seq("x")).toDF.collect().map(_.getString(0)).toSeq ==
      Seq("10", "100", "9"))
    assert(df.numericalSort("x").toDF.collect().map(_.getString(0)).toSeq ==
      Seq("9", "10", "100"))
  }

  test("dropEmptyCols / dropEmptyRows") {
    val df = XDF(Seq(("a", "", ""), ("b", "", "x"), ("", "", "")).toDF("c1", "c2", "c3"))
    assert(df.dropEmptyCols().toDF.columns.toSeq == Seq("c1", "c3"))
    assert(df.dropEmptyRows().toDF.count() == 2)
    // typed emptiness: numerics are non-empty iff non-null; nulls count
    // as empty for strings too
    val mixed = XDF(Seq((1, null: String, ""), (2, null: String, ""))
      .toDF("n", "s", "e"))
    assert(mixed.dropEmptyCols().toDF.columns.toSeq == Seq("n"))
    // 0 rows -> frame returned UNCHANGED, matching the reference's
    // num_rows()==0 short-circuit (dataframe.py:560-562); also pins the
    // sawRow=false path of the InternalRow sweep's fold
    val empty = XDF(Seq(("a", 1)).toDF("x", "y").limit(0))
    assert(empty.dropEmptyCols().toDF.columns.toSeq == Seq("x", "y"))
  }

  test("fillEmpty maps SQL nulls onto the empty-string convention") {
    val df = XDF(Seq(("a", null: String), (null: String, "b")).toDF("x", "y"))
    val filled = df.fillEmpty()
    assert(filled.toDF.collect().flatMap(_.toSeq).forall(_ != null))
    assert(filled.isEmptyStr("x").toDF.count() == 1)
  }

  test("prefix rename family is reversible") {
    val df = XDF(Seq(("1", "2")).toDF("a", "b"))
    val there = df.addPrefix("p")
    assert(there.getHeader == Seq("p:a", "p:b"))
    assert(there.removePrefix("p").getHeader == Seq("a", "b"))
    val sfx = df.addSuffix("s")
    assert(sfx.getHeader == Seq("a:s", "b:s"))
    assert(sfx.renameSuffix("s", "t").getHeader == Seq("a:t", "b:t"))
  }
}
