package graft

import org.apache.spark.sql.functions._
import graft.core.{Reshape, XDF}

/** Coverage for the remaining small verbs (affix/zero filters, inline
  * replacements, flatmap, transpose, drop families, const helpers). */
class CompletionSpec extends SparkTestBase {
  import spark.implicits._

  private def df = XDF(Seq(("apple", "0", "x-1"), ("banana", "3", "y-2"),
    ("cherry", "0.0", "z-3")).toDF("fruit", "n", "code"))

  test("affix filters") {
    assert(df.startswith("fruit", "ba").toDF.count() == 1)
    assert(df.notStartswith("fruit", "ba").toDF.count() == 2)
    assert(df.endswith("fruit", "rry").toDF.count() == 1)
    assert(df.notEndswith("fruit", "rry").toDF.count() == 2)
  }

  test("zero and membership filters") {
    assert(df.isNonzeroInt("n").toDF.count() == 1)     // "0" and "0.0" drop
    assert(df.isNonzeroFloat("n").toDF.count() == 1)
    assert(df.valuesNotIn("fruit", Seq("apple")).toDF.count() == 2)
    assert(df.notRegexMatch("fruit", "a.*").toDF.count() == 2) // anchored
  }

  test("replaceStrInline is literal, not regex") {
    val out = XDF(Seq("a.b").toDF("v")).replaceStrInline(Seq("v"), ".", "_")
      .toDF.head().getString(0)
    assert(out == "a_b")
    val noRegex = XDF(Seq("axb").toDF("v")).replaceStrInline(Seq("v"), ".", "_")
      .toDF.head().getString(0)
    assert(noRegex == "axb") // '.' must not match any char
  }

  test("setMissingValues fills empty and null") {
    val out = XDF(Seq("", "x").toDF("v")).setMissingValues(Seq("v"), "def")
      .toDF.collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("def", "x"))
  }

  test("flatmapCol fans out array expressions") {
    val out = Reshape.flatmapCol(Seq("a,b").toDF("csv"),
      split(col("csv"), ","), "item")
    assert(out.select("item").collect().map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("transpose renders first-n rows as columns") {
    val t = Reshape.transpose(Seq(("1", "x"), ("2", "y")).toDF("a", "b"), 2)
    assert(t.columns.toSeq == Seq("col_name", "row:1", "row:2"))
    val rows = t.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set(("a", "1", "2"), ("b", "x", "y")))
  }

  test("drop families by prefix and suffix") {
    val wide = XDF(Seq(("1", "2", "3")).toDF("p:a", "p:b", "q:c"))
    assert(wide.dropColsWithPrefix("p").getHeader == Seq("q:c"))
    val sfx = XDF(Seq(("1", "2")).toDF("a:s", "b"))
    assert(sfx.dropColsWithSuffix("s").getHeader == Seq("b"))
    assert(wide.dropColsWithPrefixExcept("p", "p:a").getHeader == Seq("p:a", "q:c"))
  }

  test("const helpers respect existing columns") {
    val out = df.addConstIfMissing("fruit", "nope").addConstIfMissing("tag", "t")
    assert(out.getHeader.contains("tag"))
    assert(out.toDF.select("fruit").head().getString(0) == "apple")
    assert(df.addEmptyColsIfMissing("extra").toDF.select("extra").head().getString(0) == "")
  }

  test("dropColsIfExists ignores missing, dropCols raises") {
    assert(df.dropColsIfExists("ghost").getHeader == df.getHeader)
    intercept[IllegalArgumentException] { df.dropCols("ghost") }
  }

  test("generateKeyHash default path is stable") {
    val a = df.generateKeyHash("h", Seq("fruit")).toDF
      .select("h").collect().map(_.getLong(0)).toSeq
    val b = df.generateKeyHash("h", Seq("fruit")).toDF
      .select("h").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.distinct.length == 3)
  }
}
