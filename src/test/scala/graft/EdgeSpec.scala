package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Sampling, XDF}

/** Edge-case coverage for paths not exercised by the oracle gate. */
class EdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents on empty edges, minhashClusters all-singleton") {
    import graft.operators.{Dedup, GraphOps}
    val empty = Seq.empty[(String, String)].toDF("src", "target")
    assert(GraphOps.connectedComponents(empty).count() == 0)
    // distinct texts: every row is its own cluster and survives dedup
    val docs = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh"), (3L, "ii jj kk ll"))
      .toDF("doc_id", "text")
    val clustered = Dedup.minhashClusters(docs, "doc_id", "text")
    assert(clustered.filter(col("cluster_id") === col("doc_id")).count() == 3)
    assert(Dedup.minhashDedupCC(docs, "doc_id", "text").count() == 3)
    // output-column clash is rejected, not silently overwritten
    intercept[IllegalArgumentException] {
      Dedup.minhashClusters(docs, "doc_id", "text", outCol = "text")
    }
  }

  test("minhashDedup keeps null-text rows as singletons (parity with CC)") {
    import graft.operators.Dedup
    val df = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ee"), (3L, null))
      .toDF("doc_id", "text")
    val oneHop = Dedup.minhashDedup(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cc = Dedup.minhashDedupCC(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(oneHop == Set(1L, 3L), s"null-text doc must survive, got $oneHop")
    assert(cc == oneHop)
  }

  test("forwardPaths returns empty on empty roots instead of throwing") {
    import graft.operators.GraphOps
    val edges = Seq(("a", "b")).toDF("src", "target")
    val roots = Seq.empty[String].toDF("node_id")
    assert(GraphOps.forwardPaths(edges, roots).count() == 0)
  }

  test("sampleClass leaves null-class rows untouched") {
    val df = Seq(("spam", 1), ("spam", 2), ("ham", 3))
      .toDF("label", "id")
      .union(Seq((null.asInstanceOf[String], 4), (null.asInstanceOf[String], 5))
        .toDF("label", "id"))
    val out = Sampling.sampleClass(df, "label", "spam", 0.0, 7L, Seq("id"))
      .select("id").collect().map(_.getInt(0)).toSet
    // ratio 0 removes every spam row; ham AND null-label rows all survive
    assert(out == Set(3, 4, 5))
  }

  test("portable gate separates key material: no concat collisions") {
    // ("ab","c") and ("a","bc") must receive independent decisions
    val a = Sampling.sampleGroupByKeyPortable(
      Seq(("ab", "c", 1)).toDF("x", "y", "id"), Seq("x", "y"), "80")
    val b = Sampling.sampleGroupByKeyPortable(
      Seq(("a", "bc", 1)).toDF("x", "y", "id"), Seq("x", "y"), "80")
    // with the old separator-less concat both hashed "abc0" — identical
    // outcomes by construction; now the decisions come from different
    // digests (verified distinct by direct md5 of the keyed material)
    val da = a.count(); val db = b.count()
    val mat = spark.sql(
      "SELECT md5('ab' || chr(1) || 'c' || chr(1) || '0') AS h1," +
      "       md5('a' || chr(1) || 'bc' || chr(1) || '0') AS h2").head()
    assert(mat.getString(0) != mat.getString(1))
    assert(Seq(da, db).forall(n => n == 0 || n == 1))
  }

  test("windowAggregate drops null window values without misaligning windows") {
    import graft.core.WindowOps
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", 4.0))
      .toDF("w", "v")
      .union(Seq((null.asInstanceOf[String], 100.0)).toDF("w", "v"))
    val out = WindowOps.windowAggregate(df, "w", Seq("v"), Seq("sum"), 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // null must not claim an ordinal: windows are {a,b} and {c,d}
    assert(out == Map("a - b" -> 3.0, "c - d" -> 7.0))
  }

  test("resolveTemplateCol tolerates $ and backslash in data") {
    val df = XDF(Seq(("$42.00", "price is {price}", "a\\b"))
      .toDF("price", "tpl", "other"))
    val out = df.resolveTemplateCol("tpl", "msg").toDF.head()
    assert(out.getAs[String]("msg") == "price is $42.00")
  }

  test("mkstr family drops blank cells, mkstr4f has no thousands separators") {
    import graft.core.AggRegistry
    val df = Seq(("g", "b"), ("g", ""), ("g", "a"), ("g", " ")).toDF("k", "v")
    val r = df.groupBy("k").agg(
      AggRegistry.expr("mkstr", col("v")).as("m"),
      AggRegistry.expr("sorted_mkstr", col("v")).as("sm")).head()
    assert(r.getAs[String]("m").split(",").sorted.toSeq == Seq("a", "b"))
    assert(r.getAs[String]("sm") == "a,b")
    val big = Seq(("g", 1234.5)).toDF("k", "v")
    val f = big.groupBy("k").agg(AggRegistry.expr("mkstr4f", col("v"))).head()
    assert(f.getString(1) == "1234.5000") // no "1,234.5000"
  }

  test("joins: defaults only fill the non-matched side; key-name clash guarded") {
    val l = XDF(Seq(("1", null: String), ("2", "lv2")).toDF("id", "lval"))
    val r = XDF(Seq(("1", "rv1")).toDF("rid", "rval"))
    val out = l.leftJoin(r, Seq("id"), Seq("rid"), defaultVal = "DEF").toDF
    val m = out.collect().map(x => x.getAs[String]("id") ->
      (x.getAs[String]("lval"), x.getAs[String]("rval"))).toMap
    assert(m("1") == ((null, "rv1")), "matched left null must stay null")
    assert(m("2") == (("lv2", "DEF")), "unmatched right side fills")
    // right non-key column named like the left key must demand suffixes
    val rClash = XDF(Seq(("1", "boom")).toDF("rid", "id"))
    intercept[IllegalArgumentException] {
      l.innerJoin(rClash, Seq("id"), Seq("rid"))
    }
  }

  test("concatAsCols fails fast on row-count mismatch") {
    val a = XDF(Seq("1", "2").toDF("x"))
    val b = XDF(Seq("1").toDF("y"))
    intercept[IllegalArgumentException] {
      a.concatAsCols(b, Seq("x"), Seq("y"))
    }
  }

  test("forwardPaths counts multi-route paths") {
    val edges = Seq(("root", "a"), ("root", "b"), ("a", "b")).toDF("src", "target")
    val roots = Seq("root").toDF("node_id")
    val out = graft.operators.GraphOps.forwardPaths(edges, roots).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(out("b") == 2L, s"two routes to b, got $out")
    assert(out("a") == 1L && out("root") == 1L)
  }

  test("resolveTemplateCol fills placeholders from row values") {
    val df = XDF(Seq(("alice", "Hi {name}, meet {other}", "bob"))
      .toDF("name", "tpl", "other"))
    val out = df.resolveTemplateCol("tpl", "msg").toDF.head()
    assert(out.getAs[String]("msg") == "Hi alice, meet bob")
  }

  test("addRow appends a literal row with coercion") {
    val df = XDF(Seq((1L, "a")).toDF("id", "v"))
    val out = df.addRow(Seq("2", "b")).sort(Seq("id")).toDF.collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException] { df.addRow(Seq("only-one")) }
  }

  test("base64 round-trip inline") {
    val df = XDF(Seq("hello world").toDF("v"))
    val rt = df.base64EncodeInline("v").base64DecodeInline("v").toDF.head()
    assert(rt.getString(0) == "hello world")
  }

  test("toCsvText and toJsonRecords render rows") {
    val df = XDF(Seq(("1", "a")).toDF("x", "y"))
    assert(df.toCsvText().toDF.head().getString(0) == "1,a")
    assert(df.toJsonRecords().toDF.head().getString(0) == """{"x":"1","y":"a"}""")
  }

  test("take / skipRows / lastRows honor order") {
    val df = XDF(Seq("a", "b", "c", "d").toDF("v")).sort(Seq("v"))
    assert(df.take(2).toDF.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(df.skipRows(3).toDF.collect().map(_.getString(0)).toSeq == Seq("d"))
    assert(df.lastRows(1).toDF.collect().map(_.getString(0)).toSeq == Seq("d"))
  }

  test("reorder moves matches to front, reverseReorder to back") {
    val df = XDF(Seq(("1", "2", "3")).toDF("a", "b", "c"))
    assert(df.reorder("c").getHeader == Seq("c", "a", "b"))
    assert(df.reverseReorder("a").getHeader == Seq("b", "c", "a"))
  }

  test("sampleClass leaves other classes untouched") {
    val df = (1 to 200).map(i => (if (i % 2 == 0) "big" else "keep", i))
      .toDF("cls", "v")
    val out = Sampling.sampleClass(df, "cls", "big", 0.2, 42, Seq("v"))
    val counts = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("keep") == 100)          // untouched class intact
    assert(counts("big") < 60)             // sampled class reduced
  }

  test("sampleGroupByMaxUniqValues caps distinct values per group") {
    val df = (1 to 100).map(i => ("g", s"v${i % 10}")).toDF("k", "v")
    val out = Sampling.sampleGroupByMaxUniqValues(df, Seq("k"), "v", 3, 1)
    assert(out.select("v").distinct().count() == 3)
    // every surviving row's value is one of the 3 kept values
    assert(out.count() == 30)
  }

  test("mergeIntersect keeps only common columns") {
    val a = XDF(Seq(("1", "x")).toDF("id", "onlyA"))
    val b = XDF(Seq(("2", "y")).toDF("id", "onlyB"))
    val m = a.mergeIntersect(Seq(b))
    assert(m.getHeader == Seq("id"))
    assert(m.toDF.count() == 2)
  }

  test("splitBatches partitions rows completely and disjointly") {
    val df = (1 to 100).map(_.toString).toDF("v")
    val batches = Sampling.splitBatches(df, Seq("v"), 4, 9)
    val counts = batches.map(_.count())
    assert(counts.sum == 100)
    assert(counts.forall(_ > 0))
  }

  test("sampleColumnByMaxUniqValuesPortable caps the distinct value set") {
    val df = (1 to 90).map(i => (i, (i % 9).toString)).toDF("id", "cls")
    val out = Sampling.sampleColumnByMaxUniqValuesPortable(df, "cls", 4, "s")
    assert(out.select("cls").distinct().count() == 4)
    // every kept class keeps ALL its rows (semi-join, not a row sample)
    assert(out.count() == 40)
    // a cap above the distinct count is a no-op
    assert(Sampling.sampleColumnByMaxUniqValuesPortable(df, "cls", 99, "s")
      .count() == 90)
  }

  test("selectAndAddEmptyColsIfMissing creates absent plain cols") {
    val df = XDF(Seq(("1")).toDF("a"))
    val out = df.selectAndAddEmptyColsIfMissing("a", "ghost")
    assert(out.getHeader == Seq("a", "ghost"))
    assert(out.toDF.head().getString(1) == "")
  }

  test("transform inline log families compute correctly") {
    val df = XDF(Seq("8.0").toDF("v"))
    val out = df.transformInlineLog2("v").toDF.head()
    assert(math.abs(out.getDouble(0) - 3.0) < 1e-12)
  }
}
