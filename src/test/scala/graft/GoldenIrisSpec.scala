package graft

import graft.core.XDF
import graft.sources.TsvIO

/**
 * Golden-output spec against the reference's OWN published fixtures and
 * documented results — the only authoritative expected outputs the
 * reference ships (README.md usage block; docs/api-doc.md:31-38
 * aggregate table). Everything here reads the reference's actual
 * `data/iris.tsv(.gz/.zip)` files through TsvIO and asserts the values
 * the reference documents, byte-for-byte at the cell level (the TSV
 * read path is string-typed, so "3.0" must survive as "3.0", not "3").
 */
class GoldenIrisSpec extends SparkTestBase {

  private val refData = "/root/reference/data"
  private def available = new java.io.File(s"$refData/iris.tsv").exists()

  private def cells(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r => (0 until r.length).map(r.getString))

  // the README's to_pandas_df(10) block (reference README.md usage
  // section), transcribed verbatim
  private val readmeFirst10 = Seq(
    Seq("5.1", "3.5", "1.4", "0.2", "Iris-setosa"),
    Seq("4.9", "3.0", "1.4", "0.2", "Iris-setosa"),
    Seq("4.7", "3.2", "1.3", "0.2", "Iris-setosa"),
    Seq("4.6", "3.1", "1.5", "0.2", "Iris-setosa"),
    Seq("5.0", "3.6", "1.4", "0.2", "Iris-setosa"),
    Seq("5.4", "3.9", "1.7", "0.4", "Iris-setosa"),
    Seq("4.6", "3.4", "1.4", "0.3", "Iris-setosa"),
    Seq("5.0", "3.4", "1.5", "0.2", "Iris-setosa"),
    Seq("4.4", "2.9", "1.4", "0.2", "Iris-setosa"),
    Seq("4.9", "3.1", "1.5", "0.1", "Iris-setosa"))

  test("iris.tsv: header, num_rows()==150, first 10 rows match the README block") {
    assume(available)
    val x = XDF(TsvIO.read(spark, s"$refData/iris.tsv"))
    assert(x.getHeader == Seq(
      "sepal_length", "sepal_width", "petal_length", "petal_width", "class"))
    // README: ">>> print(x.num_rows())  150"
    assert(x.numRows() == 150L)
    assert(cells(x.toDF.limit(10)) == readmeFirst10)
  }

  test("iris.tsv.gz and iris.tsv.zip read identical to the plain file") {
    assume(available)
    def sortedCells(df: org.apache.spark.sql.DataFrame) =
      cells(df).sortBy(_.mkString("\t"))
    val plain = TsvIO.read(spark, s"$refData/iris.tsv")
    val gz = TsvIO.read(spark, s"$refData/iris.tsv.gz")
    val zip = TsvIO.readZip(spark, s"$refData/iris.tsv.zip")
    assert(gz.columns.toSeq == plain.columns.toSeq)
    assert(zip.columns.toSeq == plain.columns.toSeq)
    assert(sortedCells(gz) == sortedCells(plain),
      "gz-transparent read must be byte-identical to the plain TSV")
    assert(sortedCells(zip) == sortedCells(plain),
      "zip read must be byte-identical to the plain TSV")
  }

  test("README filter chain: eq_str + gt_float + select reproduces the shown rows") {
    assume(available)
    import graft.compat._
    val x = XDF(TsvIO.read(spark, s"$refData/iris.tsv"))
    // README: y = x.eq_str("class","Iris-setosa").gt_float("sepal_width",3.1)
    //              .select(["sepal_width","sepal_length"]); y.show(5)
    val y = x.eq_str("class", "Iris-setosa")
      .gt_float("sepal_width", 3.1)
      .select("sepal_width", "sepal_length")
    assert(y.getHeader == Seq("sepal_width", "sepal_length"))
    // the block displays the leading rows: 3.5/5.1, 3.2/4.7, 3.6/5.0 —
    // file order survives the string-typed filter chain
    assert(cells(y.toDF.limit(3)) == Seq(
      Seq("3.5", "5.1"), Seq("3.2", "4.7"), Seq("3.6", "5.0")))
  }

  test("api-doc aggregate block: class x petal_length:min values and rendering") {
    assume(available)
    val x = XDF(TsvIO.read(spark, s"$refData/iris.tsv"))
    // docs/api-doc.md:31-38: x.aggregate("class", ["petal_length"], [min])
    // -> Iris-setosa 1.000 / Iris-versicolor 3.000 / Iris-virginica 4.500
    val agg = x.aggregate(Seq("class"), Seq("petal_length"), Seq("min"))
      .sort(Seq("class")).toDF
    assert(agg.columns.toSeq == Seq("class", "petal_length:min"))
    val rendered = agg.collect().toSeq.map(r =>
      r.getString(0) -> f"${r.getDouble(1)}%.3f")
    assert(rendered == Seq(
      "Iris-setosa" -> "1.000",
      "Iris-versicolor" -> "3.000",
      "Iris-virginica" -> "4.500"))
  }
}
