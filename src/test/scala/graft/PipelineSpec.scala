package graft

import org.apache.spark.sql.functions._
import graft.core.XDF
import graft.functions.TextOps
import graft.operators.Dedup
import graft.sources.TsvIO

/** End-to-end pipeline integration: the library's verbs composed the way
  * a user would chain them (reference README / notebook flows and a
  * training-data curation pipeline). */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("README-style flow: write TSV, read, filter, select, aggregate") {
    val iris = Seq(
      ("5.1", "3.5", "1.4", "0.2", "Iris-setosa"),
      ("4.9", "3.0", "1.4", "0.2", "Iris-setosa"),
      ("6.2", "3.4", "5.4", "2.3", "Iris-virginica"),
    ).toDF("sepal_length", "sepal_width", "petal_length", "petal_width", "class")
    val dir = graft.core.TempDirs.scratch("graft_pipeline")
    TsvIO.write(iris, dir)
    val out = XDF(TsvIO.read(spark, dir))
      .eqStr("class", "Iris-setosa")
      .gtFloat("sepal_width", 3.1)
      .select("sepal_width", "sepal_length")
    assert(out.toTuples() == Seq(Seq("3.5", "5.1")))
    val agg = XDF(TsvIO.read(spark, dir))
      .aggregate(Seq("class"), Seq("petal_length"), Seq("min"))
      .sort(Seq("class"))
    assert(agg.getHeader == Seq("class", "petal_length:min"))
    assert(agg.toDF.count() == 2)
  }

  test("training-data curation: dedup -> quality gate -> lang filter -> stats") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dupped = docs.union(docs.withColumn("doc_id", col("doc_id") + 10000))
    val curated = XDF(Dedup.minhashDedup(dupped, "doc_id", "text"))
      .transform("quality", TextOps.qualityScore(col("text")))
      .gtFloat("quality", 0.3)
      .transform("pred_lang", TextOps.languageId(col("text")))
      .where(col("pred_lang") =!= "und")
      .transform("n_tok", TextOps.tokenCount(col("text")))
    val n = curated.toDF.count()
    assert(n > 0 && n <= 500, "dedup must collapse the planted duplicates")
    val stats = curated
      .aggregate(Seq("pred_lang"), Seq("n_tok", "quality"), Seq("mean", "mean"))
    assert(stats.getHeader.toSet ==
      Set("pred_lang", "n_tok:mean", "quality:mean"))
  }

  test("events analytics: enrich as-of, window, top-k per key") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val hourly = XDF(graft.core.WindowOps.tumblingTimeAggregate(
        events, "ts", "1 hour", Seq("event_type"), Seq("value"), Seq("sum")))
      .sampleGroupByTopk(Seq("event_type"), "value:sum", 2)
    val rows = hourly.toDF.groupBy("event_type").count().collect()
    assert(rows.forall(_.getLong(1) <= 2), "top-2 hours per event type")
  }
}
