package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{JsonFlattener, Reshape}
import graft.functions.{TextOps, TimeFuncs}
import graft.operators.{Dedup, GraphOps, Multimodal, Similarity}
import graft.sources.TsvIO

/** Specs for reshape, JSON flatten, dedup/similarity, graph, time, TSV
  * and multimodal operators. */
class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("splitStr fans out aligned positions") {
    val df = Seq(("1", "a,b", "x,y")).toDF("id", "l", "r")
    val out = Reshape.splitStr(df, Seq("l", "r"), ",", "s")
    val rows = out.select("s:l", "s:r").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSet == Set(("a", "x"), ("b", "y")))
  }

  test("replicateRows repeats by count col, drops non-positive") {
    val df = Seq(("a", "2"), ("b", "0"), ("c", "1")).toDF("v", "n")
    val out = Reshape.replicateRows(df, "n")
    assert(out.select("v").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "a", "c"))
  }

  test("reverseTranspose pivots with reference naming") {
    val df = Seq(("g1", "k1", "1"), ("g1", "k2", "2"), ("g2", "k1", "3"))
      .toDF("g", "k", "v")
    val out = Reshape.reverseTranspose(df, Seq("g"), "k", "v")
    assert(out.columns.toSet == Set("g", "v:k:k1", "v:k:k2"))
  }

  test("explodeJson: nested map, primitive list collapse, array fan-out") {
    val df = Seq(
      ("""{"a": 1, "m": {"x": "u", "y": 2}, "tags": ["t1","t2"], "items": [{"p": 1}, {"p": 2}]}""", "r1"),
      ("""{"a": 3, "m": {"x": "v", "y": 4}, "tags": [], "items": []}""", "r2"),
    ).toDF("js", "keep")
    val out = JsonFlattener.explodeJson(df, "js", "j")
    assert(out.columns.contains("j:a") && out.columns.contains("j:m:x"))
    val r1 = out.filter(col("keep") === "r1")
      .orderBy("j:items:__explode_json_index__").collect()
    assert(r1.length == 2)
    assert(r1.map(_.getAs[String]("j:items:p")).toSeq == Seq("1", "2"))
    assert(r1.head.getAs[String]("j:tags") == "t1,t2")
    assert(r1.head.getAs[Int]("j:items:__explode_json_len__") == 2)
    // empty array row survives via posexplode_outer with len 0
    val r2 = out.filter(col("keep") === "r2").collect()
    assert(r2.length == 1 && r2.head.getAs[Int]("j:items:__explode_json_len__") == 0)
  }

  test("explodeJson transposeColGroups pivots key/value subtrees") {
    val df = Seq(
      ("""{"id": 1, "props": [{"key": "os", "value": "linux"}, {"key": "cpu", "value": "x86"}]}""", "r1"),
      ("""{"id": 2, "props": [{"key": "os", "value": "mac"}]}""", "r2"),
    ).toDF("js", "tag")
    val out = graft.core.JsonFlattener.explodeJson(df, "js", "j",
      transposeColGroups = Seq("props"))
    assert(out.count() == 2) // no fan-out: props pivots to columns
    val r = out.orderBy("j:id").collect()
    assert(r(0).getAs[String]("j:props:os") == "linux")
    assert(r(0).getAs[String]("j:props:cpu") == "x86")
    assert(r(1).getAs[String]("j:props:os") == "mac")
    assert(r(1).getAs[String]("j:props:cpu") == null)
  }

  test("explodeJson singleValueListCols and maxResults options") {
    val df = Seq(
      ("""{"one": [{"a": 7}], "many": [{"b": 1}, {"b": 2}, {"b": 3}]}""", "r")
    ).toDF("js", "tag")
    val out = graft.core.JsonFlattener.explodeJson(df, "js", "j",
      singleValueListCols = Seq("one"), maxResults = 2)
    assert(out.count() == 2) // many capped at 2, one doesn't fan out
    assert(out.select("j:one:a").distinct().head().getString(0) == "7")
    assert(out.select("j:many:b").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("1", "2"))
  }

  test("explodeJson cogroup keeps rows where one array is missing") {
    val df = Seq(
      ("""{"xs": [{"a": 1}, {"a": 2}], "ys": [{"b": 9}]}""", "full"),
      ("""{"xs": [{"a": 5}]}""", "noys"),
    ).toDF("js", "tag")
    val out = graft.core.JsonFlattener.explodeJson(df, "js", "j",
      arrayMergeMode = "cogroup")
    // the ys-less row must still fan out its xs (arrays_zip is
    // null-intolerant without the coalesce guard)
    val noys = out.filter(col("tag") === "noys").collect()
    assert(noys.length == 1 && noys.head.getAs[String]("j:xs:a") == "5")
    assert(out.filter(col("tag") === "full").count() == 2)
  }

  test("explodeJson transposeColGroups tolerates duplicate keys (first wins)") {
    val df = Seq(
      ("""{"props": [{"key": "os", "value": "linux"}, {"key": "os", "value": "dup"}]}""", "r")
    ).toDF("js", "tag")
    val out = graft.core.JsonFlattener.explodeJson(df, "js", "j",
      transposeColGroups = Seq("props"))
    assert(out.select("j:props:os").head().getString(0) == "linux")
  }

  test("explodeJson cogroup mode pad-aligns multiple arrays") {
    val df = Seq(
      ("""{"xs": [{"a": 1}, {"a": 2}, {"a": 3}], "ys": [{"b": 9}]}""", "r")
    ).toDF("js", "tag")
    val joinMode = graft.core.JsonFlattener.explodeJson(df, "js", "j")
    assert(joinMode.count() == 3) // 3 xs x 1 ys cartesian
    val cg = graft.core.JsonFlattener.explodeJson(df, "js", "j",
      arrayMergeMode = "cogroup")
    val rows = cg.orderBy("j:xs:__explode_json_index__").collect()
    assert(rows.length == 3) // pad-aligned to the longest list
    assert(rows.map(_.getAs[String]("j:xs:a")).toSeq == Seq("1", "2", "3"))
    assert(rows.map(_.getAs[String]("j:ys:b")).toSeq == Seq("9", null, null))
    assert(rows.head.getAs[Int]("j:ys:__explode_json_len__") == 1)
  }

  test("explodeJson accepted/excluded/nested col controls") {
    val df = Seq(
      ("""{"keep": 1, "drop": 2, "sub": {"x": 3, "y": [1,2]}}""", "r")
    ).toDF("js", "tag")
    val acc = graft.core.JsonFlattener.explodeJson(df, "js", "j",
      acceptedCols = Seq("keep"))
    assert(acc.columns.filter(_.startsWith("j:")).toSeq == Seq("j:keep"))
    val exc = graft.core.JsonFlattener.explodeJson(df, "js", "j",
      excludedCols = Seq("drop"), nestedCols = Seq("sub"))
    assert(!exc.columns.contains("j:drop"))
    assert(exc.columns.contains("j:sub:json_encoded"))
    val sub = exc.select("j:sub:json_encoded").head().getString(0)
    assert(sub == """{"x":3,"y":[1,2]}""")
  }

  test("sliding count-window replicates values into winSize windows") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 4.0)).toDF("d", "v")
    val out = graft.core.WindowOps.slidingWindowAggregate(
        df, "d", Seq("v"), Seq("sum"), winSize = 2)
      .orderBy("d:window").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    // only COMPLETE windows [a,b], [b,c] — the reference assigns win
    // indexes only while num_values - win_index >= winsize (DF:676-678)
    assert(out.toSeq == Seq("a - b" -> 3.0, "b - c" -> 6.0))
  }

  test("welch t-test matches hand computation") {
    val df = Seq(("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 3.0),
      ("g", "B", 2.0), ("g", "B", 4.0), ("g", "B", 6.0)).toDF("k", "cls", "v")
    val r = graft.functions.Stats.welchTTest(df, Seq("k"), "cls", "A", "B", "v").head()
    // mean_a=2 var_a=1; mean_b=4 var_b=4; t = -2/sqrt(1/3+4/3) = -1.5492
    assert(math.abs(r.getAs[Double]("t_stat") - (-1.5491933)) < 1e-6)
    assert(math.abs(r.getAs[Double]("df") - 2.9411764) < 1e-6)
  }

  test("minhash LSH finds planted near-duplicates") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("delta", "delta2") // 1-word change
    val distinct = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val df = Seq((0L, base), (1L, nearDup), (2L, distinct)).toDF("doc_id", "text")
    val out = Dedup.minhashDedup(df, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.contains(0L) && out.contains(2L))
    assert(!out.contains(1L), "near-dup should collapse onto doc 0")
  }

  test("connected components: multi-hop chains, isolated pairs, undirected") {
    // chain a-b-c-d (given as mixed directions) + separate pair x-y
    val edges = Seq(("b", "a"), ("b", "c"), ("d", "c"), ("x", "y"))
      .toDF("src", "target")
    val out = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("minhash CC dedup collapses transitive chains one-hop can miss") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val step1 = base.replace("delta", "delta2")   // ~1 word from base
    val step2 = step1.replace("sigma", "sigma2")  // ~2 words from base
    val distinct = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val df = Seq((0L, base), (1L, step1), (2L, step2), (3L, distinct))
      .toDF("doc_id", "text")
    val cc = Dedup.minhashDedupCC(df, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val oneHop = Dedup.minhashDedup(df, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(cc == Set(0L, 3L), s"chain should collapse onto doc 0, got $cc")
    // closure can only remove MORE docs than the one-hop approximation
    assert(cc.subsetOf(oneHop))
  }

  test("electRepresentative keeps max score, min id on ties") {
    val df = Seq((1L, 10L, 5), (2L, 10L, 9), (3L, 10L, 9), (4L, 40L, 1))
      .toDF("id", "cluster", "score")
    val out = Dedup.electRepresentative(df, "cluster", "score", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 4L)) // 2 beats 3 on id tie-break, 4 is singleton
  }

  test("simhashDedupHamming matches local union-find over true hamming pairs") {
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon zeta2", "one two three four five six",
      "uno dos tres cuatro cinco seis", "seven eight nine ten eleven")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val hashes = df.withColumn("sh", graft.functions.TextOps.simhash16(col("text")))
      .select("doc_id", "sh").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // ground truth: union-find over pairs with hamming distance <= 1
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for (a <- hashes.keys; b <- hashes.keys if a < b
         if Integer.bitCount(hashes(a) ^ hashes(b)) <= 1) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = hashes.keys.filter(k => find(k) == k).toSet
    val got = Dedup.simhashDedupHamming(df, "doc_id", "text", maxHamming = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(!got.contains(1L)) // exact duplicate always collapses
  }

  test("explodeMaps discovers output schema from data") {
    val df = Seq(("1", "a=1,b=2"), ("2", "c=9")).toDF("id", "kv")
    val out = graft.core.Reshape.explodeMaps(df, Seq("kv"),
      m => m("kv").split(",").toSeq.map { p =>
        val Array(k, v) = p.split("=", 2); Map("key" -> k, "val" -> v)
      }, prefix = "e")
    assert(out.columns.toSeq == Seq("id", "e:key", "e:val"))
    val rows = out.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set(("1", "a", "1"), ("1", "b", "2"), ("2", "c", "9")))
  }

  test("mergeSimilarLeafNodes collapses same-parent same-key leaves") {
    val edges = Seq(("root", "mid"), ("mid", "f1.txt"), ("mid", "f2.txt"),
      ("mid", "app.exe")).toDF("src", "target")
    val out = graft.operators.GraphOps.mergeSimilarLeafNodes(edges,
        d => regexp_extract(d("target"), "\\.(\\w+)$", 1))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("root", "mid", 1L),
      ("mid", "grp:mid:txt", 2L), ("mid", "grp:mid:exe", 1L)))
  }

  test("exact dedup keeps min-id representative") {
    val df = Seq((5L, "same"), (2L, "same"), (9L, "other")).toDF("id", "t")
    val out = Dedup.exact(df, "t", "id").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 9L))
  }

  test("cosine / top-k brute force") {
    val corpus = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)), (3L, Array(0.9, 0.1)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0, 0.0))).toDF("query_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "query_id", k = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    assert(out.head._1 == 1L && out.head._2 == 1.0)
    assert(out(1)._1 == 3L)
  }

  test("IVF top-k with full probing equals brute force") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextDouble() - 0.5))).toDF("vec_id", "embedding")
    val queries = (0L until 4L).map(i =>
      (i, Array.fill(8)(rnd.nextDouble() - 0.5))).toDF("query_id", "embedding")
    val exact = graft.operators.Similarity.bruteForceTopK(
        corpus, queries, "vec_id", "embedding", "query_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.operators.Similarity.ivfTopK(
        corpus, queries, "vec_id", "embedding", "query_id", k = 3,
        nClusters = 4, nProbes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == exact) // probing every cell degenerates to exact search
  }

  test("IVF with a sample-trained quantizer holds the gate's recall bound") {
    // the documented 100 TB path (SCALE.md): fit the coarse quantizer on
    // a corpus SAMPLE, never the full data. trainSample < 1 was the one
    // path no gate or spec exercised (round-11 verdict item 4) — assert
    // the q_sim_ivf_topk recall bound (0.85 vs brute-force top-3) holds
    // at trainSample = 0.2 on the same fixture and index config.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(
      e, queries, "vec_id", "embedding", "query_id", k = 3))
    val sampled = pairs(Similarity.ivfTopK(
      e, queries, "vec_id", "embedding", "query_id", k = 3,
      nClusters = 8, nProbes = 4, trainSample = 0.2))
    val recall = (sampled intersect exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"sample-trained IVF recall $recall < 0.85")
  }

  test("bfs levels tolerate cycles") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "target")
    val roots = Seq("a").toDF("node_id")
    val out = GraphOps.bfsLevels(edges, roots).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3))
  }

  test("dangling edges prune to fixpoint") {
    // chain a->b->c->d, d dangling; full fixpoint empties the chain
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "target")
    assert(GraphOps.removeDanglingEdges(edges, Nil, maxIter = 10).count() == 0)
    // retaining d keeps everything
    assert(GraphOps.removeDanglingEdges(edges, Seq("d"), maxIter = 10).count() == 3)
  }

  test("asof join attaches the most recent right ROW even when its value is null") {
    val left = Seq(("k", 30L, "e")).toDF("key", "ts", "ev")
    val right = Seq(("k", 10L, "r10"), ("k", 20L, null))
      .toDF("key", "rts", "rv")
    val out = graft.operators.AsofJoin.asofJoinBackward(
        left, right, Seq("key"), "ts", "rts", Seq("rv")).head()
    // merge_asof semantics: the t=20 row (null value) supersedes r10
    assert(out.getAs[String]("rv") == null)
  }

  test("multimodal extraction survives a null payload row") {
    val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "payload")
      .union(Seq((2L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload"))
    val out = graft.operators.Multimodal.extractFeatures(df, "id", "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }

  test("asof join backward picks most recent right row, equal ts matches") {
    val left = Seq(("k", 10L, "e1"), ("k", 20L, "e2"), ("k", 5L, "e0"),
      ("x", 10L, "e3")).toDF("key", "ts", "ev")
    val right = Seq(("k", 8L, "r8"), ("k", 20L, "r20"), ("z", 1L, "rz"))
      .toDF("key", "rts", "rv")
    val out = graft.operators.AsofJoin.asofJoinBackward(
        left, right, Seq("key"), "ts", "rts", Seq("rv"))
      .collect().map(r => r.getAs[String]("ev") -> r.getAs[String]("rv")).toMap
    assert(out == Map("e0" -> null, "e1" -> "r8", "e2" -> "r20", "e3" -> null))
  }

  test("lenient time parse cascade") {
    val df = Seq("2024-01-02 03:04:05", "01/02/2024 03:04:05", "2024-01-02",
      "20240102", "1704164645").toDF("s")
    val out = df.select(TimeFuncs.datetimeToUtcTimestampSec(col("s")).as("e"))
      .collect().map(_.getLong(0))
    assert(out(0) == out(1))               // same instant, two formats
    assert(out(2) == out(3))               // date-only formats agree
    assert(out(4) == 1704164645L)          // epoch passthrough
  }

  test("duration grammar and humanize") {
    val df = Seq("3d4h", "2h30m", "45s").toDF("s")
    val secs = df.select(TimeFuncs.durationToSec(col("s")).as("sec"))
      .collect().map(_.getLong(0))
    assert(secs.toSeq == Seq(3 * 86400 + 4 * 3600, 2 * 3600 + 30 * 60, 45))
    val rel = df.select(TimeFuncs.displayRelativeTime(
      TimeFuncs.durationToSec(col("s"))).as("r")).collect().map(_.getString(0))
    assert(rel.toSeq == Seq("3d 4h", "2h 30m", "0m"))
  }

  test("TSV round-trip preserves special characters") {
    val dir = graft.core.TempDirs.scratch("graft_tsv_spec")
    val df = Seq(("1", "a b", "x\ty"), ("2", "c+d", "p%q")).toDF("id", "s1", "s2")
    TsvIO.write(df, dir)
    val back = TsvIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back.toSeq == Seq(("1", "a b", "x\ty"), ("2", "c+d", "p%q")))
  }

  test("multimodal feature extraction is deterministic and batched") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "bye"))
      .toDF("id", "text")
      .select(col("id"), encode(col("text"), "utf-8").as("bin"))
    val out = Multimodal.extractFeatures(df, "id", "bin").collect()
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("content_md5") == byId(2L).getAs[String]("content_md5"))
    assert(byId(1L).getAs[Int]("byte_len") == 11)
    assert(byId(1L).getAs[scala.collection.Seq[Double]]("features").toSeq ==
      byId(2L).getAs[scala.collection.Seq[Double]]("features").toSeq)
  }

  test("simhash of similar docs is closer than dissimilar") {
    val df = Seq(
      (1L, "spark query engine fast distributed"),
      (2L, "spark query engine fast distributed extra"),
      (3L, "completely different words entirely unrelated")).toDF("id", "text")
    val sh = df.select(col("id"), TextOps.simhash16(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("sh")).toMap
    def hamming(a: Int, b: Int) = Integer.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
  }

  test("language id picks the dominant stopword language") {
    val df = Seq(
      ("the cat is of the house and it is a dog", "en"),
      ("el perro de la casa y un gato por los campos", "es"),
      ("xyzzy qwerty asdf", "und")).toDF("text", "expected")
    val out = df.select(TextOps.languageId(col("text")).as("got"), col("expected"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("duplicatedNgramSpans == brute force on a planted corpus, any partitioning") {
    import spark.implicits._
    // d1/d2 share an interior 4-gram block; d3 shares d1's tail; d4 has an
    // internal repeat only (must NOT mark); d5 is clean; d6 is short
    val docs = Seq(
      ("d1", "alpha beta gamma delta epsilon zeta eta theta iota"),
      ("d2", "one two gamma delta epsilon zeta three four"),
      ("d3", "x y zeta eta theta iota"),
      ("d4", "rep rep rep rep rep rep rep rep"),
      ("d5", "totally unique words only here now there then"),
      ("d6", "too short"))
    val n = 4
    // brute force: cross-doc duplicated n-gram positions, merged spans
    val grams = docs.flatMap { case (id, text) =>
      val ts = text.split("\\s+")
      (0 to ts.length - n).map(i => (id, i + 1, ts.slice(i, i + n).mkString(" ")))
    }.filter { case (_, _, _) => true }
    val byGram = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = grams.filter(g => byGram(g._3)).groupBy(_._1).flatMap {
      case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        // islands: break when gap to the previous mark >= n
        val islands = sorted.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && p - acc.head.head < n =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }.map(_.reverse).reverse
        islands.map(is => (id, is.head.toLong, (is.last + n - 1).toLong, is.size.toLong))
    }.toSet
    for (nPart <- Seq(1, 3, 7)) {
      val got = Dedup.duplicatedNgramSpans(
          docs.toDF("doc_id", "text").repartition(nPart), "doc_id", "text", n)
        .select(col("doc_id"), col("span_start").cast("long"),
          col("span_end").cast("long"), col("n_grams"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === expected, s"nPart=$nPart")
    }
    // sanity on the fixture itself: d4's internal repeat is unmarked,
    // d1 carries two separate spans (d2-block and d3-tail merge check)
    assert(!expected.exists(_._1 == "d4"))
    assert(expected.count(_._1 == "d1") >= 1)

    // stripDuplicatedSpans: exactly the span-covered tokens drop,
    // survivors re-join with single spaces; span-free docs pass through
    // token-normalized; counts reconcile
    val covered: Map[String, Set[Long]] = expected.groupBy(_._1).map {
      case (id, sps) => id -> sps.flatMap(s => s._2 to s._3).toSet }
    val stripped = Dedup.stripDuplicatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .select("doc_id", "clean_text", "n_kept", "n_removed")
      .as[(String, String, Long, Long)].collect()
    assert(stripped.length === docs.length)
    stripped.foreach { case (id, clean, kept, removed) =>
      val ts = docs.toMap.apply(id).split("\\s+")
      val cov = covered.getOrElse(id, Set.empty)
      val expectClean = ts.zipWithIndex.collect {
        case (tok, i) if !cov((i + 1).toLong) => tok }.mkString(" ")
      assert(clean === expectClean, id)
      assert(kept === ts.length - cov.size, id)
      assert(removed === cov.size, id)
    }
  }
}
