/**
 * Box-state calibration workload (round-17, verdict item 1).
 *
 * A FIXED CPU + shuffle + parquet-scan mix run from a PINNED jar
 * (scripts/calib/graft-calib.jar, compiled once from this file and
 * committed — never rebuilt with the library), scored immediately before
 * every bench sweep. The score is a measured box-speed denominator:
 * cross-round geomeans divide by it, so a slow box-night is visible
 * BEFORE attribution instead of after a worktree binary A/B (rounds
 * 14-16 each burned their headline effort on exactly that archaeology).
 *
 * Deliberately independent of the graft library: only Spark built-ins,
 * deterministic inputs (spark.range), fixed sizes, fixed parallelism
 * (local[32], 32 shuffle partitions — the sweep environment). Changing
 * ANY of this invalidates cross-round comparability; bump the workload
 * version and re-pin deliberately if ever required.
 *
 * Usage: java -cp graft-calib.jar:/opt/spark/jars/* CalibWorkload [out.json]
 * Output: one JSON line, e.g.
 *   {"workload":"calib_v1","score_sec":5.1,"passes":[...],"components":{...}}
 * score_sec = median of the LAST 3 of 4 pass totals: the first pass
 * absorbs JIT/page warm-up and is reported but never scored, so the
 * score reflects steady-state box speed.
 */
import java.util.Arrays;
import java.util.Locale;
import org.apache.spark.sql.SparkSession;

public class CalibWorkload {

  private static double median(double[] xs) {
    double[] s = xs.clone();
    Arrays.sort(s);
    return s[s.length / 2];
  }

  private static String arr(double[] xs) {
    StringBuilder b = new StringBuilder("[");
    for (int i = 0; i < xs.length; i++) {
      if (i > 0) b.append(",");
      b.append(String.format(Locale.ROOT, "%.3f", xs[i]));
    }
    return b.append("]").toString();
  }

  private static void rmTree(java.nio.file.Path p) throws Exception {
    if (!java.nio.file.Files.exists(p)) return;
    java.util.stream.Stream<java.nio.file.Path> walk = java.nio.file.Files.walk(p);
    try {
      walk.sorted(java.util.Comparator.reverseOrder()).forEach(f -> {
        try { java.nio.file.Files.delete(f); } catch (Exception e) { }
      });
    } finally {
      walk.close();
    }
  }

  public static void main(String[] args) throws Exception {
    String out = args.length > 0 ? args[0] : "/tmp/graft_calib.json";
    SparkSession spark = SparkSession.builder()
        .master("local[32]")
        .appName("graft-calib")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate();
    spark.sparkContext().setLogLevel("ERROR");
    // JIT/codegen + scheduler warm-up (same convention as graft.Bench)
    spark.range(1000000).selectExpr("sum(id)").collect();

    java.nio.file.Path scratch =
        java.nio.file.Files.createTempDirectory("graft_calib");
    String pq = scratch.resolve("t.parquet").toString();
    // fixed parquet fixture, written once per calibration run
    // (deterministic contents; the write is not part of the score)
    spark.range(100000000L)
        .selectExpr("id", "cast(id % 97 as string) as s", "id * 2.5 as d")
        .repartition(32)
        .write().mode("overwrite").parquet(pq);

    final int PASSES = 4;
    double[] cpu = new double[PASSES], shuffle = new double[PASSES],
        scan = new double[PASSES], totals = new double[PASSES];
    for (int p = 0; p < PASSES; p++) {
      long t0 = System.nanoTime();
      // CPU: codegen'd hash chain over 1B rows, no shuffle (the % keeps
      // the ANSI-mode sum from overflowing long)
      spark.range(1000000000L)
          .selectExpr("sum(xxhash64(xxhash64(id)) % 100000)").collect();
      long t1 = System.nanoTime();
      // shuffle: 150M rows through a 1M-key hash aggregate
      spark.range(150000000L)
          .selectExpr("id % 1000000 as k", "id as v")
          .groupBy("k")
          .agg(org.apache.spark.sql.functions.sum("v"),
               org.apache.spark.sql.functions.count("v"))
          .selectExpr("sum(hash(k))").collect();
      long t2 = System.nanoTime();
      // scan: full read of the 100M-row parquet + mixed aggregate
      spark.read().parquet(pq)
          .selectExpr("sum(xxhash64(s) % 100000)", "avg(d)",
                      "count(distinct id % 1000)")
          .collect();
      long t3 = System.nanoTime();
      cpu[p] = (t1 - t0) / 1e9;
      shuffle[p] = (t2 - t1) / 1e9;
      scan[p] = (t3 - t2) / 1e9;
      totals[p] = (t3 - t0) / 1e9;
    }
    rmTree(scratch);

    String json = String.format(Locale.ROOT,
        "{\"workload\":\"calib_v1\",\"score_sec\":%.3f,\"passes\":%s,"
            + "\"components\":{\"cpu\":%s,\"shuffle\":%s,\"scan\":%s},"
            + "\"medians\":{\"cpu\":%.3f,\"shuffle\":%.3f,\"scan\":%.3f}}",
        median(Arrays.copyOfRange(totals, 1, PASSES)), arr(totals),
        arr(cpu), arr(shuffle), arr(scan),
        median(Arrays.copyOfRange(cpu, 1, PASSES)),
        median(Arrays.copyOfRange(shuffle, 1, PASSES)),
        median(Arrays.copyOfRange(scan, 1, PASSES)));
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json.getBytes("UTF-8"));
    System.out.println(json);
    spark.stop();
  }
}
