package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Registry integrity after the round-11 family regrouping: SparkEntry
 * merges 13 registries with `++`, which on a duplicated query name would
 * silently keep the LAST definition — a gate could be overridden without
 * any test noticing. These checks make a collision (and an oracle naming
 * a query that does not exist) a named failure.
 */
class RegistrySpec extends AnyFunSuite {

  private val registries: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("TrainingQueries", TrainingQueries.queries, TrainingQueries.oracleSql),
      ("ParityQueries", ParityQueries.queries, ParityQueries.oracleSql),
      ("FuzzQueries", FuzzQueries.queries, FuzzQueries.oracleSql),
      ("IoQueries", IoQueries.queries, IoQueries.oracleSql),
      ("ColumnOpsQueries", ColumnOpsQueries.queries, ColumnOpsQueries.oracleSql),
      ("SamplingQueries", SamplingQueries.queries, SamplingQueries.oracleSql),
      ("GraphQueries", GraphQueries.queries, GraphQueries.oracleSql),
      ("SkewQueries", SkewQueries.queries, SkewQueries.oracleSql),
      ("StreamingQueries", StreamingQueries.queries, StreamingQueries.oracleSql),
      ("SketchQueries", SketchQueries.queries, SketchQueries.oracleSql),
      ("RangeJoinQueries", RangeJoinQueries.queries, RangeJoinQueries.oracleSql),
      ("DedupQueries", DedupQueries.queries, DedupQueries.oracleSql))

  test("no query name is defined by more than one registry") {
    val perRegistry = registries.flatMap { case (r, qs, _) =>
      qs.keys.map(_ -> r)
    } ++ SparkEntry.coreQueries.keys.map(_ -> "SparkEntry.core")
    val dups = perRegistry.groupBy(_._1).filter(_._2.size > 1)
      .map { case (q, rs) => s"$q in ${rs.map(_._2).mkString("+")}" }
    assert(dups.isEmpty, s"query names defined twice (Map ++ silently " +
      s"keeps the last — a gate is being overridden): $dups")
    // with uniqueness proven, the merged total must be exactly the sum
    val sum = registries.map(_._2.size).sum + SparkEntry.coreQueries.size
    assert(SparkEntry.queries.size == sum,
      s"merged registry lost entries: ${SparkEntry.queries.size} != $sum")
  }

  test("every oracle names a defined query; every gate has an oracle or a documented value check") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val orphanOracles = os -- qs
    assert(orphanOracles.isEmpty,
      s"oracles with no query (typo in a name?): $orphanOracles")
    // the driver records rows-only for queries without SQL oracles;
    // scripts/check_oracle.py value-checks exactly this quartet
    val valueChecked = Set("q_keyhash_mmh3", "q_sample_n_replace",
      "q_sim_ivf_topk", "q_agg_registry_approx")
    val unchecked = qs -- os -- valueChecked
    assert(unchecked.isEmpty,
      s"gates with neither a SQL oracle nor a registered value check: $unchecked")
  }

  test("per-registry oracle keys are a subset of that registry's queries") {
    val bad = registries.flatMap { case (r, qs, os) =>
      (os.keySet -- qs.keySet).map(k => s"$r: $k")
    }
    assert(bad.isEmpty,
      s"oracle entries whose query lives in a DIFFERENT registry: $bad")
  }
}
