package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.XDF

/**
 * Property-based differential gates: randomly generated operator
 * pipelines (filters from the §2.3 family -> optional aggregate ->
 * deterministic sort) emitted simultaneously as an XDF chain and as the
 * equivalent DuckDB SQL. The generator is seeded, so the SAME pipelines
 * are produced in every JVM — they plug into the ordinary
 * Verify/check_oracle machinery as first-class gates rather than an
 * in-process fuzz loop, giving the differential harness coverage of
 * operator COMPOSITIONS no hand-written gate exercises.
 *
 * Literal pools come from the TPC-H column domains (stable at every
 * scale factor), so filters hit a mix of empty, narrow, and broad
 * selectivities. Double-typed aggregates round to 2 decimals on both
 * sides (the q_agg_basic convention) to absorb summation-order ulps.
 */
object FuzzQueries {

  private case class Col(name: String, kind: String) // int | float | str

  private case class Table(name: String, cols: Seq[Col],
                           strPool: Map[String, Seq[String]],
                           numPool: Map[String, Seq[Long]])

  private val tables = Seq(
    Table("orders",
      Seq(Col("o_orderkey", "int"), Col("o_custkey", "int"),
        Col("o_totalprice", "float"), Col("o_orderpriority", "str"),
        Col("o_orderstatus", "str")),
      strPool = Map(
        "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"),
        "o_orderstatus" -> Seq("O", "F", "P")),
      numPool = Map(
        "o_orderkey" -> Seq(1000L, 30000L),
        "o_custkey" -> Seq(100L, 700L),
        "o_totalprice" -> Seq(50000L, 120000L, 200000L))),
    Table("lineitem",
      Seq(Col("l_orderkey", "int"), Col("l_linenumber", "int"),
        Col("l_quantity", "float"), Col("l_extendedprice", "float"),
        Col("l_returnflag", "str"), Col("l_linestatus", "str")),
      strPool = Map(
        "l_returnflag" -> Seq("A", "N", "R"),
        "l_linestatus" -> Seq("O", "F")),
      numPool = Map(
        "l_orderkey" -> Seq(5000L, 20000L),
        "l_linenumber" -> Seq(2L, 4L),
        "l_quantity" -> Seq(10L, 25L, 40L),
        "l_extendedprice" -> Seq(20000L, 50000L))),
    Table("customer",
      Seq(Col("c_custkey", "int"), Col("c_nationkey", "int"),
        Col("c_acctbal", "float"), Col("c_mktsegment", "str")),
      strPool = Map(
        "c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY")),
      numPool = Map(
        "c_custkey" -> Seq(200L, 900L),
        "c_nationkey" -> Seq(8L, 15L),
        "c_acctbal" -> Seq(0L, 2500L, 6000L))))

  /** One generated step: the XDF transform and its SQL WHERE clause. */
  private case class Filter(fn: XDF => XDF, sql: String)

  private def genFilter(rnd: scala.util.Random, t: Table): Filter = {
    def q(s: String) = s.replace("'", "''")
    val c = t.cols(rnd.nextInt(t.cols.length))
    c.kind match {
      case "str" =>
        val pool = t.strPool(c.name)
        rnd.nextInt(4) match {
          case 0 =>
            val v = pool(rnd.nextInt(pool.length))
            Filter(_.eqStr(c.name, v), s"${c.name} = '${q(v)}'")
          case 1 =>
            val v = pool(rnd.nextInt(pool.length))
            Filter(_.notEqStr(c.name, v), s"${c.name} <> '${q(v)}'")
          case 2 =>
            val vs = rnd.shuffle(pool).take(1 + rnd.nextInt(2))
            Filter(_.valuesIn(c.name, vs),
              s"${c.name} IN (${vs.map(v => s"'${q(v)}'").mkString(", ")})")
          case _ =>
            val v = pool(rnd.nextInt(pool.length)).take(1)
            Filter(_.startswith(c.name, v), s"${c.name} LIKE '${q(v)}%'")
        }
      case "int" =>
        val pool = t.numPool(c.name)
        val v = pool(rnd.nextInt(pool.length))
        rnd.nextInt(3) match {
          case 0 => Filter(_.gtInt(c.name, v), s"${c.name} > $v")
          case 1 => Filter(_.leInt(c.name, v), s"${c.name} <= $v")
          case _ => Filter(_.notEqInt(c.name, v), s"${c.name} <> $v")
        }
      case _ => // float
        val pool = t.numPool(c.name)
        val v = pool(rnd.nextInt(pool.length))
        if (rnd.nextBoolean())
          Filter(_.gtFloat(c.name, v.toDouble), s"${c.name} > $v")
        else
          Filter(_.leFloat(c.name, v.toDouble), s"${c.name} <= $v")
    }
  }

  /** Deterministically generate `n` pipelines (seeded). */
  private val pipelines: Seq[(String, Table, Seq[Filter],
      Option[(Seq[String], Seq[(String, String)])])] = {
    val rnd = new scala.util.Random(424242L)
    (0 until 16).map { i =>
      val t = tables(rnd.nextInt(tables.length))
      val filters = Seq.fill(1 + rnd.nextInt(3))(genFilter(rnd, t))
      // half the pipelines aggregate: 1-2 string keys, 1-2 numeric aggs
      val agg =
        if (rnd.nextBoolean() && t.strPool.nonEmpty) {
          val keys = rnd.shuffle(t.strPool.keys.toSeq).take(1 + rnd.nextInt(2))
          val numCols = t.cols.filter(c => c.kind != "str").map(_.name)
          val funcs = Seq("sum", "count", "min", "max")
          val aggs = Seq.fill(1 + rnd.nextInt(2))(
            (numCols(rnd.nextInt(numCols.length)), funcs(rnd.nextInt(funcs.length))))
            .distinct
          Some((keys, aggs))
        } else None
      (f"q_fuzz_$i%02d", t, filters, agg)
    }
  }

  // ===== generated JOIN pipelines (q_fuzz_16..23) =====
  // The scalar fuzz above never crosses a table boundary; these compose
  // filter -> equi-join (differently-named FK -> PK keys, so the
  // rkey-copy mechanism is exercised) -> optional aggregate. Left joins
  // stay aggregate-free and sort on ALL left columns — non-null on both
  // engines (no NULLS FIRST/LAST divergence), and total in output terms:
  // the right side joins FK -> PK (at most one match), so every output
  // row is a function of its left row, and rows tying on every left
  // column are identical. (Left primary keys alone would NOT do: the
  // synthetic lineitem has duplicate (l_orderkey, l_linenumber) pairs.)
  // Aggregates run on inner joins where every group key is non-null.

  private val nationTable = Table("nation",
    Seq(Col("n_nationkey", "int"), Col("n_name", "str"),
      Col("n_regionkey", "int")),
    strPool = Map(
      "n_name" -> Seq("NATION_0", "NATION_3", "NATION_7", "NATION_12",
        "NATION_24")),
    numPool = Map(
      "n_nationkey" -> Seq(8L, 15L),
      "n_regionkey" -> Seq(1L, 3L)))

  /** (left table, right table, left key, right key). */
  private case class JoinPair(lt: Table, rt: Table, lk: String, rk: String)

  private val joinPairs = Seq(
    JoinPair(tables(0), tables(2), "o_custkey", "c_custkey"),
    JoinPair(tables(1), tables(0), "l_orderkey", "o_orderkey"),
    JoinPair(tables(2), nationTable, "c_nationkey", "n_nationkey"))

  private val joinPipelines: Seq[(String, JoinPair, Seq[Filter], Seq[Filter],
      String, Option[(Seq[String], Seq[(String, String)])])] = {
    val rnd = new scala.util.Random(626262L)
    (0 until 8).map { i =>
      val p = joinPairs(rnd.nextInt(joinPairs.length))
      val lFilters = Seq.fill(rnd.nextInt(3))(genFilter(rnd, p.lt))
      val rFilters = Seq.fill(rnd.nextInt(2))(genFilter(rnd, p.rt))
      val joinType = if (rnd.nextBoolean()) "inner" else "left"
      val agg =
        if (joinType == "inner" && rnd.nextBoolean()) {
          val keyPool = (p.lt.strPool.keys ++ p.rt.strPool.keys).toSeq.sorted
          val keys = rnd.shuffle(keyPool).take(1 + rnd.nextInt(2))
          val numCols = (p.lt.cols ++ p.rt.cols)
            .filter(_.kind != "str").map(_.name)
          val funcs = Seq("sum", "count", "min", "max")
          val aggs = Seq.fill(1 + rnd.nextInt(2))(
            (numCols(rnd.nextInt(numCols.length)), funcs(rnd.nextInt(funcs.length))))
            .distinct
          Some((keys, aggs))
        } else None
      (f"q_fuzz_${16 + i}%02d", p, lFilters, rFilters, joinType, agg)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    pipelines.map { case (name, t, filters, agg) =>
      name -> { (s: SparkSession, dir: String) =>
        val base = XDF(s.read.parquet(s"$dir/${t.name}.parquet")
          .select(t.cols.map(c => col(c.name)): _*))
        val filtered = filters.foldLeft(base)((x, f) => f.fn(x))
        agg match {
          case Some((keys, aggs)) =>
            val agged = filtered.aggregate(keys,
              aggs.map(_._1), aggs.map(_._2))
            // round double-valued aggregates on both sides
            val rounded = aggs.foldLeft(agged) { case (x, (c, f)) =>
              if (f == "count") x
              else {
                val n = s"$c:$f"
                x.transform(n, round(col(n), 2))
              }
            }
            val outCols = keys ++ aggs.map { case (c, f) => s"$c:$f" }
            rounded.toDF.orderBy(outCols.map(col): _*)
          case None =>
            filtered.toDF.orderBy(t.cols.map(c => col(c.name)): _*)
        }
      }
    }.toMap ++ joinPipelines.map { case (name, p, lFilters, rFilters, joinType, agg) =>
      name -> { (s: SparkSession, dir: String) =>
        def side(t: Table, fs: Seq[Filter]): XDF =
          fs.foldLeft(XDF(s.read.parquet(s"$dir/${t.name}.parquet")
            .select(t.cols.map(c => col(c.name)): _*)))((x, f) => f.fn(x))
        val l = side(p.lt, lFilters)
        val r = side(p.rt, rFilters)
        val joined =
          if (joinType == "inner") l.innerJoin(r, Seq(p.lk), Seq(p.rk))
          else l.leftJoin(r, Seq(p.lk), Seq(p.rk))
        agg match {
          case Some((keys, aggs)) =>
            val agged = joined.aggregate(keys, aggs.map(_._1), aggs.map(_._2))
            val rounded = aggs.foldLeft(agged) { case (x, (c, f)) =>
              if (f == "count") x
              else { val n = s"$c:$f"; x.transform(n, round(col(n), 2)) }
            }
            val outCols = keys ++ aggs.map { case (c, f) => s"$c:$f" }
            rounded.toDF.orderBy(outCols.map(col): _*)
          case None =>
            joined.toDF.orderBy(p.lt.cols.map(c => col(c.name)): _*)
        }
      }
    }.toMap

  def oracleSql: Map[String, String] =
    pipelines.map { case (name, t, filters, agg) =>
      val where =
        if (filters.isEmpty) "" else s" WHERE ${filters.map(_.sql).mkString(" AND ")}"
      val sql = agg match {
        case Some((keys, aggs)) =>
          val aggExprs = aggs.map { case (c, f) =>
            val alias = s""""$c:$f""""
            f match {
              case "count" => s"CAST(count($c) AS BIGINT) AS $alias"
              case "sum"   => s"round(sum(CAST($c AS DOUBLE)), 2) AS $alias"
              case "min"   => s"round(min(CAST($c AS DOUBLE)), 2) AS $alias"
              case "max"   => s"round(max(CAST($c AS DOUBLE)), 2) AS $alias"
            }
          }
          val outCols = keys.map(k => k) ++ aggs.map { case (c, f) => s""""$c:$f"""" }
          s"""SELECT ${(keys ++ aggExprs).mkString(", ")}
              FROM ${t.name}$where
              GROUP BY ${keys.mkString(", ")}
              ORDER BY ${outCols.mkString(", ")}"""
        case None =>
          s"""SELECT ${t.cols.map(_.name).mkString(", ")}
              FROM ${t.name}$where
              ORDER BY ${t.cols.map(_.name).mkString(", ")}"""
      }
      name -> sql
    }.toMap ++ joinPipelines.map { case (name, p, lFilters, rFilters, joinType, agg) =>
      def cte(alias: String, t: Table, fs: Seq[Filter]): String = {
        val where =
          if (fs.isEmpty) "" else s" WHERE ${fs.map(_.sql).mkString(" AND ")}"
        s"$alias AS (SELECT ${t.cols.map(_.name).mkString(", ")} FROM ${t.name}$where)"
      }
      val withClause =
        s"WITH ${cte("lf", p.lt, lFilters)}, ${cte("rf", p.rt, rFilters)}"
      val joinKw = if (joinType == "inner") "JOIN" else "LEFT JOIN"
      val from = s"FROM lf $joinKw rf ON lf.${p.lk} = rf.${p.rk}"
      val sql = agg match {
        case Some((keys, aggs)) =>
          val aggExprs = aggs.map { case (c, f) =>
            val alias = s""""$c:$f""""
            f match {
              case "count" => s"CAST(count($c) AS BIGINT) AS $alias"
              case "sum"   => s"round(sum(CAST($c AS DOUBLE)), 2) AS $alias"
              case "min"   => s"round(min(CAST($c AS DOUBLE)), 2) AS $alias"
              case "max"   => s"round(max(CAST($c AS DOUBLE)), 2) AS $alias"
            }
          }
          val outCols = keys ++ aggs.map { case (c, f) => s""""$c:$f"""" }
          s"""$withClause
              SELECT ${(keys ++ aggExprs).mkString(", ")} $from
              GROUP BY ${keys.mkString(", ")}
              ORDER BY ${outCols.mkString(", ")}"""
        case None =>
          s"""$withClause
              SELECT lf.*, rf.* $from
              ORDER BY ${p.lt.cols.map(_.name).mkString(", ")}"""
      }
      name -> sql
    }.toMap
}
