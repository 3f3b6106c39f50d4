package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Recursive JSON flattener — the engine's `explode_json`
 * (reference: dataframe.py:4292-4682, the largest single operator there).
 *
 * Reference semantics preserved:
 *  - nested maps flatten to `parent:child` columns (prefix joined with ':');
 *  - lists of structs fan out to rows, with `prefix:__explode_json_index__`
 *    position and `prefix:__explode_json_len__` count sidecars;
 *  - primitive lists either CSV-join in place (`collapsePrimitiveList=true`,
 *    the reference default) or fan out;
 *  - `acceptedCols` / `excludedCols` restrict which top-level keys survive;
 *  - `nestedCols` subtrees stay as JSON strings (`:json_encoded` suffix).
 *
 * Architecture difference: the reference walks parsed dicts row-by-row in
 * Python and discovers the output schema from the data. Here the schema
 * comes from Spark's distributed JSON inference (`schema_of_json` over the
 * data via spark.read.json) once, then the whole flatten is a static
 * `select` of nested field paths + `posexplode` — lazy, codegen'd,
 * column-pruned. No per-row interpretation.
 */
object JsonFlattener {

  // Inputs persisted for schema inference (see explodeJson) register in
  // the shared graft.core.Caches tracker — a pure cache, released by the
  // caller after the consuming action (Bench/Verify do per query).
  /** Unpersist every operator-tracked cache since the last call — kept as
    * the historical entry point; delegates to [[Caches.release]]. */
  def releaseInferredCaches(): Unit = Caches.release()

  /** Infer the schema of a JSON string column. `sampleRows` bounds the
    * inference scan (homogeneous payloads need only a few rows; a full
    * corpus pass would double every explode_json). Pass 0 for a full
    * scan, or supply the schema explicitly to skip inference entirely. */
  def inferSchema(df: DataFrame, jsonCol: String,
                  sampleRows: Int = 1000, maxFields: Int = 10000): StructType = {
    import df.sparkSession.implicits._
    val src = if (sampleRows > 0) df.select(col(jsonCol)).limit(sampleRows)
              else df.select(col(jsonCol))
    val sch = df.sparkSession.read.json(src.as[String]).schema
    // The row sample bounds the SCAN, not the KEY SPACE: one row holding
    // a million-key object still yields a million-field schema, which
    // OOMs the driver and the projection downstream. Fail loudly.
    val leaves = countLeaves(sch)
    if (leaves > maxFields)
      throw new IllegalStateException(
        s"explode_json: inferred schema has $leaves leaf fields " +
          s"(> maxFields=$maxFields) — a per-key column layout is not " +
          "viable for this payload. Pass schema= with the fields you " +
          "need (acceptedCols prunes the rest), or raise maxFields " +
          "deliberately.")
    sch
  }

  private def countLeaves(dt: DataType): Int = dt match {
    case st: StructType => st.fields.map(f => countLeaves(f.dataType)).sum
    case at: ArrayType  => countLeaves(at.elementType)
    case mt: MapType    => countLeaves(mt.valueType)
    case _              => 1
  }

  /**
   * Flatten a JSON string column into `prefix:`-namespaced columns.
   * One array-of-struct fan-out level per call is applied for every array
   * encountered (arrays at different paths fan out independently =
   * the reference's `join` merge mode / Cartesian; reference
   * dataframe.py:4577-4579).
   */
  def explodeJson(df: DataFrame, jsonCol: String, prefix: String,
                  acceptedCols: Seq[String] = Nil,
                  excludedCols: Seq[String] = Nil,
                  nestedCols: Seq[String] = Nil,
                  collapsePrimitiveList: Boolean = true,
                  dropInput: Boolean = true,
                  arrayMergeMode: String = "join",
                  singleValueListCols: Seq[String] = Nil,
                  maxResults: Int = -1,
                  transposeColGroups: Seq[String] = Nil,
                  schema: StructType = null,
                  maxTransposeKeys: Int = 10000): DataFrame = {
    // When inferring, persist the input first: inference is an ACTION on
    // the upstream plan, and without the persist a computed input (e.g. a
    // full aggregation) executes twice — once for inference, once for the
    // flatten itself (measured 2x on q_explode_json_array). The cache
    // populates during inference and the flatten reuses it. At corpus
    // scale pass `schema=` instead — schema-first is the contract there
    // (the persist trades memory for the double execution, and a bounded
    // sample can miss late-appearing keys regardless).
    val (input, sch) = if (schema != null) (df, schema)
    else {
      Log.warnOnce("explode_json: schema inferred from a bounded sample; " +
        "keys first appearing beyond it will be absent — pass schema= or " +
        "inferSchema(sampleRows = 0) for heterogeneous payloads")
      val cached = Caches.track(
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      (cached, inferSchema(cached, jsonCol))
    }
    val keep = (f: StructField) =>
      (acceptedCols.isEmpty || acceptedCols.contains(f.name)) &&
        !excludedCols.contains(f.name)
    val parsed = input.withColumn("__json__", from_json(col(jsonCol), sch))
    val (flatCols, arrayPaths0) = planFlatten(sch, "__json__", prefix,
      keep, nestedCols, collapsePrimitiveList)
    // single_value_list_cols (dataframe.py:4390-4398): arrays known to
    // carry one element flatten to that element, no fan-out
    val (singles, arrayPaths1) = arrayPaths0.partition { case (_, pfx, _) =>
      singleValueListCols.exists(c => pfx == s"$prefix:$c") }
    val singleCols = singles.flatMap { case (p, pfx, elemType) =>
      elemType match {
        case st: StructType =>
          st.fields.map(f => (s"$pfx:${f.name}",
            flattenLeaf(try_element_at(p, lit(1)).getField(f.name), f.dataType)))
        case dt => Seq((s"$pfx:value", flattenLeaf(try_element_at(p, lit(1)), dt)))
      }
    }
    // transpose_col_groups (dataframe.py:4522-4550): an array of
    // {key, value} entries pivots to one column per distinct key. Keys
    // are data — discovered from a bounded sample like the schema.
    val (transposed, arrayPaths2) = arrayPaths1.partition { case (_, pfx, t) =>
      transposeColGroups.exists(c => pfx == s"$prefix:$c") && (t match {
        case st: StructType => st.fieldNames.toSet == Set("key", "value")
        case _ => false
      })
    }
    val transposeCols: Seq[(String, Column)] = transposed.flatMap { case (p, pfx, _) =>
      // keys are data, so the discovery must be bounded BEFORE it becomes
      // a column layout: distinct first (a bounded scan of entries would
      // silently lose late-appearing keys — the round-9 defect), then
      // over-fetch by one so "at the cap" and "beyond it" are
      // distinguishable, and fail loudly naming the escape hatches.
      val discovered = parsed.select(explode(p).as("__e__"))
        .select(col("__e__.key").cast(StringType).as("__k__"))
        .filter(col("__k__").isNotNull)
        .distinct().limit(maxTransposeKeys + 1).collect().map(_.getString(0))
      if (discovered.length > maxTransposeKeys)
        throw new IllegalStateException(
          s"explode_json: transpose_col_groups '$pfx' has more than " +
            s"$maxTransposeKeys distinct keys — a per-key column layout " +
            "is not viable for this payload. Drop the group from " +
            "transposeColGroups (it stays an array column), or raise " +
            "maxTransposeKeys deliberately.")
      val keyRows = discovered.sorted
      // first-wins per key via filter (map_from_entries would throw on
      // duplicate or null keys under the default dedup policy)
      keyRows.toSeq.map { k =>
        (s"$pfx:$k",
          try_element_at(filter(p, e => e.getField("key").cast(StringType) === k),
            lit(1)).getField("value").cast(StringType))
      }
    }
    // max_results (dataframe.py:4330): cap per-row fan-out
    val arrayPaths = if (maxResults > 0)
      arrayPaths2.map { case (p, pfx, t) => (slice(p, 1, maxResults), pfx, t) }
    else arrayPaths2
    // scalar + collapsed + single-value-list + transposed columns first
    var out = parsed.select((df.columns.map(col) :+ col("__json__")) ++
      (flatCols ++ singleCols ++ transposeCols).map { case (name, c) => c.as(name) }: _*)

    def extractElem(pfx: String, elem: Column, elemType: DataType): Unit =
      elemType match {
        case st: StructType =>
          st.fields.foreach { f =>
            out = out.withColumn(s"$pfx:${f.name}",
              flattenLeaf(elem.getField(f.name), f.dataType))
          }
        case dt =>
          out = out.withColumn(s"$pfx:value", flattenLeaf(elem, dt))
      }

    if (arrayMergeMode == "cogroup" && arrayPaths.length > 1) {
      // pad-align ALL array paths positionally (reference's cogroup
      // merge, dataframe.py:4556-4576): one fan-out, arrays_zip pads
      // shorter lists with null. Null/missing arrays coalesce to empty —
      // arrays_zip is null-intolerant and would otherwise drop the row's
      // other arrays entirely.
      arrayPaths.foreach { case (p, pfx, _) =>
        out = out.withColumn(s"$pfx:__explode_json_len__",
          coalesce(size(p), lit(0)))
      }
      val zipped = arrays_zip(arrayPaths.zipWithIndex.map {
        case ((p, _, t), i) =>
          coalesce(p, array().cast(ArrayType(t))).as(s"a$i") }: _*)
      out = out.select(out.columns.map(col) :+
        posexplode_outer(zipped).as(Seq("__pos__", "__z__")): _*)
      arrayPaths.zipWithIndex.foreach { case ((_, pfx, elemType), i) =>
        out = out.withColumn(s"$pfx:__explode_json_index__", col("__pos__"))
        extractElem(pfx, col("__z__").getField(s"a$i"), elemType)
      }
      out = out.drop("__pos__", "__z__")
    } else {
      // each array path fans out independently = Cartesian across lists
      // (reference's join merge, dataframe.py:4577-4579)
      arrayPaths.foreach { case (pathExpr, pfx, elemType) =>
        out = out
          .withColumn("__arr__", pathExpr)
          .withColumn(s"$pfx:__explode_json_len__", coalesce(size(col("__arr__")), lit(0)))
          .select(out.columns.map(col) :+ col(s"$pfx:__explode_json_len__") :+
            posexplode_outer(col("__arr__")).as(Seq("__pos__", "__elem__")): _*)
          .withColumn(s"$pfx:__explode_json_index__", col("__pos__"))
        extractElem(pfx, col("__elem__"), elemType)
        out = out.drop("__arr__", "__pos__", "__elem__")
      }
    }
    out = out.drop("__json__")
    if (dropInput) out.drop(jsonCol) else out
  }

  /** Walk the schema: returns (flat scalar/collapsed columns, array-of-X
    * paths to fan out). */
  private def planFlatten(sch: StructType, rootCol: String, prefix: String,
                          keep: StructField => Boolean, nestedCols: Seq[String],
                          collapsePrimitiveList: Boolean)
      : (Seq[(String, Column)], Seq[(Column, String, DataType)]) = {
    val flat = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    val arrays = scala.collection.mutable.ArrayBuffer[(Column, String, DataType)]()

    def walk(dt: DataType, path: Column, name: String, topLevel: Boolean): Unit = dt match {
      case st: StructType =>
        st.fields.foreach { f =>
          if (!topLevel || keep(f)) {
            val childName = s"$name:${f.name}"
            if (nestedCols.contains(f.name))
              flat += ((s"$childName:json_encoded", to_json(path.getField(f.name))))
            else walk(f.dataType, path.getField(f.name), childName, topLevel = false)
          }
        }
      case ArrayType(elem: StructType, _) =>
        arrays += ((path, name, elem))
      case ArrayType(elem, _) =>
        if (collapsePrimitiveList)
          flat += ((name, array_join(path.cast(ArrayType(StringType)), ",")))
        else arrays += ((path, name, elem))
      case _ =>
        flat += ((name, flattenLeaf(path, dt)))
    }

    walk(sch, col(rootCol), prefix, topLevel = true)
    (flat.toSeq, arrays.toSeq)
  }

  /** Leaf rendering: everything becomes a string cell, per the engine's
    * string-typed compat surface; non-scalar leaves JSON-encode. */
  private def flattenLeaf(c: Column, dt: DataType): Column = dt match {
    case _: StructType | _: MapType | _: ArrayType => to_json(c)
    case BooleanType => when(c, "1").otherwise("0")
    case _ => c.cast(StringType)
  }
}
