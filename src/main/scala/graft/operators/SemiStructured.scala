package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (JSON) column extraction — crawl pipelines carry
  * metadata sidecars (fetch headers, page stats, labeler outputs) as
  * JSON strings; training-data curation needs them as typed columns.
  *
  * The scale-correct shape: infer the schema ONCE, driver-side, from a
  * bounded sample, then apply `from_json` with that fixed schema across
  * the corpus — codegen'd, no per-row schema discovery, and the output
  * schema is stable regardless of which executor sees which rows
  * (per-partition inference would let ragged key sets produce
  * divergent schemas). Keys absent from the sample surface as nulls —
  * size `sampleRows` to cover the key population, or pass an explicit
  * `schema` when the contract is known.
  */
object SemiStructured {

  /** Infer the JSON schema of `jsonCol` from a bounded sample of
    * non-null values (one driver-side job).
    *
    * The sample is ORDERED before the limit: a bare limit on a
    * multi-partition source can pick different rows run to run, which
    * would make the inferred schema — the output CONTRACT — itself
    * nondeterministic. Ordering by a HASH of the value (ties by the
    * value) keeps the sample deterministic without biasing it toward
    * lexicographically small payloads, whose key set may not represent
    * the corpus; TakeOrdered keeps the pass bounded at scale.
    * Permissive inference surfaces malformed sample rows as Spark's
    * corrupt-record column; that is a parser artifact, not a data
    * field, so it is excluded from the result.
    */
  def inferJsonSchema(df: DataFrame, jsonCol: String, sampleRows: Int = 1000): StructType = {
    val sample = df.select(col(jsonCol)).na.drop()
      .orderBy(xxhash64(col(jsonCol)), col(jsonCol)).limit(sampleRows)
      .as(Encoders.STRING)
    val inferred = df.sparkSession.read.json(sample).schema
    val corrupt = df.sparkSession.conf
      .get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    StructType(inferred.fields.filterNot(_.name == corrupt))
  }

  /** Flatten a JSON string column into typed columns appended after
    * the existing ones (the JSON column itself is dropped). Nested
    * objects flatten RECURSIVELY with `parent_child` name mangling —
    * `{"device": {"os": "x"}}` becomes column `device_os` — to any
    * depth (`recurse = false` restores top-level-only, keeping nested
    * objects as struct columns). Arrays are kept as-is at whatever
    * level they appear: flattening an array is an explode — a row
    * multiplier, not a column extraction — and callers must opt into
    * that separately.
    *
    * `schema = None` infers from a bounded sample via
    * [[inferJsonSchema]]; pass an explicit schema for a stable
    * contract. Rows whose JSON fails to parse yield nulls in every
    * extracted column (from_json PERMISSIVE default) rather than
    * failing the job. Name collisions — flattened names against
    * existing columns, flattened names among themselves (`{"a_b": 1,
    * "a": {"b": 2}}`), or anything claiming the reserved temp name —
    * are rejected loudly rather than silently overwritten.
    */
  def flattenJson(
      df: DataFrame,
      jsonCol: String,
      schema: Option[StructType] = None,
      sampleRows: Int = 1000,
      recurse: Boolean = true
  ): DataFrame = {
    val s = schema.getOrElse(inferJsonSchema(df, jsonCol, sampleRows))
    val keptNames = df.columns.filterNot(_ == jsonCol)
    val tmp = "__graft_json"
    def leaves(prefix: String, path: Column, dt: org.apache.spark.sql.types.DataType): Seq[(String, Column)] =
      dt match {
        case st: StructType if recurse && st.fields.nonEmpty =>
          st.fields.toSeq.flatMap(f =>
            leaves(prefix + "_" + f.name, path.getField(f.name), f.dataType))
        case _ => Seq(prefix -> path)
      }
    val extracted: Seq[(String, Column)] =
      s.fields.toSeq.flatMap(f => leaves(f.name, col(tmp).getField(f.name), f.dataType))
    val outNames = extracted.map(_._1)
    val selfClash = outNames.diff(outNames.distinct).distinct
    require(selfClash.isEmpty,
      s"flattened JSON names collide among themselves: ${selfClash.mkString(", ")} — " +
        "pass an explicit schema with renamed fields")
    val clash = outNames.toSet.intersect(keptNames.toSet)
    require(clash.isEmpty,
      s"JSON keys collide with existing columns: ${clash.mkString(", ")} — " +
        "pass an explicit schema with renamed fields")
    require(!keptNames.contains(tmp) && !outNames.contains(tmp),
      s"the name $tmp is reserved by flattenJson (internal parse column) — " +
        "rename the input column / JSON field")
    df.withColumn(tmp, from_json(col(jsonCol), s))
      .select(keptNames.map(col) ++ extracted.map { case (n, c) => c.as(n) }: _*)
  }
}
