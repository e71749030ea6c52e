package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
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

  /** Flatten a JSON string column into typed top-level columns appended
    * after the existing ones (the JSON column itself is dropped).
    * `schema = None` infers from a bounded sample via
    * [[inferJsonSchema]]; pass an explicit schema for a stable contract.
    * Rows whose JSON fails to parse yield nulls in every extracted
    * column (from_json PERMISSIVE default) rather than failing the job.
    */
  def flattenJson(
      df: DataFrame,
      jsonCol: String,
      schema: Option[StructType] = None,
      sampleRows: Int = 1000
  ): DataFrame = {
    val s = schema.getOrElse(inferJsonSchema(df, jsonCol, sampleRows))
    val keptNames = df.columns.filterNot(_ == jsonCol)
    val clash = s.fieldNames.toSet.intersect(keptNames.toSet)
    require(clash.isEmpty,
      s"JSON keys collide with existing columns: ${clash.mkString(", ")} — " +
        "pass an explicit schema with renamed fields")
    df.withColumn("__graft_json", from_json(col(jsonCol), s))
      .select(keptNames.map(col).toSeq :+ col("__graft_json.*"): _*)
  }
}
