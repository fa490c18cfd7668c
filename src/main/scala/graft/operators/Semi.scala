package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column handling — the event-properties surface
  * of an analytics engine: typed extraction from a JSON string column and
  * the per-group field profile that audits it.
  *
  * Reference shape: event/property payloads ride along the fixed columns
  * as JSON (the `events.props` column here); analytics want them TYPED,
  * and a 100 TB scan cannot afford a per-row parser in interpreted code.
  * Spark-first: `from_json` (Catalyst JsonToStructs — a single codegen'd
  * Jackson pass per row) with an EXPLICIT narrow schema, so only the
  * requested fields are materialized; malformed payloads yield null
  * (PERMISSIVE) and are COUNTED, never dropped silently or thrown on —
  * at corpus scale a poison row must be visible, not fatal.
  */
object Semi {

  /** Add typed columns extracted from `jsonCol` under `schemaDdl` (e.g.
    * `"k INT, tag STRING"`). One parse per row; each field lands as its
    * own top-level column named as in the schema. Malformed rows leave
    * every extracted column null. */
  def extractTyped(df: DataFrame, jsonCol: String,
                   schemaDdl: String): DataFrame = {
    val parsed = df.withColumn("_parsed",
      from_json(col(jsonCol), schemaDdl, Map.empty[String, String]))
    val fields = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
      .fieldNames.toSeq
    fields.foldLeft(parsed) { (acc, f) =>
      acc.withColumn(f, col("_parsed").getField(f))
    }.drop("_parsed")
  }

  /** Per-group profile of one numeric JSON field: row/unparsed counts and
    * the value distribution — the audit a pipeline runs before trusting a
    * semi-structured column. One hash aggregation; the parse is map-side
    * and schema-pruned to the single field. */
  def jsonFieldProfile(df: DataFrame, groupCol: String, jsonCol: String,
                       field: String, fieldType: String = "INT"): DataFrame = {
    val typed = extractTyped(df, jsonCol, s"$field $fieldType")
    typed.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col(field).isNull.cast("long")).as("n_unparsed"),
        round(avg(col(field)), 6).as(s"avg_$field"),
        min(col(field)).as(s"min_$field"),
        max(col(field)).as(s"max_$field"),
        countDistinct(col(field)).as(s"n_distinct_$field"))
  }
}
