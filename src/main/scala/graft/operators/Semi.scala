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

  /** Per-group profile of one numeric JSON field: row counts, TRUE parse
    * failures (`n_malformed`: non-null payload whose parse returned null
    * — a missing or null FIELD in valid JSON is `n_null_field`, not a
    * failure; conflating them masks real malformed-row regressions behind
    * optional properties), and the value distribution — the audit a
    * pipeline runs before trusting a semi-structured column. One hash
    * aggregation; the parse is map-side and schema-pruned to the single
    * field. */
  def jsonFieldProfile(df: DataFrame, groupCol: String, jsonCol: String,
                       field: String, fieldType: String = "INT"): DataFrame = {
    // PERMISSIVE from_json yields a struct of NULL fields for malformed
    // input (not a null struct), so true failures are only visible via
    // the corrupt-record column, which captures the raw payload
    val parsed = df.withColumn("_parsed",
        from_json(col(jsonCol), s"$field $fieldType, _corrupt STRING",
          Map("columnNameOfCorruptRecord" -> "_corrupt")))
      .withColumn("_malformed",
        col("_parsed").getField("_corrupt").isNotNull.cast("long"))
      .withColumn(field, col("_parsed").getField(field))
    parsed.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_malformed")).as("n_malformed"),
        sum(col(field).isNull.cast("long")).as("n_null_field"),
        round(avg(col(field)), 6).as(s"avg_$field"),
        min(col(field)).as(s"min_$field"),
        max(col(field)).as(s"max_$field"),
        countDistinct(col(field)).as(s"n_distinct_$field"))
  }
}
