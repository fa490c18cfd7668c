package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation for hot keys.
  *
  * At 100 TB a handful of symbols (or LSH buckets) can dominate a shuffle
  * partition. AQE's skew handling covers joins; for aggregations whose
  * partial state is reassociable (sum/count/min/max), salting splits each
  * hot key across `salts` reducers and recombines:
  *
  *   phase 1: groupBy(key, salt = pmod(hash(ord), salts)) → partial aggs
  *   phase 2: groupBy(key) → combine partials
  *
  * The first shuffle spreads a hot key over `salts` partitions; the second
  * shuffles only `salts` rows per key.
  */
object Salting {

  /** Salted sum/count over possibly-skewed keys: returns one row per key
    * with `sum_<valueCol>` and `cnt`. `entropyCol` must vary within a key
    * (an ingestion id, a timestamp). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     entropyCol: String, salts: Int = 16): DataFrame = {
    val salt = pmod(hash(col(entropyCol)), lit(salts)).as("_salt")
    val partial = df
      .groupBy((keys.map(col) :+ salt): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("cnt"))
  }
}
