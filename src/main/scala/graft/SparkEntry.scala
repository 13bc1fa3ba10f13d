package graft

import graft.config.TableSpec
import graft.envelope.FlinkDebeziumCdc
import graft.operators.{Dedup, MergeOps}
import graft.sources.CdcGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full CDC spine end-to-end: synthesize Debezium envelopes from
    * `events` → route one table → parse+normalize → last-write-wins dedup →
    * merge (upsert + physical delete) into a customer-derived target. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val spec = TableSpec(db = "cdc_db", table = "t0", primaryKey = Seq("id"))
    val target = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"), col("c_acctbal").as("val"))
    val raw = CdcGen.debezium(Tables.events(spark, dir))
    val routed = raw.filter(FlinkDebeziumCdc.route(col("value"), spec))
    val norm = FlinkDebeziumCdc.normalize(routed, CdcGen.payloadSchema)
    val stage = Dedup.latestPerKey(norm, spec.primaryKey,
      Seq(col("ts_ms_aws"), col("idx_aws"), col("event_id")))
      .select(col("id"), concat(lit("user_"), col("id")).as("name"),
        col("val"), col("op_aws"))
    MergeOps.merge(target, stage, Seq("id"), col("op_aws") === "d",
      dropCols = Seq("op_aws"))
  }

  /** One entry per implemented operator from SURVEY.md §2.
    * NOTE: q92 is a deliberate numbering hole (never assigned — a
    * planning renumber skipped it; COVERAGE.md documents this). Do not
    * renumber to close it: rounds diff these registries by name. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesExt.all ++ QueriesExt2.all ++ QueriesExt3.all ++
      QueriesExt4.all ++ QueriesExt5.all ++ QueriesExt6.all ++
      QueriesExt7.all ++ QueriesExt8.all ++ QueriesExt9.all ++
      QueriesExt10.all ++ QueriesExt11.all ++ QueriesExt12.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ QueriesExt.oracles ++ QueriesExt2.oracles ++
      QueriesExt3.oracles ++ QueriesExt4.oracles ++ QueriesExt5.oracles ++
      QueriesExt6.oracles ++ QueriesExt7.oracles ++ QueriesExt8.oracles ++
      QueriesExt9.oracles ++ QueriesExt10.oracles ++ QueriesExt11.oracles ++
      QueriesExt12.oracles
}
