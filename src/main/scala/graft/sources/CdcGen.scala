package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic CDC-envelope synthesis from the driver's `events` table
  * (TESTDATA.md). This is the engine's test/bench input: each generator
  * maps every event row to one Kafka-record-shaped JSON string (column
  * `value`), in one of the four envelope formats of SURVEY.md §1.4, using
  * a fixed, oracle-reproducible mapping:
  *
  *   - payload        {id: user_id, event_id, k: props.$.k::int, val: value}
  *   - db             "cdc_db"
  *   - table/coll     "t" + (user_id % 2)        → routing has real work
  *   - event time     ts_ms = epoch-ms of ts
  *   - ops            signup→create, purchase/click→update, error→delete,
  *                    view→snapshot-read (Debezium r) / control (DMS) /
  *                    create (Canal has no r) / invalidate (Mongo, filtered)
  *
  * Because the mapping is pure column algebra, a DuckDB oracle can
  * recompute any downstream result directly from `events` — no JSON
  * round-trip on the oracle side.
  *
  * Fixture shapes follow FIXTURES.md §1 (ref README.md:315-526).
  */
object CdcGen {

  /** Materialization barrier appended to every generator: a round-robin
    * exchange that makes the generated JSON behave like an ingested Kafka
    * batch. Without it, CollapseProject inlines the `to_json` into every
    * downstream `get_json_object` routing predicate — the envelope gets
    * serialized 3× per row and the fused codegen blows up (seconds of
    * janino compilation per query). With it, the strings are produced once
    * at the exchange, exactly like a real source. */
  private def asBatch(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** The testdata parquet files are single-row-group → the scan is one
    * task. Spread the (tiny) raw columns across cores *before* the
    * expensive per-row JSON serialization so `to_json` parallelizes. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Explicit payload schema for the explicit-schema parse path. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("event_id", LongType),
    StructField("k", IntegerType),
    StructField("val", DoubleType)
  ))

  private def payload: Column = struct(
    col("user_id").as("id"),
    col("event_id"),
    get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
    col("value").as("val")
  )

  private def tableName: Column = tableName(2)
  private def tableName(numTables: Int): Column =
    concat(lit("t"), col("user_id") % numTables)

  /** events must already carry `ts_ms` (see graft.Tables.events).
    * `numTables` spreads rows over t0..t{n-1} for multi-table fan-out
    * scenarios (the oracle queries assume the default 2). With
    * `barrier=false` the generator emits a plain narrow projection — no
    * exchange of the serialized strings; downstream routing re-evaluates
    * the serialization (CPU) instead of shuffling it (I/O). Right for
    * single-pass scaled runs where the caller already spread the input;
    * keep the default for anything consumed more than once. */
  def debezium(events: DataFrame, numTables: Int = 2,
               barrier: Boolean = true): DataFrame = {
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d")
      .when(col("event_type") === "view", "r")
      .otherwise("u")
    val raw = (if (barrier) spread(events) else events).select(to_json(struct(
      when(op === "d", payload).as("before"),
      when(op =!= "d", payload).as("after"),
      struct(lit("cdc_db").as("db"), tableName(numTables).as("table"), col("ts_ms")).as("source"),
      op.as("op"),
      col("ts_ms")
    )).as("value"))
    if (barrier) asBatch(raw) else raw
  }

  def dms(events: DataFrame): DataFrame = {
    val op = when(col("event_type") === "signup", "insert")
      .when(col("event_type") === "error", "delete")
      .otherwise("update")
    val recordType = when(col("event_type") === "view", "control").otherwise("data")
    asBatch(spread(events).select(to_json(struct(
      payload.as("data"),
      struct(
        date_format(timestamp_millis(col("ts_ms")), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
          .as("timestamp"),
        recordType.as("record-type"),
        op.as("operation"),
        lit("cdc_db").as("schema-name"),
        tableName.as("table-name")
      ).as("metadata")
    )).as("value")))
  }

  /** Canal batches many rows per envelope; we group by (user_id,
    * event_type) so each envelope has a uniform op, and sort the array by
    * event_id so array position (`idx_aws` after posexplode) is
    * deterministic. Envelope ts = max ts_ms of the group. */
  def canal(events: DataFrame): DataFrame = {
    val op = when(col("event_type") === "error", "DELETE")
      .when(col("event_type").isin("signup", "view"), "INSERT")
      .otherwise("UPDATE")
    asBatch(events
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        sort_array(collect_list(payload)).as("data"),
        max(col("ts_ms")).as("ts"))
      .select(to_json(struct(
        col("data"),
        lit("cdc_db").as("database"),
        tableName.as("table"),
        col("ts"),
        op.as("type")
      )).as("value")))
  }

  /** Mongo change stream. `view` maps to `invalidate` (a real change-stream
    * op the sink must filter out). Deletes carry fullDocument=null. The
    * caller should pre-dedup events to one per (user_id, ts_ms) so the LWW
    * order on (doc_id, ts_ms) is total.
    *
    * Users with `user_id % 10 == 6` get a COMPOSITE object `_id`
    * (`{"_id": {"tenant": uid%7, "uid": uid}}` — mod 7, NOT a divisor
    * of the selector's mod 10, so planted tenants actually vary across
    * documents instead of collapsing to one value) — the reference's README
    * Mongo exemplars include composite-key documents (ref
    * README.md:416-526), and planting them here keeps the doc-id
    * extraction quirk (composite → the object's compact JSON text)
    * oracle-pinned by q12, not just spec-pinned. */
  def mongo(events: DataFrame): DataFrame = {
    val op = when(col("event_type") === "signup", "insert")
      .when(col("event_type") === "purchase", "update")
      .when(col("event_type") === "click", "replace")
      .when(col("event_type") === "error", "delete")
      .otherwise("invalidate")
    // Integer-only fields so an SQL oracle can rebuild the exact JSON text
    // by concatenation (double formatting differs across engines).
    val fullDoc = when(col("event_type") =!= "error",
      to_json(struct(col("event_id"), get_json_object(col("props"), "$.k")
        .cast(IntegerType).as("k"))))
    asBatch(spread(events).select(to_json(struct(
      col("event_id").cast(StringType).as("_id"),
      op.as("operationType"),
      fullDoc.as("fullDocument"),
      when(col("user_id") % 10 === 6,
        concat(lit("{\"_id\": {\"tenant\": "), col("user_id") % 7,
          lit(", \"uid\": "), col("user_id"), lit("}}")))
        .otherwise(concat(lit("{\"_id\": "), col("user_id"), lit("}")))
        .as("documentKey"),
      struct(lit("cdc_db").as("db"), tableName.as("coll")).as("ns"),
      col("ts_ms")
    )).as("value")))
  }
}
