package graft.envelope

import graft.config.TableSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC envelope formats the engine understands (ref SURVEY.md §1.4).
  *
  * Each format knows how to:
  *   1. `route` — keep only one logical table's rows out of the multiplexed
  *      topic, as a predicate on the *raw JSON string* (cheap pre-filter
  *      before any parse; replaces the reference's Python routing UDFs at
  *      cdc_util/redshift_sink.py:18-51 with Catalyst-optimizable
  *      `get_json_object`/`rlike` expressions).
  *   2. `normalize` — parse the envelope and emit the flattened payload
  *      plus three canonical meta columns:
  *        - `op_aws`     canonical op: "c" | "u" | "d" | "r"
  *        - `ts_ms_aws`  event time, epoch milliseconds (BIGINT)
  *        - `idx_aws`    intra-envelope position (Canal array index;
  *                       0 elsewhere) — last-write-wins tie-breaker
  *      (replaces the envelope-normalization UDF at redshift_sink.py:54-67
  *      with a struct-level `when/otherwise`).
  *
  * Scale note: routing runs on the raw string *before* `from_json`, so a
  * 1000-table topic costs one cheap JSON-path probe per (row, table) and
  * the expensive parse touches only matching rows — same idea as the
  * reference (redshift_sink.py:585-594) but whole-stage-codegen'd.
  */
sealed trait CdcFormat {
  def name: String

  /** Canonical meta column names (suffix `_aws` mirrors the reference's
    * synthetic-column convention, e.g. `seqnum_aws`). */
  final val OpCol = "op_aws"
  final val TsCol = "ts_ms_aws"
  final val IdxCol = "idx_aws"
  final def metaCols: Seq[String] = Seq(OpCol, TsCol, IdxCol)

  /** Predicate on the raw JSON value selecting `spec`'s rows. */
  def route(raw: Column, spec: TableSpec): Column

  /** Envelope schema given an explicit payload schema. */
  def envelopeSchema(payload: StructType): StructType

  /** Parse `valueCol` of `df` and return payload columns + meta columns.
    * `payload` is the payload StructType (explicit or inferred per batch). */
  def normalize(df: DataFrame, payload: StructType, valueCol: String = "value"): DataFrame

  /** Extract the payload StructType out of a per-batch *inferred* envelope
    * schema (ref S4: the reference infers the whole envelope then flattens
    * the payload member — redshift_sink.py:592-594). */
  def payloadFromEnvelope(envelope: StructType): StructType

  final def isDelete(df: DataFrame): Column = col(OpCol) === "d"

  /** Operational-event whitelist on the canonical op (ref redshift_sink.py
    * :200,204,208 — formats differ in raw ops; canonicalized here). */
  final def opFilter(df: DataFrame): Column = col(OpCol).isin("c", "u", "d", "r")

  protected def tableMatch(c: Column, spec: TableSpec): Column =
    if (spec.tableIsRegex) c.rlike("^" + spec.table + "$") else c === spec.table
}

/** Debezium shape, used by both FLINK-CDC and MSK-DEBEZIUM-CDC
  * (identical handling in the reference — redshift_sink.py:30,57,202).
  * Envelope: {before, after, source:{db,table,...}, op, ts_ms}. */
case object FlinkDebeziumCdc extends CdcFormat {
  val name = "FLINK-CDC"

  def route(raw: Column, spec: TableSpec): Column =
    get_json_object(raw, "$.source.db") === spec.db &&
      tableMatch(get_json_object(raw, "$.source.table"), spec)

  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField("before", payload),
    StructField("after", payload),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("ts_ms", LongType)
    ))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)
  ))

  def normalize(df: DataFrame, payload: StructType, valueCol: String): DataFrame = {
    val parsed = df.select(from_json(col(valueCol), envelopeSchema(payload)).as("e"))
    // Delete events carry the row image in `before` with `after=null`
    // (ref redshift_sink.py:54-64); swap structurally, no string surgery.
    parsed
      .select(
        when(col("e.op") === "d", coalesce(col("e.after"), col("e.before")))
          .otherwise(col("e.after")).as("r"),
        col("e.op").as(OpCol),
        col("e.ts_ms").as(TsCol),
        lit(0).as(IdxCol))
      .select(col("r.*"), col(OpCol), col(TsCol), col(IdxCol))
  }

  /** Union of the inferred `after` and `before` member fields (deletes may
    * be the only rows carrying a column, in `before`). `after` wins on
    * name collisions. */
  def payloadFromEnvelope(envelope: StructType): StructType = {
    def member(n: String): Seq[StructField] = envelope.fields
      .find(_.name == n).map(_.dataType) match {
      case Some(st: StructType) => st.fields.toSeq
      case _ => Nil
    }
    val after = member("after")
    val names = after.map(_.name).toSet
    StructType(after ++ member("before").filterNot(f => names.contains(f.name)))
  }
}

/** AWS DMS shape: {data, metadata:{timestamp, record-type, operation,
  * schema-name, table-name}} (ref README.md:393-413). Control records
  * (record-type != "data") are excluded at routing time
  * (ref redshift_sink.py:24-29). */
case object DmsCdc extends CdcFormat {
  val name = "DMS-CDC"

  def route(raw: Column, spec: TableSpec): Column =
    get_json_object(raw, "$.metadata.schema-name") === spec.db &&
      tableMatch(get_json_object(raw, "$.metadata.table-name"), spec) &&
      get_json_object(raw, "$.metadata.record-type") === "data"

  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField("data", payload),
    StructField("metadata", StructType(Seq(
      StructField("timestamp", StringType),
      StructField("record-type", StringType),
      StructField("operation", StringType),
      StructField("schema-name", StringType),
      StructField("table-name", StringType)
    )))
  ))

  /** DMS raw ops → canonical (ref redshift_sink.py:200: load/insert/update/
    * delete; `load` is the initial full-load, canonically a snapshot read). */
  private def canonOp(op: Column): Column =
    when(op === "delete", "d")
      .when(op === "insert", "c")
      .when(op === "update", "u")
      .when(op === "load", "r")

  def normalize(df: DataFrame, payload: StructType, valueCol: String): DataFrame = {
    val parsed = df.select(from_json(col(valueCol), envelopeSchema(payload)).as("e"))
    parsed.select(
      col("e.data.*"),
      canonOp(col("e.metadata.operation")).as(OpCol),
      // ISO-8601 with fractional seconds; ordering by parsed epoch-ms is
      // equivalent to the reference's lexical ISO-string ordering (:200).
      unix_millis(to_timestamp(col("e.metadata.timestamp"))).as(TsCol),
      lit(0).as(IdxCol))
  }

  def payloadFromEnvelope(envelope: StructType): StructType =
    envelope.fields.find(_.name == "data").map(_.dataType) match {
      case Some(st: StructType) => st
      case _ => new StructType()
    }
}

/** Canal shape: {data: ARRAY of rows, database, table, ts, type}
  * (ref redshift_sink.py:33-35,206-209,261-267). The array is exploded
  * with position; position is the in-envelope tie-breaker. */
case object CanalCdc extends CdcFormat {
  val name = "CANAL-CDC"

  def route(raw: Column, spec: TableSpec): Column =
    get_json_object(raw, "$.database") === spec.db &&
      tableMatch(get_json_object(raw, "$.table"), spec)

  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField("data", ArrayType(payload)),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("ts", LongType),
    StructField("type", StringType)
  ))

  private def canonOp(op: Column): Column =
    when(op === "DELETE", "d")
      .when(op === "INSERT", "c")
      .when(op === "UPDATE", "u")

  def normalize(df: DataFrame, payload: StructType, valueCol: String): DataFrame = {
    val parsed = df.select(from_json(col(valueCol), envelopeSchema(payload)).as("e"))
    parsed
      .filter(col("e.type").isin("INSERT", "UPDATE", "DELETE"))
      .select(
        posexplode(col("e.data")).as(Seq("pos", "r")),
        canonOp(col("e.type")).as(OpCol),
        col("e.ts").as(TsCol))
      .select(col("r.*"), col(OpCol), col(TsCol), col("pos").cast(IntegerType).as(IdxCol))
  }

  def payloadFromEnvelope(envelope: StructType): StructType =
    envelope.fields.find(_.name == "data").map(_.dataType) match {
      case Some(ArrayType(st: StructType, _)) => st
      case _ => new StructType()
    }
}

/** MongoDB change-stream shape (ref README.md:418-525,
  * mongo_redshift_sink.py). Payload is the raw `fullDocument` JSON string
  * kept as a semi-structured column; the key is `doc_id` extracted from
  * `documentKey` (scalar or composite object — both arrive as a string). */
case object MongoCdc extends CdcFormat {
  val name = "MONGO-CDC"

  def route(raw: Column, spec: TableSpec): Column =
    get_json_object(raw, "$.ns.db") === spec.db &&
      tableMatch(get_json_object(raw, "$.ns.coll"), spec)

  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("operationType", StringType),
    StructField("fullDocument", StringType),
    StructField("documentKey", StringType),
    StructField("ns", StructType(Seq(
      StructField("db", StringType), StructField("coll", StringType)))),
    StructField("ts_ms", LongType)
  ))

  private def canonOp(op: Column): Column =
    when(op === "delete", "d")
      .when(op === "insert", "c")
      .when(op.isin("update", "replace"), "u")

  def normalize(df: DataFrame, payload: StructType, valueCol: String): DataFrame = {
    val parsed = df.select(from_json(col(valueCol), envelopeSchema(payload)).as("e"))
    parsed
      .filter(col("e.operationType").isin("insert", "update", "replace", "delete"))
      .select(
        // Scalar `_id` → its value; composite `_id` (object) → the object's
        // JSON text; fall back to the whole documentKey (ref
        // mongo_redshift_sink.py:33-43).
        coalesce(get_json_object(col("e.documentKey"), "$._id"), col("e.documentKey"))
          .as("doc_id"),
        // Deletes have fullDocument=null → repaired to '[]' so the SUPER
        // column stays parseable (ref mongo_redshift_sink.py:129).
        coalesce(col("e.fullDocument"), lit("[]")).as("doc"),
        to_date(timestamp_millis(col("e.ts_ms"))).as("ts_date"),
        canonOp(col("e.operationType")).as(OpCol),
        col("e.ts_ms").as(TsCol),
        lit(0).as(IdxCol))
  }

  /** Mongo keeps the document as a raw JSON string column; no payload
    * struct is ever flattened. */
  def payloadFromEnvelope(envelope: StructType): StructType = new StructType()
}

object CdcFormat {
  val all: Seq[CdcFormat] = Seq(FlinkDebeziumCdc, DmsCdc, CanalCdc, MongoCdc)

  /** Dispatch on the config string (ref config/job.properties:13). */
  def forName(s: String): CdcFormat = s.toUpperCase match {
    case "FLINK-CDC" | "MSK-DEBEZIUM-CDC" => FlinkDebeziumCdc
    case "DMS-CDC"                        => DmsCdc
    case "CANAL-CDC"                      => CanalCdc
    case "MONGO-CDC"                      => MongoCdc
    case other => throw new IllegalArgumentException(s"unknown cdc_format: $other")
  }
}
