package graft

import graft.config.TableSpec
import graft.envelope._
import graft.operators.{Coerce, Dedup, MergeOps}
import graft.schema.{SchemaEvolution, SchemaInference}
import graft.sources.CdcGen
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The declared query set (SURVEY.md §2.12): one oracle-checkable query per
  * operator-inventory row, over the driver's testdata. Each Spark side runs
  * the *real library operators* end-to-end (generate CDC JSON from `events`
  * → route → parse → normalize → dedup → merge …); each oracle recomputes
  * the same semantics in plain SQL directly over `events`, using the fixed
  * generator mapping documented in [[graft.sources.CdcGen]].
  */
object Queries {

  private val specT0 = TableSpec(db = "cdc_db", table = "t0", primaryKey = Seq("id"))

  /** Shared oracle SQL fragments (DuckDB dialect). */
  private val kSql = "CAST(json_extract_string(props, '$.k') AS INTEGER)"
  private val opSql =
    """CASE WHEN event_type = 'signup' THEN 'c' WHEN event_type = 'error' THEN 'd'
      |     WHEN event_type = 'view' THEN 'r' ELSE 'u' END""".stripMargin

  private def events(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** Generated-batch cache (the reference's C2: one cached Kafka batch is
    * shared by every table task — emr_ec2/cdc_redshift.py:117-128). Keyed
    * by (session, sf-dir, format) so Verify/Bench generate each envelope
    * batch once and every query over it reuses the materialization. */
  private val rawCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]
  private def cachedBatch(s: SparkSession, dir: String, fmt: String)
                         (gen: => DataFrame): DataFrame =
    rawCache.getOrElseUpdate((s.sparkContext.applicationId, dir, fmt),
      gen.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def debeziumBatch(s: SparkSession, dir: String): DataFrame =
    cachedBatch(s, dir, "debezium")(CdcGen.debezium(events(s, dir)))
  private def dmsBatch(s: SparkSession, dir: String): DataFrame =
    cachedBatch(s, dir, "dms")(CdcGen.dms(events(s, dir)))
  private def canalBatch(s: SparkSession, dir: String): DataFrame =
    cachedBatch(s, dir, "canal")(CdcGen.canal(events(s, dir)))
  private def mongoBatch(s: SparkSession, dir: String): DataFrame =
    cachedBatch(s, dir, "mongo")(CdcGen.mongo(
      Dedup.stagingDedup(events(s, dir), Seq("user_id", "ts_ms"), Seq(col("event_id")))))

  /** The q24 input: a 10× key- and row-expanded Debezium batch (≈1M records
    * at the bench scale factor — the reference's per-trigger cap). Cached
    * like every other generated batch: the synthesized strings stand in for
    * a Kafka micro-batch, so they are produced once and the queries over
    * them measure the engine, not the generator. */
  private def debezium10xBatch(s: SparkSession, dir: String): DataFrame =
    cachedBatch(s, dir, "debezium10x") {
      val copies = broadcast(s.range(10).select(col("id").as("copy")))
      // Key stride DERIVED from the data (max user_id + 1), not a fixed
      // 1000: sf0.1 user_ids reach 1499, so a fixed stride aliased ~1/3
      // of each copy's users into the next copy and the "key-expanded"
      // LWW grain was wrong (r12 review). One 1-row agg, mirrored by a
      // scalar subquery in the oracle.
      // Guard the scalar: max() over an empty events table is NULL and
      // getLong would throw an opaque NPE (r12 advice).
      val maxRow = events(s, dir).agg(max(col("user_id")).cast("long")).head()
      require(!maxRow.isNullAt(0),
        s"events table at $dir is empty — cannot derive the copy key stride")
      val stride = maxRow.getLong(0) + 1
      val expanded = events(s, dir).crossJoin(copies).select(
        (col("event_id") * 10 + col("copy")).as("event_id"),
        col("ts"), col("ts_ms"),
        (col("user_id") + col("copy") * stride).as("user_id"),
        col("event_type"), col("value"), col("props"))
      // Pre-spread the (tiny) raw columns so the expensive per-row JSON
      // serialization parallelizes; persist is the materialization barrier,
      // so no extra exchange of the serialized strings is needed.
      CdcGen.debezium(expanded.repartition(
        s.sparkContext.defaultParallelism), barrier = false)
    }

  /** Force-materialize every generated envelope batch (the harness's
    * stand-in for Kafka micro-batches already sitting in the broker).
    * Bench calls this in its untimed setup so the per-query timings
    * measure the engine — route → parse → normalize → dedup → merge —
    * rather than the test-data synthesizer. */
  def warmGeneratedInputs(s: SparkSession, dir: String): Unit =
    Seq(debeziumBatch(s, dir), dmsBatch(s, dir), canalBatch(s, dir),
      mongoBatch(s, dir), debezium10xBatch(s, dir))
      .foreach(_.write.format("noop").mode("overwrite").save())

  /** Record count of the scaled spine input (cheap — counts the persisted
    * batch), so Bench can report spine throughput against the reference's
    * 1M-records-per-trigger envelope (BASELINE.md). */
  def scaledSpineCount(s: SparkSession, dir: String): Long =
    debezium10xBatch(s, dir).count()

  /** LWW ordering used everywhere: event time desc, intra-envelope index
    * desc (Canal), unique event id desc as total-order tie-break. */
  private val lwwOrder: Seq[Column] =
    Seq(col("ts_ms_aws"), col("idx_aws"), col("event_id"))

  // ---------------------------------------------------------------- q1
  /** Routing filter P1/P7 on the raw JSON (DMS format: db+table match AND
    * record-type='data' excludes control records) — no parse, pure
    * string-path predicates. */
  def q1RouteFilter(s: SparkSession, dir: String): DataFrame = {
    val raw = dmsBatch(s, dir)
    raw.filter(DmsCdc.route(col("value"), specT0))
      .select(
        get_json_object(col("value"), "$.data.event_id").cast(LongType).as("event_id"),
        get_json_object(col("value"), "$.metadata.operation").as("operation"))
  }
  val q1Sql: String =
    """SELECT event_id,
      |       CASE WHEN event_type = 'signup' THEN 'insert'
      |            WHEN event_type = 'error' THEN 'delete'
      |            ELSE 'update' END AS operation
      |FROM events WHERE user_id % 2 = 0 AND event_type <> 'view'""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Envelope normalization P3: Debezium deletes arrive with after=null;
    * the struct-level when/otherwise swap restores the row image from
    * `before`. Output carries every routed event with its payload — if the
    * swap were broken, delete rows would be all-null. */
  def q2EnvelopeNormalize(s: SparkSession, dir: String): DataFrame = {
    val raw = debeziumBatch(s, dir)
    val routed = raw.filter(FlinkDebeziumCdc.route(col("value"), specT0))
    FlinkDebeziumCdc.normalize(routed, CdcGen.payloadSchema)
      .select(col("event_id"), col("id"), col("k"), col("val"), col("op_aws"))
  }
  val q2Sql: String =
    s"""SELECT event_id, user_id AS id, $kSql AS k, "value" AS val, $opSql AS op_aws
       |FROM events WHERE user_id % 2 = 0""".stripMargin

  // ---------------------------------------------------------------- q3
  /** Flatten P5 + per-batch schema inference S4: infer the envelope schema
    * from the routed JSON strings (JVM-native, no RDD detour), then
    * from_json + select(after.*). Deletes excluded (their after is null). */
  def q3FlattenInfer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = debeziumBatch(s, dir)
      .filter(FlinkDebeziumCdc.route(col("value"), specT0))
      .filter(get_json_object(col("value"), "$.op") =!= "d")
    // localCheckpoint: inference materializes the batch in-call anyway;
    // a lineage cut shares it with the parse pass without registering a
    // CacheManager entry that a repeated run would warn about.
    val cached = raw.localCheckpoint(true)
    val schema = SchemaInference.infer(s, cached.select(col("value")).as[String])
    cached.select(from_json(col("value"), schema).as("kdata"))
      .select(col("kdata.after.*"))
      .select(col("event_id").cast(LongType), col("id").cast(LongType),
        col("k").cast(IntegerType), col("val").cast(DoubleType))
  }
  val q3Sql: String =
    s"""SELECT event_id, user_id AS id, $kSql AS k, "value" AS val
       |FROM events WHERE user_id % 2 = 0 AND event_type <> 'error'""".stripMargin

  // ---------------------------------------------------------------- q4
  /** Canal array payload F2: posexplode with position — the position is
    * the in-envelope LWW tie-breaker (`idx_aws`). */
  def q4CanalExplode(s: SparkSession, dir: String): DataFrame = {
    val raw = canalBatch(s, dir)
    val routed = raw.filter(CanalCdc.route(col("value"), specT0))
    CanalCdc.normalize(routed, CdcGen.payloadSchema)
      .select(col("id"), col("event_id"), col("k"), col("val"),
        col("op_aws"), col("ts_ms_aws"), col("idx_aws"))
  }
  val q4Sql: String =
    s"""SELECT user_id AS id, event_id, $kSql AS k, "value" AS val,
       |       CASE WHEN event_type IN ('signup','view') THEN 'c'
       |            WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op_aws,
       |       MAX(epoch_ms(ts)) OVER (PARTITION BY user_id, event_type) AS ts_ms_aws,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) - 1
       |            AS INTEGER) AS idx_aws
       |FROM events WHERE user_id % 2 = 0""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Last-write-wins dedup W1 (the core aggregation): latest event per
    * primary key, ordered by event time with total-order tie-break. */
  def q5LwwDedup(s: SparkSession, dir: String): DataFrame = {
    val raw = debeziumBatch(s, dir)
    val routed = raw.filter(FlinkDebeziumCdc.route(col("value"), specT0))
    val norm0 = FlinkDebeziumCdc.normalize(routed, CdcGen.payloadSchema)
    val norm = norm0.filter(FlinkDebeziumCdc.opFilter(norm0)) // op whitelist P7
    Dedup.latestPerKey(norm, specT0.primaryKey, lwwOrder)
      .select(col("id"), col("event_id"), col("k"), col("val"), col("op_aws"))
  }
  val q5Sql: String =
    s"""SELECT user_id AS id, event_id, $kSql AS k, "value" AS val, $opSql AS op_aws
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
       |      FROM events WHERE user_id % 2 = 0) t
       |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q6
  /** Delete-audit P8: latest *delete* per key (feeds `_delete` tables). */
  def q6DeleteAudit(s: SparkSession, dir: String): DataFrame = {
    val raw = debeziumBatch(s, dir)
    val routed = raw.filter(FlinkDebeziumCdc.route(col("value"), specT0))
    val norm = FlinkDebeziumCdc.normalize(routed, CdcGen.payloadSchema)
    Dedup.latestDeletePerKey(norm, specT0.primaryKey, lwwOrder, col("op_aws") === "d")
      .select(col("id"), col("event_id"), col("val"))
  }
  val q6Sql: String =
    """SELECT user_id AS id, event_id, "value" AS val
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      |      FROM events WHERE user_id % 2 = 0 AND event_type = 'error') t
      |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Keyed merge J1–J3: upsert + physical delete of the deduped batch into
    * a target snapshot — target ANTI stage ∪ stage-minus-deletes. The
    * stage side is broadcast (micro-batch ≪ target). */
  def q7Merge(s: SparkSession, dir: String): DataFrame = {
    val target = Tables.customer(s, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"), col("c_acctbal").as("val"))
    val raw = debeziumBatch(s, dir)
    val routed = raw.filter(FlinkDebeziumCdc.route(col("value"), specT0))
    val norm = FlinkDebeziumCdc.normalize(routed, CdcGen.payloadSchema)
    val stage = Dedup.latestPerKey(norm, Seq("id"), lwwOrder)
      .select(col("id"), concat(lit("user_"), col("id")).as("name"),
        col("val"), col("op_aws"))
    MergeOps.merge(target, stage, Seq("id"), col("op_aws") === "d",
      dropCols = Seq("op_aws"))
  }
  val q7Sql: String =
    s"""WITH stage AS (
       |  SELECT user_id AS id, 'user_' || user_id AS name, "value" AS val, $opSql AS op_aws
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |          ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
       |        FROM events WHERE user_id % 2 = 0) t
       |  WHERE rn = 1)
       |SELECT c_custkey AS id, c_name AS name, c_acctbal AS val
       |FROM customer WHERE c_custkey NOT IN (SELECT id FROM stage)
       |UNION ALL
       |SELECT id, name, val FROM stage WHERE op_aws <> 'd'""".stripMargin

  // ---------------------------------------------------------------- q8
  /** Type coercions F3/F4: string→timestamp (default ISO-'Z' format),
    * epoch-day int→date (`since_1970`), string→date with explicit format. */
  def q8Coerce(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(
      col("event_id"),
      date_format(col("ts"), Coerce.DefaultTsFmt).as("create_time"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast(DateType)).as("create_date"),
      date_format(col("ts"), "yyyy-MM-dd").as("mod_date"))
    val t = Coerce.timestampColumns(e, Seq("create_time"))
    Coerce.dateColumns(t, Seq("create_date", "mod_date|yyyy-MM-dd"))
  }
  val q8Sql: String =
    """SELECT event_id,
      |       CAST(date_trunc('second', ts) AS TIMESTAMP) AS create_time,
      |       CAST(ts AS DATE) AS create_date,
      |       CAST(ts AS DATE) AS mod_date
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q9
  /** Staging dedup W2: arbitrary-but-deterministic winner per key (guard
    * against duplicate keys in a retried staging load). */
  def q9StagingDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.stagingDedup(events(s, dir), Seq("user_id"), Seq(col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"))
  val q9Sql: String =
    """SELECT user_id, event_id, event_type
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |      FROM events) t
      |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q10
  /** SUPER repair P10/F6: null/empty semi-structured column → '{}' so the
    * warehouse JSON parse cannot fail; field metadata stamped for DDL. */
  def q10SuperRepair(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("props",
      when(col("event_type") === "error", lit(null).cast(StringType))
        .otherwise(col("props")))
    Coerce.superColumns(e, Seq("props")).select(col("event_id"), col("props"))
  }
  val q10Sql: String =
    """SELECT event_id,
      |       CASE WHEN event_type = 'error' THEN '{}' ELSE props END AS props
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Schema-drift diff: batch schema vs warehouse catalog → ADD/DROP column
    * set, with the Spark→DDL type mapping (DecimalType bug fixed). */
  def q11SchemaDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val catalog = li.schema.fields.filterNot(_.name == "l_tax")
      .map(f => SchemaEvolution.ColumnDef(f.name, SchemaEvolution.sparkToSql(f))).toSeq :+
      SchemaEvolution.ColumnDef("legacy_col", "VARCHAR(65535)")
    val (adds, drops) = SchemaEvolution.diff(li.schema, catalog)
    val rows = adds.map(f => (f.name, SchemaEvolution.sparkToSql(f), "add")) ++
      drops.map(c => (c.name, c.sqlType, "drop"))
    rows.toDF("column_name", "sql_type", "action")
  }
  val q11Sql: String =
    """SELECT 'l_tax' AS column_name, 'DOUBLE PRECISION' AS sql_type, 'add' AS action
      |UNION ALL
      |SELECT 'legacy_col', 'VARCHAR(65535)', 'drop'""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Mongo change-stream path P2/P4/F5/F6: doc-id extraction from
    * documentKey, null-doc repair on deletes, epoch-ms → date derivation,
    * LWW per doc key. Input pre-deduped to one event per (user, ms) so the
    * LWW order is total. */
  def q12Mongo(s: SparkSession, dir: String): DataFrame = {
    val routed = mongoBatch(s, dir).filter(MongoCdc.route(col("value"), specT0))
    val norm = MongoCdc.normalize(routed, CdcGen.payloadSchema)
    Dedup.latestPerKey(norm, Seq("doc_id"), Seq(col("ts_ms_aws")))
      .select(col("doc_id"), col("doc"), col("ts_date"), col("op_aws"))
  }
  val q12Sql: String =
    """WITH e AS (
      |  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ms(ts)
      |                   ORDER BY event_id) AS rn0 FROM events) WHERE rn0 = 1),
      |m AS (
      |  SELECT CASE WHEN user_id % 10 = 6
      |           THEN '{"tenant":' || (user_id % 7) || ',"uid":' || user_id || '}'
      |           ELSE CAST(user_id AS VARCHAR) END AS doc_id,
      |         CASE WHEN event_type = 'error' THEN '[]'
      |              ELSE '{"event_id":' || event_id || ',"k":' ||
      |                   CAST(json_extract_string(props, '$.k') AS INTEGER) || '}' END AS doc,
      |         CAST(make_timestamp(epoch_ms(ts) * 1000) AS DATE) AS ts_date,
      |         CASE WHEN event_type = 'signup' THEN 'c' WHEN event_type = 'error' THEN 'd'
      |              ELSE 'u' END AS op_aws,
      |         epoch_ms(ts) AS ts_ms,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC) AS rn
      |  FROM e WHERE user_id % 2 = 0 AND event_type <> 'view')
      |SELECT doc_id, doc, ts_date, op_aws FROM m WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Canal cross-envelope LWW: the full ordering (envelope ts DESC, array
    * position DESC, unique id DESC) across many envelopes per key — the
    * ordering SURVEY §7.4 flags as easy to get wrong. */
  def q23CanalLww(s: SparkSession, dir: String): DataFrame = {
    val routed = canalBatch(s, dir).filter(CanalCdc.route(col("value"), specT0))
    val norm = CanalCdc.normalize(routed, CdcGen.payloadSchema)
    Dedup.latestPerKey(norm, Seq("id"), lwwOrder)
      .select(col("id"), col("event_id"), col("k"), col("val"), col("op_aws"))
  }
  val q23Sql: String =
    s"""WITH x AS (
       |  SELECT user_id, event_id, $kSql AS k, "value" AS val,
       |         CASE WHEN event_type IN ('signup','view') THEN 'c'
       |              WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op_aws,
       |         MAX(epoch_ms(ts)) OVER (PARTITION BY user_id, event_type) AS env_ts,
       |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) - 1 AS idx
       |  FROM events WHERE user_id % 2 = 0)
       |SELECT user_id AS id, event_id, k, val, op_aws
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY env_ts DESC, idx DESC, event_id DESC) AS rn FROM x) t
       |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Scaled spine: the full route→parse→normalize→LWW pipeline over a 10×
    * key- and row-expanded batch (≈1M records at the bench scale factor) —
    * the reference's 1M-records-per-trigger operating envelope
    * (BASELINE.md) exercised as one query. */
  def q24SpineScaled(s: SparkSession, dir: String): DataFrame = {
    val raw = debezium10xBatch(s, dir)
    val routed = raw.filter(FlinkDebeziumCdc.route(col("value"), specT0))
    val norm = FlinkDebeziumCdc.normalize(routed, CdcGen.payloadSchema)
    Dedup.latestPerKey(norm, Seq("id"), lwwOrder)
      .select(col("id"), col("event_id"), col("k"), col("val"), col("op_aws"))
  }
  val q24Sql: String =
    s"""WITH ex AS (
       |  SELECT event_id * 10 + copy AS event_id, ts,
       |         user_id + copy * (SELECT max(user_id) + 1 FROM events) AS user_id,
       |         event_type, "value", props
       |  FROM events, (SELECT unnest(range(10)) AS copy))
       |SELECT user_id AS id, event_id,
       |       $kSql AS k, "value" AS val, $opSql AS op_aws
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
       |      FROM ex WHERE user_id % 2 = 0) t
       |WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------ registry
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_route_filter" -> (q1RouteFilter _),
    "q2_envelope_normalize" -> (q2EnvelopeNormalize _),
    "q3_flatten_infer" -> (q3FlattenInfer _),
    "q4_canal_explode" -> (q4CanalExplode _),
    "q5_lww_dedup" -> (q5LwwDedup _),
    "q6_delete_audit" -> (q6DeleteAudit _),
    "q7_merge" -> (q7Merge _),
    "q8_coerce" -> (q8Coerce _),
    "q9_staging_dedup" -> (q9StagingDedup _),
    "q10_super_repair" -> (q10SuperRepair _),
    "q11_schema_drift" -> (q11SchemaDrift _),
    "q12_mongo" -> (q12Mongo _),
    "q23_canal_lww" -> (q23CanalLww _),
    "q24_spine_scaled" -> (q24SpineScaled _)
  )

  val oracles: Map[String, String] = Map(
    "q1_route_filter" -> q1Sql,
    "q2_envelope_normalize" -> q2Sql,
    "q3_flatten_infer" -> q3Sql,
    "q4_canal_explode" -> q4Sql,
    "q5_lww_dedup" -> q5Sql,
    "q6_delete_audit" -> q6Sql,
    "q7_merge" -> q7Sql,
    "q8_coerce" -> q8Sql,
    "q9_staging_dedup" -> q9Sql,
    "q10_super_repair" -> q10Sql,
    "q11_schema_drift" -> q11Sql,
    "q12_mongo" -> q12Sql,
    "q23_canal_lww" -> q23Sql,
    "q24_spine_scaled" -> q24Sql
  )
}
