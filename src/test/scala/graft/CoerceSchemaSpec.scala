package graft

import graft.config.{JobConfig, TableSpec}
import graft.operators.Coerce
import graft.schema.{SchemaEvolution, SchemaInference}
import graft.schema.SchemaEvolution.ColumnDef
import org.apache.spark.sql.types._

/** Coercions (F3/F4/P10/P11), schema drift + DDL, config parsing. */
class CoerceSchemaSpec extends SparkSuite {
  import spark.implicits._

  test("timestamp_columns: default ISO-Z format and per-column override") {
    val df = Seq(("2023-06-14T14:15:45Z", "14/06/2023 10:00")).toDF("a", "b")
    val out = Coerce.timestampColumns(df, Seq("a", "b|dd/MM/yyyy HH:mm"))
    assert(out.schema("a").dataType == TimestampType)
    assert(out.schema("b").dataType == TimestampType)
    val r = out.collect().head
    assert(r.getTimestamp(0).toInstant.toString == "2023-06-14T14:15:45Z")
    assert(r.getTimestamp(1).toInstant.toString == "2023-06-14T10:00:00Z")
  }

  test("date_columns: since_1970 epoch-days and explicit format") {
    val df = Seq((19522, "2023-06-14")).toDF("d1", "d2")
    val out = Coerce.dateColumns(df, Seq("d1", "d2|yyyy-MM-dd"))
    val r = out.collect().head
    assert(r.getDate(0).toString == "2023-06-14") // 19522 epoch days
    assert(r.getDate(1).toString == "2023-06-14")
  }

  test("missing configured columns are skipped, not fatal") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = Coerce.timestampColumns(df, Seq("nope"))
    assert(out.columns.toSeq == Seq("a", "b"))
  }

  test("super_columns: null/empty repaired to {} and metadata stamped") {
    val df = Seq(("{\"x\":1}"), (""), (null: String)).toDF("j")
    val out = Coerce.superColumns(df, Seq("j"))
    assert(out.as[String].collect().toSet == Set("{\"x\":1}", "{}"))
    val meta = out.schema("j").metadata
    assert(meta.getBoolean("super") && meta.getString("redshift_type") == "super")
  }

  test("spark→sql DDL type mapping, incl. DecimalType precision fix") {
    def t(dt: DataType): String = SchemaEvolution.sparkToSql(StructField("c", dt))
    assert(t(IntegerType) == "INTEGER" && t(LongType) == "BIGINT")
    assert(t(DoubleType) == "DOUBLE PRECISION" && t(FloatType) == "REAL")
    assert(t(ShortType) == "INTEGER" && t(ByteType) == "SMALLINT")
    assert(t(BooleanType) == "BOOLEAN" && t(DateType) == "DATE")
    assert(t(TimestampType) == "TIMESTAMP" && t(StringType) == "VARCHAR(65535)")
    assert(t(DecimalType(28, 10)) == "DECIMAL(28,10)") // ref bug: only (10,0) matched
    assert(t(NullType) == "VARCHAR(65535)") // all-null batch column policy
    intercept[IllegalArgumentException](t(ArrayType(IntegerType)))
    val withMax = StructField("c", StringType,
      metadata = new MetadataBuilder().putLong("maxlength", 256).build())
    assert(SchemaEvolution.sparkToSql(withMax) == "VARCHAR(256)")
    assert(SchemaEvolution.sparkToSql(
      StructField("c", StringType, metadata = Coerce.superMetadata)) == "SUPER")
  }

  test("drift diff + DDL generation") {
    val batch = StructType(Seq(StructField("id", LongType), StructField("newc", StringType)))
    val catalog = Seq(ColumnDef("id", "bigint"), ColumnDef("oldc", "integer"))
    val (adds, drops) = SchemaEvolution.diff(batch, catalog)
    assert(adds.map(_.name) == Seq("newc") && drops.map(_.name) == Seq("oldc"))
    val ddl = SchemaEvolution.alterDdl("t", adds, drops)
    assert(ddl == Seq("""ALTER TABLE t ADD COLUMN "newc" VARCHAR(65535)""",
      """ALTER TABLE t DROP COLUMN "oldc""""))
    val create = SchemaEvolution.createTableDdl("t", batch, Seq("id"))
    assert(create.contains("CREATE TABLE IF NOT EXISTS t") && create.contains("SORTKEY"))
  }

  test("ignore_ddl cast path: batch cast to catalog types, catalog order") {
    val df = Seq(("12", "x", 1.5)).toDF("a", "b", "c")
    val catalog = Seq(ColumnDef("c", "double precision"), ColumnDef("a", "integer"))
    val out = SchemaEvolution.castToCatalog(df, catalog)
    assert(out.columns.toSeq == Seq("c", "a"))
    assert(out.schema("a").dataType == IntegerType)
  }

  test("warehouse type normalization (inverse mapping)") {
    assert(SchemaEvolution.sqlToSpark("timestamp without time zone") == TimestampType)
    assert(SchemaEvolution.sqlToSpark("character varying(256)") == StringType)
    assert(SchemaEvolution.sqlToSpark("numeric(10,2)") == DecimalType(10, 2))
    assert(SchemaEvolution.sqlToSpark("int8") == LongType)
    assert(SchemaEvolution.sqlToSpark("float4") == FloatType)
  }

  test("all-null inferred columns become strings, not NullType") {
    val s = SchemaInference.nullSafe(StructType(Seq(
      StructField("a", NullType), StructField("b", LongType))))
    assert(s("a").dataType == StringType && s("b").dataType == LongType)
  }

  test("SchemaCache: steady state serves cached, probe merges drift, absent fields retained") {
    val cache = new graft.schema.SchemaCache(probeEvery = 2)
    val v1 = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val v2 = StructType(Seq(StructField("id", LongType), StructField("extra", LongType)))
    var served = cache.payloadFor("t", () => v1)
    assert(served == v1 && cache.inferCount == 1)
    served = cache.payloadFor("t", () => fail("must not re-infer on a cached batch"))
    assert(served == v1 && cache.inferCount == 1)
    // probe batch: fresh schema gains `extra`, lost `v` — merge keeps both
    served = cache.payloadFor("t", () => v2)
    assert(cache.inferCount == 2)
    assert(served.fieldNames.toSeq == Seq("id", "v", "extra"))
    // type drift takes the fresh type on the next probe
    cache.invalidate("t")
    val v3 = StructType(Seq(StructField("id", StringType)))
    assert(cache.payloadFor("t", () => v3)("id").dataType == StringType)
    // nested: a probe lacking an optional nested field keeps it (recursive merge)
    val metaAB = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val metaA = StructType(Seq(StructField("a", LongType)))
    val mergedNested = graft.schema.SchemaCache.merge(
      StructType(Seq(StructField("meta", metaAB))),
      StructType(Seq(StructField("meta", metaA))))
    assert(mergedNested("meta").dataType == metaAB)
  }

  test("properties + sync_table_list parsing (incl. the 'ture' typo)") {
    val cfg = JobConfig.fromProperties(
      """cdc_format=CANAL-CDC
        |topic=t1
        |max_offsets_per_trigger=5000
        |thread_max_workers=7
        |maxerror=100
        |disable_msg=false
        |schema_probe_batches=5
        |sync_table_list=[{"db":"d1","table":"t1","primary_key":"pk1,pk2","skip_delete":"ture","dedup_strategy":"SALTED","salt_buckets":"8"},{"db":"d2","table":"t2","target_table":"t2x","super_columns":"sc1","ignore_ddl":"true","scd2_history":"true"}]
        |""".stripMargin)
    assert(cfg.cdcFormat == "CANAL-CDC" && cfg.maxOffsetsPerTrigger == 5000L)
    assert(cfg.threadMaxWorkers == 7 && cfg.tables.size == 2)
    assert(cfg.maxError == 100L)
    assert(!cfg.disableMsg && cfg.schemaProbeBatches == 5)
    val t1 = cfg.tables.head
    assert(t1.primaryKey == Seq("pk1", "pk2") && t1.skipDelete)
    assert(t1.dedupStrategy == "salted" && t1.saltBuckets == 8)
    val t2 = cfg.tables(1)
    assert(t2.resolvedTarget == "t2x" && t2.ignoreDdl && t2.superColumns == Seq("sc1"))
    assert(t2.dedupStrategy == "window" && t2.saltBuckets == 16)
    assert(t2.scd2History && !t1.scd2History)
  }

  test("TableSpec defaults") {
    val t = TableSpec.fromMap(Map("db" -> "d", "table" -> "t"))
    assert(!t.skipDelete && !t.saveDelete && t.primaryKey.isEmpty && t.resolvedTarget == "t")
    assert(t.dedupStrategy == "window" && t.saltBuckets == 16 && !t.scd2History)
  }

  test("superColumnsVariant: VariantType column, null repair, field access, parquet round-trip") {
    import org.apache.spark.sql.functions.{col, to_json, try_variant_get}
    import org.apache.spark.sql.types.VariantType
    val df = Seq(
      (1L, """{"a": 1, "b": {"c": "x"}}"""),
      (2L, null.asInstanceOf[String]),
      (3L, "")
    ).toDF("id", "props")
    val v = graft.operators.Coerce.superColumnsVariant(df, Seq("props"))
    assert(v.schema("props").dataType == VariantType)
    assert(graft.schema.SchemaEvolution.sparkToSql(v.schema("props")) == "SUPER")
    val got = v.select(col("id"),
        try_variant_get(col("props"), "$.b.c", "string").as("c"),
        to_json(col("props")).as("j"))
      .orderBy("id").as[(Long, Option[String], String)].collect()
    assert(got(0)._2.contains("x"))
    assert(got(1)._3 == "{}" && got(2)._3 == "{}")
    // variant survives a parquet round-trip (parse once at ingest)
    val dir = java.nio.file.Files.createTempDirectory("variant").toString
    v.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("props").dataType == VariantType)
    assert(back.select(try_variant_get(col("props"), "$.a", "int").as("a"))
      .as[Option[Int]].collect().flatten.toSet == Set(1))
  }
}
