package graft

import graft.config.TableSpec
import graft.envelope._
import graft.sources.CdcGen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden envelope-decode tests seeded from the reference's README
  * exemplars (FIXTURES.md §1; ref README.md:315-526). */
class EnvelopeSpec extends SparkSuite {
  import spark.implicits._

  private val sbtestPayload = StructType(Seq(
    StructField("id", LongType), StructField("k", LongType),
    StructField("c", StringType), StructField("pad", StringType)))

  private def df(rows: String*): DataFrame = rows.toDF("value")

  private val spec = TableSpec("cdc_db_02", "sbtest19", Seq("id"))

  // Debezium update exemplar (ref README.md:317-351 shape)
  private val debeziumUpdate =
    """{"before": {"id": 19770, "k": 4996, "c": "c0", "pad": "p0"},
      | "after": {"id": 19770, "k": 4997, "c": "c1", "pad": "p1"},
      | "source": {"version":"1.6.4.Final","connector":"mysql","db":"cdc_db_02",
      |            "table":"sbtest19","ts_ms":1681561501000},
      | "op": "u", "ts_ms": 1681561501093, "transaction": null}""".stripMargin.replaceAll("\n", "")
  // Delete: after=null, image in before (ref redshift_sink.py:57-64)
  private val debeziumDelete =
    """{"before": {"id": 5, "k": 1, "c": "cc", "pad": "pp"}, "after": null,
      | "source": {"db":"cdc_db_02","table":"sbtest19","ts_ms":1681561502000},
      | "op": "d", "ts_ms": 1681561502000}""".stripMargin.replaceAll("\n", "")
  private val debeziumOtherTable =
    debeziumUpdate.replace("sbtest19", "sbtest20")

  test("debezium: routing keeps only the spec's table") {
    val raw = df(debeziumUpdate, debeziumDelete, debeziumOtherTable)
    assert(raw.filter(FlinkDebeziumCdc.route(col("value"), spec)).count() == 2)
  }

  test("debezium: regex table routing") {
    val raw = df(debeziumUpdate, debeziumOtherTable)
    val rx = spec.copy(table = "sbtest\\d+", tableIsRegex = true)
    assert(raw.filter(FlinkDebeziumCdc.route(col("value"), rx)).count() == 2)
  }

  test("debezium: delete rows keep the before-image after normalize") {
    val raw = df(debeziumUpdate, debeziumDelete)
    val norm = FlinkDebeziumCdc.normalize(raw, sbtestPayload)
    val d = norm.filter(col("op_aws") === "d").collect().head
    assert(d.getAs[Long]("id") == 5L && d.getAs[String]("c") == "cc")
    val u = norm.filter(col("op_aws") === "u").collect().head
    assert(u.getAs[Long]("k") == 4997L) // after image, not before
    assert(u.getAs[Long]("ts_ms_aws") == 1681561501093L)
  }

  test("dms: control records filtered at routing; load maps to r") {
    val dmsData =
      """{"data": {"pid": 2, "pname": "prodcut-002", "pprice": 110},
        | "metadata": {"timestamp": "2023-04-15T12:38:13.780065Z", "record-type": "data",
        |   "operation": "load", "schema-name": "test_db", "table-name": "product"}}"""
        .stripMargin.replaceAll("\n", "")
    val dmsControl = dmsData.replace("\"record-type\": \"data\"", "\"record-type\": \"control\"")
    val pspec = TableSpec("test_db", "product", Seq("pid"))
    val raw = df(dmsData, dmsControl)
    val routed = raw.filter(DmsCdc.route(col("value"), pspec))
    assert(routed.count() == 1)
    val payload = StructType(Seq(StructField("pid", LongType),
      StructField("pname", StringType), StructField("pprice", LongType)))
    val norm = DmsCdc.normalize(routed, payload).collect().head
    assert(norm.getAs[String]("op_aws") == "r")
    assert(norm.getAs[Long]("ts_ms_aws") == 1681562293780L) // micro → ms truncation
  }

  test("canal: array explodes with position as tie-break index") {
    val canal =
      """{"data": [{"itemcode": "A1", "price": "9.9"}, {"itemcode": "A2", "price": "8.8"}],
        | "database": "prodb01", "table": "product_mark_19",
        | "ts": 1694000000000, "type": "INSERT"}""".stripMargin.replaceAll("\n", "")
    val cspec = TableSpec("prodb01", "product_mark_19", Seq("itemcode"))
    val payload = StructType(Seq(StructField("itemcode", StringType),
      StructField("price", StringType)))
    val raw = df(canal)
    assert(raw.filter(CanalCdc.route(col("value"), cspec)).count() == 1)
    val norm = CanalCdc.normalize(raw, payload).orderBy("idx_aws").collect()
    assert(norm.length == 2)
    assert(norm(0).getAs[String]("itemcode") == "A1" && norm(0).getAs[Int]("idx_aws") == 0)
    assert(norm(1).getAs[String]("itemcode") == "A2" && norm(1).getAs[Int]("idx_aws") == 1)
    assert(norm.forall(_.getAs[String]("op_aws") == "c"))
  }

  test("mongo: scalar and composite doc ids; delete doc repaired to []") {
    val mongoInsert =
      """{"_id": "rt1", "operationType": "insert",
        | "fullDocument": "{\"_id\": 1.0, \"price\": 2.243, \"name\": \"p1\"}",
        | "ns": {"db": "test_db", "coll": "product"},
        | "documentKey": "{\"_id\": 1.0}", "ts_ms": 1684918589037}""".stripMargin.replaceAll("\n", "")
    val mongoDeleteComposite =
      """{"_id": "rt2", "operationType": "delete", "fullDocument": null,
        | "ns": {"db": "test_db", "coll": "product"},
        | "documentKey": "{\"_id\": {\"pid\": 2, \"site\": \"a\"}}", "ts_ms": 1684918590000}"""
        .stripMargin.replaceAll("\n", "")
    val mspec = TableSpec("test_db", "product")
    val raw = df(mongoInsert, mongoDeleteComposite)
    assert(raw.filter(MongoCdc.route(col("value"), mspec)).count() == 2)
    val norm = MongoCdc.normalize(raw, new StructType()).orderBy("ts_ms_aws").collect()
    assert(norm(0).getAs[String]("doc_id") == "1.0")
    assert(norm(0).getAs[String]("doc").contains("\"price\""))
    // composite key → the key object's JSON text
    assert(norm(1).getAs[String]("doc_id").contains("\"pid\""))
    assert(norm(1).getAs[String]("doc") == "[]")
    assert(norm(1).getAs[String]("op_aws") == "d")
    assert(norm(1).getAs[java.sql.Date]("ts_date").toString == "2023-05-24")
  }

  test("inferred envelope → payload extraction, incl. before-only columns") {
    val raw = df(debeziumUpdate, debeziumDelete)
    val env = spark.read.json(raw.as[String]).schema
    val payload = FlinkDebeziumCdc.payloadFromEnvelope(env)
    assert(payload.fieldNames.toSet == Set("id", "k", "c", "pad"))
    // normalize with the inferred payload gives the same rows
    val norm = FlinkDebeziumCdc.normalize(raw, payload)
    assert(norm.count() == 2)
  }

  test("format dispatch accepts all config spellings") {
    assert(CdcFormat.forName("FLINK-CDC") == FlinkDebeziumCdc)
    assert(CdcFormat.forName("MSK-DEBEZIUM-CDC") == FlinkDebeziumCdc)
    assert(CdcFormat.forName("dms-cdc") == DmsCdc)
    assert(CdcFormat.forName("CANAL-CDC") == CanalCdc)
    assert(CdcFormat.forName("MONGO-CDC") == MongoCdc)
    intercept[IllegalArgumentException](CdcFormat.forName("nope"))
  }

  test("generators emit parseable envelopes for every format") {
    val ev = Tables.events(spark, sf("sf0.001")).limit(50)
    val gens: Seq[DataFrame => DataFrame] =
      Seq(CdcGen.debezium(_), CdcGen.dms, CdcGen.mongo)
    for (gen <- gens) {
      val parsed = spark.read.json(gen(ev).as[String])
      assert(parsed.count() == 50)
    }
    assert(spark.read.json(CdcGen.canal(ev).as[String]).count() > 0)
  }
}
