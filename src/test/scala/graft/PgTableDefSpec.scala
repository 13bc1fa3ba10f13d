package graft

import graft.schema.{PgTableDef, SchemaEvolution}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** S6 Redshift-dialect catalog semantics, pinned against the exact
  * strings `pg_table_def` returns and the reference's normalization
  * outputs (redshift_schema_evolution.py:88-155). */
class PgTableDefSpec extends AnyFunSuite {

  test("catalog query and search_path text match the reference") {
    assert(PgTableDef.columnsWithTypeSql("orders", "cdc") ==
      """select "column", "type" from pg_table_def where tablename = 'orders' and schemaname='cdc'""")
    assert(PgTableDef.searchPathSql("cdc") == "set search_path to '$user', public, cdc")
  }

  test("type normalization reproduces the reference ladder on real pg_table_def strings") {
    val rows = Seq(
      "ts1" -> "timestamp without time zone",
      "ts2" -> "timestamp with time zone",
      "name" -> "character varying(256)",
      "code" -> "character(8)",
      "ok" -> "boolean",
      "d" -> "date",
      "x" -> "double precision",
      "amt" -> "numeric(18,2)",
      "r" -> "real",
      "i" -> "integer",
      "big" -> "bigint",
      "small" -> "smallint",
      "doc" -> "super")
    val n = rows.map { case (c, t) => PgTableDef.normalize(c, t) }
    assert(n.map(c => c.dataType -> c.cast) == Seq(
      "timestamp" -> true, "timestamp" -> true,
      "varchar(256)" -> true, "varchar(8)" -> true,
      "boolean" -> true, "date" -> true, "float8" -> true,
      "numeric(18,2)" -> true, "float4" -> true, "int4" -> true,
      "int8" -> true, "smallint" -> true,
      // unrecognized types pass through uncast, as in the reference
      "super" -> false))
  }

  test("ignore_ddl cast lists: catalog order, ::casts, smallint digits guard") {
    val catalog = Seq(
      PgTableDef.normalize("id", "bigint"),
      PgTableDef.normalize("qty", "smallint"),
      PgTableDef.normalize("name", "character varying(64)"),
      PgTableDef.normalize("doc", "super"),
      PgTableDef.normalize("dropped", "integer"))
    // batch order differs and lacks `dropped` — catalog order must win
    val (ins, sel) = PgTableDef.castSelect(catalog, Seq("name", "doc", "qty", "id"))
    assert(ins == Seq("\"id\"", "\"qty\"", "\"name\"", "\"doc\""))
    assert(sel == Seq(
      "\"id\"::int8",
      "case when trim(\"qty\") ~ '^[0-9]+$' then trim(\"qty\") else null end::smallint as \"qty\"",
      "\"name\"::varchar(64)",
      "\"doc\""))
  }

  test("normalized pg types flow into the engine's Spark-type mapping") {
    val defs = PgTableDef.toColumnDefs(Seq(
      "ts" -> "timestamp without time zone",
      "name" -> "character varying(256)",
      "amt" -> "numeric(18,2)",
      "x" -> "double precision",
      "i" -> "integer",
      "doc" -> "super"))
    assert(defs.map(d => SchemaEvolution.sqlToSpark(d.sqlType)) == Seq(
      TimestampType, StringType, DecimalType(18, 2), DoubleType,
      IntegerType, StringType))
  }
}
