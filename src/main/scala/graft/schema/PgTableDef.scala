package graft.schema

import graft.schema.SchemaEvolution.ColumnDef

/** Redshift-dialect catalog semantics — the S6 production form.
  *
  * The reference reads the warehouse catalog from `pg_table_def` and
  * normalizes Postgres-style type strings to Redshift cast targets
  * (`cdc_util/redshift_schema_evolution.py:88-155`): `character
  * varying(256)` → `varchar(256)`, `timestamp without time zone` →
  * `timestamp`, `double precision` → `float8`, and builds the
  * `ignore_ddl` INSERT/SELECT column lists with per-type `::casts`
  * (smallint guarded by a digits-only regex so free-text never aborts
  * the COPY transaction). The sandbox warehouse (Derby) exposes its
  * catalog through JDBC `DatabaseMetaData` instead, so these are pure
  * string functions: a Redshift deployment feeds them real
  * `pg_table_def` rows; the spec feeds them the same strings Redshift
  * would return and pins the reference's outputs byte-for-byte.
  */
object PgTableDef {

  /** The catalog query the reference issues (one per synced table,
    * redshift_schema_evolution.py:98-100), and the search_path set
    * before it (schema-qualified catalogs hide their rows otherwise,
    * redshift_schema_evolution.py:83-85). */
  def columnsWithTypeSql(table: String, schema: String): String =
    s"""select "column", "type" from pg_table_def where tablename = '$table' and schemaname='$schema'"""

  def searchPathSql(schema: String): String =
    s"set search_path to '$$user', public, $schema"

  /** One normalized catalog column: the cast target and whether the
    * ignore_ddl SELECT should `::cast` it at all (`cast = false` means
    * the type passed through unrecognized — the reference inserts the
    * bare column). */
  final case class CastColumn(name: String, dataType: String, cast: Boolean)

  /** The reference's type-normalization ladder, order and outputs
    * preserved (redshift_schema_evolution.py:104-132). Substring
    * matches on purpose — `timestamp without time zone`, `timestamp
    * with time zone` and `timestamptz` all fold to `timestamp`, as in
    * the original. */
  def normalize(name: String, pgType: String): CastColumn = {
    val t = pgType
    if (t.contains("timestamp")) CastColumn(name, "timestamp", cast = true)
    else if (t.contains("character") && t.contains("varying"))
      CastColumn(name, "varchar" + t.split("varying")(1).trim, cast = true)
    else if (t.contains("character("))
      CastColumn(name, "varchar" + t.split("character")(1).trim, cast = true)
    else if (t.contains("boolean")) CastColumn(name, "boolean", cast = true)
    else if (t.contains("date")) CastColumn(name, "date", cast = true)
    else if (t.contains("double precision")) CastColumn(name, "float8", cast = true)
    else if (t.contains("numeric"))
      CastColumn(name, "numeric" + t.split("numeric")(1).trim, cast = true)
    else if (t.contains("real")) CastColumn(name, "float4", cast = true)
    else if (t.contains("integer")) CastColumn(name, "int4", cast = true)
    else if (t.contains("bigint")) CastColumn(name, "int8", cast = true)
    else if (t.contains("smallint")) CastColumn(name, "smallint", cast = true)
    else CastColumn(name, t, cast = false)
  }

  /** The ignore_ddl column lists (redshift_schema_evolution.py:138-155):
    * catalog columns present in the batch become quoted INSERT names and
    * `::cast` SELECT expressions, in CATALOG order (the warehouse's
    * column order wins, not the batch's). smallint gets the reference's
    * digits-only guard so a drifted free-text value nulls instead of
    * aborting the transaction. */
  def castSelect(catalog: Seq[CastColumn],
                 batchFields: Seq[String]): (Seq[String], Seq[String]) = {
    val present = batchFields.toSet
    val kept = catalog.filter(c => present.contains(c.name))
    val insertCols = kept.map(c => "\"" + c.name + "\"")
    val selectCols = kept.map { c =>
      val q = "\"" + c.name + "\""
      if (!c.cast) q
      else if (c.dataType == "smallint")
        s"case when trim($q) ~ '^[0-9]+$$' then trim($q) else null end::smallint as $q"
      else s"$q::${c.dataType}"
    }
    (insertCols, selectCols)
  }

  /** Bridge to the engine-portable path: normalized catalog columns in
    * [[ColumnDef]] form, so [[SchemaEvolution.castToCatalog]] /
    * `sqlToSpark` consume real `pg_table_def` strings unchanged. */
  def toColumnDefs(rows: Seq[(String, String)]): Seq[ColumnDef] =
    rows.map { case (name, pgType) =>
      val n = normalize(name, pgType)
      ColumnDef(n.name, n.dataType)
    }
}
