package graft.schema

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** Per-batch JSON schema inference — the reference's most load-bearing
  * design decision (SURVEY.md §1.2; cdc_util/redshift_sink.py:592). */
object SchemaInference {

  /** Infer the envelope/payload schema of a batch of JSON strings. Unlike
    * the reference (which detours through an RDD of Python strings), this
    * stays in the JVM: `spark.read.json(Dataset[String])`. Costs one extra
    * scan of the batch — callers should cache the filtered subset first
    * (the reference re-scans three times; see SURVEY.md §4.2). */
  def infer(spark: SparkSession, jsonLines: Dataset[String]): StructType =
    spark.read.json(jsonLines).schema

  /** All-null columns infer as NullType/missing (ref README.md:64-67).
    * Policy: type them as StringType rather than failing downstream DDL —
    * generalizes the reference's regex-guarded smallint cast. */
  def nullSafe(schema: StructType): StructType =
    StructType(schema.fields.map {
      case f if f.dataType == NullType => f.copy(dataType = StringType)
      case f => f
    })
}

/** Schema-drift detection + DDL generation (ref SURVEY.md §1.3;
  * cdc_util/redshift_schema_evolution.py). The engine auto-creates the
  * target table and emits ADD/DROP COLUMN as the source drifts. */
object SchemaEvolution {

  /** One warehouse catalog column. */
  final case class ColumnDef(name: String, sqlType: String)

  /** Spark type → ANSI/Redshift DDL type (ref redshift_schema_evolution.py
    * :157-186). Fixes the reference's latent DecimalType bug: its equality
    * check `dataType == DecimalType()` only matched DECIMAL(10,0); we match
    * any precision/scale. */
  def sparkToSql(f: StructField): String = {
    val meta = f.metadata
    f.dataType match {
      case _ if meta.contains("redshift_type") && meta.getString("redshift_type") == "super" =>
        "SUPER"
      case StringType if meta.contains("maxlength") =>
        s"VARCHAR(${meta.getLong("maxlength")})"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case DoubleType => "DOUBLE PRECISION"
      case FloatType => "REAL"
      case ShortType => "INTEGER" // widened on purpose, as in the reference
      case ByteType => "SMALLINT"
      case BooleanType => "BOOLEAN"
      case TimestampType => "TIMESTAMP"
      // Parquet timestamps without UTC adjustment read as NTZ in Spark 4.
      case TimestampNTZType => "TIMESTAMP"
      case DateType => "DATE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      // Spark 4 native semi-structured column (Coerce.superColumnsVariant).
      case VariantType => "SUPER"
      case StringType => "VARCHAR(65535)"
      case NullType => "VARCHAR(65535)" // all-null batch column (README.md:64-67)
      case other =>
        throw new IllegalArgumentException(s"not support data type: $other (column ${f.name})")
    }
  }

  /** Diff a batch schema against the warehouse catalog: columns to ADD
    * (in batch, not in catalog) and to DROP (in catalog, not in batch)
    * (ref redshift_schema_evolution.py:57-69,188-211). Case-insensitive
    * names, as warehouse catalogs lower-case identifiers. */
  def diff(batch: StructType, catalog: Seq[ColumnDef]): (Seq[StructField], Seq[ColumnDef]) = {
    val batchNames = batch.fields.map(_.name.toLowerCase).toSet
    val catNames = catalog.map(_.name.toLowerCase).toSet
    val adds = batch.fields.filter(f => !catNames.contains(f.name.toLowerCase)).toSeq
    val drops = catalog.filter(c => !batchNames.contains(c.name.toLowerCase))
    (adds, drops)
  }

  def alterDdl(table: String, adds: Seq[StructField], drops: Seq[ColumnDef]): Seq[String] =
    adds.map(f => s"""ALTER TABLE $table ADD COLUMN "${f.name}" ${sparkToSql(f)}""") ++
      drops.map(c => s"""ALTER TABLE $table DROP COLUMN "${c.name}"""")

  /** CREATE TABLE with the primary key as compound sort key (ref
    * redshift_sink.py:331-334,498-501). */
  def createTableDdl(table: String, schema: StructType, sortKeys: Seq[String],
                     ifNotExists: Boolean = true): String = {
    val cols = schema.fields.map(f => s""""${f.name}" ${sparkToSql(f)}""").mkString(", ")
    val sk = if (sortKeys.nonEmpty) s""" SORTKEY (${sortKeys.map(k => s""""$k"""").mkString(", ")})"""
             else ""
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ine$table ($cols)$sk"
  }

  /** `ignore_ddl` mode: the user manages DDL; the engine casts the batch to
    * the catalog's types instead of evolving the table (ref
    * redshift_schema_evolution.py:97-155). Returns `col::type`-style cast
    * expressions in catalog order, restricted to columns present in both. */
  def castToCatalog(df: DataFrame, catalog: Seq[ColumnDef]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val present = df.columns.map(_.toLowerCase).toSet
    val kept = catalog.filter(c => present.contains(c.name.toLowerCase))
    df.select(kept.map(c => col(c.name).cast(sqlToSpark(c.sqlType)).as(c.name)): _*)
  }

  /** Normalize a warehouse catalog type back to a Spark type (inverse
    * mapping, ref redshift_schema_evolution.py:97-135). */
  def sqlToSpark(sqlType: String): DataType = {
    val t = sqlType.trim.toLowerCase
    val numeric = "(?:numeric|decimal)\\s*\\((\\d+)\\s*,\\s*(\\d+)\\)".r
    val varchar = "(?:character varying|varchar)\\s*\\((\\d+)\\)".r
    t match {
      case s if s.startsWith("timestamp") => TimestampType
      case varchar(_) => StringType
      case "double precision" | "float8" | "float" => DoubleType
      case numeric(p, s) => DecimalType(p.toInt, s.toInt)
      case "real" | "float4" => FloatType
      case "integer" | "int4" | "int" => IntegerType
      case "bigint" | "int8" => LongType
      case "smallint" | "int2" => ShortType
      case "boolean" | "bool" => BooleanType
      case "date" => DateType
      case "super" => StringType
      case _ => StringType
    }
  }
}
