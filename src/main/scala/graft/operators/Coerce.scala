package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StringType}

/** Column-type coercions applied after flatten, driven by the table spec
  * (ref SURVEY.md §2.8 F3/F4, §2.2 P10/P11; cdc_util/redshift_sink.py
  * :170-190,276-290,416-441). All native expressions — codegen'd, no UDFs,
  * no RDD round-trip (the reference rebuilds the DataFrame via
  * `createDataFrame(df.rdd, schema)` to attach metadata; we use
  * `Column.as(name, metadata)` which keeps the plan intact). */
object Coerce {

  /** Default format matches the reference (redshift_sink.py:178). */
  final val DefaultTsFmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  private def split(entry: String): (String, Option[String]) =
    entry.split("\\|", 2) match {
      case Array(c)      => (c.trim, None)
      case Array(c, fmt) => (c.trim, Some(fmt.trim))
    }

  /** `timestamp_columns`: each entry "col" (default format) or "col|fmt"
    * (ref redshift_sink.py:170-182). Missing columns are skipped, as in
    * the reference (schema drift may lag config). */
  def timestampColumns(df: DataFrame, entries: Seq[String],
                       defaultFmt: String = DefaultTsFmt): DataFrame =
    entries.map(split).foldLeft(df) { case (d, (c, fmt)) =>
      if (!d.columns.contains(c)) d
      else d.withColumn(c, to_timestamp(col(c).cast(StringType), fmt.getOrElse(defaultFmt)))
    }

  /** `date_columns`: "col" defaults to `since_1970` — the column is an
    * epoch-day integer (Flink CDC emits DATE as days since 1970-01-01) →
    * `date_add('1970-01-01', n)`; "col|fmt" parses a date string
    * (ref redshift_sink.py:183-187). */
  def dateColumns(df: DataFrame, entries: Seq[String]): DataFrame =
    entries.map(split).foldLeft(df) { case (d, (c, fmt)) =>
      if (!d.columns.contains(c)) d
      else fmt match {
        case None | Some("since_1970") =>
          d.withColumn(c, date_add(lit("1970-01-01").cast("date"), col(c).cast("int")))
        case Some(f) =>
          d.withColumn(c, to_date(col(c).cast(StringType), f))
      }
    }

  /** Metadata marking a string column as semi-structured for the sink DDL
    * (→ SUPER in Redshift terms; ref redshift_sink.py:283-284). */
  val superMetadata: Metadata = new MetadataBuilder()
    .putBoolean("super", true).putString("redshift_type", "super").build()

  /** Shared P10 repair: null/empty semi-structured payload → "{}" so the
    * downstream JSON parse cannot fail — one definition for both the
    * text-SUPER and variant-SUPER paths. */
  private def repairJson(c: String) =
    when(col(c).isNull || col(c) === "", lit("{}"))
      .otherwise(col(c).cast(StringType))

  /** `super_columns`: (1) repair null/empty to "{}" so the sink's JSON
    * parse cannot fail (ref P10, redshift_sink.py:276-278), (2) stamp the
    * field metadata used by DDL generation (ref P11). */
  def superColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (!d.columns.contains(c)) d
      else d.withColumn(c, repairJson(c).as(c, superMetadata))
    }

  /** Spark-4-native alternative for semi-structured columns: the same
    * null/empty repair, then `parse_json` into a real `VariantType` column
    * (binary-encoded, field-accessible via `variant_get` without
    * re-parsing, storable in parquet). The reference keeps SUPER columns
    * as JSON text because Redshift parses them on COPY
    * (redshift_sink.py:276-290); for lake-house targets the variant form
    * is strictly better — parse once at ingest, prune fields at read.
    * `parse_json` (not `try_parse_json`): a malformed SUPER payload should
    * fail the batch loudly, matching the sink's fail-fast policy. */
  def superColumnsVariant(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (!d.columns.contains(c)) d
      else d.withColumn(c, parse_json(repairJson(c)).as(c, superMetadata))
    }

  /** Apply every coercion a TableSpec declares, in reference order.
    * `super_as_variant` picks the native VariantType form over repaired
    * JSON text (same repair, parsed once; SUPER DDL either way). */
  def apply(df: DataFrame, spec: graft.config.TableSpec): DataFrame = {
    val t = timestampColumns(df, spec.timestampColumns)
    val d = dateColumns(t, spec.dateColumns)
    if (spec.superAsVariant) superColumnsVariant(d, spec.superColumns)
    else superColumns(d, spec.superColumns)
  }
}
