package graft.sink

import graft.config.TableSpec
import graft.schema.SchemaEvolution
import graft.schema.SchemaEvolution.ColumnDef
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** S5's production form: the staged-COPY bulk-load path.
  *
  * The reference never batch-INSERTs a micro-batch into Redshift — it
  * writes the batch to S3 part files and has the warehouse pull them with
  * `COPY`, then runs the merge transaction as a post-action
  * (`cdc_util/redshift_sink.py:345-380,498-560`: tempdir staging,
  * `tempformat` CSV / CSV GZIP / PARQUET, `extracopyoptions`
  * "TRUNCATECOLUMNS region … maxerror … dateformat 'auto' timeformat
  * 'auto'", `aws_iam_role`, and the begin/delete-using/insert/truncate/end
  * transaction with a `create table … sortkey … as select … where 1=3`
  * prepended on first contact). JDBC insert cannot sustain 1M-row batches
  * against a columnar warehouse; the staged COPY is the scale path.
  *
  * Spark-first split of that behavior:
  *  - [[CopyStage.stage]] — the batch lands as part files via Spark's
  *    DISTRIBUTED writer (every executor writes its partition; the driver
  *    only lists the finished files to build the manifest, O(#files)).
  *  - [[RedshiftSql]] — the exact SQL text the warehouse would receive
  *    (COPY statement + merge transaction), pure functions pinned by
  *    `StagedCopySpec` against the reference's templates.
  *  - [[CopyExecutor]] — how the staged files become staging-table rows.
  *    [[StatementCopyExecutor]] issues the COPY text verbatim over the
  *    warehouse connection (production; needs a COPY-capable engine).
  *    [[ReplayCopyExecutor]] replays the manifest through a distributed
  *    Spark read + JDBC append — COPY semantics for engines without COPY
  *    (Derby here), so the WHOLE pipeline (staging layout, manifest,
  *    transaction, retry) is exercised end-to-end in the sandbox.
  *
  * At 100 TB: the staging write is a narrow per-partition dump (no
  * shuffle), the manifest is #files entries, and the warehouse-side COPY
  * parallelizes across its own slices — nothing on the Spark side holds
  * the batch in one place.
  */
object CopyStage {

  /** Options shared by the staging writer and the replay reader — both
    * sides MUST agree or the round-trip corrupts nulls/quotes/timestamps.
    * `@NULL@` is the spark-redshift community connector's null sentinel
    * (emitted in the COPY text as `NULL AS '@NULL@'`). */
  val csvOptions: Map[String, String] = Map(
    "nullValue" -> "@NULL@",
    "quote" -> "\"",
    "escape" -> "\"",
    // read-side: records legally contain quoted newlines (COPY CSV parses
    // them; Spark needs the whole-file parser). gzip parts are already
    // non-splittable, so this costs nothing at the staging sizes involved.
    "multiLine" -> "true",
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "dateFormat" -> "yyyy-MM-dd")

  /** Options shared by the JSON staging writer and replay reader (the
    * reference's other tempformat pair, config/job-ec2.properties:15:
    * "CSV,CSV GZIP,JSON, JSON GZIP"). */
  val jsonOptions: Map[String, String] = Map(
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "dateFormat" -> "yyyy-MM-dd")

  final case class StagedBatch(dir: String, manifestPath: String,
                               files: Seq[String], tempformat: String)

  /** Write `df` under `tempRoot/<uuid>/` in `tempformat` and a Redshift
    * manifest JSON naming every part file (`mandatory: true` — a lost
    * part must fail the COPY, not silently shrink the batch). */
  def stage(df: DataFrame, tempRoot: String, tempformat: String): StagedBatch = {
    val dir = s"$tempRoot/${java.util.UUID.randomUUID().toString}"
    val w = df.write.mode(SaveMode.Overwrite)
    tempformat.trim.toUpperCase match {
      case "PARQUET" => w.parquet(dir)
      case "CSV" => w.options(csvOptions).csv(dir)
      case "CSV GZIP" => w.options(csvOptions).option("compression", "gzip").csv(dir)
      case "JSON" => w.options(jsonOptions).json(dir)
      case "JSON GZIP" => w.options(jsonOptions).option("compression", "gzip").json(dir)
      case other => throw new IllegalArgumentException(
        s"unsupported tempformat '$other' (CSV | CSV GZIP | JSON | JSON GZIP | PARQUET)")
    }
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getAbsolutePath).sorted.toSeq
    val manifestPath = s"$dir/manifest.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(manifestPath),
      manifestJson(files))
    StagedBatch(dir, manifestPath, files, tempformat.trim.toUpperCase)
  }

  /** Redshift COPY manifest format (public AWS spec): every entry
    * mandatory so a missing part aborts the load. */
  def manifestJson(files: Seq[String]): String =
    files.map(f => s"""    {"url": "$f", "mandatory": true}""")
      .mkString("{\n  \"entries\": [\n", ",\n", "\n  ]\n}\n")

  /** Parse entry URLs back out of a manifest (the replay executor's
    * input; bounded by #files). */
  def manifestFiles(manifestPath: String): Seq[String] = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(manifestPath))
    "\"url\"\\s*:\\s*\"([^\"]+)\"".r.findAllMatchIn(text).map(_.group(1)).toSeq
  }

  def cleanup(batch: StagedBatch): Unit =
    DirSwap.rmTree(new java.io.File(batch.dir))
}

/** The warehouse-dialect SQL text, centralized and pure so the spec pins
  * it byte-for-byte against the reference's templates. */
object RedshiftSql {

  final case class CopyOptions(iamRole: String = "", region: String = "",
                               maxError: Long = 0L, tempformat: String = "CSV")

  private def fmt(tempformat: String): String = tempformat.trim.toUpperCase match {
    case "PARQUET" => "FORMAT AS PARQUET"
    // CSV carries the connector's null sentinel; JSON/PARQUET are
    // self-describing ('auto' maps JSON keys to columns by name)
    case "CSV" => "FORMAT AS CSV NULL AS '@NULL@'"
    case "CSV GZIP" => "FORMAT AS CSV GZIP NULL AS '@NULL@'"
    case "JSON" => "FORMAT AS JSON 'auto'"
    case "JSON GZIP" => "FORMAT AS JSON 'auto' GZIP"
    case other => throw new IllegalArgumentException(s"unsupported tempformat '$other'")
  }

  /** The reference's extracopyoptions string, verbatim
    * (redshift_sink.py:356-358): TRUNCATECOLUMNS + region + maxerror +
    * auto date/time parsing. */
  def extraCopyOptions(opts: CopyOptions): String =
    s"TRUNCATECOLUMNS region '${opts.region}' maxerror ${opts.maxError} " +
      "dateformat 'auto' timeformat 'auto'"

  /** The COPY the warehouse receives: manifest-driven, IAM-authorized,
    * format per `tempformat`, reference extracopyoptions appended. */
  def copySql(stagingTable: String, manifestUrl: String, opts: CopyOptions): String =
    s"COPY $stagingTable FROM '$manifestUrl' " +
      s"IAM_ROLE '${opts.iamRole}' MANIFEST ${fmt(opts.tempformat)} " +
      extraCopyOptions(opts)

  /** First-contact target creation — the reference's create-as-select with
    * the primary key as compound sortkey, byte-identical to
    * redshift_sink.py:331-334 (including its double space after "table"). */
  def createAsSelectSql(target: String, staging: String, cols: Seq[String],
                        sortKeys: Seq[String]): String = {
    val q = (s: String) => "\"" + s + "\""
    s"create table  $target sortkey (${sortKeys.map(q).mkString(",")}) " +
      s"as select ${cols.map(q).mkString(",")} from $staging where 1=3;"
  }

  /** The merge transaction post-action, byte-shaped like
    * redshift_sink.py:335-341: begin; [create;] [schema-change;] delete
    * using; insert-select; truncate staging; end. */
  def transactionSql(target: String, staging: String, cols: Seq[String],
                     mergeKeys: Seq[String], targetExists: Boolean,
                     schemaChangeSql: String = ""): String = {
    val q = (s: String) => "\"" + s + "\""
    val on = mergeKeys.map(k => s"$target.${q(k)} = $staging.${q(k)}").mkString(" and ")
    val columns = cols.map(q).mkString(",")
    val txn = s"begin;$schemaChangeSql delete from $target using $staging where $on; " +
      s"insert into $target($columns) select $columns from $staging; " +
      s"truncate table $staging; end;"
    if (targetExists) txn
    else txn.replace("begin;",
      s"begin; ${createAsSelectSql(target, staging, cols, mergeKeys)}")
  }

  /** The MONGO path's merge transaction, byte-shaped like
    * mongo_redshift_sink.py:174-187 — the reference is ASYMMETRIC
    * between its two sinks, and the asymmetry is pinned here rather
    * than papered over:
    *
    *  - lifecycle: the Mongo path `drop table`s the staging table per
    *    batch where the MySQL path `truncate`s it (the Mongo staging
    *    table is re-created by the connector on the next batch; the
    *    MySQL one persists empty);
    *  - delete handling: the Mongo path filters `operation!='delete'`
    *    INSIDE the warehouse insert (the delete rows still ride to the
    *    staging table to drive the delete-using), where the MySQL path
    *    inserts every staged row;
    *  - join key: fixed unquoted `doc_id`, staging side first
    *    (mongo_redshift_sink.py:133-138), vs per-spec quoted keys
    *    target-side-first;
    *  - first-contact create-as-select sortkeys `ts_date` (the derived
    *    ingest date), not the merge key.
    *
    * `opCol`/`delValue` default to the REFERENCE's column name and
    * delete sentinel (`operation`/'delete' — the byte-shape
    * StagedCopySpec pins); [[StagedCopyMergeSink.writeBatch]] passes
    * this pipeline's own markers (`op_aws`/'d') so the recorded
    * post-action is executable against the staging tables this sink
    * actually stages. */
  def mongoTransactionSql(target: String, staging: String,
                          cols: Seq[String], targetExists: Boolean,
                          opCol: String = "operation",
                          delValue: String = "delete"): String = {
    val columns = cols.mkString(",")
    val txn = s"begin; delete from $target using $staging " +
      s"where $staging.doc_id = $target.doc_id; " +
      s"insert into $target($columns) select $columns from $staging " +
      s"where $opCol!='$delValue'; drop table $staging; end;"
    if (targetExists) txn
    else txn.replace("begin;",
      s"begin; create table  $target sortkey (ts_date) " +
        s"as select $columns from $staging where 1=3;")
  }
}

/** How staged part files become staging-table rows. */
trait CopyExecutor {
  /** Load `batch` into `stagingTable`. `conn` is the warehouse connection
    * the merge transaction will run on (the statement executor uses it;
    * the replay executor loads through Spark's own JDBC path instead,
    * exactly like the connector's pre-postactions write). */
  def copyInto(conn: Connection, stagingTable: String, batch: CopyStage.StagedBatch,
               schema: StructType, opts: RedshiftSql.CopyOptions): Unit

  /** Whether [[copyInto]] needs the staging table pre-created (a real
    * warehouse COPY loads INTO an existing table; the replay executor
    * instead recreates the table through Spark's JDBC Overwrite, whose
    * dialect owns the column types — pre-creating with warehouse DDL
    * would leave types the dialect's writer can't bind, e.g. Derby
    * binds string NULLs as CLOB, not VARCHAR). */
  def requiresExistingStaging: Boolean = true
}

/** Production path: hand the warehouse the COPY text and let it pull the
  * manifest itself. `manifestUrlFor` maps the local manifest path to the
  * URL the warehouse sees (e.g. the s3:// key the tempdir is mounted at). */
final class StatementCopyExecutor(manifestUrlFor: String => String = identity)
  extends CopyExecutor {
  def copyInto(conn: Connection, stagingTable: String, batch: CopyStage.StagedBatch,
               schema: StructType, opts: RedshiftSql.CopyOptions): Unit = {
    val st = conn.createStatement()
    try st.execute(RedshiftSql.copySql(stagingTable,
      manifestUrlFor(batch.manifestPath), opts.copy(tempformat = batch.tempformat)))
    finally st.close()
  }
}

/** COPY semantics for engines without COPY: read the manifest's files back
  * with the SAME options the stage writer used and append through Spark's
  * distributed JDBC writer. Every part file is mandatory — a missing one
  * throws, as the real COPY would. */
final class ReplayCopyExecutor(spark: SparkSession, url: String, connProps: Properties)
  extends CopyExecutor {
  override def requiresExistingStaging: Boolean = false
  def copyInto(conn: Connection, stagingTable: String, batch: CopyStage.StagedBatch,
               schema: StructType, opts: RedshiftSql.CopyOptions): Unit = {
    val files = CopyStage.manifestFiles(batch.manifestPath)
    files.filterNot(f => new java.io.File(f).isFile) match {
      case Nil =>
      case missing => throw new IllegalStateException(
        s"mandatory manifest entries missing: ${missing.mkString(", ")}")
    }
    val df =
      if (files.isEmpty) // an all-quarantined batch stages zero part files
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else batch.tempformat match {
        case "PARQUET" => spark.read.schema(schema).parquet(files: _*)
        case "JSON" | "JSON GZIP" =>
          spark.read.schema(schema).options(CopyStage.jsonOptions).json(files: _*)
        case _ => spark.read.schema(schema).options(CopyStage.csvOptions).csv(files: _*)
      }
    // Same staging-load shape as JdbcMergeSink: Overwrite + truncate
    // reuses the table when shapes match and recreates it when the
    // dialect owns the types (a dialect's string type must also be the
    // type its writer binds NULLs with); op_aws is forced comparable.
    val w = df.write.mode(SaveMode.Overwrite).option("truncate", "true")
    (if (df.columns.contains("op_aws"))
       w.option("createTableColumnTypes", "op_aws VARCHAR(8)")
     else w).jdbc(url, stagingTable, connProps)
  }
}

/** The staged-COPY merge sink: same contract as [[JdbcMergeSink]] (S5 —
  * auto-create/evolve, dedup'd batch in, one merge transaction, retry
  * once with a dropped staging table) but the staging load goes through
  * tempdir part files + manifest + COPY instead of batch INSERT. The
  * generated warehouse-dialect post-action text for the last batch is
  * kept on [[lastTransactionSql]] so callers (and the spec) can audit
  * exactly what a Redshift deployment would have executed. */
final class StagedCopyMergeSink(url: String, connProps: Properties = new Properties(),
                                tempDir: String,
                                executor: CopyExecutor,
                                opts: RedshiftSql.CopyOptions = RedshiftSql.CopyOptions(),
                                maxVarchar: Int = 65535,
                                keepStaged: Boolean = false) {

  @volatile private var lastTxn: Option[String] = None
  /** The Redshift-dialect transaction the last [[writeBatch]] mirrors. */
  def lastTransactionSql: Option[String] = lastTxn

  private def clampVarchar(ddl: String): String =
    "VARCHAR\\((\\d+)\\)".r.replaceAllIn(ddl, m =>
      s"VARCHAR(${math.min(m.group(1).toInt, maxVarchar)})")

  private def withConnection[A](f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, connProps)
    try f(conn) finally conn.close()
  }

  private def execute(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  private def lookupColumns(conn: Connection, name: String): List[ColumnDef] = {
    val (schemaPat, tablePat) = name.split("\\.", 2) match {
      case Array(s, t) => (s, t)
      case _ => (null, name)
    }
    def one(s: String, t: String): List[ColumnDef] = {
      val rs = conn.getMetaData.getColumns(null, s, t, null)
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => ColumnDef(r.getString("COLUMN_NAME").toLowerCase,
          r.getString("TYPE_NAME"))).toList
    }
    one(schemaPat, tablePat) match {
      case Nil => one(if (schemaPat == null) null else schemaPat.toUpperCase,
        tablePat.toUpperCase)
      case c => c
    }
  }

  def catalogColumns(table: String): Option[Seq[ColumnDef]] = withConnection { conn =>
    lookupColumns(conn, table) match { case Nil => None; case c => Some(c) }
  }

  private def q(id: String): String = "\"" + id + "\""

  def writeBatch(stage0: DataFrame, spec: TableSpec): Unit = {
    val target = spec.resolvedTarget
    val staging = s"${target}_stage_aws"
    val dataCols = stage0.columns.filterNot(Seq("ts_ms_aws", "idx_aws").contains)
    val stage1 = stage0.select(dataCols.map(col): _*)
    val stage = if (!spec.ignoreDdl) stage1 else {
      val catalog = catalogColumns(target).getOrElse(throw new IllegalStateException(
        s"ignore_ddl=true but target table $target does not exist"))
      val present = stage1.columns.map(_.toLowerCase).toSet
      val castCols = catalog.filter(c => present.contains(c.name.toLowerCase))
        .map(c => col(c.name).cast(SchemaEvolution.sqlToSpark(c.sqlType)).as(c.name))
      stage1.select(castCols :+ col("op_aws"): _*)
    }

    def attempt(dropStagingFirst: Boolean): Unit = {
      val targetExisted = withConnection { conn =>
        if (dropStagingFirst)
          try execute(conn, s"DROP TABLE $staging") catch { case _: Exception => }
        val existed = lookupColumns(conn, target).nonEmpty
        ensureTargetSchema(conn, stage.drop("op_aws"), spec)
        // Staging must exist before a COPY statement can target it —
        // the production StatementCopyExecutor hands the warehouse
        // COPY text only, so on first contact, and on every batch
        // after a Mongo-family per-batch DROP, the table would be
        // missing. Mirrors the connector's staging-create preaction.
        // The replay executor opts out: Spark's JDBC Overwrite
        // creates the table with the dialect's own types.
        if (executor.requiresExistingStaging && lookupColumns(conn, staging).isEmpty)
          execute(conn, clampVarchar(SchemaEvolution.createTableDdl(
            staging, stage.schema, Nil, ifNotExists = false)))
        existed
      }
      val batch = CopyStage.stage(stage, tempDir, opts.tempformat)
      try {
        withConnection { conn =>
          executor.copyInto(conn, staging, batch, stage.schema,
            opts.copy(maxError = math.max(opts.maxError, 0L)))
          // The exact post-action a Redshift deployment would run —
          // the Mongo family (no configured primary key: the pipeline
          // merges on the extracted doc_id, TableSpec.mergeKeys) uses
          // the reference's drop-staging / insert-filtered form, every
          // other family the MySQL truncate-staging form (see
          // mongoTransactionSql's scaladoc on the asymmetry).
          val isMongo = spec.primaryKey.isEmpty
          lastTxn = Some(
            if (isMongo) RedshiftSql.mongoTransactionSql(target, staging,
              stage.columns.filterNot(_ == "op_aws").toSeq,
              targetExists = targetExisted,
              opCol = "op_aws", delValue = "d")
            else RedshiftSql.transactionSql(target, staging,
              stage.columns.filterNot(_ == "op_aws").toSeq, spec.mergeKeys,
              targetExists = targetExisted))
          conn.setAutoCommit(false)
          try {
            val on = spec.mergeKeys
              .map(k => s"$target.${q(k)} = $staging.${q(k)}").mkString(" AND ")
            execute(conn,
              s"DELETE FROM $target WHERE EXISTS (SELECT 1 FROM $staging WHERE $on)")
            val insertCols = stage.columns.filterNot(_ == "op_aws").map(q)
            val opPredicate = if (spec.skipDelete) "1=1" else s"${q("op_aws")} <> 'd'"
            execute(conn,
              s"INSERT INTO $target (${insertCols.mkString(", ")}) " +
                s"SELECT ${insertCols.mkString(", ")} FROM $staging WHERE $opPredicate")
            // Staging lifecycle follows the reference's per-family
            // asymmetry: Mongo-shaped specs drop the staging table each
            // batch (recreated by the next batch's staged load), MySQL
            // truncates and keeps it.
            if (spec.primaryKey.isEmpty)
              execute(conn, s"DROP TABLE $staging")
            else
              execute(conn, s"TRUNCATE TABLE $staging")
            conn.commit()
          } catch {
            case e: Exception => conn.rollback(); throw e
          } finally conn.setAutoCommit(true)
        }
        if (!keepStaged) CopyStage.cleanup(batch)
      } catch {
        case e: Exception =>
          if (!keepStaged) CopyStage.cleanup(batch)
          throw e
      }
    }
    // Reference retry: first failure drops the (usually schema-drifted)
    // staging table and tries once more (redshift_sink.py:360-380).
    try attempt(dropStagingFirst = false)
    catch { case _: Exception => attempt(dropStagingFirst = true) }
  }

  private def ensureTargetSchema(conn: Connection, data: DataFrame, spec: TableSpec): Unit = {
    if (spec.ignoreDdl) return
    val target = spec.resolvedTarget
    val existing = lookupColumns(conn, target)
    if (existing.isEmpty) {
      execute(conn, clampVarchar(SchemaEvolution.createTableDdl(target, data.schema,
        Nil, ifNotExists = false)))
    } else {
      val (adds, drops) = SchemaEvolution.diff(data.schema, existing)
      SchemaEvolution.alterDdl(target, adds, drops).map(clampVarchar)
        .foreach(execute(conn, _))
    }
  }
}
