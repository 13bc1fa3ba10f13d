package graft

import org.apache.spark.sql.SparkSession

/** Testdata-schema smoke gate (VERDICT r7 "what's wrong" #4): the driver
  * regenerates `/root/testdata` between rounds and has changed physical
  * types under us before (events.ts: int64-nanos → timestamp[us], which
  * silently shipped a red round). This main fails LOUDLY — nonzero exit,
  * one line per problem — if any table in any sf dir can't be read or if
  * the [[Tables.events]] derivations (`ts` TimestampType, `ts_ms` BIGINT)
  * don't resolve and materialize. Run it before Verify/Bench:
  * {{{ sbt "runMain graft.Smoke" }}}
  * (~5 s; reads 1 row per table). Optional arg: a base dir other than
  * /root/testdata.
  */
object Smoke {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfDirs = new java.io.File(base).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted.toSeq
    if (sfDirs.isEmpty) { System.err.println(s"[smoke] no sf dirs under $base"); sys.exit(2) }

    var bad = 0
    for (dir <- sfDirs; t <- tables) {
      try {
        val df =
          if (t == "events") {
            val e = Tables.events(spark, dir)
            val tsType = e.schema("ts").dataType.typeName
            val msType = e.schema("ts_ms").dataType.typeName
            require(tsType == "timestamp", s"events.ts resolved to $tsType, want timestamp")
            require(msType == "long", s"events.ts_ms resolved to $msType, want long")
            // unit-inference sanity: a misread epoch unit lands centuries
            // away — any plausible testdata is between 2010 and 2040
            val ms = e.select("ts_ms").head().getLong(0)
            require(ms > 1262304000000L && ms < 2208988800000L,
              s"events.ts_ms=$ms outside 2010..2040 — epoch unit misinferred?")
            e
          } else Tables.table(spark, dir, t)
        // materialize one row end-to-end so physical read + conversions run
        val n = df.limit(1).collect().length
        require(n == 1, s"$t read 0 rows")
        println(s"[smoke] ok   $dir/$t")
      } catch {
        case e: Throwable =>
          bad += 1
          System.err.println(s"[smoke] FAIL $dir/$t: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
    if (bad > 0) { System.err.println(s"[smoke] $bad failures"); sys.exit(1) }
    println(s"[smoke] all ${sfDirs.size * tables.size} table reads green")
  }
}
