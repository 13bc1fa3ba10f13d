package graft

import graft.operators.DataQuality
import graft.operators.DataQuality.{Accepted, Check, ForeignKey, InRange, NotNull, Predicate, Unique}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks ([[graft.operators.DataQuality]]):
  * exact violation counts per check, one aggregate pass for all scalar
  * checks, anti-join referential integrity. */
class DataQualitySpec extends SparkSuite {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame,
                     checks: Seq[Check]): Map[String, (Long, Boolean)] =
    DataQuality.run(df, checks).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("each check counts exactly its violations on crafted rows") {
    val df = Seq(
      (1L, Some("a"), 10.0, "x"),
      (2L, None, 5.0, "y"),
      (2L, Some("c"), -1.0, "x"),
      (4L, Some("d"), 200.0, "zz"))
      .toDF("id", "name", "v", "cat")
    val got = report(df, Seq(
      NotNull("name"),
      Unique(Seq("id")),
      InRange("v", 0.0, 100.0),
      Accepted("cat", Seq("x", "y")),
      Predicate("custom(v_gt_cat_len)", col("v") > length(col("cat")) * 100)))
    assert(got("not_null(name)") === (1L, false))
    assert(got("unique(id)") === (1L, false))
    assert(got("in_range(v,0.0,100.0)") === (2L, false), got) // -1 and 200
    assert(got("accepted(cat)") === (1L, false))
    assert(got("custom(v_gt_cat_len)") === (0L, true))
  }

  test("foreign key: orphans counted via anti-join; clean child passes") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 9L), (13L, 9L)).toDF("id", "fk")
    val got = report(child, Seq(ForeignKey(Seq("fk"), parent, Seq("pk"))))
    assert(got("foreign_key(fk)") === (2L, false))
    val clean = Seq((10L, 1L)).toDF("id", "fk")
    assert(report(clean,
      Seq(ForeignKey(Seq("fk"), parent, Seq("pk"))))("foreign_key(fk)") ===
      (0L, true))
  }

  test("null values violate in_range and accepted (a contract about a " +
    "column's values is a contract about its presence)") {
    val df = Seq((1L, Some(5.0), Some("x")), (2L, None, None))
      .toDF("id", "v", "cat")
      .select(col("id"), col("v").cast("double").as("v"), col("cat"))
    val got = report(df, Seq(InRange("v", 0.0, 10.0), Accepted("cat", Seq("x"))))
    assert(got("in_range(v,0.0,10.0)") === (1L, false))
    assert(got("accepted(cat)") === (1L, false))
  }

  test("unique: NULL keys count as violations, matching the " +
    "count(*) - count(DISTINCT key) replay") {
    val df = Seq((Some(1L), "a"), (None: Option[Long], "b"),
      (None: Option[Long], "c"), (Some(2L), "d"))
      .toDF("id", "x")
    val got = report(df, Seq(Unique(Seq("id"))))
    assert(got("unique(id)") === (2L, false), got) // 4 rows - 2 distinct
  }

  test("an empty table passes every aggregate check (zero violations)") {
    val df = Seq.empty[(Long, String)].toDF("id", "name")
    val got = report(df, Seq(NotNull("name"), Unique(Seq("id"))))
    assert(got.values.forall(_ == (0L, true)), got)
  }

  test("all scalar checks share one aggregate: the plan has a single " +
    "aggregate pair over one scan") {
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("g"))
    val q = DataQuality.run(df, Seq(NotNull("g"), InRange("g", 0.0, 6.0),
      Unique(Seq("id"))))
    q.collect()
    val scans = q.queryExecution.executedPlan.collect {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
      case r if r.nodeName.contains("Range") => r
    }
    assert(scans.size <= 2, // the Range may appear pre/post AQE once each
      q.queryExecution.executedPlan.toString.take(1500))
  }
}
