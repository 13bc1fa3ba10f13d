package graft

import java.nio.file.Paths

/** Pins the [[AuditAll]] round gate's FAILURE direction: the sweep
  * proves the registry is clean, this spec proves the gate would
  * actually catch a regression (an unflaggable gate is no gate). */
class AuditAllSpec extends SparkSuite {

  test("collect allowlist flags a new site and count growth") {
    // New file not in the allowlist.
    assert(AuditAll.collectOffenders(Map("Rogue.scala" -> 1)).size === 1)
    // Known file, one more site than audited.
    val f = "PrefixScan.scala"
    val grown = Map(f -> (AuditAll.collectAllowlist(f) + 1))
    val msgs = AuditAll.collectOffenders(grown)
    assert(msgs.size === 1 && msgs.head.contains(f))
    // At or under the audited count: clean.
    assert(AuditAll.collectOffenders(
      Map(f -> AuditAll.collectAllowlist(f))).isEmpty)
    assert(AuditAll.collectOffenders(Map(f -> 0)).isEmpty)
  }

  test("allowlist matches the actual census (no drift either way)") {
    // Run from the repo root (sbt's working dir): the census the gate
    // scans is the same tree this build just compiled. An allowlist
    // entry ABOVE the census is stale headroom a new collect() could
    // hide under — require exact equality.
    val census = AuditAll.collectCensus(Paths.get("src/main/scala"))
    assert(census === AuditAll.collectAllowlist)
  }

  test("census counts OCCURRENCES: two collect() calls on one line are two") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit-census")
    java.nio.file.Files.write(dir.resolve("TwoOnOneLine.scala"),
      "val a = x.collect(); val b = y.collect()\n".getBytes)
    try assert(AuditAll.collectCensus(dir) === Map("TwoOnOneLine.scala" -> 2))
    finally {
      java.nio.file.Files.delete(dir.resolve("TwoOnOneLine.scala"))
      java.nio.file.Files.delete(dir)
    }
  }

  test("census SUMS same-named files in different directories") {
    // r11 review: a basename-keyed toMap was last-write-wins, so a new
    // collect() in a shadowed same-named file could evade the gate.
    val dir = java.nio.file.Files.createTempDirectory("graft-audit-dup")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("sub"))
    java.nio.file.Files.write(dir.resolve("Dup.scala"),
      "val a = x.collect()\n".getBytes)
    java.nio.file.Files.write(sub.resolve("Dup.scala"),
      "val b = y.collect(); val c = z.collect()\n".getBytes)
    try assert(AuditAll.collectCensus(dir) === Map("Dup.scala" -> 3))
    finally {
      java.nio.file.Files.delete(sub.resolve("Dup.scala"))
      java.nio.file.Files.delete(dir.resolve("Dup.scala"))
      java.nio.file.Files.delete(sub)
      java.nio.file.Files.delete(dir)
    }
  }

  test("plan walkers flag the shapes the gate exists to catch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(100).toDF("id")
      .withColumn("r", row_number().over(Window.orderBy(col("id"))))
    assert(WindowAudit.unpartitionedWindows(df).nonEmpty)
    val big = spark.range(5000).toDF("a")
    val alsoBig = spark.range(5000).toDF("b")
    val cart = big.join(alsoBig, col("a") < col("b"))
    assert(JoinAudit.oversizedNonEquiJoins(cart).nonEmpty)
  }
}
