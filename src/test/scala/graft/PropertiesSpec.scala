package graft

import graft.operators.{Dedup, MergeOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based property tests (SURVEY.md §5 strategy: ScalaCheck for W1/J3
  * idempotence + convergence): random CDC event logs are replayed through
  * the real dedup+merge operators and compared against an imperative
  * in-memory model of "last writer wins, deletes remove". */
object PropertiesSpec {
  /** Top-level so Spark can derive an Encoder (inner classes cannot). */
  final case class E(id: Long, ts: Long, idx: Int, eid: Long, v: String, op: String)
}

class PropertiesSpec extends SparkSuite {
  import PropertiesSpec.E

  /** Deterministic sampling of a ScalaCheck generator (the scalatest
    * bridge artifact is not in the offline dep set — raw Gen + fixed
    * seeds keep the properties reproducible). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
  import spark.implicits._

  private val genEvent: Gen[(Long, Long, Int, String)] = for {
    id <- Gen.choose(0L, 6L)       // small key space → heavy per-key traffic
    ts <- Gen.choose(0L, 5L)       // coarse time → frequent ts ties
    idx <- Gen.choose(0, 2)        // Canal-style intra-envelope position
    op <- Gen.oneOf("c", "u", "u", "d") // deletes common but minority
  } yield (id, ts, idx, op)

  private val genLog: Gen[List[E]] = for {
    n <- Gen.choose(0, 60)
    raw <- Gen.listOfN(n, genEvent)
  } yield raw.zipWithIndex.map { case ((id, ts, idx, op), i) =>
    E(id, ts, idx, i.toLong, s"v$i", op) // eid unique → total LWW order
  }

  private val order = Seq(col("ts"), col("idx"), col("eid"))

  private def dedup(b: DataFrame): DataFrame = Dedup.latestPerKey(b, Seq("id"), order)

  private def merge(t: DataFrame, b: DataFrame): DataFrame = {
    // Materialize each step: chained lazy merges over many batches build a
    // deep plan; checkpoint-by-collect keeps the property fast and stable.
    val m = MergeOps.merge(t, dedup(b), Seq("id"), col("op") === "d",
      dropCols = Seq("op", "ts", "idx"))
    m.sparkSession.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(m.collect(): _*)), m.schema)
  }

  /** The spec: per key, the (ts, idx, eid)-max event wins; a winning
    * delete removes the key. Applied batch-by-batch (cross-batch: later
    * batch simply overwrites — reference T5 semantics). */
  private def model(batches: List[List[E]]): Map[Long, Long] =
    batches.foldLeft(Map.empty[Long, Long]) { (state, batch) =>
      val winners = batch.groupBy(_.id).map { case (id, es) =>
        id -> es.maxBy(e => (e.ts, e.idx, e.eid))
      }
      winners.foldLeft(state) { case (st, (id, w)) =>
        if (w.op == "d") st - id else st + (id -> w.eid)
      }
    }

  private def df(es: List[E]): DataFrame =
    es.toDF("id", "ts", "idx", "eid", "v", "op")

  private val emptyTarget = Seq.empty[(Long, Long, String)].toDF("id", "eid", "v")

  test("merge of random batch sequences equals the LWW model") {
    for (batches <- samples(Gen.listOfN(3, genLog), 8)) {
      val finalState = batches.foldLeft(emptyTarget)((t, b) => merge(t, df(b)))
        .select("id", "eid").as[(Long, Long)].collect().toMap
      assert(finalState == model(batches), s"batches=$batches")
    }
  }

  test("merge is idempotent on random batches: replaying the last batch is a no-op") {
    for ((b1, b2) <- samples(Gen.zip(genLog, genLog), 8)) {
      val once = merge(merge(emptyTarget, df(b1)), df(b2))
      val twice = merge(once, df(b2))
      val a = once.as[(Long, Long, String)].collect().toSet
      val b = twice.as[(Long, Long, String)].collect().toSet
      assert(a == b, s"b1=$b1 b2=$b2")
    }
  }

  test("window LWW ≡ max_by LWW ≡ salted LWW on random logs (incl. ties)") {
    for (log <- samples(genLog, 8) if log.nonEmpty) {
      val w = dedup(df(log)).as[(Long, Long, Int, Long, String, String)].collect().toSet
      val a = Dedup.latestPerKeyAgg(df(log), Seq("id"), order)
        .as[(Long, Long, Int, Long, String, String)].collect().toSet
      assert(w == a, s"log=$log")
      for (buckets <- Seq(1, 3, 16)) {
        val s = graft.operators.Skew.saltedLatestPerKey(df(log), Seq("id"), order,
            col("eid"), buckets)
          .as[(Long, Long, Int, Long, String, String)].collect().toSet
        assert(w == s, s"buckets=$buckets log=$log")
      }
    }
  }

  test("SchemaCache.merge: idempotent, name-preserving, fresh types win (random nested schemas)") {
    import org.apache.spark.sql.types._
    val leaf: Gen[DataType] = Gen.oneOf(StringType, LongType, DoubleType, BooleanType)
    def genStruct(depth: Int): Gen[StructType] = for {
      n <- Gen.choose(1, 4)
      names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f"))
      fields <- Gen.sequence[Seq[StructField], StructField](names.map { nm =>
        (if (depth > 0) Gen.frequency(3 -> leaf, 1 -> genStruct(depth - 1)) else leaf)
          .map(dt => StructField(nm, dt))
      })
    } yield StructType(fields)
    val pairs = samples(Gen.zip(genStruct(2), genStruct(2)), 40)
    for ((cached, fresh) <- pairs) {
      val m = graft.schema.SchemaCache.merge(cached, fresh)
      // idempotent on itself; never loses a name from either side
      assert(graft.schema.SchemaCache.merge(cached, cached) == cached)
      assert((cached.fieldNames ++ fresh.fieldNames).toSet == m.fieldNames.toSet)
      // cached order is a prefix; fresh-only names append in fresh order
      assert(m.fieldNames.take(cached.fieldNames.length).toSeq == cached.fieldNames.toSeq)
      // for shared non-struct fields the fresh type wins
      for (f <- fresh.fields; cf <- cached.fields.find(_.name == f.name)
           if !cf.dataType.isInstanceOf[StructType] || !f.dataType.isInstanceOf[StructType])
        assert(m(f.name).dataType == f.dataType, s"cached=$cached fresh=$fresh")
      // merging the merge with fresh again changes nothing (stable)
      assert(graft.schema.SchemaCache.merge(m, fresh) == m)
    }
  }

  test("secrets (S8): scheme resolution, dict parse, secret-wins precedence, redaction") {
    import graft.config.{JobConfig, Secrets}
    // env scheme (injected env), JSON dict shape like the reference's
    // SecretString (redshift_sink.py:104-110)
    val env = Map("WH_SECRET" -> """{"username": "svc", "password": "p@ss", "port": 5439}""")
    val c = Secrets.credentials(Some("env:WH_SECRET"),
      explicitUser = Some("ignored"), explicitPassword = Some("also_ignored"),
      env = env.get)
    assert(c.username.contains("svc") && c.password.contains("p@ss"))
    assert(c.port.contains(5439))
    // secret missing a field -> the explicit property fills it
    val env2 = Map("WH_SECRET" -> """{"password": "only_pw"}""")
    val c2 = Secrets.credentials(Some("env:WH_SECRET"), Some("cfg_user"), None, env2.get)
    assert(c2.username.contains("cfg_user") && c2.password.contains("only_pw"))
    // file scheme with a bare (non-JSON) secret = password
    val f = java.nio.file.Files.createTempFile("graft-secret", ".txt")
    java.nio.file.Files.writeString(f, "filepw\n")
    val c3 = Secrets.credentials(Some(s"file:$f"), Some("u"), None, _ => None)
    assert(c3.password.contains("filepw") && c3.username.contains("u"))
    java.nio.file.Files.delete(f)
    // no reference -> explicit properties pass through
    val c4 = Secrets.credentials(None, Some("u"), Some("p"), _ => None)
    assert(c4.username.contains("u") && c4.password.contains("p"))
    // unknown scheme / unset env fail loudly
    intercept[IllegalArgumentException](Secrets.resolve("vault:x", _ => None))
    intercept[IllegalArgumentException](Secrets.resolve("env:MISSING", _ => None))
    // toString never leaks
    assert(!c.toString.contains("p@ss") && !c.toString.contains("svc"))
    // properties: the reference's key name drops in unchanged
    val cfg = JobConfig.fromProperties(
      "redshift_secret_id = env:WH_SECRET\njdbc_user = u2\n")
    assert(cfg.secretId.contains("env:WH_SECRET") && cfg.jdbcUser.contains("u2"))
    assert(JobConfig.fromProperties("secret_id = file:/s\n").secretId.contains("file:/s"))
  }

  test("secrets (S8): endpoint override and escaped-JSON credential values") {
    import graft.config.Secrets
    // a rotated secret that moves the warehouse wins over the configured URL
    val moved = Secrets.parse(
      """{"username": "svc", "password": "pw", "host": "wh-new.internal", "port": 5440}""")
    assert(moved.applyTo("jdbc:postgresql://wh-old:5439/dev?ssl=true") ==
      "jdbc:postgresql://wh-new.internal:5440/dev?ssl=true")
    // secret host without port keeps the URL's port
    val hostOnly = Secrets.parse("""{"host": "wh-new"}""")
    assert(hostOnly.applyTo("jdbc:postgresql://wh-old:5439/dev") ==
      "jdbc:postgresql://wh-new:5439/dev")
    // and no port anywhere -> none emitted
    assert(hostOnly.applyTo("jdbc:postgresql://wh-old/dev") == "jdbc:postgresql://wh-new/dev")
    // secrets without a host or port, and URLs without an authority, pass through
    assert(Secrets.parse("""{"password": "p"}""").applyTo("jdbc:postgresql://h:1/db") ==
      "jdbc:postgresql://h:1/db")
    assert(moved.applyTo("jdbc:derby:memory:graft;create=true") ==
      "jdbc:derby:memory:graft;create=true")
    // a port-only secret rewrites just the port (a rotation can move the
    // listener without moving the host)
    assert(Secrets.parse("""{"port": 5440}""").applyTo("jdbc:postgresql://wh:5439/dev") ==
      "jdbc:postgresql://wh:5440/dev")
    // driver suffixes delimited by ; or ? survive the rewrite
    assert(hostOnly.applyTo("jdbc:sqlserver://wh-old;databaseName=dev") ==
      "jdbc:sqlserver://wh-new;databaseName=dev")
    assert(Secrets.parse("""{"host": "wh-new", "port": 5440}""")
      .applyTo("jdbc:mysql://wh-old:3306?useSSL=false&load=1") ==
      "jdbc:mysql://wh-new:5440?useSSL=false&load=1")
    // bracketed IPv6 authorities rewrite as one host token
    assert(hostOnly.applyTo("jdbc:postgresql://[::1]:5432/dev") ==
      "jdbc:postgresql://wh-new:5432/dev")
    assert(Secrets.parse("""{"host": "[2001:db8::7]"}""")
      .applyTo("jdbc:postgresql://wh-old:5432/dev") ==
      "jdbc:postgresql://[2001:db8::7]:5432/dev")
    // escaped quotes/backslashes/control escapes in JSON string values
    // survive the parse intact (passwords legally contain any of them)
    val esc = Secrets.parse(
      """{"username": "dom\\svc", "password": "a\"b\\c\td", "host": "h"}""")
    assert(esc.username.contains("dom\\svc"), esc.username)
    assert(esc.password.contains("a\"b\\c\td"), "escaped password must round-trip")
    assert(esc.host.contains("h"))
    // \uXXXX escapes decode (ensure-ascii JSON encoders emit them for
    // every non-ASCII character); the JSON below carries a literal
    // backslash-u sequence, built with \\ so the Scala lexer leaves it be
    val uni = Secrets.parse("{\"password\": \"p\\u00e4ss\\u20ac\"}")
    assert(uni.password.contains("päss€"), uni.password)
  }

  test("secrets (S8): database key and the SecretBinary base64 arm") {
    import graft.config.Secrets
    // the reference's dict carries `database` too (redshift_sink.py:105-115)
    // and it must win over the URL's path segment, like host/port
    val full = Secrets.parse(
      """{"username": "svc", "password": "pw", "host": "wh", "port": 5439, "database": "prod"}""")
    assert(full.database.contains("prod"))
    assert(full.applyTo("jdbc:postgresql://old:1/dev?ssl=true") ==
      "jdbc:postgresql://wh:5439/prod?ssl=true")
    assert(full.applyTo("jdbc:postgresql://old:1/dev") == "jdbc:postgresql://wh:5439/prod")
    // database-only secrets rewrite just the path; attr-style URLs
    // (no db segment) pass through unchanged
    val dbOnly = Secrets.parse("""{"database": "prod"}""")
    assert(dbOnly.applyTo("jdbc:postgresql://h:1/dev") == "jdbc:postgresql://h:1/prod")
    assert(dbOnly.applyTo("jdbc:sqlserver://h;databaseName=dev") ==
      "jdbc:sqlserver://h;databaseName=dev")
    // SecretBinary analog: a b64+ prefix decodes the resolved value
    // before parsing (redshift_sink.py:640-645)
    val json = """{"username": "binsvc", "password": "binpw"}"""
    val b64 = java.util.Base64.getEncoder.encodeToString(
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val c = Secrets.credentials(Some("b64+env:WH_BIN"), None, None,
      Map("WH_BIN" -> b64).get)
    assert(c.username.contains("binsvc") && c.password.contains("binpw"))
    // redaction covers the new field path too
    assert(full.toString.contains("database=Some(prod)") && !full.toString.contains("pw"))
  }

  test("affine MinHash family: coeffs in range, distinct, and collision-free on random bases") {
    import graft.functions.DedupFunctions._
    val coeffs = (1 to 64).map(minhashCoeff)
    assert(coeffs.distinct.size == 64, "coefficient pairs repeat")
    coeffs.foreach { case (a, b) =>
      assert(a % 2 == 1 && a > 0 && a < (1L << 20), s"a out of range: $a")
      assert(b >= 0 && b <= MinhashOutMask, s"b out of range: $b")
    }
    // For every seed, the map h0 -> (a*h0+b)&M40 must be injective on the
    // 35-bit base domain (odd multiplier mod a power of two) — sample it.
    val bases = samples(Gen.chooseNum(0L, MinhashBaseMask), 500).distinct
    for ((a, b) <- coeffs.take(8)) {
      val out = bases.map(h0 => (a * h0 + b) & MinhashOutMask)
      assert(out.distinct.size == bases.size, s"collision under a=$a b=$b")
      assert(out.forall(v => v >= 0 && v <= MinhashOutMask))
      // no overflow anywhere near Long range (the oracle engine errors on it)
      assert(bases.forall(h0 => a * h0 + b < (1L << 56)))
    }
  }
}
