package graft

import graft.functions.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions: the properties that make these operators hold
  * at 1000× the data are plan shapes, not constants — guard them.
  * (SURVEY.md §4; the "would this survive a 100× scale-up" checklist.) */
class PlanSpec extends SparkSuite {

  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def planString(df: DataFrame): String = executed(df).toString

  /** Every shuffle exchange in an executed plan, descending into AQE
    * query stages (whose wrapped plan is not a `children` member — a
    * plain collect sees none of them). */
  private def allShuffles(p: SparkPlan)
  : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
    p.collect {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allShuffles(s.plan)
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        Seq(e)
    }.flatten.distinct

  test("qa2 star join broadcasts both dimensions (lineitem never shuffled pre-agg)") {
    val p = planString(QueriesExt.qa2Revenue(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("q7 merge anti-join broadcasts the stage key set (target side streams)") {
    val p = planString(Queries.q7Merge(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2000))
  }

  test("LWW dedup plans as WindowGroupLimit (rank filter pushed below shuffle)") {
    val p = planString(Queries.q5LwwDedup(spark, sf("sf0.001")))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("qa1 projection prunes lineitem scan to the aggregated columns") {
    val p = executed(QueriesExt.qa1Pricing(spark, sf("sf0.001")))
    val scan = p.collectLeaves().map(_.toString).find(_.contains("lineitem")).get
    assert(scan.contains("l_returnflag") && !scan.contains("l_shipdate"),
      "scan reads columns the query never uses:\n" + scan.take(1000))
  }

  test("filter pushdown reaches the parquet scan") {
    import org.apache.spark.sql.functions.col
    val df = Tables.lineitem(spark, sf("sf0.001"))
      .filter(col("l_orderkey") === 1L).select(col("l_quantity"))
    val scan = executed(df).collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.contains("IsNotNull(l_orderkey)"),
      scan.take(1000))
  }

  test("partial aggregation before the shuffle (map-side combine) for qa1") {
    val p = planString(QueriesExt.qa1Pricing(spark, sf("sf0.001")))
    // Two HashAggregate levels around one Exchange = partial + final.
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
  }

  test("ANN top-k plans as WindowGroupLimit (per-partition k before shuffle)") {
    val p = planString(QueriesExt.q17AnnCosine(spark, sf("sf0.001")))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("CDC spine's routing filter and parse execute inside codegen stages") {
    // q24 is the barrier-free path: the routing Filter and the payload
    // Project must carry a *(n) codegen prefix — an interpreter barrier on
    // the spine (the janino-blowup regression) would strip it.
    val p = planString(Queries.q24SpineScaled(spark, sf("sf0.001")))
    assert("""\*\(\d+\) Filter""".r.findFirstIn(p).isDefined, p.take(3000))
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("q31 profile: pruning pushes through the repartition — one column per branch scan") {
    // Opt into the harness spread (as Bench/Verify do) so the tested plan
    // actually contains the repartition the assertion is about.
    spark.conf.set("spark.graft.spreadSmallScans", "true")
    val df =
      try QueriesExt.q31Profile(spark, sf("sf0.001"))
      finally spark.conf.unset("spark.graft.spreadSmallScans")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"),
      "expected the spread repartition in the tested plan")
    // AQE wraps subtrees in query stages; read the scans off the full tree.
    val p = df.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(schemas.size >= 4, s"expected one pruned scan per branch:\n${p.take(1500)}")
    schemas.foreach { s =>
      assert(s.count(_ == ':') == 1, s"branch scan reads more than one column: $s")
    }
  }

  test("q33 LSH ANN broadcasts the probe-expanded query side") {
    val p = planString(QueriesExt.q33LshAnn(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "bucket join degraded to cartesian")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // The 100 TB idiom: a selective dimension filter injects a bloom
    // filter into the fact scan, so most probe rows die before the join
    // shuffle. Pinned here with the conf the cluster profile would set;
    // broadcast is disabled to force the shuffle-join path the filter
    // targets (tiny local tables would otherwise broadcast).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.orders(spark, sf("sf0.001"))
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, sf("sf0.001"))
      val p = planString(li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderpriority")).count())
      // the probe-side Filter prints as might_contain(<bloom subquery>, …)
      assert(p.contains("might_contain"), p.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pre-bucketed tables join with zero exchanges (co-located join)") {
    // The other 100 TB join idiom: two fact tables bucketed the same way
    // on the join key join WITHOUT any shuffle — output layout is read
    // layout. This is what a nightly "bucketize once, join often"
    // pipeline relies on; pin that Spark honors it.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
      .write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/ta").saveAsTable("graft_ta")
    (1L to 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
      .write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/tb").saveAsTable("graft_tb")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planString(spark.table("graft_ta").join(spark.table("graft_tb"), "k"))
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert(!p.contains("Exchange"), "bucketed join still shuffles:\n" + p.take(2000))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_ta")
      spark.sql("DROP TABLE IF EXISTS graft_tb")
    }
  }

  test("q41 IVF ANN: broadcast cell join, top-k limited before the shuffle, no cartesian") {
    val p = planString(QueriesExt.q41IvfAnn(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "cell join degraded to cartesian")
  }

  test("q32 near-dup pairing is a bucket equi-join, never all-pairs") {
    val p = planString(QueriesExt.q32CosineNearDup(spark, sf("sf0.001")))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "SRP bucket join degraded to an all-pairs physical join:\n" + p.take(2000))
  }

  test("simhash signatures partially aggregate (docs, not tokens, shuffle)") {
    val p = planString(graft.functions.TextFunctions.simhashSignatures(
      Tables.documents(spark, sf("sf0.001")).limit(50), "text", "doc_id"))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
  }

  test("bucketed merge target: the touched-bucket read is partition-pruned at the scan") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-prune").toString + "/t"
    (1L to 64L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn("kb_aws", pmod(xxhash64(col("id")), lit(8L)).cast("int"))
      .write.partitionBy("kb_aws").parquet(root)
    // The exact read the bucketed merge issues for a 2-bucket batch:
    // explicit touched-bucket dirs under basePath — listing, footer reads,
    // and the scan itself are all O(touched buckets), and kb_aws survives
    // as a partition column.
    val pruned = spark.read.option("basePath", root)
      .parquet(s"$root/kb_aws=0", s"$root/kb_aws=3")
    assert(pruned.columns.contains("kb_aws"))
    val parts = executed(pruned).collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(parts.nonEmpty && parts.head == 2, s"expected 2 selected partitions, got $parts")
  }

  test("q43 boilerplate removal anti-joins a BROADCAST dictionary (corpus never reshuffled)") {
    val p = planString(QueriesExt.q43Boilerplate(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "boilerplate dictionary join degraded from broadcast anti:\n" + p.take(2000))
  }

  test("q44 heavy hitters plans as TakeOrderedAndProject (no full sort)") {
    val p = planString(QueriesExt.q44HeavyHitters(spark, sf("sf0.001")))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q42 BM25 top-k is a WindowGroupLimit; corpus scalars broadcast") {
    val p = planString(QueriesExt.q42Bm25(spark, sf("sf0.001")))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the one-row scalar frame should broadcast:\n" + p.take(2000))
  }

  test("q47 domain cap plans as WindowGroupLimit (k rows per group pre-shuffle)") {
    val p = planString(QueriesExt.q47DomainCap(spark, sf("sf0.001")))
    assert(p.contains("WindowGroupLimit"),
      "per-group cap degraded to a full window sort:\n" + p.take(2000))
  }

  test("q45 stratified sample filter pushes to a narrow scan (no shuffle at all)") {
    val p = planString(QueriesExt.q45StratifiedSample(spark, sf("sf0.001")))
    assert(!p.contains("Exchange"), "deterministic sampling must not shuffle:\n" + p.take(2000))
  }

  test("q50 quality rules: one narrow map, no shuffle, two-column scan") {
    val p = planString(QueriesExt.q50QualityRules(spark, sf("sf0.001")))
    assert(!p.contains("Exchange"), "per-row rules must not shuffle:\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "rule filter must prune the scan to (doc_id, text):\n" + p.take(2000))
  }

  test("q67 entropy gate: one narrow map, no shuffle, CSE'd char_stats, two-column scan") {
    val p = planString(QueriesExt.q67EntropyQuality(spark, sf("sf0.001")))
    assert(!p.contains("Exchange"), "per-row char stats must not shuffle:\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "entropy gate must prune the scan to (doc_id, text):\n" + p.take(2000))
    assert("char_stats".r.findAllIn(p).length == 1,
      "the kernel must evaluate once per row, not once per projection:\n" + p.take(2000))
  }

  test("q51 zorder: no sort/window — the only exchange carries partial file aggregates") {
    val p = planString(QueriesExt.q51Zorder(spark, sf("sf0.001")))
    assert(!p.contains("Sort") && !p.contains("Window"),
      "Z-order assignment must be pure arithmetic, not a sort:\n" + p.take(2000))
    assert(p.contains("partial_"), "file stats must aggregate map-side first:\n" + p.take(2000))
    assert("Exchange".r.findAllIn(p).length == 1,
      "exactly one exchange (the partial-agg shuffle) expected:\n" + p.take(2000))
  }

  test("q53 contamination: the eval shingle set broadcasts (corpus never reshuffled by it)") {
    val p = planString(QueriesExt.q53ContaminationScore(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "eval-set membership must be a broadcast semi join:\n" + p.take(2000))
  }

  test("q52 semantic dedup pairs: banded candidates stay an equi-join, never all-pairs") {
    // pin the pair generator (the CC loop runs eagerly off-plan, like q39)
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val p = planString(graft.functions.Similarity.cosineNearDupPairs(
      e, threshold = 0.9, planes = Similarity.deterministicPlanes(8, 64)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "banded near-dup must join on (band, bucket):\n" + p.take(2000))
  }

  test("q54 span dedup: both window mins stack over ONE block exchange, no join-back") {
    val p = planString(QueriesExt.q54SpanDedup(spark, sf("sf0.001")))
    assert(!p.contains("Join"), "first-occurrence marking must stay co-partitioned:\n" + p.take(2000))
    // exchanges: one on block content (shared by both windows), one for
    // the per-doc reassembly aggregate — nothing else
    assert("Exchange".r.findAllIn(p).length == 2,
      "expected exactly 2 exchanges (block windows + reassembly):\n" + p.take(2000))
    assert("(?s)Window.*Window".r.findFirstIn(p).isDefined &&
      "(?s)Sort.*Sort".r.findFirstIn(p).isEmpty,
      "the stacked windows must share one sort:\n" + p.take(2000))
  }

  test("q55 temperature mixture: rate table broadcasts; corpus never shuffled") {
    val p = planString(QueriesExt.q55TemperatureMixture(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"),
      "per-source rates must broadcast into the corpus scan:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus must not shuffle for the rate join:\n" + p.take(2000))
  }

  test("q57 unigram scoring: model broadcasts as one row; docs score in the scan") {
    val p = planString(QueriesExt.q57UnigramLogprob(spark, sf("sf0.001")))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the one-row vocab model must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "corpus must not shuffle to meet the model:\n" + p.take(2000))
  }

  test("q58 DSIR: bucket model broadcasts as one map row; corpus never shuffled") {
    val p = planString(QueriesExt.q58Dsir(spark, sf("sf0.001")))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the bucket-ratio model must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "scoring must not shuffle the corpus:\n" + p.take(2000))
  }

  test("q68 SQ8: corpus streams as codes; min/max model is a partial aggregate; top-k group-limits") {
    val p = planString(QueriesExt.q68SqAnn(spark, sf("sf0.001")))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "queries must broadcast against the encoded corpus:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "the corpus must never shuffle for scoring:\n" + p.take(2000))
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k must limit before the exchange:\n" + p.take(2000))
  }

  test("q71 inverted index: posting page caps via WindowGroupLimit before any list builds") {
    val p = planString(QueriesExt.q71InvertedIndex(spark, sf("sf0.001")))
    assert(p.contains("WindowGroupLimit"),
      "the posting cap must group-limit before the sort:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "df/page join must stay an equi-join:\n" + p.take(2000))
  }

  test("q70 k-means assignment: trained centroids are plan literals — pure narrow map, no join") {
    val p = planString(QueriesExt.q70Kmeans(spark, sf("sf0.001")))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "assignment under a trained model must be a literal-centroid projection:\n" + p.take(2000))
  }

  test("q69 kNN eval: probe sample broadcasts; neighbor search group-limits; no cartesian") {
    val p = planString(QueriesExt.q69KnnEval(spark, sf("sf0.001")))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the probe sample must broadcast against the corpus scan:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "scoring must never be a cartesian shuffle:\n" + p.take(2000))
    assert(p.contains("WindowGroupLimit"),
      "per-probe top-k must limit before the exchange:\n" + p.take(2000))
  }

  test("q59 PQ-ADC: the candidate join carries codes, never the corpus vectors") {
    val p = executed(QueriesExt.q59PqAnn(spark, sf("sf0.001")))
    // The BNLJ streams the encoded corpus against broadcast query LUTs —
    // its streamed side must project codes only: the raw embedding
    // column must not cross the join (that 64x blowup is the whole
    // point of PQ compression).
    val joins = p.toString.linesIterator
      .dropWhile(l => !l.contains("BroadcastNestedLoopJoin")).toList
    assert(joins.nonEmpty, "expected a broadcast candidate join:\n" + p.toString.take(2000))
    // The join's combined output is streamed ++ broadcast columns: codes
    // and LUTs only — the raw embedding must be pruned out before the join
    // on BOTH sides. (collect() does not descend into AQE query stages,
    // so walk them explicitly.)
    def allNodes(n: SparkPlan): Seq[SparkPlan] = n +: (n match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case _ => n.children.flatMap(allNodes)
    })
    val joinCols = allNodes(p).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        j.output.map(_.name)
    }.flatten
    assert(joinCols.contains("codes") && !joinCols.contains("embedding"),
      s"candidate join must carry codes, not vectors: $joinCols")
    assert(p.toString.contains("WindowGroupLimit"),
      "per-query top-k must rank-limit before the final sort:\n" + p.toString.take(2000))
  }

  test("q60 bigram LM: count tables meet the pair stream by equi-join, partial-agg'd") {
    val p = planString(QueriesExt.q60BigramLm(spark, sf("sf0.001")))
    // vocabulary-bounded count tables: two HashAggregate levels around
    // each exchange (map-side combine), and the scoring joins stay
    // equi-joins (broadcast or shuffled-hash/SMJ on the key — NEVER a
    // nested-loop over the corpus).
    assert("HashAggregate".r.findAllIn(p).length >= 4, p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "bigram scoring must join on keys:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q65 IVF-PQ: candidates come from a cell equi-join (no cross join), codes-only stream") {
    val p = planString(QueriesExt.q65IvfPq(spark, sf("sf0.001")))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "IVF-PQ must never scan the whole corpus per query — the cell id is an equi-key:\n" +
        p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "probe-expanded queries must broadcast to the encoded corpus:\n" + p.take(2000))
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k must rank-limit before the final sort:\n" + p.take(2000))
  }

  test("q66 bloom build is a fixed-size aggregate that broadcasts; corpus shingles never shuffle to probe") {
    val p = planString(QueriesExt.q66BloomContamination(spark, sf("sf0.001")))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "bloom build must partial-aggregate:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "the <=16-row filter must broadcast into the probe scan:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") || p.indexOf("SortMergeJoin") >
      p.indexOf("BroadcastHashJoin"),
      "probing must not shuffle the corpus to meet the filter:\n" + p.take(2000))
  }

  test("q61 count-min: counter table is a fixed-size partial aggregate, probes broadcast back") {
    val p = planString(QueriesExt.q61CountMin(spark, sf("sf0.001")))
    // rows x width counters: partial + final HashAggregate around the
    // one exchange; the 20-row probe side must broadcast against it.
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "the top-k probe rows must broadcast to the counter table:\n" + p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "exact top-k must not full-sort the vocabulary:\n" + p.take(2000))
  }

  test("q73 SCD2 build: both window passes stack over ONE key exchange, no join") {
    val p = planString(QueriesExt.q73Scd2(spark, sf("sf0.001")))
    assert(!p.contains("Join"),
      "the changelog must fold into versions co-partitioned, never via self-join:\n" + p.take(2000))
    assert("Exchange".r.findAllIn(p).length == 1,
      "lag (change-detect) and lead (interval close) must share one (keys) shuffle:\n" + p.take(2000))
    assert("Window".r.findAllIn(p).length >= 2, p.take(2000))
  }

  test("q74 PageRank iteration: rank mass moves via equi-join + partial agg, never a product") {
    import spark.implicits._
    val edges = (0L until 400L).map(i => (i % 40, (i * 13 + 7) % 40)).toDF("src", "dst")
    val p = planString(graft.operators.PageRank.ranks(edges, iterations = 1))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "an iteration is edge⋈rank⋈degree on node id — all equi-joins:\n" + p.take(2000))
    assert(p.contains("partial_sum") || p.contains("partial_"),
      "contribution sums must combine map-side before the exchange:\n" + p.take(2000))
  }

  test("q77 HTML extraction is a pure narrow map (no exchange, no UDF)") {
    val p = planString(QueriesExt.q77HtmlExtract(spark, sf("sf0.001")))
    assert(!p.contains("Exchange"),
      "tag strip / entity decode / href extract must not shuffle:\n" + p.take(2000))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "extraction must stay codegen'd column algebra:\n" + p.take(2000))
  }

  test("q78 URL stats: canonicalize in the scan, partial-agg'd count shuffles, no join") {
    val p = planString(QueriesExt.q78UrlStats(spark, sf("sf0.001")))
    assert(!p.contains("Join"), p.take(2000))
    // count(distinct canon) rewrites to the two-level (domain, canon) →
    // domain aggregate; both levels must combine map-side before their
    // exchange (partial_ under the scan stage).
    assert(p.contains("partial_count"),
      "per-domain counts must combine map-side:\n" + p.take(2000))
    assert(p.indexOf("partial_") < p.lastIndexOf("Exchange"),
      "a partial aggregate must sit below an exchange:\n" + p.take(2000))
  }

  test("q79 PR curve: histogram-first — corpus partial-aggregates to bins, never sorts") {
    val p = planString(QueriesExt.q79PrCurve(spark, sf("sf0.001")))
    assert(p.contains("partial_"),
      "score bins must combine map-side:\n" + p.take(2000))
    // the threshold sweep's sort touches only the ≤21-row bin table —
    // the corpus-side scan stage must contain no Sort
    val scanStage = p.substring(p.lastIndexOf("Exchange"))
    assert(!scanStage.contains("Sort"),
      "the corpus must not sort for a threshold sweep:\n" + p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the one-row positive total must broadcast back:\n" + p.take(2000))
  }

  test("q82 SemDeDup: cell assignment in the scan, pair join on cell, no product") {
    val p = planString(QueriesExt2.q82SemDedup(spark, sf("sf0.001")))
    assert(!p.contains("CartesianProduct"),
      "within-cell pairs must equi-join on the cell id:\n" + p.take(2000))
    assert(p.contains("pq_encode"),
      "cell assignment must be the literal-centroid kernel in the scan:\n" + p.take(2000))
  }

  test("q83 JL ANN: reduced-space shortlist group-limits; raw rejoin broadcasts the candidates") {
    val p = planString(QueriesExt2.q83JlAnn(spark, sf("sf0.001")))
    assert(p.contains("WindowGroupLimit"),
      "the shortlist rank filter must push below the shuffle:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "the Q×30 shortlist must broadcast against the raw-vector scan:\n" + p.take(2000))
  }

  test("q86 substring spans: no join; text never enters a shuffle") {
    val q = QueriesExt2.q86SubstringSpans(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("Join"),
      "first-occurrence marking and span merge must stay join-free:\n" + p.take(2000))
    val exchanges = allShuffles(executed(q))
    assert(exchanges.nonEmpty, "expected the hash/doc window exchanges")
    assert(exchanges.forall(!_.child.output.map(_.name).contains("text")),
      "raw document text leaked into a shuffle")
  }

  test("q95 PSI: only (bin, count) rows ever shuffle; boundary row broadcasts") {
    val q = QueriesExt2.q95PsiDrift(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("CartesianProduct"),
      "the one-row boundary frame must broadcast, not product:\n" + p.take(2000))
    val exchanges = allShuffles(executed(q))
    assert(exchanges.nonEmpty, "expected the per-side bin-count exchanges")
    assert(exchanges.forall(!_.child.output.map(_.name).contains("n_chars")),
      "raw per-document values leaked into a shuffle — counts must partial-agg map-side")
  }

  test("q96 hard negatives: queries broadcast, per-query top-k group-limits") {
    val p = planString(QueriesExt2.q96HardNegatives(spark, sf("sf0.001")))
    assert(p.contains("WindowGroupLimit"),
      "the rank<=k filter must push below the exchange:\n" + p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the labeled query side must broadcast against the corpus scan:\n" + p.take(2000))
  }

  test("q99 TF-IDF cosine: pairs meet through the term equi-join, never a product") {
    val q = QueriesExt2.q99TfidfCosine(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("CartesianProduct"),
      "pair candidates must come from the shared-term equi-join:\n" + p.take(2000))
    val exchanges = allShuffles(executed(q))
    assert(exchanges.forall(!_.child.output.map(_.name).contains("text")),
      "raw document text leaked into a shuffle — weights must project in the scan")
  }

  test("q107 funnel: three step windows + per-user agg share ONE user exchange and one sort") {
    val q = QueriesExt2.q107Funnel(spark, sf("sf0.001"))
    val p = planString(q)
    assert("Window".r.findAllIn(p).length >= 3, p.take(2000))
    assert("(?s)Sort.*Sort".r.findFirstIn(p).isEmpty,
      "the stacked step windows must share one partition sort:\n" + p.take(2000))
    // one (user_id) hash exchange feeding windows AND the per-user agg
    // (same partitioning, no re-shuffle), plus the final single-partition
    // rollup — nothing else
    assert(allShuffles(executed(q)).length <= 2,
      "funnel must cost one user shuffle + the tiny final rollup:\n" + p.take(2000))
  }

  test("q108 retention: map-side distinct before any exchange, no join anywhere") {
    val q = QueriesExt2.q108Retention(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("Join"),
      "cohort assignment must stack on the activity grain, never join back:\n" + p.take(2000))
    // the (user, week) distinct partial-aggregates map-side, so the first
    // exchange carries the activity grain, not raw events
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
    val exchanges = allShuffles(executed(q))
    assert(exchanges.nonEmpty && exchanges.length <= 4,
      s"expected the grain/window/cell exchanges only, got ${exchanges.length}")
    assert(exchanges.forall(!_.child.output.map(_.name).contains("event_type")),
      "raw event rows leaked into a shuffle — distinct must reduce first")
  }

  test("q105/q106 media decode: pure narrow maps — no exchange, blobs never shuffle") {
    for (q <- Seq(QueriesExt2.q105ImageDecode(spark, sf("sf0.001")),
                  QueriesExt2.q106AudioDecode(spark, sf("sf0.001")))) {
      val p = planString(q)
      assert(!p.contains("Exchange"),
        "codec evaluation must stay a per-row map in the scan stage:\n" + p.take(2000))
    }
  }

  test("q93 source overlap: fingerprints aggregate BEFORE the self-join; text never shuffles") {
    val q = QueriesExt2.q93SourceOverlap(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "the overlap pairing must equi-join on the fingerprint:\n" + p.take(2000))
    // The (h, source) distinct is an aggregate that runs below the join —
    // each source contributes at most one row per fingerprint, so the join
    // input is dedup-bounded, not corpus-sized. Plans print top-down, so
    // "below the join" = a dedup HashAggregate appearing AFTER the join line.
    val joinAt = p.indexOf("Join")
    assert(joinAt >= 0 && p.indexOf("HashAggregate(keys=[h", joinAt) > joinAt,
      "the per-source fingerprint dedup must aggregate before (i.e. plan-below) the join:\n" +
        p.take(2000))
    val exchanges = allShuffles(executed(q))
    assert(exchanges.nonEmpty, "expected the fingerprint-dedup exchanges")
    assert(exchanges.forall(!_.child.output.map(_.name).contains("text")),
      "raw document text leaked into a shuffle — fingerprint must project in the scan")
  }

  test("q102 LSH recall: planted-pair eval keeps the banded equi-join shape, never all-pairs") {
    val p = planString(QueriesExt2.q102LshRecall(spark, sf("sf0.001")))
    assert(!p.contains("CartesianProduct"),
      "candidate pairs must come from the (band, bucket) equi-join:\n" + p.take(2000))
    // signatures are partial aggregates: docs shuffle, shingles don't
    assert("partial_".r.findAllIn(p).nonEmpty,
      "minhash signatures must combine map-side:\n" + p.take(2000))
  }

  test("q103 grouped PSI: per-source quartiles broadcast; only (source, bin) counts shuffle") {
    val q = QueriesExt2.q103PsiBySource(spark, sf("sf0.001"))
    val p = planString(q)
    assert(p.contains("BroadcastHashJoin"),
      "the per-source boundary table must broadcast into both snapshot scans:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val exchanges = allShuffles(executed(q))
    assert(exchanges.nonEmpty, "expected the bin-count exchanges")
    assert(exchanges.forall(!_.child.output.map(_.name).contains("n_chars")),
      "raw per-document values leaked into a shuffle — counts must partial-agg map-side")
  }

  test("q75 fuzzy match: candidates come from the gram equi-join, never all-pairs") {
    val p = planString(QueriesExt.q75FuzzyMatch(spark, sf("sf0.001")))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "q-gram filtering must never degrade to an all-pairs product:\n" + p.take(2000))
    // The unbounded document text must not ride through the join — only
    // the bounded 40-char normalized prefix appears in exchanges.
    val exchanges = allShuffles(executed(QueriesExt.q75FuzzyMatch(spark, sf("sf0.001"))))
    assert(exchanges.nonEmpty, "expected the gram-join exchanges")
    assert(exchanges.forall(!_.child.output.map(_.name).contains("text")),
      "raw document text leaked into a shuffle")
  }

  test("q109 KMV sketch: rank filter plans as WindowGroupLimit; " +
    "the sketch join broadcasts") {
    val q = QueriesExt3.q109KmvDistinct(spark, sf("sf0.001"))
    val p = planString(q)
    // every map task trims to its local k smallest before the exchange —
    // the property that makes the sketch O(partitions × k), not O(distinct)
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      "the per-type sketch/exact join must broadcast:\n" + p.take(2000))
  }

  test("q111 expectations: the whole suite is ONE aggregation — " +
    "no join, no union, one scan") {
    val q = QueriesExt3.q111Expectations(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("Join") && !p.contains("Union"),
      "rules must compile into a single aggregate:\n" + p.take(2000))
    val scans = executed(q).collectLeaves().map(_.toString)
      .count(_.contains("orders"))
    assert(scans === 1, s"expected one orders scan, got $scans")
  }

  test("q116 weighted sample: WindowGroupLimit bounds every group " +
    "before the exchange; no join anywhere") {
    val q = QueriesExt3.q116WeightedSample(spark, sf("sf0.001"))
    val p = planString(q)
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("Join"), "sampling must be a narrow map + window:\n" +
      p.take(2000))
  }

  test("q117 rolling distinct: sketch-range join never degrades to a " +
    "cartesian product; the sketch cut plans as WindowGroupLimit") {
    val q = QueriesExt3.q117RollingDistinct(spark, sf("sf0.001"))
    val p = planString(q)
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "day-range joins must broadcast the day dimension:\n" + p.take(2000))
  }

  test("q119 image near-dup: blobs never shuffle; twins meet in a hash " +
    "equi-join, not a nested loop") {
    val q = QueriesExt3.q119ImageNearDup(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "pair generation must be an equi-join on the hash:\n" + p.take(2000))
    val exchanges = allShuffles(executed(q))
    assert(exchanges.forall(!_.child.output.map(_.name).exists(
        n => n.contains("png") || n.contains("payload"))),
      "image bytes leaked into a shuffle")
  }

  test("q124 triangles: no wedge-materializing self-join — the closing " +
    "intersection is a narrow map over checkpointed edges") {
    val q = QueriesExt4.q124Triangles(spark, sf("sf0.001"))
    val p = planString(q)
    assert(p.contains("array_intersect"),
      "forward algorithm must intersect out-lists:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // The oriented edge list is a checkpointed RDD scan, not a re-derived
    // lineitem self-join, on the triangle side of the plan.
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "edge list must come from the localCheckpoint:\n" + p.take(2000))
  }

  test("q125 histogram percentiles: windows run over the bin frame — " +
    "no window over the events grain") {
    val q = QueriesExt4.q125HistPercentiles(spark, sf("sf0.001"))
    val p = planString(q)
    // Exactly ONE window ranks the events grain — the published exact
    // eval tier (row_number by vm). Every sketch-side window keys on the
    // bin column after the additive partial aggregate.
    assert(p.split("row_number").length - 1 === 1,
      "only the exact tier may rank the data:\n" + p.take(2000))
    assert(p.contains("partial_min(b") || p.contains("partial_min"),
      "bin minima must partially aggregate:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q130 neighborhood LSH: candidates meet in a band equi-join, " +
    "never an all-pairs product; signatures partial-aggregate") {
    val q = QueriesExt4.q130NeighborLsh(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "band join must be an equi-join:\n" + p.take(2000))
    assert(p.contains("partial_min") || p.contains("min("),
      "signature mins must partially aggregate:\n" + p.take(2000))
  }

  test("q131 trigram search: document text never enters the posting " +
    "shuffle; candidates meet in an equi-join") {
    val q = QueriesExt4.q131TrigramSearch(spark, sf("sf0.001"))
    val exchanges = allShuffles(executed(q))
    assert(exchanges.forall(!_.child.output.map(_.name).contains("text")),
      "raw text leaked into a shuffle")
    val p = planString(q)
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q141 association rules: minSupport prunes the pair frame before " +
    "the item-support joins") {
    val q = QueriesExt4.q141AssociationRules(spark, sf("sf0.001"))
    val p = planString(q)
    // The >= 3 filter must sit on the aggregated pair count (a Filter
    // over count), not after the joins.
    assert(p.contains("supp_ab"), p.take(1000))
    assert(!p.contains("CartesianProduct") ||
      p.contains("BroadcastNestedLoopJoin"),
      "only the 1-row basket-total broadcast may be non-equi:\n" +
        p.take(2000))
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // The OTHER skew tool next to Skew.saltedLatestPerKey: when a join
    // key is hot, AQE's OptimizeSkewedJoin splits the oversized shuffle
    // partition into parallel sub-reads instead of one straggler task.
    // Thresholds are lowered to make the tiny local skew visible; the
    // production conf differs only in magnitudes.
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, concat, when}
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 80% of the left rows share key 0 → one shuffle partition dwarfs
      // the rest.
      val left = spark.range(0, 50000).select(
        when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("v"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        lit("dim").as("d"))
      val j = left.join(right, "k")
      j.collect()
      val p = (j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }).toString
      assert(p.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + p.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("day-partitioned layout: a day predicate prunes whole partitions " +
    "at plan time, and data-column pushdown composes inside them") {
    import graft.functions.Layout
    val dir = java.nio.file.Files.createTempDirectory("daypart").toString
    val ev = Tables.events(spark, sf("sf0.001"))
    Layout.writeDayPartitioned(ev.select("event_id", "ts_ms", "value"),
      col("ts_ms"), dir)
    val days = spark.read.parquet(dir)
      .select(col("day").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(days.length > 5, s"expected multiple day partitions, got ${days.length}")
    val one = days(days.length / 2)
    val q = Layout.readDayRange(spark, dir, one, one)
      .filter(col("value") > 0.5d)
    val scan = executed(q).collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // plan-time pruning: ONE directory selected out of all days
    assert(scan.selectedPartitions.partitionCount === 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")
    // row-group pushdown on the data column still applies inside it
    assert(scan.toString.contains("PushedFilters") &&
      scan.toString.contains("value"), scan.toString.take(1000))
    // and the result is right
    val expected = ev.filter(org.apache.spark.sql.functions.expr("ts_ms div 86400000") === one &&
      col("value") > 0.5d).count()
    assert(q.count() === expected)
  }

  /** Every WindowExec/WindowGroupLimitExec with an EMPTY partition
    * spec in an executed plan — the "Moving all data to a single
    * partition" shape that breaks at 100×. One shared AQE-aware
    * traversal ([[WindowAudit.unpartitionedWindows]]) serves this
    * spec, PrefixScanSpec, and the audit main. */
  private def unpartitionedWindows(df: DataFrame): Seq[String] =
    WindowAudit.unpartitionedWindows(df)

  test("the five global-scan statistics queries never plan a " +
    "single-partition window (q121/q154/q167/q178/q194)") {
    // VERDICT r8's one scale defect: these ran unpartitioned global
    // windows. Now they run PrefixScan's two-pass partition-prefix
    // form; this pin keeps the single-task shape from returning.
    val d = sf("sf0.001")
    val offenders = Seq(
      "q121" -> QueriesExt3.q121Spearman(spark, d),
      "q154" -> QueriesExt4.q154LatenessAudit(spark, d),
      "q167" -> QueriesExt4.q167KsTest(spark, d),
      "q168" -> QueriesExt4.q168SpendGini(spark, d),
      "q178" -> QueriesExt4.q178ParetoShares(spark, d),
      "q194" -> QueriesExt4.q194AbcAnalysis(spark, d))
    offenders.foreach { case (name, q) =>
      val bad = unpartitionedWindows(q)
      assert(bad.isEmpty, s"$name plans a single-partition window:\n" +
        bad.mkString("\n").take(2000))
    }
  }

  test("bounded-frame windows (q79 sweep, q183 day series) carry an " +
    "explicit constant partition, not an empty spec") {
    val d = sf("sf0.001")
    Seq("q79" -> QueriesExt.q79PrCurve(spark, d),
        "q183" -> QueriesExt4.q183GmvTrend(spark, d))
      .foreach { case (name, q) =>
        val bad = unpartitionedWindows(q)
        assert(bad.isEmpty, s"$name:\n" + bad.mkString("\n").take(2000))
      }
  }

  test("q205 session overlap: the interval join is a bucket hash join, " +
    "never a nested-loop product; q204 sweep-line has no global window") {
    val d = sf("sf0.001")
    val p205 = planString(QueriesExt5.q205SessionOverlap(spark, d))
    assert(!p205.contains("BroadcastNestedLoopJoin") &&
      !p205.contains("CartesianProduct"), p205.take(2000))
    assert(unpartitionedWindows(QueriesExt5.q204PeakConcurrency(spark, d))
      .isEmpty)
  }

  test("q207 incremental agg: the state merge is a union + hash " +
    "aggregate, never a join; q210's delta terms all broadcast") {
    val d = sf("sf0.001")
    val p207 = planString(QueriesExt6.q207IncrementalAgg(spark, d))
    assert(!p207.contains("Join"),
      "applyDeltas must merge by re-aggregation, not a join:\n" +
        p207.take(2000))
    val p210 = planString(QueriesExt6.q210IncrementalJoinView(spark, d))
    assert(p210.contains("BroadcastHashJoin"), p210.take(2000))
    assert(!p210.contains("SortMergeJoin") &&
      !p210.contains("ShuffledHashJoin"),
      "a delta term re-joined the bases with a shuffle join:\n" +
        p210.take(2000))
  }

  test("q213 surgical backfill: touched days reach the recompute as a " +
    "broadcast semi-join and stored days as a broadcast anti-join") {
    val p = planString(QueriesExt6.q213SurgicalBackfill(spark, sf("sf0.001")))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "a backfill join degraded to a shuffle join:\n" + p.take(2000))
  }

  test("q113 transitions: one user exchange feeds the lag; the " +
    "probability window runs over the matrix, never events") {
    val q = QueriesExt3.q113Transitions(spark, sf("sf0.001"))
    val p = planString(q)
    assert(!p.contains("Join"),
      "adjacent pairs must come from lag, not a self-join:\n" + p.take(2000))
    val exchanges = allShuffles(executed(q))
    // user-key window exchange + (prev,next) agg + tiny matrix window
    assert(exchanges.length <= 3, s"expected ≤3 exchanges, got ${exchanges.length}")
    assert(exchanges.exists(_.child.output.map(_.name).contains("user_id")),
      "expected the user-key exchange for the lag window")
  }
}
