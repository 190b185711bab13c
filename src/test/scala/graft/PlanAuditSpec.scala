package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, count, lit, when}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the scale properties the queries claim
  * (pushdown, pruning, broadcast, top-k, partial aggregation, codegen)
  * must be visible in the executed plan, not just intended. A regression
  * that silently drops a pushed filter or turns a broadcast join into a
  * shuffle join fails here even though results stay correct.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Formatted explain of the FINAL (AQE-resolved) plan. */
  private def formatted(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** Distinct node ids for operator `op` in the FINAL plan tree only.
    * AQE explain prints the final tree ("Op (id)" lines), then the
    * pre-adaptive tree under "== Initial Plan ==", then per-node details
    * ("(id) Op" lines) — only the final tree reflects what executed. */
  private def nodeCount(plan: String, op: String): Int = {
    val tree = plan.split(raw"== Initial Plan ==").head
    raw"$op[^(\n]*\((\d+)\)".r.findAllMatchIn(tree).map(_.group(1)).toSet.size
  }

  test("q2_topn: filter pushed to parquet scan, TakeOrderedAndProject, pruned read schema") {
    val s = formatted(SparkEntry.queries("q2_topn")(spark, sfDir))
    assert(s.contains("GreaterThanOrEqual(l_quantity,48.0)"), "filter not pushed to scan")
    assert(s.contains("TakeOrderedAndProject"), "order+limit should compile to a per-partition top-k heap")
    assert(s.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>"),
      "scan reads more columns than the projection needs")
  }

  test("q6_scalar_agg: all three predicates push to the scan") {
    val s = formatted(SparkEntry.queries("q6_scalar_agg")(spark, sfDir))
    assert(s.contains("GreaterThan(l_discount,0.02)"), s.linesIterator.filter(_.contains("PushedFilters")).mkString)
    assert(s.contains("In(l_returnflag, [A,R])"))
    assert(s.contains("GreaterThanOrEqual(l_shipdate,"))
    assert(s.contains("ReadSchema: struct<l_extendedprice:double,l_discount:double,l_returnflag:string,l_shipdate:timestamp"),
      "scan should read only the 4 referenced columns")
  }

  test("q3_join_agg: nation and region join as broadcast hash joins") {
    val s = formatted(SparkEntry.queries("q3_join_agg")(spark, sfDir))
    assert(nodeCount(s, "BroadcastHashJoin") >= 2,
      s"expected >=2 broadcast joins:\n${s.linesIterator.filter(_.contains("Join")).mkString("\n")}")
  }

  test("q1_agg: partial aggregation before the shuffle, inside whole-stage codegen") {
    val s = formatted(SparkEntry.queries("q1_agg")(spark, sfDir))
    assert(s.contains("partial_sum"), "no map-side partial aggregation")
    assert(nodeCount(s, "HashAggregate") >= 2, "expected partial+final hash aggregates")
    assert(s.contains("codegen id"), "hot path fell out of whole-stage codegen")
  }

  test("semi/anti joins keep only probe-side columns (no wide shuffle)") {
    val s4 = formatted(SparkEntry.queries("q4_semi_join")(spark, sfDir))
    assert(s4.contains("LeftSemi"))
    assert(s4.contains("ReadSchema: struct<o_custkey:bigint,o_orderstatus:string>"),
      "orders side should read only join key + filter column")
    val s5 = formatted(SparkEntry.queries("q5_anti_join")(spark, sfDir))
    assert(s5.contains("LeftAnti"))
  }

  test("e1 window aggregate: one wide shuffle plus the final sort exchange") {
    val s = formatted(SparkEntry.queries("e1_window_hourly")(spark, sfDir))
    assert(nodeCount(s, "Exchange") <= 2,
      s"expected <=2 exchanges:\n${s.linesIterator.filter(_.contains("Exchange")).mkString("\n")}")
  }

  test("v1 knn: query batch broadcasts against the corpus (no shuffle pair)") {
    val s = formatted(graft.queries.VectorOps.v1KnnBrute(spark, sfDir))
    assert(s.contains("BroadcastNestedLoopJoin") || nodeCount(s, "BroadcastHashJoin") > 0,
      "query side should broadcast")
    assert(nodeCount(s, "SortMergeJoin") == 0, "corpus must not sort-merge shuffle")
  }

  test("minhash signature: no wide shuffle beyond the compute repartition") {
    val docs = Tables(spark, sfDir, "documents")
    val sig = graft.operators.MinHashDedup.signatureFromSets(
      graft.operators.MinHashDedup.shingleSets(docs, "doc_id", "text"))
    val s = formatted(sig)
    // the row-local minhash_sig expression replaces the K-column
    // aggregate: only the compute-spreading repartition remains
    assert(nodeCount(s, "Exchange") <= 1,
      s"expected <=1 exchange:\n${s.linesIterator.filter(_.contains("Exchange")).mkString("\n")}")
  }

  test("no declared query ever plans a CartesianProduct", SlowTier) {
    // sweeping scale-killer net over the whole inventory: broadcast cross
    // joins on tiny dims (q19/q21) plan as BroadcastNestedLoopJoin and are
    // fine; an un-broadcast CartesianProduct anywhere is a regression
    try SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${plan.take(800)}")
    } finally spark.catalog.clearCache() // i1/m1/m2 construction persists
  }

  test("s4 bucketed join: no exchange at or below the sort-merge join") {
    val s = formatted(SparkEntry.queries("s4_bucketed_join")(spark, sfDir))
    val tree = s.split(raw"== Initial Plan ==").head
    // the layout lever: per-order aggregate + fact-fact join run in place
    // on the bucketed scans; only the tiny priority rollup and the output
    // sort may exchange
    assert(nodeCount(s, "SortMergeJoin") == 1, "merge hint must hold at every SF")
    assert(nodeCount(s, "Exchange") <= 2,
      s"expected <=2 exchanges:\n${tree.linesIterator.filter(_.contains("Exchange")).mkString("\n")}")
    assert(!tree.contains("hashpartitioning(l_orderkey") &&
      !tree.contains("hashpartitioning(o_orderkey"),
      "join-key shuffle found — bucketed layout not used:\n" +
        tree.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
    // node details (after the tree) carry the scan's bucket marker
    assert(s.contains("Bucketed: true"), "scan did not read bucket layout")
  }

  test("r2 band join: BandJoinRewrite fires — bucketed equi-join, no nested loop") {
    val s = formatted(SparkEntry.queries("r2_band_join")(spark, sfDir))
    // the naive abs(cm - em) <= 2 predicate has no equality key; the
    // injected rule must turn it into a hash join on the bucket id
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"rewrite did not fire:\n${s.linesIterator.filter(_.contains("Join")).mkString("\n")}")
    assert(s.contains("_graft_pbin") && s.contains("_graft_bbin"),
      "bucket columns missing — band join not rewritten")
    assert(nodeCount(s, "BroadcastHashJoin") + nodeCount(s, "SortMergeJoin") +
      nodeCount(s, "ShuffledHashJoin") >= 1, s"no equi-join found:\n${s.take(1200)}")
  }

  test("q36 lateral: decorrelated — each table scanned once, no per-outer-row loop") {
    val s = formatted(SparkEntry.queries("q36_lateral")(spark, sfDir))
    // DecorrelateInnerQuery must turn the correlated aggregate+LIMIT
    // block into one join tree: 3 scans total (region, nation, customer),
    // not |region| re-executions of the inner query, and no cartesian
    assert(!s.contains("CartesianProduct"), "lateral planned a cartesian")
    assert(nodeCount(s, "Scan parquet") <= 3,
      s"inner query re-executed per outer row:\n${s.linesIterator.filter(_.contains("Scan")).mkString("\n")}")
    assert(nodeCount(s, "BroadcastHashJoin") + nodeCount(s, "SortMergeJoin") +
      nodeCount(s, "ShuffledHashJoin") >= 1, "no equi-join in decorrelated plan")
  }

  test("m6 cms: sketch builds as a partial+final object-hash pair, probe join broadcasts") {
    try {
      val s = formatted(SparkEntry.queries("m6_cms_heavy")(spark, sfDir))
      // the TypedImperativeAggregate must partially aggregate before the
      // lang shuffle (map-side combine ships one grid per mapper) and the
      // 10-per-lang probe side must broadcast against the sketch rows.
      // The partial_/final function pair in the node details is the
      // direct evidence of the combine (the ObjectHashAggregate nodes
      // themselves sit under cached/AQE subtrees the final-tree counter
      // does not walk)
      assert(s.contains("partial_cms_counts"),
        s"no partial (map-side) cms aggregate:\n${s.linesIterator.filter(_.contains("Aggregate")).mkString("\n")}")
      assert(s.contains("Functions [1]: [cms_counts"),
        "no final cms aggregate in plan details")
      assert(nodeCount(s, "BroadcastHashJoin") >= 1, "sketch probe join did not broadcast")
      assert(!s.contains("CartesianProduct"))
    } finally spark.catalog.clearCache() // m6 persists the (lang, term) counts
  }

  test("s1 salted agg: both phases partial-aggregate, no cartesian anywhere") {
    val s = formatted(SparkEntry.queries("s1_skew_agg")(spark, sfDir))
    // phase 1 (key,salt) and phase 2 (key) each split into partial+final
    // HashAggregate around their exchange — 4 aggregate nodes total
    assert(nodeCount(s, "HashAggregate") >= 4,
      s"expected two two-phase aggregates:\n${s.linesIterator.filter(_.contains("HashAggregate")).mkString("\n")}")
    assert(!s.contains("CartesianProduct"))
  }

  test("i1 ivf probe: candidate join is broadcast, corpus side never cartesian") {
    // audit the operator's live plan: the i1 query wrapper materializes
    // and closes the index (cache-leak fix), so its returned frame is a
    // LocalRelation with no join left to inspect
    val e = Tables(spark, sfDir, "embeddings")
    val idx = graft.operators.IvfSearch.buildIndex(
      e, "vec_id", "embedding", k = 8, iters = 2, roundDecimals = 6)
    try {
      val probe = graft.operators.IvfSearch.approxTopK(
        e.filter(org.apache.spark.sql.functions.col("vec_id") < 3), idx,
        "vec_id", "embedding", k = 5, nprobe = 3)
      val s = formatted(probe)
      assert(nodeCount(s, "BroadcastHashJoin") >= 1,
        s"probe->assignments join should broadcast the tiny probe side:\n" +
          s.linesIterator.filter(_.contains("Join")).mkString("\n"))
      assert(!s.contains("CartesianProduct"), "IVF probing must stay an equi-join")
    } finally idx.close()
  }

  test("h7 filtered ivf dense leg: reads only probed inverted lists — no full embeddings scan") {
    // audit the raw operator (the h7 query wrapper materializes and
    // closes the index, leaving a LocalRelation): the only parquet
    // scans in the dense leg must be the query-vector lookup
    // (embeddings, pushed vec_id filter) and the slice ids (documents,
    // pushed lang filter) — the corpus side is the cached inverted
    // lists (InMemoryTableScan), cut to the slice by a semi-join. A
    // brute slice scan would surface as a third parquet scan.
    val e = Tables(spark, sfDir, "embeddings")
    val docs = Tables(spark, sfDir, "documents")
    val idx = graft.operators.IvfSearch.buildIndex(
      e, "vec_id", "embedding", k = 8, iters = 2, roundDecimals = 6)
    try {
      val probe = graft.operators.IvfSearch.approxTopKWithin(
        e.filter(org.apache.spark.sql.functions.col("vec_id") < 3), idx,
        "vec_id", "embedding", k = 5, nprobe = 3,
        allowed = docs
          .filter(org.apache.spark.sql.functions.col("lang") === "en")
          .select(org.apache.spark.sql.functions.col("doc_id").as("vec_id")))
      assert(probe.count() > 0, "filtered probe returned nothing")
      val s = formatted(probe)
      // parquet scans that EXECUTE: nodes in the final tree outside any
      // InMemoryRelation subtree (a cache definition re-prints its
      // source scan, but the TableCacheQueryStage serves from memory)
      val nodeRe = raw"([A-Za-z][A-Za-z ]*[A-Za-z]) *\((\d+)\)".r
      val live = scala.collection.mutable.Set[String]()
      var imrCol = -1
      s.split(raw"== Initial Plan ==").head.linesIterator.foreach { l =>
        nodeRe.findFirstMatchIn(l).foreach { m =>
          val c = l.indexOf(m.group(1))
          if (imrCol >= 0 && c <= imrCol) imrCol = -1
          if (imrCol < 0) {
            if (m.group(1).trim.startsWith("InMemoryRelation")) imrCol = c
            else if (m.group(1).trim == "Scan parquet") live += m.group(2)
          }
        }
      }
      def detail(id: String): String =
        (raw"(?s)\(" + id + raw"\) Scan parquet.*?(?=\n\(\d+\) |\z)").r
          .findFirstIn(s).getOrElse("")
      assert(live.size == 2,
        s"expected exactly 2 EXECUTING parquet scans (query lookup + " +
          s"slice ids), got ${live.size}: ${live.map(detail).mkString("\n")}")
      // ...and each of the two is the bounded read it claims to be: the
      // query-vector lookup (pushed vec_id) and the slice ids (pushed
      // lang) — a brute dense leg would add an UNfiltered embeddings scan
      assert(live.map(detail).exists(d => d.contains("embeddings.parquet") &&
          d.contains("IsNotNull(vec_id)")),
        "query-vector lookup must push its vec_id filter")
      assert(live.map(detail).exists(d => d.contains("documents.parquet") &&
          d.contains("EqualTo(lang,en)")),
        "the slice predicate must push to the documents scan")
      assert(nodeCount(s, "InMemoryTableScan") >= 1,
        "corpus candidates must come from the cached inverted lists")
      assert(nodeCount(s, "BroadcastHashJoin") >= 1,
        "probe->assignments join should broadcast the tiny probe side")
      assert(!s.contains("CartesianProduct"),
        "filtered IVF probing must stay equi/semi joins")
    } finally idx.close()
  }

  test("e8 as-of join is join-free: window carry, no Join operator, no pair explosion") {
    val s = formatted(SparkEntry.queries("e8_asof_join")(spark, sfDir))
    val tree = s.split(raw"== Initial Plan ==").head
    assert(!tree.contains("Join"),
      s"as-of must plan as union+window, not a range join:\n" +
        tree.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(nodeCount(s, "Window") >= 1, "running-carry window missing")
    assert(nodeCount(s, "Union") >= 1, "tagged union missing")
  }

  test("e10 nearest as-of shares ONE exchange across both direction carries") {
    val s = formatted(SparkEntry.queries("e10_asof_nearest")(spark, sfDir))
    val tree = s.split(raw"== Initial Plan ==").head
    assert(!tree.contains("Join"),
      "nearest as-of must stay join-free (two window carries, no range join)")
    assert(nodeCount(s, "Window") >= 2,
      "backward AND forward carries should appear as two Window operators")
    // both carries partition by the same key: beyond the scan-side and
    // final-sort exchanges, the two windows must NOT add one each
    assert(nodeCount(s, "Exchange") <= 3,
      s"windows re-exchanged separately:\n" +
        s.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("e7 interval join plans as a shuffle equi-join on user_id, never cartesian") {
    val s = formatted(SparkEntry.queries("e7_interval_join")(spark, sfDir))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      "interval join must keep the user_id equality as the join key")
    assert(nodeCount(s, "SortMergeJoin") + nodeCount(s, "ShuffledHashJoin") +
      nodeCount(s, "BroadcastHashJoin") >= 1, s"no equi-join found:\n$s")
  }

  test("v4 quantization is shuffle-free per-row work: no join, at most the final sort exchange") {
    val s = formatted(SparkEntry.queries("v4_quantize_int8")(spark, sfDir))
    val tree = s.split(raw"== Initial Plan ==").head
    assert(!tree.contains("Join"), "SQ8 must be pure per-row arithmetic")
    assert(s.contains("LessThan(vec_id,50)"), "id filter not pushed to the scan")
    assert(nodeCount(s, "Exchange") <= 1,
      s"only the final orderBy may exchange:\n" +
        tree.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("q25 fact-fact join: filters push to both fact scans, dims broadcast, shuffle equi-join") {
    // with auto-broadcast disabled, the only broadcasts left are the
    // explicit nation/region hints; the fact-fact joins must then plan as
    // shuffle equi-joins (sort-merge or shuffled-hash — never cartesian),
    // which is exactly the big-big shape a 100 TB run would execute
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val s = formatted(SparkEntry.queries("q25_fact_join")(spark, sfDir))
      assert(s.contains("GreaterThanOrEqual(l_quantity,5.0)"),
        "quantity filter not pushed to the lineitem scan")
      assert(s.contains("GreaterThanOrEqual(o_orderdate,"),
        "date filter not pushed to the orders scan")
      assert(nodeCount(s, "BroadcastHashJoin") >= 2,
        s"nation/region hints lost:\n${s.linesIterator.filter(_.contains("Join")).mkString("\n")}")
      assert(nodeCount(s, "SortMergeJoin") + nodeCount(s, "ShuffledHashJoin") >= 1,
        s"no shuffle join for the fact-fact pair:\n${s.linesIterator.filter(_.contains("Join")).mkString("\n")}")
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        "every join must stay an equi-join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // the runtime complement to SkewAgg's manual salting: one hot key makes
    // one shuffle partition vastly larger than the rest, and AQE's skew-join
    // rule must split it (visible as skew=true / "skewed" in the final
    // plan) instead of letting a single reducer absorb the whole key
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of rows share key 0, and the payload is incompressible (md5) —
      // skew detection runs on COMPRESSED shuffle sizes, so a constant pad
      // deflates away and the hot partition never crosses the 2× median bar
      val left = spark.range(200000).select(
        when(col("id") % 10 === 0, col("id")).otherwise(0L).as("k"),
        org.apache.spark.sql.functions.md5(col("id").cast("string")).as("payload"))
      val right = spark.range(2000).select(col("id").as("k"), lit(1L).as("w"))
      // global (ungrouped) aggregate on top: a groupBy("k") could reuse the
      // join's hash partitioning, and AQE refuses to split skewed partitions
      // when a downstream stage requires that distribution
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"),
          org.apache.spark.sql.functions.max(col("payload")).as("m"))
      val s = formatted(joined)
      assert(s.contains("skew=true"),
        s"AQE did not split the skewed partition:\n" +
          s.linesIterator.filter(l => l.contains("Join") || l.contains("AQEShuffleRead"))
            .mkString("\n"))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partitioned sink + partition pruning: filtered read scans one partition") {
    val tmpPath = java.nio.file.Files.createTempDirectory("graft_part")
    val tmp = tmpPath.toString
    try {
      Tables(spark, sfDir, "events")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      val read = spark.read.parquet(tmp).filter(col("event_type") === "click")
      val s = formatted(read)
      // the predicate must land in PartitionFilters (directory pruning at
      // the source — the 100 TB layout lever), NOT as a post-scan Filter
      val pf = s.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(pf.contains("= click"),
        s.linesIterator.filter(l => l.contains("Partition") || l.contains("Filter"))
          .mkString("\n"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("bucketed tables co-locate: same-key join plans with zero exchanges") {
    val ev = Tables(spark, sfDir, "events").select("event_id", "user_id", "value")
    spark.sql("DROP TABLE IF EXISTS ev_bucket_a")
    spark.sql("DROP TABLE IF EXISTS ev_bucket_b")
    ev.write.format("parquet").bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("ev_bucket_a")
    ev.write.format("parquet").bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("ev_bucket_b")
    // disable auto-broadcast: at the test SF the sides are broadcast-sized,
    // but the property under audit is the big-big case where both sides
    // are far past the broadcast threshold and bucketing is what removes
    // the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucket_a").alias("a")
        .join(spark.table("ev_bucket_b").alias("b"), "user_id")
      val s = formatted(joined.groupBy(col("user_id")).agg(count(lit(1)).as("n")))
      // bucket layout replaces the shuffle: both join sides and the
      // follow-on user_id aggregation reuse the bucketing, so the whole
      // plan runs without a single Exchange — the co-located-join lever
      // the 100 TB design calls for
      assert(nodeCount(s, "Exchange") == 0,
        s.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS ev_bucket_a")
      spark.sql("DROP TABLE IF EXISTS ev_bucket_b")
    }
  }

  test("bucketed reverse geocode: broadcast join on cell key, points never shuffle") {
    import spark.implicits._
    val pts = Seq((19.0, 72.9), (28.6, 77.2)).toDF("latitude", "longitude")
    val gaz = (0 until 2000).map(i => (s"c$i", "X", -50.0 + i * 0.05, -180.0 + i * 0.18))
      .toDF("city", "country", "lat", "lon")
    val s = formatted(graft.ingest.Geo.reverseGeocodeBucketed(pts, gaz, 1.0))
    assert(nodeCount(s, "BroadcastHashJoin") >= 1, "cell join should broadcast")
    assert(!s.contains("CartesianProduct"))
    // the cell-candidate build shuffles (bounded by gazetteer size); the
    // points side itself must not appear below any Exchange: the only
    // exchanges in the plan belong to the gazetteer aggregation
    val tree = s.split(raw"== Initial Plan ==").head
    val exchanges = tree.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(nodeCount(s, "Exchange") <= 2, s"unexpected exchanges:\n$exchanges")
  }

  test("k1 bm25: corpus stats broadcast, scoring row-local — no shuffle before top-k") {
    val s = formatted(SparkEntry.queries("k1_bm25_topk")(spark, sfDir))
    assert(s.contains("BroadcastExchange"), s.take(800))
    // the only allowed non-broadcast movement is the TakeOrdered top-k
    // (which is not an Exchange node at all)
    assert(nodeCount(s, "Exchange hashpartitioning") == 0, s.take(1500))
    assert(s.contains("TakeOrderedAndProject"), s.take(800))
  }

  test("k6 at-rest search: probe partition-prunes to the query terms' shards") {
    val s = formatted(SparkEntry.queries("k6_search_at_rest")(spark, sfDir))
    // the shard filter must land as PARTITION pruning on the postings
    // scan (shard is the index's partition column), the term filter as a
    // pushed data filter, and the final cut stays a top-k heap
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(term, ["), s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(s.contains("TakeOrderedAndProject"), s.take(800))
    assert(nodeCount(s, "CartesianProduct") == 0)
  }

  test("k17 boolean retrieval: probe partition-prunes to the query terms' shards") {
    val s = formatted(SparkEntry.queries("k17_boolean_retrieval")(spark, sfDir))
    // boolean connectives must evaluate over the PROBED postings only:
    // shard partition pruning + pushed term filter, and NOT must be an
    // indicator (no anti-join against a corpus scan)
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(term, ["),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(nodeCount(s, "Scan parquet") == 1,
      "boolean retrieval must read ONLY the probed postings")
    assert(!s.contains("Join"), "NOT must be an indicator, not an anti-join")
  }

  test("k18 ranked boolean: ONE postings probe feeds filter and rank; no corpus scan") {
    val s = formatted(SparkEntry.queries("k18_ranked_boolean")(spark, sfDir))
    // the probe must partition-prune to the query terms' shards with the
    // term filter pushed (same contract as k17)
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(term, ["),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    // EXECUTING parquet scans (outside any InMemoryRelation cache
    // definition, the h7 counting rule): exactly ONE — the 1-row stats
    // table. The postings probe is persisted so the flag/tf aggregation
    // and the df aggregate share one scan; a second executing postings
    // scan (or any documents.parquet scan) means the probe is being
    // recomputed per consumer.
    val nodeRe = raw"([A-Za-z][A-Za-z ]*[A-Za-z]) *\((\d+)\)".r
    val live = scala.collection.mutable.Set[String]()
    var imrCol = -1
    s.split(raw"== Initial Plan ==").head.linesIterator.foreach { l =>
      nodeRe.findFirstMatchIn(l).foreach { m =>
        val c = l.indexOf(m.group(1))
        if (imrCol >= 0 && c <= imrCol) imrCol = -1
        if (imrCol < 0) {
          if (m.group(1).trim.startsWith("InMemoryRelation")) imrCol = c
          else if (m.group(1).trim == "Scan parquet") live += m.group(2)
        }
      }
    }
    def detail(id: String): String =
      (raw"(?s)\(" + id + raw"\) Scan parquet.*?(?=\n\(\d+\) |\z)").r
        .findFirstIn(s).getOrElse("")
    assert(live.size == 1,
      s"expected exactly 1 EXECUTING parquet scan (the stats table), " +
        s"got ${live.size}: ${live.map(detail).mkString("\n")}")
    assert(live.map(detail).forall(d => d.contains("stats")),
      "the one executing scan must be the index's stats table")
    assert(!s.contains("documents.parquet"),
      "ranked boolean must never rescan the corpus")
    assert(nodeCount(s, "InMemoryTableScan") >= 2,
      "both probe consumers (flag/tf agg, df agg) must read the cached probe")
    assert(!s.contains("SortMergeJoin"),
      "stats/dfs attach as broadcasts, never a shuffled join")
  }

  test("k8 at-rest fuzzy search: probe partition-prunes to the query variants' shards") {
    val s = formatted(SparkEntry.queries("k8_fuzzy_at_rest")(spark, sfDir))
    // the shard filter must land as PARTITION pruning on the variant-
    // table scan (shard is the index's partition column) and the variant
    // filter as a pushed data filter; the query side broadcasts
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(variant, ["),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(s.contains("BroadcastHashJoin"), s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0)
  }

  test("k9 at-rest proximity: probe partition-prunes to the query terms' shards") {
    val s = formatted(SparkEntry.queries("k9_proximity_at_rest")(spark, sfDir))
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(term, ["),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(nodeCount(s, "CartesianProduct") == 0)
  }

  test("k10 n-word phrase: probe partition-prunes, one index join, no position self-join") {
    val s = formatted(SparkEntry.queries("k10_phrase_at_rest")(spark, sfDir))
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(term, ["),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    // slot-aligned voting reads the positional index ONCE however many
    // words the phrases have — the n−1 adjacency self-joins would scan
    // it per word
    assert(nodeCount(s, "Scan parquet") == 1, s.take(1500))
    assert(s.contains("BroadcastHashJoin"), s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0)
  }

  test("k12 rolling fuzzy serve: probe partition-prunes to the variants' shards, broadcast join") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pa_fuzzy")
    graft.streaming.StreamOps.fuzzyIndexBatch(
      Seq(1L -> "a vector engine with stream processing",
        2L -> "vectors and streams everywhere").toDF("doc_id", "text"),
      "doc_id", "text", 16, root.toString, 0L)
    // Plan variant: the probe shape executing inside the public pin
    val s = formatted(graft.streaming.StreamOps.fuzzyServeRollingPlan(
      spark, root.toString, Seq("vektor"), 16))
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(variant, ["),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(s.contains("BroadcastHashJoin"), s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0)
    spark.catalog.clearCache()
  }

  test("bm25 rolling serve with tombstones: shard-pruned probe, broadcast anti-join, no cartesian") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pa_bm25")
    def land(id: Long, docs: Seq[(Long, String)]): Unit =
      graft.streaming.StreamOps.bm25IndexBatch(docs.toDF("doc_id", "text"),
        "doc_id", "text", 8, root.toString, id)
    land(0L, Seq(1L -> "the quick brown fox", 2L -> "a lazy dog sleeps"))
    land(1L, Seq(2L -> "the dog barks at the fox")) // supersede -> tombstone
    // the Plan variant: the public serve pins its result (maintain-
    // while-serving isolation), so the probe shape to audit is the
    // plan that executes INSIDE that pin
    val s = formatted(graft.streaming.StreamOps.bm25ServeRollingPlan(
      spark, root.toString, Seq("fox", "dog"), 8))
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(term, ["),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    // the dead-version drop is a BROADCAST anti-join on the (tiny)
    // tombstone log — a shuffled anti-join here would move every probed
    // posting for a lookaside table
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftAnti"),
      s.take(1500))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") <= 2, // the two 1-row stat frames
      s.take(1500))
    spark.catalog.clearCache()
  }

  test("k13 rolling positions serve: shard-pruned probe, pushed term filter, broadcast anti-join") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pa_pos")
    graft.streaming.StreamOps.posIndexBatch(
      Seq(1L -> "a vector engine with stream processing",
        2L -> "vectors and streams everywhere").toDF("doc_id", "text"),
      "doc_id", "text", 16, root.toString, 0L)
    // re-land doc 2 so the tombstone anti-join participates in the plan
    graft.streaming.StreamOps.posIndexBatch(
      Seq(2L -> "vector streams again").toDF("doc_id", "text"),
      "doc_id", "text", 16, root.toString, 1L)
    // Plan variant: the probe shape executing inside the public pin
    val s = formatted(graft.streaming.StreamOps.posServeRollingPlan(
      spark, root.toString, Seq("vector", "stream"), 16))
    assert(s.contains("PartitionFilters") && s.contains("shard"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(s.contains("In(term, ["),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftAnti"),
      s.take(1500))
    assert(nodeCount(s, "CartesianProduct") == 0)
    // time travel (k15/k16): the asOf bound must reach the scan as a
    // batch_id PARTITION filter — as-of never reads future segments
    val t = formatted(graft.streaming.StreamOps.posServeRollingPlan(
      spark, root.toString, Seq("vector", "stream"), 16, asOf = 0L))
    val pf = t.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("batch_id") && pf.contains("shard"), pf)
    spark.catalog.clearCache()
  }

  test("a6/d45 as-of snapshots: the frontier pick is a batch_id partition filter") {
    import spark.implicits._
    import graft.streaming.StreamOps
    val root = java.nio.file.Files.createTempDirectory("pa_asof").toString
    // kanon: two accumulated class-count snapshots
    def kdocs(ids: Seq[Long]) = ids
      .map(i => (i, s"src${i % 2}", "en", 10 * i))
      .toDF("doc_id", "source", "lang", "n_chars")
    StreamOps.kAnonBatch(kdocs(Seq(1L, 2L)), s"$root/state", 0L)
    StreamOps.kAnonBatch(kdocs(Seq(3L, 4L)), s"$root/state", 1L)
    val k = formatted(StreamOps.kanonAsOf(spark, s"$root/state", asOf = 0L))
    val kpf = k.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(kpf.contains("batch_id"), kpf)
    // sem labels: two landed label snapshots (drive semDedupBatch waves)
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val statics = Seq((1L, Seq(1.0, 0.0), 0))
      .toDF("id", "emb", "centroid_id")
    val seed = Seq.empty[(Long, Long)].toDF("id", "component")
    def wave(id: Long, vid: Long): Unit =
      StreamOps.semDedupBatch(Seq((vid, Seq(1.0, 0.0)))
          .toDF("vec_id", "embedding"),
        cents, statics, seed, "vec_id", "embedding", 0.9,
        s"$root/state", id)
    wave(0L, 10L); wave(1L, 11L)
    val m = formatted(StreamOps.semLabelsAsOf(spark, s"$root/state", seed,
      org.apache.spark.sql.types.LongType, asOf = 0L))
    val mpf = m.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(mpf.contains("batch_id"), mpf)
    spark.catalog.clearCache()
  }

  test("mm1 media bridge: the doc window is pushed to the scan, read schema pruned") {
    val s = formatted(SparkEntry.queries("mm1_video_luma")(spark, sfDir))
    // the synthesis/decode mapPartitions must sit on a scan that already
    // pruned to the 40-doc window and the two needed columns — a full
    // documents scan under a per-row codec pass is the wrong plan
    assert(s.contains("LessThan(doc_id,40)"),
      s.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("doc_id") && readSchema.contains("text") &&
      !readSchema.contains("source"), readSchema)
  }

  test("q35 top-k aggregate: object-hash partial+final pair, ZERO window sorts") {
    val s = formatted(SparkEntry.queries("q35_topk_agg")(spark, sfDir))
    assert(s.contains("ObjectHashAggregate"), s.take(1200))
    assert(nodeCount(s, "Window") == 0,
      "the bounded-heap aggregate exists to remove the window sort")
    // one hash exchange for the final aggregate; the customer join
    // broadcasts; the output sort is the only other movement
    assert(nodeCount(s, "Exchange hashpartitioning") <= 1, s.take(1500))
  }

  test("k3 redaction and z1 z-address are row-local: one exchange beyond partial agg") {
    val k3 = formatted(SparkEntry.queries("k3_pii_redact")(spark, sfDir))
    // regexp work happens in the scan projection; the output sort is the
    // only data movement
    assert(nodeCount(k3, "Exchange") <= 1, k3.take(1500))
    val z1 = formatted(SparkEntry.queries("z1_zorder_stats")(spark, sfDir))
    // partial agg shuffle on the z-bucket + final sort
    assert(nodeCount(z1, "Exchange") <= 2, z1.take(1500))
    assert(z1.contains("partial"), z1.take(800))
  }

  test("d18 sequence packing: offsets broadcast back, one window shuffle on the bin") {
    val s = formatted(SparkEntry.queries("d18_seq_pack")(spark, sfDir))
    try {
      assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
        s.take(1200))
      // bin window + pack_id agg + final sort; the prefix sum must NOT
      // appear as a single global-order window (no empty-key
      // Exchange SinglePartition before a Window node)
      assert(!s.contains("Exchange SinglePartition"), s.take(1500))
    } finally spark.catalog.clearCache() // packSequences persists its token table
  }

  test("s2 salted join: shuffled hash join on (key, salt), dim never broadcast") {
    val s = formatted(SparkEntry.queries("s2_skew_join")(spark, sfDir))
    assert(s.contains("ShuffledHashJoin"), s.take(1200))
    assert(!s.contains("BroadcastHashJoin"),
      "the salted join must exercise the shuffle path — a broadcast would " +
        "bypass the salt entirely: " + s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
  }

  test("b1 bloom join: probe filters the fact scan before the semi-join shuffle") {
    val s = formatted(SparkEntry.queries("b1_bloom_join")(spark, sfDir))
    assert(s.contains("bloom_might_contain"), s.take(1500))
    // the probe must run codegen'd in the scan stage: formatted explain
    // marks WSCG membership with a star on the node line
    assert(s.contains("* Filter"), s.take(1500))
    assert(s.contains("LeftSemi"), s.take(1500))
  }

  test("e17 SCD2 and e18 TWAP: one user-key shuffle, windows share the exchange") {
    val e17 = formatted(SparkEntry.queries("e17_scd2_intervals")(spark, sfDir))
    // both windows partition by user_id: one hash exchange + final sort
    assert(nodeCount(e17, "Exchange") <= 2, e17.take(1500))
    val e18 = formatted(SparkEntry.queries("e18_twap")(spark, sfDir))
    // window shuffle on user_id; the groupBy reuses the same partitioning,
    // leaving only the final sort as a second movement
    assert(nodeCount(e18, "Exchange") <= 2, e18.take(1500))
  }

  test("e13 rolling range: every exchange co-partitions on (event_type, bucket), never type alone") {
    val s = formatted(SparkEntry.queries("e13_rolling_range")(spark, sfDir))
    // the 100×-scale property: no window stage may sort a whole
    // event_type (5 distinct values); both rolling phases must hash on
    // the composite (event_type, bkt) key so a task holds ~3h of one
    // type. The tree names nodes; partitioning keys live in the details
    // section — read the Arguments of each FINAL-tree Exchange node.
    val tree = s.split(raw"== Initial Plan ==").head
    val finalIds = raw"\((\d+)\)".r.findAllMatchIn(tree).map(_.group(1)).toSet
    val parts = s.split("\n\n").toSeq
      .filter(b => raw"^\((\d+)\) Exchange".r.findFirstMatchIn(b)
        .exists(m => finalIds.contains(m.group(1))))
      .flatMap(b => raw"hashpartitioning\(([^)]*)\)".r
        .findFirstMatchIn(b).map(_.group(1)))
    val typed = parts.filter(_.contains("event_type"))
    assert(typed.nonEmpty, s"expected (event_type, bkt) exchanges:\n${parts.mkString("\n")}")
    typed.foreach { p =>
      assert(p.contains("bkt"),
        s"exchange partitions on event_type WITHOUT the bucket key: $p")
    }
    assert(nodeCount(s, "Window") >= 2, "two-phase shape: fwd + suffix windows")
  }

  test("c6 split leakage: one gram hash-join family, no pairwise doc join") {
    val s = formatted(SparkEntry.queries("c6_split_leakage")(spark, sfDir))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
    assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
      s.contains("BroadcastHashJoin"), "gram overlap must be a hash/merge equi-join")
  }

  test("i4 PQ distortion: distributed top-k, no global-window sort") {
    val s = formatted(SparkEntry.queries("i4_pq_distortion")(spark, sfDir))
    // the error expression is row-local (map-literal codeword lookups) and
    // the 20-row cut must be a per-partition heap, not a single-partition
    // global window over the whole corpus
    assert(s.contains("TakeOrderedAndProject"), s.take(1500))
    assert(nodeCount(s, "Window") == 0, "no window machinery expected")
  }

  test("b2 bloom anti-join: absent rows bypass the join, sliver runs exact anti") {
    val s = formatted(SparkEntry.queries("b2_bloom_anti_join")(spark, sfDir))
    assert(s.contains("bloom_might_contain"), "bloom probe must reach the scan side")
    assert(s.contains("LeftAnti"), "exact anti-join must clear the fpp sliver")
    assert(s.contains("Union"), "definitely-absent branch must union around the join")
    assert(nodeCount(s, "CartesianProduct") == 0, s.take(1200))
  }

  test("e30 inter-arrival: lag window partitions on (user, type), never type alone") {
    val s = formatted(SparkEntry.queries("e30_inter_arrival")(spark, sfDir))
    val tree = s.split(raw"== Initial Plan ==").head
    val finalIds = raw"\((\d+)\)".r.findAllMatchIn(tree).map(_.group(1)).toSet
    val parts = s.split("\n\n").toSeq
      .filter(b => raw"^\((\d+)\) Exchange".r.findFirstMatchIn(b)
        .exists(m => finalIds.contains(m.group(1))))
      .flatMap(b => raw"hashpartitioning\(([^)]*)\)".r
        .findFirstMatchIn(b).map(_.group(1)))
    // the corpus-sized LAG window must hash on the composite
    // (user_id, event_type) key; the later type-only exchanges carry the
    // percentile stage, which is the deliberately spillable p2 shape
    assert(parts.exists(p => p.contains("user_id") && p.contains("event_type")),
      s"no composite (user, type) exchange for the lag window:\n${parts.mkString("\n")}")
  }

  test("e20 MAD outliers: stat tables broadcast back, no cartesian") {
    val s = formatted(SparkEntry.queries("e20_mad_outliers")(spark, sfDir))
    assert(s.contains("BroadcastHashJoin"), s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
  }

  test("c3 decontaminated clean: contamination drop plans as an anti-join in one plan") {
    val s = formatted(SparkEntry.queries("c3_clean_decontaminated")(spark, sfDir))
    assert(s.contains("LeftAnti"), s.take(1500))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
  }

  test("q29 correlation: one partial+final aggregate pass, 3-column scan") {
    val s = formatted(SparkEntry.queries("q29_correlation")(spark, sfDir))
    assert(s.contains("partial_"), "moments must combine map-side")
    assert(nodeCount(s, "HashAggregate") >= 2, "expected partial+final hash aggregates")
    assert(s.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>"),
      "scan should read only quantity, price, returnflag: " +
        s.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("e21 cusum and e23 seasonal: stats broadcast back over the scan, no cartesian") {
    val s21 = formatted(SparkEntry.queries("e21_cusum_change")(spark, sfDir))
    assert(s21.contains("BroadcastHashJoin"), "per-type totals must broadcast")
    assert(nodeCount(s21, "CartesianProduct") == 0 &&
      nodeCount(s21, "BroadcastNestedLoopJoin") == 0, s21.take(1200))
    val s23 = formatted(SparkEntry.queries("e23_seasonal_anom")(spark, sfDir))
    assert(s23.contains("BroadcastHashJoin"), "bucket stats must broadcast")
    assert(nodeCount(s23, "SortMergeJoin") == 0 &&
      nodeCount(s23, "CartesianProduct") == 0,
      "the |types*24|-row stat table must never shuffle the fact side: " + s23.take(1200))
  }

  test("e22 transitions: lead and the src-total window share one user shuffle each, no join") {
    val s = formatted(SparkEntry.queries("e22_transitions")(spark, sfDir))
    assert(nodeCount(s, "SortMergeJoin") == 0 && nodeCount(s, "BroadcastHashJoin") == 0,
      "transition matrix should be windows+agg, not a join: " + s.take(1200))
    // column pruning is the audit; ts's physical type varies by testdata
    // generation (bigint nanos pre-round-9, timestamp_ntz micros after)
    val rs = s.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(rs.contains("event_id:bigint") && rs.contains("user_id:bigint") &&
      rs.contains("event_type:string") && rs.contains("ts:") &&
      !rs.contains("value") && !rs.contains("props"),
      "scan should read only id/ts/user/type: " + rs)
  }

  test("k5 proximity: pair table broadcasts, postings join hash-based, no cartesian") {
    val s = formatted(SparkEntry.queries("k5_proximity_search")(spark, sfDir))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0,
      "proximity must be equi-joins (doc_id + term), never a pair blowup: " +
        s.take(1200))
    assert(nodeCount(s, "BroadcastHashJoin") >= 1,
      "the 3-row pair table must broadcast: " + s.take(1200))
  }

  test("d38 LM filter: model aggregates + one scoring join, TakeOrdered drop list") {
    val s = formatted(SparkEntry.queries("d38_lm_quality")(spark, sfDir))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
    assert(s.contains("TakeOrderedAndProject"),
      "the lowest-K drop list must be a distributed top-k, not a full sort: " +
        s.take(1200))
    assert(nodeCount(s, "Window") == 0,
      "no global window anywhere in the scoring path: " + s.take(1200))
  }

  test("c10 dup factor: cluster table joins the corpus without any pair blowup") {
    val s = try formatted(SparkEntry.queries("c10_source_dup_factor")(spark, sfDir))
    finally spark.catalog.clearCache() // minhash band tables persist
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
  }

  test("q32 column stats: ONE scan feeds all four columns' stats (Expand, no re-reads)") {
    val s = formatted(SparkEntry.queries("q32_column_stats")(spark, sfDir))
    assert(nodeCount(s, "Scan parquet") <= 1,
      "the profiler must not rescan the table per column: " +
        s.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    assert(s.contains("Expand"), "exact multi-countDistinct should compile to Expand")
  }

  test("e28 target encode: global stats broadcast, single fact scan family, no BNLJ blowup") {
    val s = formatted(SparkEntry.queries("e28_target_encode")(spark, sfDir))
    assert(nodeCount(s, "CartesianProduct") == 0, s.take(1200))
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      "the 1-row global aggregate must broadcast: " + s.take(1200))
  }

  test("d30 novelty and d31 hapax: hash aggregates on gram/token keys, no pairwise join") {
    val s30 = try formatted(SparkEntry.queries("d30_ngram_novelty")(spark, sfDir))
    finally spark.catalog.clearCache() // d30 persists its gram table
    assert(nodeCount(s30, "CartesianProduct") == 0 &&
      nodeCount(s30, "BroadcastNestedLoopJoin") == 0, s30.take(1200))
    assert(s30.contains("InMemoryTableScan") || s30.contains("TableCacheQueryStage"),
      "both branches must read the persisted gram table: " + s30.take(1200))
    val s31 = formatted(SparkEntry.queries("d31_hapax_rate")(spark, sfDir))
    assert(s31.contains("partial_count") || s31.contains("partial_"),
      "token counts must partial-aggregate map-side: " + s31.take(1200))
    assert(nodeCount(s31, "SortMergeJoin") == 0 && nodeCount(s31, "CartesianProduct") == 0)
  }

  test("e33 OHLC: one hash-aggregate family over the composite key, zero windows") {
    val s = formatted(SparkEntry.queries("e33_ohlc")(spark, sfDir))
    // the scaladoc claim: min_by/max_by over the total-order key makes
    // OHLC a pure two-phase aggregate — a window over raw events would
    // re-sort the whole stream per type
    assert(nodeCount(s, "Window") == 0, "no window machinery expected: " + s.take(1200))
    assert(s.contains("partial_"), "open/close must combine map-side")
    assert(nodeCount(s, "HashAggregate") + nodeCount(s, "SortAggregate") >= 2,
      "expected partial+final aggregates: " + s.take(1200))
  }

  test("e34 incremental agg: base+delta aggregate families merge without window or cartesian") {
    val s = formatted(SparkEntry.queries("e34_incremental_agg")(spark, sfDir))
    assert(nodeCount(s, "Window") == 0, s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
    // the merge is a |types|-row join of two aggregate families
    assert(nodeCount(s, "HashAggregate") >= 4,
      "base and delta must each partial+final aggregate: " + s.take(1200))
  }

  test("v9 top eigen: Gram entries partial-aggregate; driver work bounded by dim²") {
    // audit the distributed stage (the query fn collects the dim²-entry
    // aggregate and returns a local frame, so build the stage directly)
    import org.apache.spark.sql.functions.{posexplode, round => rnd, sum}
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("embedding").cast("array<double>").as("emb"))
    val stage = e.select(col("emb"), posexplode(col("emb")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("emb")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(rnd(sum(col("xi") * col("xj")), 6).as("t"))
    val s = formatted(stage)
    assert(s.contains("partial_sum"), "Gram sums must combine map-side: " + s.take(1200))
    assert(nodeCount(s, "Window") == 0 && nodeCount(s, "CartesianProduct") == 0,
      s.take(1200))
  }

  test("h1 hybrid RRF: legs are broadcast + top-k heaps; fusion never goes cartesian") {
    val s = formatted(SparkEntry.queries("h1_hybrid_rrf")(spark, sfDir))
    // each leg: corpus scan + 1-row broadcast (bm25 stats / query vec),
    // cut by a TakeOrdered heap — no full sort of either corpus
    assert(s.contains("BroadcastExchange"), s.take(1000))
    assert(s.contains("TakeOrderedAndProject"), s.take(1000))
    // the only unbounded-side join allowed is the 1-row query-vector
    // broadcast; the rank windows and the fusion join sit above LIMITs
    assert(nodeCount(s, "CartesianProduct") == 0, s.take(1500))
    // embeddings scan reads only (vec_id, embedding) — label pruned
    assert(!s.contains("label:int"),
      "embeddings scan must prune the label column: " +
        s.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
    // three-leg fusion (h5): the extra fuzzy leg must not change the
    // shape — broadcast variant match, top-k heaps, no cartesian
    val t = formatted(SparkEntry.queries("h5_tri_rrf")(spark, sfDir))
    assert(nodeCount(t, "CartesianProduct") == 0, t.take(1500))
    assert(t.contains("TakeOrderedAndProject"), t.take(1000))
    // filtered hybrid (h6): the lang slice reaches the documents scan
    // as a pushed filter and the dense leg joins the slice semi, never
    // post-filters a global ranking
    val u = formatted(SparkEntry.queries("h6_filtered_hybrid")(spark, sfDir))
    assert(u.contains("EqualTo(lang,en)"),
      u.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(u.contains("LeftSemi"), u.take(1500))
    assert(nodeCount(u, "CartesianProduct") == 0, u.take(1500))
  }

  test("pipe2 serves from the landed attribution artifact: one scan, no funnel re-derivation") {
    val s = formatted(SparkEntry.queries("pipe2_funnel_by_lang")(spark, sfDir))
    // the per-language cut is a group-by over the landed pipe1s table —
    // re-deriving the funnel would surface as a documents scan plus the
    // whole MinHash/decontamination chain
    assert(nodeCount(s, "Scan parquet") == 1,
      "pipe2 must read ONLY the landed attribution table: " + s.take(1200))
    assert(nodeCount(s, "Join") == 0 && nodeCount(s, "CartesianProduct") == 0,
      "pipe2 is a hash aggregate over the artifact, no join: " + s.take(1200))
  }

  test("pipe3 packs survivors off the artifact: att + documents scans only") {
    val s = formatted(SparkEntry.queries("pipe3_funnel_packing")(spark, sfDir))
    // survivor ids come from the landed attribution table; the text
    // joins in from documents — exactly two parquet sources, and the
    // funnel's sweep chain must NOT re-run
    assert(nodeCount(s, "Scan parquet") == 2,
      "pipe3 must read the artifact + documents, nothing else: " + s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0, s.take(1200))
  }

  test("mm16 as-of pair-log read partition-prunes on batch_id") {
    // run the query once so the mm16s artifact exists for this corpus
    SparkEntry.queries("mm16_rolling_image_neardup")(spark, sfDir)
    val root = graft.queries.ScaleOps.artifactRoot("mm16s",
      graft.queries.ScaleOps.dataFingerprint(sfDir, Seq("documents")))
    val s = formatted(graft.streaming.StreamOps.imageNdAsOf(
      spark, root.resolve("state").toString, asOf = 1L))
    // batch_id is the delta's partition column: the as-of cut must land
    // as partition pruning, never a row filter over every wave
    assert(s.contains("PartitionFilters") && s.contains("batch_id"),
      s.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(nodeCount(s, "Scan parquet") == 1, s.take(800))
  }

  test("h12 cascade: the expensive rerank is candidate-sized, candidates broadcast") {
    val s = formatted(SparkEntry.queries("h12_cascade_rerank")(spark, sfDir))
    // the 100-candidate stage-1 pool must BROADCAST into the embeddings
    // join (a shuffled join would repartition the corpus for 100 rows),
    // and nothing plans a cartesian pair — the 1-row query vector rides
    // a broadcast too
    assert(nodeCount(s, "BroadcastHashJoin") >= 1, s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0, s.take(1200))
    // ...and the final cut is a bounded window over the candidate pool,
    // not a corpus sort
    assert(s.contains("Window"), s.take(1200))
  }

  test("d25 dup passages: hash-join on gram hashes, no pairwise doc join") {
    val s = try formatted(SparkEntry.queries("d25_dup_passages")(spark, sfDir))
    finally spark.catalog.clearCache() // d25 persists its gram table
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
    assert(s.contains("InMemoryTableScan") || s.contains("TableCacheQueryStage"),
      "both branches must read the persisted gram table, not re-derive it: " +
        s.take(1200))
  }

  test("d48 span dedup: gram-hash shuffles + per-doc window, never a pair join") {
    val s = try formatted(SparkEntry.queries("d48_span_dedup")(spark, sfDir))
    finally spark.catalog.clearCache() // spanProfile persists its gram table
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
    // duplicated-gram detection must be the semi-join back onto the
    // posting list, and the interval merge a per-doc window
    assert(s.contains("LeftSemi"), s.take(1200))
    assert(s.contains("Window"), s.take(1200))
    assert(s.contains("InMemoryTableScan") || s.contains("TableCacheQueryStage"),
      "df-filter and semi-join must share the persisted gram table: " +
        s.take(1200))
  }

  test("geo1 bucketed reverse geocode: points never shuffle — ring join broadcasts") {
    val s = formatted(SparkEntry.queries("geo1_reverse_geocode")(spark, sfDir))
    assert(nodeCount(s, "BroadcastHashJoin") >= 1,
      "the cell-ring candidate table must broadcast: " + s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0,
      "the gazetteer must never cross-join the points: " + s.take(1200))
  }

  test("c23 served decontamination: shard-pruned index scan, eval side " +
      "broadcasts, corpus text never re-read") {
    val s = formatted(
      SparkEntry.queries("c23_decontaminate_served")(spark, sfDir))
    // the posting-table scan partition-prunes on the eval probe's shards
    val pf = s.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(_.contains("shard")),
      s"posting scan must partition-prune on shard:\n${pf.mkString("\n")}")
    // the tiny eval-gram side broadcasts — the join is map-side
    assert(nodeCount(s, "BroadcastHashJoin") >= 1, s.take(1500))
    // the corpus side reads (id, gh) longs from the index, never text —
    // the whole point of serving at rest: the ONLY text scan allowed is
    // the (tiny) eval side's
    val textScans = s.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("text:string")).size
    assert(textScans <= 1,
      s"only the eval side may read document text, got $textScans text scans")
  }

  test("a9 served verdicts: one parquet scan, no pair join, no dot " +
      "products - the sweep cost is gone from the serve plan") {
    val s = formatted(
      SparkEntry.queries("a9_semdedup_verdicts_at_rest")(spark, sfDir))
    assert(nodeCount(s, "BroadcastHashJoin") == 0 &&
      nodeCount(s, "SortMergeJoin") == 0 &&
      nodeCount(s, "ShuffledHashJoin") == 0,
      "the at-rest serve must not re-run the within-list pair join: " +
        s.take(1200))
    assert(!s.contains("dot_product"),
      "the serve plan must not recompute cosines: " + s.take(1200))
    // count scans in the executed tree only (the formatted dump repeats
    // the tree under == Initial Plan == and again in the details section)
    val tree = s.split(raw"== Initial Plan ==").head
    val scans = tree.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1,
      s"expected exactly the verdict-table scan, got $scans:\n${tree.take(1200)}")
  }

  test("geo1s served reverse geocode: the landed ring table broadcasts, " +
      "points never shuffle") {
    val s = formatted(
      SparkEntry.queries("geo1s_reverse_geocode_served")(spark, sfDir))
    assert(nodeCount(s, "BroadcastHashJoin") >= 1,
      "the landed cell-ring table must broadcast: " + s.take(1200))
    assert(nodeCount(s, "CartesianProduct") == 0 &&
      nodeCount(s, "BroadcastNestedLoopJoin") == 0, s.take(1200))
    // the points themselves must not shuffle pre-join: walk the join's
    // SUBTREE (the lines after the join at deeper indent — formatted
    // explain lists children below their parent) and require its only
    // Exchange to be the ring table's BroadcastExchange. The round-18
    // form of this assertion grepped the tree for 'Exchange
    // hashpartitioning', which the tree never prints (that string lives
    // in the details section) — it could not fail
    val tree = s.split(raw"== Initial Plan ==").head
    val lines = tree.linesIterator.toSeq
    def depth(l: String): Int = l.indexWhere(c => c.isLetter || c == '*')
    val joinIdx = lines.indexWhere(_.contains("BroadcastHashJoin"))
    assert(joinIdx >= 0, "expected a BroadcastHashJoin in the tree:\n" +
      s.take(1500))
    val jd = depth(lines(joinIdx))
    val subtree = lines.drop(joinIdx + 1)
      .takeWhile(l => depth(l) > jd || depth(l) < 0)
    assert(subtree.nonEmpty, "join subtree parse came up empty:\n" +
      lines.slice(joinIdx, joinIdx + 5).mkString("\n"))
    val shuffles = subtree.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles.isEmpty,
      "points shuffled before the ring join: " + shuffles.mkString("\n"))
  }

  test("pipe5 curriculum: no global or per-stratum window — every Window " +
      "partitions on a two-phase bin") {
    val s = try formatted(SparkEntry.queries("pipe5_curriculum")(spark, sfDir))
    finally spark.catalog.clearCache()
    // every Window node's partition spec must include a bin column
    // (hbin/kbin) — a Window partitioned on (epoch, stratum) alone or on
    // nothing would sort an unbounded stratum in one task
    val tree = s.split(raw"== Initial Plan ==").head
    val winDetails = s.split("\n\n").filter(_.contains("Window"))
      .filter(_.contains("windowspecdefinition"))
    assert(winDetails.nonEmpty, "expected Window details in plan")
    winDetails.foreach { d =>
      assert(d.contains("hbin") || d.contains("kbin"),
        s"a Window runs without a two-phase bin partition:\n${d.take(800)}")
    }
    assert(nodeCount(tree, "CartesianProduct") == 0, s.take(1200))
  }

  test("pipe4 span funnel: the rollup runs over the pinned attribution") {
    val s = try formatted(SparkEntry.queries("pipe4_span_funnel")(spark, sfDir))
    finally spark.catalog.clearCache()
    // the attribution (pipe1s artifact + span overlay) pins via
    // localCheckpoint before the funnel agg — the executed plan's only
    // input is that pinned RDD, never a re-derived corpus chain (no
    // parquet scans, no gram/shingle shuffles in the rollup itself)
    assert(s.contains("ExistingRDD"),
      "funnel rollup must read the pinned attribution: " + s.take(1500))
    assert(!s.contains("Scan parquet"),
      "the rollup re-derived state from parquet instead of the pin: " +
        s.take(1500))
    assert(nodeCount(s, "CartesianProduct") == 0, s.take(1200))
  }
}
