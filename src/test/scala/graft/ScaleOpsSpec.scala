package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnSearch, MinHashDedup, PortableHash, SimHash}
import graft.queries.VectorOps

/** Quality checks for the approximate scale operators against their exact
  * baselines (the DuckDB oracle pins the *values*; these pin the
  * *approximation quality*). */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PortableHash column and driver forms agree") {
    import spark.implicits._
    val strs = Seq("hello", "the quick brown", "0:abc", "")
    val fromEngine = strs.toDF("s")
      .select(PortableHash.hex60(col("s"))).collect().map(_.getLong(0))
    val fromDriver = strs.map(PortableHash.hex60)
    assert(fromEngine.toSeq == fromDriver)
  }

  test("ANN top-5 has recall >= 0.8 vs exact brute-force kNN") {
    val exact = VectorOps.v1KnnBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = queries.ScaleOps.a1AnnTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"ANN recall $recall below 0.8 (got ${approx.size} pairs)")
  }

  test("SQ8 coarse+rerank top-5 has recall >= 0.8 vs exact brute-force kNN") {
    val exact = VectorOps.v1KnnBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = VectorOps.v8Sq8Rerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 rerank recall $recall below 0.8")
  }

  test("MinHash candidates recover exact 3-shingle Jaccard>=0.7 pairs (recall >= 0.9)") {
    val docs = Tables(spark, sfDir, "documents").filter(col("doc_id") < 100)
    // exact pairwise 3-shingle Jaccard on the small block, computed directly
    val sh = MinHashDedup.shingles(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    val ids = sh.keys.toSeq.sorted
    val exact = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      jac = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if jac >= 0.7
    } yield (a, b)).toSet
    assert(exact.nonEmpty, "test block has no high-similarity pairs — not a meaningful check")
    val cands = MinHashDedup.candidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & cands).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall on ${exact.size} exact pairs")
  }

  test("MinHash near-dup jaccard values match the exact computation") {
    val docs = Tables(spark, sfDir, "documents").filter(col("doc_id") < 100)
    val nd = MinHashDedup.nearDuplicates(docs, "doc_id", "text", 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact pairs computed over 3-shingles differ from d6's unigram sets;
    // recompute the exact jaccard on the same shingle definition
    val sh = MinHashDedup.shingles(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    nd.foreach { case ((a, b), j) =>
      val exact = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      assert(math.abs(j - exact) < 1e-6, s"pair ($a,$b): engine $j vs exact $exact")
    }
  }

  test("SimHash: identical docs collide at hamming 0, fingerprints are stable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document about spark execution engines")
    ).toDF("doc_id", "text")
    val pairs = SimHash.nearDuplicates(docs, "doc_id", "text", 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
    val fps = SimHash.fingerprints(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("SimHash multi-band blocking finds EXACTLY the Hamming<=4 pair set") {
    import spark.implicits._
    // crafted corpus: identical pairs (hamming 0), near-identical variants
    // (small hamming), and unrelated filler — plus the assertion that the
    // banded join returns the same set as brute-force all-pairs Hamming,
    // i.e. recall 1.0 at maxHamming = NumBands - 1 (the pigeonhole bound)
    val base = (0 until 10).map(i =>
      (100L + i, s"cluster $i shares a long common body of tokens alpha beta gamma delta epsilon zeta eta theta"))
    val dup = base.map { case (id, t) => (id + 50, t) } // exact duplicates
    val variant = base.map { case (id, t) => (id + 100, t + s" extra${id}") }
    val filler = (0 until 30).map(i =>
      (300L + i, s"unrelated document number $i with completely different words w${i}a w${i}b w${i}c w${i}d"))
    val docs = (base ++ dup ++ variant ++ filler).toDF("doc_id", "text")
    val fps = SimHash.fingerprints(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= SimHash.NumBands - 1
    } yield (ia, ib, h)).toSet
    assert(exact.nonEmpty, "crafted corpus produced no close pairs")
    val got = SimHash.nearDuplicates(docs, "doc_id", "text", SimHash.NumBands - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exact,
      s"banded != exact: missed ${(exact -- got).take(5)}, spurious ${(got -- exact).take(5)}")
  }

  test("SimHash banding is exact on the sf0.001 documents table too") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val fps = SimHash.fingerprints(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 4
    } yield (ia, ib, h)).toSet
    val got = SimHash.nearDuplicates(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exact)
  }

  test("incremental MinHash dedup rejects a batch whose ids already exist in the corpus") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val corpus = docs.filter(col("doc_id") < 250)
    val replayed = docs.filter(col("doc_id") >= 240 && col("doc_id") < 260)
    val e = intercept[IllegalArgumentException](graft.operators.MinHashDedup
      .nearDuplicatesAgainst(corpus, replayed, "doc_id", "text", 0.3).count())
    assert(e.getMessage.contains("already present"), e.getMessage)
  }

  test("incremental MinHash dedup equals the one-shot pair set restricted to new docs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
    val got = graft.operators.MinHashDedup
      .nearDuplicatesAgainst(corpus, fresh, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val newIds = fresh.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = graft.operators.MinHashDedup
      .nearDuplicates(docs, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => newIds(t._1) || newIds(t._2)).toSet
    assert(want.nonEmpty, "split produced no pairs touching the new batch — weak fixture")
    assert(got == want,
      s"incremental-only=${(got -- want).take(5)}, batch-only=${(want -- got).take(5)}")
    spark.catalog.clearCache()
  }

  test("index-backed incremental sweep equals the from-text sweep; bands co-locate") {
    import graft.operators.MinHashDedup
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
    MinHashDedup.saveDedupIndex(
      MinHashDedup.buildDedupIndex(corpus, "doc_id", "text"), "dedup_idx", buckets = 8)
    try {
      val loaded = MinHashDedup.loadDedupIndex(spark, "dedup_idx")
      val got = MinHashDedup
        .nearDuplicatesAgainstIndex(loaded, fresh, "doc_id", "text", 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = MinHashDedup
        .nearDuplicatesAgainst(corpus, fresh, "doc_id", "text", 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(want.nonEmpty && got == want,
        s"index-only=${(got -- want).take(5)}, text-only=${(want -- got).take(5)}")
      // the at-rest point: the bands table is bucketed on its probe key,
      // so a join on (band, sig) reads it in place — zero exchanges when
      // both sides share the layout (same property as the S5 bucketed sink)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val b = spark.table("dedup_idx_bands")
        val j = b.as("x").join(b.as("y"), Seq("band", "sig"))
        j.collect()
        assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
          "bucketed band table must join on (band, sig) without a shuffle")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      Seq("dedup_idx_bands", "dedup_idx_shingles", "dedup_idx_sizes")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("DistributedPercentile equals the built-in percentile() bit-for-bit") {
    val li = graft.Tables(spark, sfDir, "lineitem")
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val dist = graft.operators.DistributedPercentile.groupPercentiles(
      li, "l_returnflag", "l_quantity", Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(dist == builtin)
  }

  test("DistributedPercentile ignores NULLs like percentile()/quantile_cont") {
    import spark.implicits._
    val df = Seq(("a", Some(10.0)), ("a", None), ("a", Some(20.0)), ("a", Some(30.0)),
      ("b", Some(5.0)), ("b", None))
      .toDF("k", "v")
    val got = graft.operators.DistributedPercentile
      .groupPercentiles(df, "k", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 20.0, "b" -> 5.0), got)
  }

  test("DistributedPercentile surfaces all-NULL groups with NULL values like percentile()") {
    import spark.implicits._
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("c", None), ("c", None))
      .toDF("k", "v")
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    val builtin = norm(df.groupBy(col("k"))
      .agg(expr("percentile(v, 0.5)").as("p50")).orderBy("k").collect())
    val got = norm(graft.operators.DistributedPercentile
      .groupPercentiles(df, "k", "v", Seq("p50" -> 0.5)).collect())
    assert(got == builtin, s"got $got vs builtin $builtin")
    assert(got.contains(("c", None)), "all-NULL group must surface with NULL value")
  }

  test("DistributedPercentile computes a NULL group KEY like percentile()") {
    import spark.implicits._
    // a NULL key whose VALUES are non-NULL is a real group to
    // percentile()/quantile_cont — null-unsafe key joins would silently
    // null its percentiles out
    val df = Seq((Some("a"), Some(10.0)), (Some("a"), Some(20.0)),
      (None, Some(4.0)), (None, Some(8.0)), (None, None))
      .toDF("k", "v")
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (if (r.isNullAt(0)) None else Some(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    val builtin = norm(df.groupBy(col("k"))
      .agg(expr("percentile(v, 0.5)").as("p50")).collect())
    val got = norm(graft.operators.DistributedPercentile
      .groupPercentiles(df, "k", "v", Seq("p50" -> 0.5)).collect())
    assert(got == builtin, s"got $got vs builtin $builtin")
    assert(got.contains((None, Some(6.0))), "NULL key group must get real percentiles")
  }

  test("i1IvfTopk releases the IVF index cache (no persisted RDDs leaked)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = queries.ScaleOps.i1IvfTopk(spark, sfDir)
    assert(res.count() > 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDD ids: $leaked")
  }

  test("VectorQuant SQ8: codes in [-127,127], reconstruction error <= scale/2") {
    val rows = queries.VectorOps.v4QuantizeInt8(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val codes = r.getString(2).split(",").map(_.toInt)
      val err = r.getDouble(3)
      assert(codes.length == 64 && codes.forall(c => c >= -127 && c <= 127))
      assert(err <= scale / 2 + 1e-12,
        s"vec ${r.getLong(0)}: err $err exceeds the half-step bound ${scale / 2}")
    }
  }

  test("SQ8-dequantized brute-force top-5 closely preserves exact kNN ranking") {
    import graft.operators.VectorQuant._
    import org.apache.spark.sql.expressions.Window
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotProduct.dotProduct(a, b)
    def top5(corpus: org.apache.spark.sql.DataFrame) = {
      val q = corpus.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      val scored = org.apache.spark.sql.functions.broadcast(q)
        .join(corpus, col("vec_id") =!= col("q_id"))
        .withColumn("cos", dot(col("q_emb"), col("emb")) /
          (sqrt(dot(col("q_emb"), col("q_emb"))) * sqrt(dot(col("emb"), col("emb")))))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val deq = e.withColumn("scale", sq8Scale(col("emb")))
      .select(col("vec_id"),
        sq8Dequant(sq8Codes(col("emb"), col("scale")), col("scale")).as("emb"))
    val exact = top5(e)
    val quant = top5(deq)
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 recall $recall < 0.8 (exact=$exact quant=$quant)")
  }

  test("AnnSearch planes are deterministic and in [-1,1]") {
    val ps = AnnSearch.planes
    assert(ps.length == AnnSearch.Tables)
    assert(ps.forall(_.forall(_.forall(w => w >= -1.0 && w <= 1.0))))
    assert(ps == AnnSearch.planes) // pure function of seeds
  }

  test("i10 at-rest baseline variant equals the self-contained retrain loop") {
    val self = graft.queries.ScaleOps.queries("i10_retrain_loop")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val atRest = graft.queries.ScaleOps.queries("i10b_retrain_at_rest")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(atRest == self, s"$atRest vs $self")
    // the artifact landed marker-last and is reused on the second call
    val again = graft.queries.ScaleOps.queries("i10b_retrain_at_rest")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(again == self)
    spark.catalog.clearCache()
  }

  test("a9 verdicts-at-rest equals a4's in-memory sweep bit-for-bit; " +
      "the second serve reuses the landed verdict log") {
    import graft.queries.ScaleOps
    val a4 = ScaleOps.queries("a4_semdedup")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val a9 = ScaleOps.queries("a9_semdedup_verdicts_at_rest")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a9 == a4, s"a9 $a9 vs a4 $a4")
    // the verdict log landed marker-last; a second serve reads it without
    // re-running the pair join / components (no file under the root moves)
    def verdictMtimes(): Seq[Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      Option(ScaleOps.artifactBase.toFile.listFiles).toSeq.flatten
        .filter(_.getName.startsWith("a9_"))
        .flatMap(walk)
        .filterNot(_.getName == "_SERVED") // the serve stamp moves per call
        .map(_.lastModified).sorted
    }
    val before = verdictMtimes()
    assert(before.nonEmpty, "expected a landed a9 artifact")
    val again = ScaleOps.queries("a9_semdedup_verdicts_at_rest")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(again == a4)
    assert(verdictMtimes() == before, "second serve must not rebuild")
    spark.catalog.clearCache()
  }

  test("artifact manifest reports landed roots; GC keeps each family's " +
      "freshest fingerprint and evicts the rest") {
    import graft.queries.ScaleOps
    val base = ScaleOps.artifactBase
    java.nio.file.Files.createDirectories(base)
    def mkRoot(name: String, servedAt: Long): java.nio.file.Path = {
      val r = base.resolve(name)
      java.nio.file.Files.createDirectories(r)
      java.nio.file.Files.write(r.resolve("data.bin"), Array[Byte](1, 2, 3))
      java.nio.file.Files.write(r.resolve("_STATE_OK"), Array.emptyByteArray)
      java.nio.file.Files.write(r.resolve("_SERVED"), Array.emptyByteArray)
      java.nio.file.Files.setLastModifiedTime(r.resolve("_SERVED"),
        java.nio.file.attribute.FileTime.fromMillis(servedAt))
      r
    }
    val now = System.currentTimeMillis()
    val old = mkRoot("gcxtest_oldfp", now - 3600 * 1000L)
    val cur = mkRoot("gcxtest_newfp", now)
    try {
      val rows = ScaleOps.artifactManifest().filter(_.family == "gcxtest")
      assert(rows.map(_.fingerprint).toSet == Set("oldfp", "newfp"), s"$rows")
      assert(rows.forall(_.bytes >= 3L), s"$rows")
      assert(rows.forall(_.builtAt > 0L), s"$rows")
      val evicted = ScaleOps.gcArtifacts()
      assert(evicted.contains(("gcxtest", "oldfp")), s"evicted: $evicted")
      assert(!java.nio.file.Files.exists(old), "stale root must be gone")
      assert(java.nio.file.Files.exists(cur.resolve("_STATE_OK")),
        "current root must survive")
      // idempotent: a single-root family is never evicted
      assert(!ScaleOps.gcArtifacts().exists(_._1 == "gcxtest"))
    } finally graft.sources.Sources.deleteRecursively(cur.toFile)
  }

  test("c18s shared artifact: lineage reads reuse one landed drive; second call builds nothing") {
    import graft.queries.{CorpusOps, ScaleOps}
    val q = CorpusOps.queries
    val first = q("c20_asof_clusters")(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(first.nonEmpty)
    // the drive landed marker-last under the shared c18s root
    val root = ScaleOps.artifactRoot("c18s",
      ScaleOps.dataFingerprint(sfDir, Seq("documents")))
    val marker = root.resolve("_STATE_OK")
    assert(java.nio.file.Files.exists(marker))
    val markerTime = java.nio.file.Files.getLastModifiedTime(marker)
    def stateMtimes(): Map[String, Long] = {
      val st = new java.io.File(root.resolve("state").toString)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(st).map(f => f.getPath -> f.lastModified).toMap
    }
    val before = stateMtimes()
    // c21 and c19 serve from the SAME artifact — no second drive, no
    // state rewrite; c20 re-read answers identically
    val reps = q("c21_asof_reps")(spark, sfDir).collect()
    assert(reps.nonEmpty)
    val corpus = q("c19_asof_corpus")(spark, sfDir).collect()
    assert(corpus.length == 3)
    val again = q("c20_asof_clusters")(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(again == first)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == markerTime,
      "the marker was rewritten — a second call re-drove the waves")
    assert(stateMtimes() == before,
      "serving reads must not rewrite any landed state file")
    spark.catalog.clearCache()
  }

  test("c22 changelog: entered minus removed reconciles to c19's per-frontier deltas") {
    val q = graft.queries.CorpusOps.queries
    val corpus = q("c19_asof_corpus")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val log = q("c22_corpus_changelog")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(log.map(_._1).toSeq == Seq(1L, 2L))
    log.foreach { case (n, ne, te, nr, tr) =>
      val (dPrev, tPrev) = corpus(n - 1)
      val (dCur, tCur) = corpus(n)
      assert(ne - nr == dCur - dPrev,
        s"transition $n: entered $ne - removed $nr != doc delta ${dCur - dPrev}")
      assert(te - tr == tCur - tPrev,
        s"transition $n: token movement $te-$tr != token delta ${tCur - tPrev}")
    }
    // the fixture must exercise BOTH directions of movement: arrivals
    // every wave, and at least one retro-drop (the pair that surfaced
    // only when its later endpoint arrived)
    assert(log.forall(_._2 > 0), "a transition landed no documents")
    assert(log.exists(_._4 > 0), "no retro-drop in the fixture")
    spark.catalog.clearCache()
  }

  test("d32s merge-table artifact: encode and fertility reuse ONE landed training") {
    import graft.queries.{ScaleOps, TextOps}
    val first = TextOps.queries("d33_bpe_encode")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(first.nonEmpty)
    val root = ScaleOps.artifactRoot("d32s",
      ScaleOps.dataFingerprint(sfDir, Seq("documents")))
    val marker = root.resolve("_STATE_OK")
    assert(java.nio.file.Files.exists(marker))
    val markerTime = java.nio.file.Files.getLastModifiedTime(marker)
    def tableMtimes(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(root.resolve("merges").toFile).map(f => f.getPath -> f.lastModified).toMap
    }
    val before = tableMtimes()
    // a DIFFERENT family member must serve from the same landed table...
    assert(TextOps.queries("d44_bpe_fertility")(spark, sfDir).collect().nonEmpty)
    // ...and a repeat of the first builds nothing either
    val again = TextOps.queries("d33_bpe_encode")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(again == first)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == markerTime,
      "the marker was rewritten — a second call re-trained the tokenizer")
    assert(tableMtimes() == before,
      "an encode read must not rewrite the landed merge table")
    // the landed table IS the from-scratch training, bit for bit — the
    // artifact short-cuts cost, never the answer
    val landed = spark.read.parquet(root.resolve("merges").toString)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("weight"))).sortBy(_._1).toSeq
    val fresh = graft.operators.BpeTrain
      .learnMerges(Tables(spark, sfDir, "documents"), "text", TextOps.BpeMerges)
      .map(m => (m.rank, m.left, m.right, m.weight))
    assert(landed == fresh, "landed merge table diverges from a fresh training")
    spark.catalog.clearCache()
  }

  test("g1s edge artifact: PageRank reuses the landed pair set; second call builds nothing") {
    import graft.queries.{CorpusOps, ScaleOps}
    val first = CorpusOps.queries("g1_pagerank_neardup")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(first.nonEmpty)
    val root = ScaleOps.artifactRoot("g1s",
      ScaleOps.dataFingerprint(sfDir, Seq("documents")))
    val marker = root.resolve("_STATE_OK")
    assert(java.nio.file.Files.exists(marker))
    val markerTime = java.nio.file.Files.getLastModifiedTime(marker)
    def edgeMtimes(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(root.resolve("edges").toFile).map(f => f.getPath -> f.lastModified).toMap
    }
    val before = edgeMtimes()
    val again = CorpusOps.queries("g1_pagerank_neardup")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(again == first)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == markerTime,
      "the marker was rewritten — a second call re-derived the pairs")
    assert(edgeMtimes() == before,
      "a PageRank read must not rewrite the landed edge list")
    spark.catalog.clearCache()
  }

  test("h4 as-of hybrid differs from the final-frontier fusion (real lineage, not a re-rank)") {
    val q = graft.queries.HybridOps.queries
    val asOf = q("h4_asof_hybrid")(spark, sfDir).collect().map(_.toSeq).toSeq
    val now = q("h2_rolling_hybrid")(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(asOf.length == now.length) // both HTopK rows
    assert(asOf != now,
      "the as-of fusion must answer from the earlier frontier — equal " +
        "answers mean the stale keyword corpus or the wave-0 index " +
        "visibility leaked to the final frontier")
    spark.catalog.clearCache()
  }

  test("buildOnce: concurrent first callers build exactly once, losers see the marker") {
    import graft.queries.ScaleOps
    val fam = s"specbo${System.nanoTime()}"
    val root = ScaleOps.artifactRoot(fam, "fp0")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { _ =>
      new Thread(() =>
        try ScaleOps.buildOnce(fam, root) {
          // no two builders may ever overlap inside the guarded section
          assert(inside.incrementAndGet() == 1, "two builds interleaved")
          Thread.sleep(50)
          builds.incrementAndGet()
          inside.decrementAndGet()
        } catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing builder threw: ${Option(errs.peek())}")
    assert(builds.get() == 1, s"${builds.get()} builds ran — the race fired")
    assert(java.nio.file.Files.exists(root.resolve("_STATE_OK")))
    graft.sources.Sources.deleteRecursively(root.toFile)
    // the per-run-unique family would otherwise leak one lock file into
    // the user-global artifact cache per test execution, forever
    java.nio.file.Files.deleteIfExists(
      ScaleOps.artifactBase.resolve(s".lock_$fam"))
  }

  test("family lock: a concurrent stale-fingerprint prune blocks until an in-flight build lands") {
    import graft.queries.ScaleOps
    val fam = s"specfl${System.nanoTime()}"
    val rootA = ScaleOps.artifactRoot(fam, "fpa")
    val payload = rootA.resolve("state").resolve("part.bin")
    val entered = new java.util.concurrent.CountDownLatch(1)
    val pruneReturned = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val builder = new Thread(() =>
      try ScaleOps.buildOnce(fam, rootA) {
        java.nio.file.Files.createDirectories(payload.getParent)
        java.nio.file.Files.write(payload, Array[Byte](1))
        entered.countDown()
        Thread.sleep(300)
        // the other session's artifactRoot(fpb) is already underway: if
        // its prune were not excluded by the family lock, the payload
        // would be gone and the prune call already returned
        assert(!pruneReturned.get,
          "the prune ran while this build held the family lock")
        assert(java.nio.file.Files.exists(payload),
          "the prune deleted in-flight build state")
      } catch { case t: Throwable => errs.add(t) })
    builder.start()
    entered.await()
    // a second "session" touches the family with a NEW fingerprint: its
    // stale-sibling prune must block until the build completes, then
    // leave exactly one survivor per family
    val rootB = ScaleOps.artifactRoot(fam, "fpb")
    pruneReturned.set(true)
    builder.join()
    assert(errs.isEmpty, s"builder thread failed: ${Option(errs.peek())}")
    assert(!java.nio.file.Files.exists(rootA),
      "stale fingerprint must be pruned once the build released the lock")
    graft.sources.Sources.deleteRecursively(rootB.toFile)
    java.nio.file.Files.deleteIfExists(
      ScaleOps.artifactBase.resolve(s".lock_$fam"))
  }

  test("v9 top eigen: PSD spectrum, unit-ish eigenvector, deterministic reruns") {
    val rows = graft.queries.VectorOps.v9TopEigen(spark, sfDir).collect()
    assert(rows.length == 8)
    val lambda = rows.head.getDouble(2)
    // T = Σ x·xᵀ is PSD, so the dominant eigenvalue is positive and at
    // most the trace (≈ Σ ||x||² = n on a unit-normalized corpus)
    assert(lambda > 0.0, s"PSD matrix cannot have top eigenvalue $lambda")
    val again = graft.queries.VectorOps.v9TopEigen(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "power iteration must be bit-deterministic")
  }
}
