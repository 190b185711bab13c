package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfSearch

class IvfSearchSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val corpus = Tables(spark, sfDir, "embeddings")
  private lazy val index = IvfSearch.buildIndex(corpus, "vec_id", "embedding", k = 16, iters = 3)

  test("index partitions the whole corpus into k inverted lists") {
    assert(index.centroids.size == 16)
    assert(index.centroids.forall(_._2.length == 64))
    val n = corpus.count()
    assert(index.assignments.count() == n)
    val lists = index.assignments.groupBy("centroid_id").count().collect()
    assert(lists.map(_.getLong(1)).sum == n)
  }

  test("probing all lists reproduces the exact brute-force top-5") {
    val q = corpus.filter(col("vec_id") < 3)
    val full = IvfSearch.approxTopK(q, index, "vec_id", "embedding", k = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = queries.VectorOps.v1KnnBrute(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, s"nprobe=k must be exhaustive; diff=${(exact -- full).take(5)}")
  }

  test("nprobe=6 of 16 recalls a useful fraction on the adversarial uniform corpus") {
    val q = corpus.filter(col("vec_id") < 3)
    val approx = IvfSearch.approxTopK(q, index, "vec_id", "embedding", k = 5, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = queries.VectorOps.v1KnnBrute(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // uniform random vectors barely cluster — IVF's worst case; on real
    // clustered embeddings recall at nprobe/k=3/8 is far higher
    assert(recall >= 0.3, s"recall $recall")
    // and the probe actually pruned work: candidates ≪ corpus
    assert(approx.size <= 15)
  }

  test("BQ two-stage probe: a corpus-sized pool degenerates to the exact probe; small pools rerank only shortlisted rows") {
    val q = corpus.filter(col("vec_id") < 3)
    // pool >= candidate count → the Hamming shortlist keeps everything
    // and the rerank must be EXACTLY approxTopK (the composition adds
    // a stage, never drift)
    val n = corpus.count().toInt
    val full = IvfSearch.approxTopKBq(q, index, "vec_id", "embedding",
        k = 5, nprobe = 16, pool = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val plain = IvfSearch.approxTopK(q, index, "vec_id", "embedding",
        k = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(full == plain, "full-pool BQ probe must equal the plain probe bit for bit")
    // a small pool still fills k ranks per query (the shortlist is a
    // pre-filter, not a truncation of the ANSWER), and stays inside the
    // probed lists' candidates
    val small = IvfSearch.approxTopKBq(q, index, "vec_id", "embedding",
        k = 5, nprobe = 16, pool = 8)
      .collect()
    assert(small.length == 15, s"expected 3 queries x 5 ranks, got ${small.length}")
  }

  test("filtered search: every neighbor shares the query's label; full probe equals filtered brute force") {
    val q = corpus.filter(col("vec_id") < 3)
    val meta = corpus.select(col("vec_id"), col("label"))
    val got = IvfSearch.approxTopKFiltered(q, index, "vec_id", "embedding",
        k = 5, nprobe = 16, meta = meta, matchCol = "label")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val labels = meta.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the predicate really constrains the result set
    assert(got.nonEmpty && got.forall { case (qid, n) => labels(qid) == labels(n) })
    // nprobe=k is exhaustive, so the filtered answer must equal the
    // exact brute-force top-5 WITHIN the query's label class
    val eb = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
      col("label"))
    val dot = graft.functions.DotProduct.dotProduct _
    val qq = eb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("label").as("q_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val exact = broadcast(qq)
      .join(eb, col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .withColumn("cos", round(dot(col("q_emb"), col("emb")) /
        (sqrt(dot(col("q_emb"), col("q_emb"))) * sqrt(dot(col("emb"), col("emb")))), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert(got == exact, s"diff=${(exact -- got).take(5)} / ${(got -- exact).take(5)}")
  }

  test("saved index reloads and answers identically (build once, query many)") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    IvfSearch.saveIndex(index, dir)
    val loaded = IvfSearch.loadIndex(spark, dir)
    assert(loaded.centroids == index.centroids,
      "centroids must round-trip bit-exactly")
    // one inverted list per parquet partition directory — the at-rest
    // layout that lets a probe's dynamic partition pruning skip lists
    val listDirs = new java.io.File(s"$dir/assignments")
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("centroid_id="))
    assert(listDirs == index.centroids.size, s"got $listDirs list dirs")
    val q = corpus.filter(col("vec_id") < 3)
    def run(ix: IvfSearch.Index) =
      IvfSearch.approxTopK(q, ix, "vec_id", "embedding", k = 5, nprobe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(run(loaded) == run(index),
      "loaded index must answer exactly like the in-memory one")
  }
}
