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
