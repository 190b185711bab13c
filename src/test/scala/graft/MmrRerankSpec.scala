package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MmrRerank

class MmrRerankSpec extends AnyFunSuite {
  import SparkTestSession._

  private def df(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "emb")
  }

  test("MMR skips a near-duplicate that plain top-k would keep") {
    try {
      // candidate 11 duplicates candidate 10 exactly; 12 is slightly less
      // relevant but genuinely different. Plain top-2 = {10, 11}; MMR must
      // pick {10, 12}: the duplicate scores 7·980000 − 3·1000000 =
      // 3,860,000 while 12 scores ≈ 7·929535 − 3·849285 ≈ 3,958,890.
      val corpus = df(Seq(
        0L -> Seq(1.0, 0.0, 0.0),
        10L -> Seq(0.98, 0.199, 0.0),
        11L -> Seq(0.98, 0.199, 0.0),
        12L -> Seq(0.93, -0.31, 0.20)))
      val q = corpus.filter(col("vec_id") === 0L)
      val out = MmrRerank.diversifiedTopK(q, corpus, "vec_id", "emb",
          poolSize = 3, k = 2)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(out.toSeq == Seq((1L, 10L), (2L, 12L)),
        s"expected diversity pick, got ${out.toSeq}")
    } finally spark.catalog.clearCache()
  }

  test("first pick is the relevance argmax; equal scores break to smaller id") {
    try {
      val corpus = df(Seq(
        0L -> Seq(1.0, 0.0),
        // 20 and 21 are identical (same rel, same sims): ties → id 20 first
        20L -> Seq(0.9, 0.4358898943540674),
        21L -> Seq(0.9, 0.4358898943540674)))
      val q = corpus.filter(col("vec_id") === 0L)
      val out = MmrRerank.diversifiedTopK(q, corpus, "vec_id", "emb",
          poolSize = 2, k = 2)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(out.toSeq == Seq((1L, 20L), (2L, 21L)))
    } finally spark.catalog.clearCache()
  }

  test("zero-norm vectors are excluded instead of poisoning the pool") {
    try {
      // a NaN cosine would sort FIRST under rel DESC and crash the
      // integer lift — the all-zero vector must simply be absent
      val corpus = df(Seq(
        0L -> Seq(1.0, 0.0),
        30L -> Seq(0.0, 0.0),
        31L -> Seq(0.6, 0.8)))
      val q = corpus.filter(col("vec_id") === 0L)
      val out = MmrRerank.diversifiedTopK(q, corpus, "vec_id", "emb",
          poolSize = 2, k = 2)
        .collect().map(_.getLong(2))
      assert(out.toSeq == Seq(31L))
    } finally spark.catalog.clearCache()
  }

  test("executor-side greedy is identical to the driver-side reference") {
    try {
      // the flatMapGroups path (production) and the collect-and-loop path
      // (reference) share pool, sims, and the integer recurrence — their
      // outputs must match row for row on real embeddings
      val e = Tables(spark, sfDir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val exec = rows(MmrRerank.diversifiedTopK(
        q, e, "vec_id", "embedding", poolSize = 15, k = 5))
      val drv = rows(MmrRerank.diversifiedTopKDriver(
        q, e, "vec_id", "embedding", poolSize = 15, k = 5))
      assert(exec === drv)
      assert(exec.size === 15, "3 queries x top-5")
    } finally spark.catalog.clearCache()
  }

  test("a pool smaller than k yields pool-many rows, not a crash") {
    try {
      val corpus = df(Seq(0L -> Seq(1.0, 0.0), 5L -> Seq(0.6, 0.8)))
      val q = corpus.filter(col("vec_id") === 0L)
      val out = MmrRerank.diversifiedTopK(q, corpus, "vec_id", "emb",
        poolSize = 4, k = 4)
      assert(out.count() == 1)
    } finally spark.catalog.clearCache()
  }
}
