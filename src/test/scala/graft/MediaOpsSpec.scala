package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaOps

/** Multimodal plumbing: schemas, partitioning, batch shape, and
  * deterministic stub behavior. */
class MediaOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val media = MediaOps.mediaFromDocuments(spark, sfDir)

  test("media table partitions kinds deterministically") {
    import spark.implicits._
    val kinds = media.groupByKey(_.kind).count().collect().toMap
    assert(kinds.keySet == Set("image", "video"))
    assert(kinds.values.sum == 500)
  }

  test("decodeImages yields one feature row per image with stable values") {
    val feats = MediaOps.decodeImages(media, parallelism = 4)
    val n = media.filter(_.kind == "image").count()
    assert(feats.count() == n)
    val f = feats.filter(_.media_id == 1L).collect()(0)
    assert(f.embedding.length == 64)
    assert(f.width >= 64 && f.width < 192 && f.channels >= 1 && f.channels <= 4)
    // deterministic across runs
    val again = MediaOps.decodeImages(media, parallelism = 2)
      .filter(_.media_id == 1L).collect()(0)
    assert(again.width == f.width && again.embedding.toSeq == f.embedding.toSeq)
  }

  test("decodeImages runs with the requested partitioning") {
    val feats = MediaOps.decodeImages(media, parallelism = 3)
    assert(feats.rdd.getNumPartitions == 3)
  }

  test("sampleFrames explodes videos into frame rows") {
    val frames = MediaOps.sampleFrames(media, everyN = 2).collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.media_id)
    // frame numbers are 0,2,4,... and bytes differ per frame
    byId.values.foreach { fs =>
      assert(fs.map(_.frame_no).sorted.toSeq == fs.map(_.frame_no).sorted.distinct.toSeq)
      assert(fs.forall(_.frame_no % 2 == 0))
      assert(fs.map(_.frame_bytes.toSeq).distinct.length == fs.length)
    }
  }

  test("resize preserves row count and tags metadata") {
    val resized = MediaOps.resizeImages(media, 224, 224)
    assert(resized.count() == media.count())
    assert(resized.filter(_.kind == "image").collect()
      .forall(_.mime.contains("resized=224x224")))
  }

  test("feature table feeds the ANN operator unchanged") {
    val feats = MediaOps.decodeImages(media, parallelism = 4)
    val emb = MediaOps.toEmbeddingTable(feats)
    assert(emb.columns.toSeq == Seq("vec_id", "embedding"))
    // brute-force cosine over the fake 8-dim features runs end-to-end
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 2)
    val topk = graft.operators.AnnSearch.approxTopK(q, emb, "vec_id", "embedding", 3)
    assert(topk.count() > 0)
  }
}
