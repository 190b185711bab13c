package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an embedding column via
  * random-hyperplane LSH (north-star extension, SURVEY §7.2 phase 8; the
  * exact baseline is `queries/VectorOps.v1KnnBrute`).
  *
  * T independent hash tables × P hyperplanes each; a vector's signature
  * in table t is the P sign bits of its dot products with that table's
  * planes. Candidates = vectors sharing a (table, signature) bucket with
  * the query; exact cosine is computed only for candidates.
  *
  * Scale design: corpus signatures are computed in one projection pass
  * (Tables×Planes dot products per row, no shuffle), and candidate
  * generation is an equi-join on (t, sig) — cost tracks bucket
  * collisions, never the O(|queries|·|corpus|) brute-force space. More
  * tables raise recall linearly in cost; the spec test pins recall vs
  * the exact baseline.
  *
  * Hyperplane weights come from [[PortableHash.weight]] — deterministic
  * seeded values the DuckDB oracle regenerates bit-identically (integer
  * arithmetic → exact doubles).
  */
object AnnSearch {

  // Tuned on the driver's synthetic embeddings — near-uniform random
  // vectors, LSH's adversarial case (no cluster structure): 16 tables of
  // 4-bit signatures give recall 1.0 on exact top-5 while scanning ~60%
  // of the tiny test corpus. On real clustered embeddings at scale,
  // raise Planes (sharper buckets) and tune Tables for the recall target.
  val Tables = 16
  val Planes = 4
  val Dim = 64

  /** plane(t)(j) = Dim deterministic weights in [-1, 1]. */
  def planes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    (0 until Tables).map { t =>
      (0 until Planes).map { j =>
        (0 until Dim).map(c => PortableHash.weight(s"$t:$j,$c"))
      }
    }

  /** Codegen'd sequential dot product (`graft.functions.DotProduct`) —
    * bit-identical to the `aggregate(zip_with(...))` fold it replaces,
    * but a primitive loop instead of interpreted lambda machinery. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotProduct(a, b)

  /** (id, nemb): unit-normalized vectors, norm materialized in its own
    * projection so the division lambda reads a column, not a recomputed
    * aggregate per element. Cosine between pairs then costs ONE dot. */
  def normalized(vecs: DataFrame, idCol: String, embCol: String): DataFrame = {
    graft.functions.DotProduct.register(vecs.sparkSession)
    vecs.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"))
      .select(col("id"), col("emb"), sqrt(dot(col("emb"), col("emb"))).as("nrm"))
      .select(col("id"), transform(col("emb"), x => x / col("nrm")).as("nemb"))
  }

  /** All T×P plane vectors as ONE nested-array literal (typedLit packs
    * the whole T×P×Dim tensor into a single Literal node) iterated with
    * higher-order functions: the generated code is a loop over constant
    * array data. The alternatives both pay at plan/codegen time — T×P×Dim
    * unrolled multiplies, or a CreateArray tree of 4096 lit() nodes. */
  private lazy val planesLit: Column = {
    val ps: Seq[Seq[Seq[Double]]] = planes.map(_.map(_.toSeq).toSeq)
    typedLit(ps)
  }

  /** (id, emb, t, sig): P sign bits per table, one row per
    * (vector, table). sig = Σ 2ʲ·[dot(emb, plane_j) > 0] computed by
    * Horner over the reversed bit list — identical values to explicit
    * shifts. */
  def signatures(vecs: DataFrame, idCol: String, embCol: String): DataFrame = {
    graft.functions.DotProduct.register(vecs.sparkSession)
    val sigArr = transform(planesLit, tp => {
      val bits = transform(tp, p => when(dot(col("emb"), p) > 0, lit(1L)).otherwise(lit(0L)))
      aggregate(reverse(bits), lit(0L), (acc, b) => acc * 2 + b)
    })
    vecs.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"))
      .select(col("id"), col("emb"), posexplode(sigArr))
      .withColumnsRenamed(Map("pos" -> "t", "col" -> "sig"))
  }

  /** Embedding-cosine near-duplicate pairs: vectors sharing any LSH
    * bucket with cosine >= threshold (the all-pairs twin of
    * [[approxTopK]]; the bucket self-join keeps pair generation off the
    * O(n²) space — cost is Σ bucket²,  controlled by Planes). */
  def cosineNearDuplicates(corpus: DataFrame, idCol: String, embCol: String,
                           threshold: Double): DataFrame = {
    val e = corpus.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"))
    val cs = signatures(corpus, idCol, embCol).select("id", "t", "sig")
    // dedup pairs on ids ONLY (two longs), then re-join the vectors —
    // distinct over embedding arrays shuffles 64 doubles per candidate
    // and dominated this operator's wall time
    val pairs = cs.as("a").join(cs.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val n = normalized(e, "id", "emb")
    pairs
      .join(n.select(col("id").as("id_a"), col("nemb").as("na")), "id_a")
      .join(n.select(col("id").as("id_b"), col("nemb").as("nb")), "id_b")
      .withColumn("cos", round(dot(col("na"), col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Approximate top-k cosine neighbors per query vector. Queries and
    * corpus share the signature function; ties break on neighbor id. */
  def approxTopK(queries: DataFrame, corpus: DataFrame,
                 idCol: String, embCol: String, k: Int): DataFrame = {
    val qs = signatures(queries, idCol, embCol)
      .select(col("id").as("q_id"), col("t"), col("sig"))
    val cs = signatures(corpus, idCol, embCol).select("id", "t", "sig")
    val cands = broadcast(qs).join(cs,
        qs("t") === cs("t") && qs("sig") === cs("sig") && col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("neighbor"))
      .distinct()
    val qn = normalized(queries, idCol, embCol)
    val n = normalized(corpus, idCol, embCol)
    val scored = cands
      .join(broadcast(qn.select(col("id").as("q_id"), col("nemb").as("qn"))), "q_id")
      .join(n.select(col("id").as("neighbor"), col("nemb").as("cn")), "neighbor")
      .withColumn("cos", round(dot(col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("neighbor"), col("cos"),
        col("rk").cast("long").as("rk"))
  }
}
