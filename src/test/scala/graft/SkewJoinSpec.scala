package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals the plain inner join on skewed data") {
    import spark.implicits._
    // one hot key carrying 80% of the fact side + a tail, some fact keys
    // with no dim match and one dim key with no fact rows
    val fact = ((1 to 8000).map(i => (7L, i.toLong, i * 1.5)) ++
      (1 to 2000).map(i => ((i % 37).toLong, (10000 + i).toLong, i * 0.5)))
      .toDF("fk", "row_id", "v").repartition(8)
    val dim = (0L to 40L).map(k => (k, s"name$k")).toDF("dk", "dname")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "row_id", "v", "dname")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "fk", "dk",
        saltBy = "row_id", salts = 8)
      .select("fk", "row_id", "v", "dname")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("NULL saltBy values fall back to salt 0 instead of dropping rows") {
    import spark.implicits._
    val fact = Seq((1L, Some(10L)), (1L, None), (2L, None))
      .toDF("fk", "maybe_salt")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("dk", "dname")
    val out = SkewJoin.saltedInnerJoin(fact, dim, "fk", "dk",
        saltBy = "maybe_salt", salts = 4)
    // all three fact rows have matching keys; the NULL-salt rows must survive
    assert(out.count() == 3)
  }

  test("salt column name collisions and same-name keys are rejected") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "_salt")
    val dim = Seq((1L, "x")).toDF("dk", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(df, dim, "k", "dk", saltBy = "k")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(Seq((1L, 2L)).toDF("k", "r"),
        Seq((1L, "x")).toDF("k", "v"), "k", "k", saltBy = "r")
    }
  }

  test("adaptive salting: identical to plain join, only hot keys replicated") {
    import spark.implicits._
    val fact = ((1 to 8000).map(i => (7L, i.toLong, i * 1.5)) ++
      (1 to 2000).map(i => ((i % 37).toLong, (10000 + i).toLong, i * 0.5)))
      .toDF("fk", "row_id", "v").repartition(8)
    val dim = (0L to 40L).map(k => (k, s"name$k")).toDF("dk", "dname")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "row_id", "v", "dname")
      .collect().map(_.toSeq).toSet
    // detect the hot key with the CMS detector and feed it in — the
    // production composition (heavyHitters -> adaptiveSaltedInnerJoin)
    val hot = graft.operators.ApproxOps.heavyHitters(
        fact.select(col("row_id"), col("fk").cast("string").as("k")),
        "k", minShare = 0.5, idCol = Some("row_id"))
      .collect().map(_.getString(0).toLong).toSeq
    assert(hot === Seq(7L), s"the 80% key must be detected, got $hot")
    val out = SkewJoin.adaptiveSaltedInnerJoin(fact, dim, "fk", "dk",
      saltBy = "row_id", hotKeys = hot, salts = 8)
    assert(out.select("fk", "row_id", "v", "dname")
      .collect().map(_.toSeq).toSet == plain)
    // only the hot key replicates: the plan's dim-side Generate must be
    // the CONDITIONAL explode (sequence for hot keys, 1-element array
    // otherwise), never a blanket sequence
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("CASE WHEN"), "dim replication must be conditional on the hot keys")
    // and the replicated dim row count is |dim| + (salts-1)*|hot|
    val dimSide = dim.withColumn("_dim_salt",
      explode(when(col("dk").isin(hot: _*), expr("sequence(0L, 7L)"))
        .otherwise(array(lit(0L)))))
    assert(dimSide.count() === 41L + 7L * hot.size)
  }

  test("adaptive salting with no hot keys degrades to the plain join") {
    import spark.implicits._
    val fact = Seq((1L, 10L), (2L, 20L)).toDF("fk", "rid")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("dk", "dname")
    val out = SkewJoin.adaptiveSaltedInnerJoin(fact, dim, "fk", "dk",
      saltBy = "rid", hotKeys = Seq.empty, salts = 8)
    assert(out.count() === 2)
    assert(!out.queryExecution.executedPlan.toString.contains("Generate"),
      "no hot keys -> no replication machinery at all")
  }

  test("string keys and non-numeric saltBy columns salt without degradation") {
    import spark.implicits._
    // the ADVICE r5 failure mode for capPerStratum was pmod on a
    // non-numeric column yielding NULL; the join salt hashes the string
    // form, so a text saltBy must still spread across salt values
    val fact = (1 to 400).map(i => ("hot", s"row$i")).toDF("fk", "rid")
    val nSalts = fact
      .withColumn("_s", pmod(graft.operators.PortableHash.hex60(col("rid").cast("string")), lit(8L)))
      .select("_s").distinct().count()
    assert(nSalts > 1, "string saltBy must spread over multiple salts")
    val dim = Seq(("hot", 1L)).toDF("dk", "dv")
    val out = SkewJoin.saltedInnerJoin(fact, dim, "fk", "dk", saltBy = "rid", salts = 8)
    assert(out.count() == 400)
  }
}
