package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomFunctions
import graft.operators.BloomPrune

class BloomPruneSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bloom-pruned semi-join equals the plain left-semi join") {
    import spark.implicits._
    val fact = (1 to 5000).map(i => (i.toLong % 1000, i)).toDF("fk", "payload")
      .repartition(8)
    val dim = (0 to 300).filter(_ % 3 == 0).map(_.toLong).toDF("dk")
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .select("fk", "payload").collect().map(_.toSeq).toSet
    val pruned = BloomPrune.semiJoin(fact, dim, "fk", "dk",
        expectedItems = 200L)
      .select("fk", "payload").collect().map(_.toSeq).toSet
    assert(pruned == plain)
  }

  test("an undersized filter (high fpp) still yields the exact result") {
    import spark.implicits._
    val fact = (1 to 4000).map(i => (i.toLong, i)).toDF("fk", "payload")
    val dim = (1L to 50L).toDF("dk")
    // expectedItems=2 at fpp 0.4 forces many false positives through the
    // bloom probe; the trailing exact semi-join must strip every one
    val out = BloomPrune.semiJoin(fact, dim, "fk", "dk",
      expectedItems = 2L, fpp = 0.4)
    assert(out.select("fk").collect().map(_.getLong(0)).toSet == (1L to 50L).toSet)
  }

  test("bloom-partitioned anti-join equals the plain left-anti join") {
    import spark.implicits._
    val fact = (1 to 5000).map(i => (i.toLong % 1000, i)).toDF("fk", "payload")
      .repartition(8)
    val dim = (0 to 300).filter(_ % 3 == 0).map(_.toLong).toDF("dk")
    val plain = fact.join(dim, col("fk") === col("dk"), "left_anti")
      .select("fk", "payload").collect().map(_.toSeq).toSet
    val pruned = BloomPrune.antiJoin(fact, dim, "fk", "dk")
      .select("fk", "payload").collect().map(_.toSeq).toSet
    assert(pruned == plain)
  }

  test("anti-join: an undersized filter (many false positives) still exact") {
    import spark.implicits._
    val fact = (1 to 4000).map(i => (i.toLong, i)).toDF("fk", "payload")
    val dim = (1L to 50L).toDF("dk")
    // expectedItems=2 at fpp 0.4 pushes a large false-positive sliver
    // into the exact anti-join branch — every FP row must come back out
    val out = BloomPrune.antiJoin(fact, dim, "fk", "dk",
      expectedItems = 2L, fpp = 0.4)
    assert(out.select("fk").collect().map(_.getLong(0)).toSet == (51L to 4000L).toSet)
  }

  test("anti-join keeps NULL-keyed fact rows, exactly like the plain left-anti") {
    import spark.implicits._
    // a NULL key never equals any dim key, so the plain anti-join KEEPS
    // the row; the probe's NULL verdict must route it down the bypass
    // branch instead of failing both filters and vanishing
    val fact = Seq((Some(1L), "match"), (Some(99L), "nomatch"), (None, "nullkey"))
      .toDF("fk", "tag")
    val dim = Seq(1L, 2L).toDF("dk")
    val plain = fact.join(dim, col("fk") === col("dk"), "left_anti")
      .collect().map(_.getString(1)).toSet
    val pruned = BloomPrune.antiJoin(fact, dim, "fk", "dk")
      .collect().map(_.getString(1)).toSet
    assert(plain === Set("nomatch", "nullkey"))
    assert(pruned === plain)
  }

  test("bloom_might_contain admits every inserted key (no false negatives)") {
    import spark.implicits._
    val keys = spark.range(1, 2001).toDF("k")
    val bf = keys.stat.bloomFilter("k", 2000L, 0.01)
    val bytes = BloomFunctions.serialize(bf)
    BloomFunctions.register(spark)
    val admitted = keys
      .filter(BloomFunctions.bloomMightContain(col("k"), bytes))
      .count()
    assert(admitted == 2000L, "a bloom filter can never reject an inserted key")
  }

  test("NULL keys yield NULL (filtered out, matching semi-join semantics)") {
    import spark.implicits._
    val dim = (1L to 10L).toDF("dk")
    val fact = Seq(Some(1L), None, Some(99L)).toDF("fk")
    val out = BloomPrune.semiJoin(fact, dim, "fk", "dk", expectedItems = 10L)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("probe compiles into whole-stage codegen (not interpreted fallback)") {
    // fact from range, not a local Seq: ConvertToLocalRelation would fold
    // a filter over a LocalRelation away at optimization time and there
    // would be nothing to audit
    val dim = spark.range(1, 101).toDF("dk")
    val fact = spark.range(1, 1001).toDF("fk")
    val pruned = BloomPrune.semiJoin(fact, dim, "fk", "dk", expectedItems = 100L)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    // `*(n) Filter ... bloom_might_contain` — the codegen star on the
    // Filter line is how the simple plan string marks a WSCG member
    assert(raw"\*\(\d+\) Filter .*bloom_might_contain".r.findFirstIn(plan).nonEmpty,
      plan.take(2000))
  }
}
