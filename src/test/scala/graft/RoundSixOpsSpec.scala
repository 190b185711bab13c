package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force semantic checks for the round-6 statistical/event operators:
  * each query's distributed plan is re-derived driver-side from collected
  * rows with naive Scala (the "obviously correct" form), then compared
  * exactly. These complement the DuckDB oracle: the oracle pins
  * engine-vs-engine agreement, these pin agreement with the textbook
  * definition.
  */
class RoundSixOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q29_correlation matches Spark's built-in corr to 1e-12") {
    val got = SparkEntry.queries("q29_correlation")(spark, sfDir).collect()
    assert(got.nonEmpty)
    import org.apache.spark.sql.functions._
    // Built-in corr over the same grid-lifted columns: same statistic,
    // different summation order — agreement to FP noise validates the
    // moment algebra without assuming the implementation.
    val ref = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_quantity"), 0).as("q"),
        round(col("l_extendedprice") * lit(100.0), 0).as("p"))
      .groupBy("l_returnflag").agg(corr(col("q"), col("p")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { r =>
      val flag = r.getString(0)
      val mine = r.getDouble(2)
      assert(math.abs(mine - ref(flag)) < 1e-12,
        s"$flag: $mine vs builtin ${ref(flag)}")
    }
    // Pearson r is always in [-1, 1]; the grid lift must not break that.
    got.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }

  test("e21_cusum_change matches a driver-side CUSUM replay") {
    val got = SparkEntry.queries("e21_cusum_change")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val rows = Tables(spark, sfDir, "events")
      .selectExpr("event_type", "event_id",
        "date_format(ts, 'yyyy-MM-dd HH:mm:ss') as t",
        "unix_micros(ts) as us",
        "cast(cast(value as decimal(18,4)) * 10000 as long) as w")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val ordered = rs.sortBy(r => (r._4, r._2))
      val n = BigInt(ordered.length)
      val sv = ordered.map(r => BigInt(r._5)).sum
      var sk = BigInt(0)
      var bestAbs = BigInt(-1); var bestTs = ""; var bestK = 0L
      ordered.zipWithIndex.foreach { case (r, i) =>
        sk += BigInt(r._5)
        val t = n * sk - BigInt(i + 1) * sv
        if (t.abs > bestAbs) { bestAbs = t.abs; bestTs = r._3; bestK = i + 1 }
      }
      assert(got(tpe) === ((bestTs, bestK)), s"type $tpe")
    }
  }

  test("e22_transitions: counts replay and probabilities sum to 1 per source") {
    val got = SparkEntry.queries("e22_transitions")(spark, sfDir).collect()
    val counts = got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = Tables(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3)).toList
      ordered.zip(ordered.drop(1)).map { case (a, b) => (a._4, b._4) }
    }.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    assert(counts === expect)
    got.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"source $src sums to $total")
    }
  }

  test("e23_seasonal_anom: integer flag agrees with the naive 2-sigma double test") {
    val got = SparkEntry.queries("e23_seasonal_anom")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val rows = Tables(spark, sfDir, "events")
      .selectExpr("event_type", "(unix_micros(ts) div 3600000000) % 24 as hr",
        "cast(cast(value as decimal(18,4)) * 10000 as long) as w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(r => (r._1, r._2)).foreach { case (key, rs) =>
      val n = rs.length.toLong
      val ws = rs.map(_._3)
      val mean = ws.map(BigDecimal(_)).sum / n
      val varPop = ws.map(w => (BigDecimal(w) - mean).pow(2)).sum / n
      val sigma = math.sqrt(varPop.toDouble)
      val nAnom = ws.count(w => math.abs(w.toDouble - mean.toDouble) > 2 * sigma)
      val (gotN, gotAnom) = got(key)
      assert(gotN === n, s"bucket $key n")
      // The distributed test is exact integer arithmetic; the naive double
      // replay can disagree only when a value sits within FP noise of the
      // boundary. Assert equality with a 1-count slack per bucket.
      assert(math.abs(gotAnom - nAnom) <= 1, s"bucket $key: $gotAnom vs $nAnom")
    }
  }

  test("c5_pagerank matches a driver-side integer PageRank replay") {
    val got = SparkEntry.queries("c5_pagerank")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Rebuild the same d6 edge set naively, then run the identical
    // integer recurrence in plain Scala.
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir, "documents").filter(col("doc_id") < 100)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet)
    val edges = for {
      (a, wa) <- docs; (b, wb) <- docs if a < b
      inter = (wa & wb).size
      if inter > 0 && inter.toDouble / (wa.size + wb.size - inter) >= 0.5
    } yield (a, b)
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val n = deg.size.toLong
    assert(n > 0, "fixture graph must be non-empty for this spec to bite")
    val init = 1000000000000L / n
    val base = (15L * 1000000000000L) / (100L * n)
    var ranks = deg.keys.map(_ -> init).toMap
    (1 to 3).foreach { _ =>
      ranks = sym.groupBy(_._2).map { case (dst, ins) =>
        dst -> (base + ins.map { case (src, _) =>
          (85L * ranks(src)) / (100L * deg(src))
        }.sum)
      }
    }
    val expect = ranks.toSeq.map { case (id, r) => (id, deg(id), r) }
      .sortBy { case (id, _, r) => (-r, id) }.take(10)
    assert(got.toSeq === expect)
  }

  test("e24_simpson_diversity matches the naive per-user index and stays in [0, 1)") {
    val got = SparkEntry.queries("e24_simpson_diversity")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val rows = Tables(spark, sfDir, "events")
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val counts = rs.groupBy(_._2).map(_._2.size.toLong)
      val n = counts.sum
      val expect = 1.0 - counts.map(c => c.toDouble * c.toDouble).sum / (n.toDouble * n.toDouble)
      val (gotN, gotTypes, gotS) = got(uid)
      assert(gotN === n && gotTypes === counts.size.toLong)
      assert(math.abs(gotS - expect) < 1e-12, s"user $uid")
      assert(gotS >= 0.0 && gotS < 1.0)
    }
  }

  test("q30_benford covers every row once and shares sum to 1") {
    val got = SparkEntry.queries("q30_benford")(spark, sfDir).collect()
    val total = Tables(spark, sfDir, "lineitem").count()
    assert(got.map(_.getLong(1)).sum === total)
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    assert(got.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 9))
  }

  test("q31_sorted_blocking equals a driver-side sorted-neighborhood replay") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val got = SparkEntry.queries("q31_sorted_blocking")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val parts = Tables(spark, sfDir, "part").selectExpr("p_partkey", "p_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = parts.groupBy(_._2.take(1)).toSeq.flatMap { case (_, blk) =>
      val sorted = blk.sortBy(p => (p._2, p._1)).toVector
      for {
        i <- sorted.indices; off <- 1 to 2 if i + off < sorted.length
        d = lev(sorted(i)._2, sorted(i + off)._2) if d >= 1 && d <= 3
      } yield (sorted(i)._1, sorted(i + off)._1, d)
    }.toSet
    assert(got === expect)
  }

  test("d28_pps_sample: systematic selection replays exactly and respects the quantile rule") {
    val got = SparkEntry.queries("d28_pps_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables(spark, sfDir, "documents").selectExpr("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = docs.map(_._2).sum
    var cw = 0L
    val expect = docs.flatMap { case (id, w) =>
      val before = cw; cw += w
      if (cw * 20L / total > before * 20L / total)
        Some((id, w, cw * 20L / total)) else None
    }
    assert(got.toSeq === expect.toSeq)
    // slots are strictly increasing — each 1/m quantile crossed once
    assert(got.map(_._3).toSeq === got.map(_._3).distinct.toSeq)
  }

  test("q32_column_stats: one row per column, stats agree with direct aggregates") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q32_column_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val li = Tables(spark, sfDir, "lineitem")
    got.foreach { case (c, (nulls, ndv, mn, mx)) =>
      val ref = li.agg(
        count(when(col(c).isNull, 1)), countDistinct(col(c)),
        min(col(c)), max(col(c))).head
      assert((nulls, ndv, mn, mx) ===
        ((ref.getLong(0), ref.getLong(1), ref.getDouble(2), ref.getDouble(3))), c)
    }
  }

  test("e25_cooccurrence_lift replays from the user-type incidence sets") {
    val got = SparkEntry.queries("e25_cooccurrence_lift")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val ut = Tables(spark, sfDir, "events")
      .selectExpr("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val users = ut.map(_._1).distinct.length.toLong
    val perType = ut.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val pairs = ut.groupBy(_._1).values.flatMap { rs =>
      val ts = rs.map(_._2).sorted
      for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j))
    }.groupBy(identity(_)).map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet === pairs.keySet)
    pairs.foreach { case ((a, b), nBoth) =>
      val (gotN, gotLift) = got((a, b))
      assert(gotN === nBoth)
      val expect = (nBoth * users).toDouble / (perType(a) * perType(b)).toDouble
      assert(gotLift === expect, s"($a,$b)")
    }
  }

  test("e28_target_encode shrinks toward the prior and replays naively") {
    val got = SparkEntry.queries("e28_target_encode")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = Tables(spark, sfDir, "events")
      .selectExpr("event_type",
        "cast(cast(value as decimal(38,4)) * 10000 as long) as w")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gN = rows.length.toLong
    val gSw = rows.map(r => BigInt(r._2)).sum
    val prior = (gSw.toDouble / gN) / 10000.0
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val n = rs.length.toLong
      val sw = rs.map(r => BigInt(r._2)).sum
      val expect =
        ((sw * gN + 10 * gSw).toDouble / (BigInt(gN) * BigInt(n + 10)).toDouble) / 10000.0
      val (gotN, gotE) = got(t)
      assert(gotN === n)
      assert(math.abs(gotE - expect) < 1e-9, s"type $t")
      // smoothing pulls the encoding strictly between raw mean and prior
      val raw = (sw.toDouble / n) / 10000.0
      val lo = math.min(raw, prior) - 1e-9
      val hi = math.max(raw, prior) + 1e-9
      assert(gotE >= lo && gotE <= hi, s"type $t: $gotE outside [$lo, $hi]")
    }
  }

  test("e29_wow_growth: first week per type is NULL, ratios replay from totals") {
    val got = SparkEntry.queries("e29_wow_growth")(spark, sfDir).collect()
    val byType = got.groupBy(_.getString(1))
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getLong(0))
      assert(sorted.head.isNullAt(3), s"type $t first week must have NULL growth")
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          val expect = (cur.getDouble(2) - prev.getDouble(2)) / prev.getDouble(2)
          assert(cur.getDouble(3) === expect, s"type $t week ${cur.getLong(0)}")
        case _ =>
      }
    }
  }

  test("d29_readability replays the Flesch surrogate counts on raw text") {
    val got = SparkEntry.queries("d29_readability")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val docs = Tables(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 200)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty && got.size === docs.length)
    docs.foreach { case (id, text) =>
      val clean = text.replace("#", "")
      val words = (text.length - text.replace(" ", "").length + 1).toLong
      val sentences = math.max("[.!?]+".r.findAllIn(clean).size.toLong, 1L)
      val syllables = math.max("[aeiouy]+".r.findAllIn(clean.toLowerCase).size.toLong, 1L)
      val flesch = 206.835 - 1.015 * (words.toDouble / sentences.toDouble) -
        84.6 * (syllables.toDouble / words.toDouble)
      assert(got(id) === ((words, sentences, syllables, flesch)), s"doc $id")
    }
  }

  test("d30_ngram_novelty: doc 0 is fully novel, exact duplicates score 0") {
    val rows = SparkEntry.queries("d30_ngram_novelty")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache() // d30 persists its gram table
    val byId = rows.map(r => r._1 -> r).toMap
    val firstId = rows.map(_._1).min
    assert(byId(firstId)._4 === 1.0, "the first document has nothing to repeat")
    rows.foreach { case (_, nGrams, nNovel, novelty) =>
      assert(nNovel >= 0 && nNovel <= nGrams)
      assert(novelty >= 0.0 && novelty <= 1.0)
    }
    // any doc whose text equals an earlier doc's text must be 0% novel
    val texts = Tables(spark, sfDir, "documents").selectExpr("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    texts.foreach { case (id, t) =>
      if (seen.contains(t)) assert(byId(id)._4 === 0.0, s"duplicate doc $id")
      seen += t
    }
  }

  test("d27_containment: a strict subset document scores 1.0") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, base),                                     // superset
      (2L, "alpha bravo charlie delta echo"),         // strict subset -> 1.0
      (3L, "kilo lima mike november oscar papa")      // disjoint
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("d27").toString
    docs.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // Reuse the other tables from sfDir is unnecessary: d27 reads documents only.
    val out = SparkEntry.queries("d27_containment")(spark, tmp).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getLong(2) === 5L)
    assert(r.getDouble(3) === 1.0)
  }
}
