package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.nlp.{Parsers, Similarity}
import graft.operators.PortableHash
import graft.sources.Hdf5

/** Property tests (SURVEY §5 strategy item 4) for the pure layers —
  * similarity, hashing, parsers — plus Spark round-trip laws on small
  * generated frames. */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, p)
    assert(res.passed, res.status.toString)
  }

  private def check(p: Prop, tune: SCTest.Parameters => SCTest.Parameters): Unit = {
    val res = SCTest.check(tune(SCTest.Parameters.default), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val text: Gen[String] = Gen.choose(0, 12)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("Similarity.ratio: bounded, identity; order-dependence matches difflib") {
    check(forAll(text, text) { (a, b) =>
      val r = Similarity.ratio(a, b)
      r >= 0.0 && r <= 1.0
    })
    check(forAll(text) { a => Similarity.ratio(a, a) == 1.0 })
    // Ratcliff/Obershelp is NOT symmetric (recursion follows a's longest
    // match); difflib shares exactly this behavior — parity pinned here
    // on a pair where the two orders genuinely differ (verified against
    // Python difflib: 0.2105… vs 0.1754…)
    val a = "qayb dvzxdt laiz ysr cq fk bpj idex bvostkd"
    val b = "k y wkd stsbzv"
    assert(math.abs(Similarity.ratio(a, b) - 0.21052631578947367) < 1e-15)
    assert(math.abs(Similarity.ratio(b, a) - 0.17543859649122806) < 1e-15)
  }

  test("PortableHash.hex60: 60-bit range, engine/driver agreement on ASCII") {
    check(forAll(text) { s =>
      val h = PortableHash.hex60(s)
      h >= 0L && h < (1L << 60)
    })
  }

  test("Parsers.extractYears: subset of literal 4-digit tokens, in range") {
    val yearish = Gen.listOf(Gen.oneOf(
      Gen.choose(1900, 2100).map(_.toString), word)).map(_.mkString(" "))
    check(forAll(yearish) { q =>
      val got = Parsers.extractYears(q)
      got.forall(y => y >= 1900 && y <= 2100 && q.contains(y.toString))
    })
  }

  test("Parsers.extractDates: always non-empty years and months (defaults)") {
    check(forAll(text) { q =>
      val (years, months) = Parsers.extractDates(q)
      years.nonEmpty && months.nonEmpty &&
        months.forall(m => m.length == 2 && m.toInt >= 1 && m.toInt <= 12)
    })
  }

  test("fuzzyResolve: cutoff monotone (higher cutoff never adds matches)") {
    val dim = Seq("Mumbai", "Delhi", "Dhaka", "Colombo", "Karachi")
    check(forAll(word, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (cand, c1, c2) =>
      val (lo, hi) = if (c1 < c2) (c1, c2) else (c2, c1)
      val atHi = Parsers.fuzzyResolve(cand, dim, hi)
      val atLo = Parsers.fuzzyResolve(cand, dim, lo)
      atHi.isEmpty || atLo == atHi
    })
  }

  test("MinHash: identical docs get identical signatures; signature is permutation-stable") {
    import spark.implicits._
    val docsGen = Gen.listOfN(4, text.suchThat(_.nonEmpty))
    check(Prop.forAllNoShrink(docsGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sig = graft.operators.MinHashDedup.signatureFromSets(
        graft.operators.MinHashDedup.shingleSets(docs, "doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // same text => same signature, regardless of doc order
      texts.zipWithIndex.groupBy(_._1).values.forall { grp =>
        grp.map { case (_, i) => sig(i.toLong) }.distinct.size == 1
      }
    }, (p: org.scalacheck.Test.Parameters) => p.withMinSuccessfulTests(5))
  }

  test("SpecCompiler predicates agree with a reference evaluator on random trees") {
    import spark.implicits._
    import graft.query.{Predicate, SpecCompiler}
    val rows = (1 to 60).map(i => (i.toLong, s"k${i % 7}", (i % 20) * 1.5))
    val df = rows.toDF("id", "k", "v")
    val leaf: Gen[Predicate] = Gen.oneOf(
      Gen.choose(1, 60).map(i => Predicate.Eq("id", i.toLong)),
      Gen.choose(0, 6).map(i => Predicate.Eq("k", s"k$i")),
      Gen.choose(0.0, 30.0).map(x => Predicate.Cmp("v", ">", x)),
      Gen.choose(0.0, 30.0).map(x => Predicate.Cmp("v", "<=", x)),
      Gen.choose(1, 50).flatMap(a => Gen.choose(a, 60).map(b =>
        Predicate.Between("id", a.toLong, b.toLong))),
      Gen.listOfN(3, Gen.choose(0, 6)).map(is => Predicate.In("k", is.map(i => s"k$i"))),
      Gen.const(Predicate.Prefix("k", "k1")))
    def tree(depth: Int): Gen[Predicate] =
      if (depth == 0) leaf
      else Gen.oneOf(leaf,
        Gen.listOfN(2, tree(depth - 1)).map(Predicate.And(_)),
        Gen.listOfN(2, tree(depth - 1)).map(Predicate.Or(_)))
    def evalRef(p: Predicate, r: (Long, String, Double)): Boolean = p match {
      case Predicate.Eq("id", x) => r._1 == x
      case Predicate.Eq("k", x) => r._2 == x
      case Predicate.Cmp("v", ">", x: Double) => r._3 > x
      case Predicate.Cmp("v", "<=", x: Double) => r._3 <= x
      case Predicate.Between("id", a: Long, b: Long) => r._1 >= a && r._1 <= b
      case Predicate.In("k", vs) => vs.contains(r._2)
      case Predicate.Prefix("k", pre) => r._2.startsWith(pre)
      case Predicate.And(ps) => ps.forall(evalRef(_, r))
      case Predicate.Or(ps) => ps.exists(evalRef(_, r))
      case other => sys.error(s"unexpected $other")
    }
    check(Prop.forAllNoShrink(tree(2)) { p =>
      val got = df.filter(SpecCompiler.predicate(p))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rows.filter(evalRef(p, _)).map(_._1).toSet
      got == want
    }, (pp: SCTest.Parameters) => pp.withMinSuccessfulTests(15))
  }

  test("SkewJoin.saltedInnerJoin equals the plain inner join on random frames") {
    import spark.implicits._
    val factGen = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n,
      for { k <- Gen.choose(0L, 6L); v <- Gen.choose(-50, 50) } yield (k, v)))
    val dimGen = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n,
      Gen.choose(0L, 9L)))
    val saltsGen = Gen.oneOf(2, 3, 8)
    check(Prop.forAllNoShrink(factGen, dimGen, saltsGen) { (fs, ds, salts) =>
      val fact = fs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("fk", "v", "rid")
      val dim = ds.distinct.map(k => (k, s"d$k")).toDF("dk", "dv")
      val plain = fact.join(dim, org.apache.spark.sql.functions.col("fk") ===
          org.apache.spark.sql.functions.col("dk"))
        .select("fk", "v", "rid", "dv").collect().map(_.toSeq).toSet
      val salted = graft.operators.SkewJoin
        .saltedInnerJoin(fact, dim, "fk", "dk", saltBy = "rid", salts = salts)
        .select("fk", "v", "rid", "dv").collect().map(_.toSeq).toSet
      salted == plain
    }, _.withMinSuccessfulTests(15))
  }

  test("SkewJoin.adaptiveSaltedInnerJoin equals the plain join for ANY hot-key set") {
    import spark.implicits._
    // the hot set is ARBITRARY (detected, mis-detected, empty, or keys
    // absent from either side) — the result must be invariant to it
    val factGen = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n,
      for { k <- Gen.choose(0L, 6L); v <- Gen.choose(-50, 50) } yield (k, v)))
    val dimGen = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 9L)))
    val hotGen = Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 12L)))
    check(Prop.forAllNoShrink(factGen, dimGen, hotGen) { (fs, ds, hot) =>
      val fact = fs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("fk", "v", "rid")
      val dim = ds.distinct.map(k => (k, s"d$k")).toDF("dk", "dv")
      val plain = fact.join(dim, org.apache.spark.sql.functions.col("fk") ===
          org.apache.spark.sql.functions.col("dk"))
        .select("fk", "v", "rid", "dv").collect().map(_.toSeq).toSet
      val adaptive = graft.operators.SkewJoin
        .adaptiveSaltedInnerJoin(fact, dim, "fk", "dk", saltBy = "rid",
          hotKeys = hot.distinct, salts = 4)
        .select("fk", "v", "rid", "dv").collect().map(_.toSeq).toSet
      adaptive == plain
    }, _.withMinSuccessfulTests(15))
  }

  test("BloomPrune.semiJoin equals the plain left-semi join on random frames") {
    import spark.implicits._
    val factGen = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 40L)))
    val dimGen = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 40L)))
    // tiny expectedItems + coarse fpp force false positives through the
    // probe; the trailing exact join must always strip them
    val fppGen = Gen.oneOf(0.01, 0.2, 0.4)
    try check(Prop.forAllNoShrink(factGen, dimGen, fppGen) { (fs, ds, fpp) =>
      val fact = fs.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("fk", "rid")
      val dim = ds.toDF("dk")
      val plain = fact.join(dim.distinct(), org.apache.spark.sql.functions.col("fk") ===
          org.apache.spark.sql.functions.col("dk"), "left_semi")
        .collect().map(_.toSeq).toSet
      val pruned = graft.operators.BloomPrune
        .semiJoin(fact, dim, "fk", "dk", expectedItems = 2L, fpp = fpp)
        .collect().map(_.toSeq).toSet
      pruned == plain
    }, _.withMinSuccessfulTests(15))
    finally spark.catalog.clearCache() // semiJoin persists its key table per call
  }

  test("AsofJoin agrees with an in-memory reference evaluator on random frames") {
    import spark.implicits._
    val baseMs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(off: Int) = new java.sql.Timestamp(baseMs + off * 1000L)
    val leftGen = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n,
      for { k <- Gen.choose(1L, 3L); off <- Gen.choose(0, 100) } yield (k, off)))
    val rightGen = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n,
      for { k <- Gen.choose(1L, 3L); off <- Gen.choose(0, 100); q <- Gen.choose(1L, 50L) }
        yield (k, off, q)))
    val tolGen = Gen.oneOf(Gen.const(Option.empty[Long]),
      Gen.choose(1, 40).map(s => Some(s * 1000000L)))
    check(Prop.forAllNoShrink(leftGen, rightGen, tolGen) { (ls, rs, tol) =>
      val left = ls.zipWithIndex.map { case ((k, off), i) => (k, t(off), i.toLong) }
        .toDF("k", "ts", "lid")
      val right = rs.map { case (k, off, q) => (k, t(off), q) }.toDF("k", "ts", "qid")
      def run(fn: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                   String, String, Seq[String], Option[Long]) => org.apache.spark.sql.DataFrame) =
        fn(left, right, "k", "ts", Seq("qid"), tol)
          .select("lid", "asof_qid").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      // in-memory reference: tolerance filters each direction, then
      // nearest picks the closer survivor (backward wins ties)
      def refBack(k: Long, off: Int): Option[Long] = {
        val cands = rs.filter { case (rk, roff, _) => rk == k && roff <= off }
        cands.sortBy { case (_, roff, q) => (roff, q) }.lastOption
          .filterNot { case (_, roff, _) => tol.exists((off - roff) * 1000000L > _) }
          .map(_._3)
      }
      def refFwd(k: Long, off: Int): Option[Long] = {
        val cands = rs.filter { case (rk, roff, _) => rk == k && roff >= off }
        cands.sortBy { case (_, roff, q) => (roff, q) }.headOption
          .filterNot { case (_, roff, _) => tol.exists((roff - off) * 1000000L > _) }
          .map(_._3)
      }
      def refNear(k: Long, off: Int): Option[Long] = {
        val bOff = rs.filter { case (rk, roff, _) => rk == k && roff <= off }
          .map(_._2).sorted.lastOption.filterNot(ro => tol.exists((off - ro) * 1000000L > _))
        val fOff = rs.filter { case (rk, roff, _) => rk == k && roff >= off }
          .map(_._2).sorted.headOption.filterNot(ro => tol.exists((ro - off) * 1000000L > _))
        (bOff, fOff) match {
          case (Some(b), Some(f)) => if (off - b <= f - off) refBack(k, off) else refFwd(k, off)
          case (Some(_), None) => refBack(k, off)
          case (None, Some(_)) => refFwd(k, off)
          case _ => None
        }
      }
      def want(ref: (Long, Int) => Option[Long]) =
        ls.zipWithIndex.map { case ((k, off), i) => i.toLong -> ref(k, off) }.toMap
      run(graft.operators.AsofJoin.asofBackward) == want(refBack) &&
        run(graft.operators.AsofJoin.asofForward) == want(refFwd) &&
        run(graft.operators.AsofJoin.asofNearest) == want(refNear)
    }, (p: SCTest.Parameters) => p.withMinSuccessfulTests(6))
  }

  test("Unpivot round-trip law on generated NOAA-shaped frames") {
    import spark.implicits._
    val row = for {
      y <- Gen.choose(1980, 2024)
      counts <- Gen.listOfN(7, Gen.choose(0, 20))
      costs <- Gen.listOfN(7, Gen.choose(0.0, 500.0).map(d => math.round(d * 10) / 10.0))
    } yield (y, counts, costs)
    val frame = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, row))
      .map(_.distinctBy(_._1))
    check(Prop.forAllNoShrink(frame) { rows =>
      val wide = rows.map { case (y, cn, cs) =>
        (y, cn(0), cs(0), cn(1), cs(1), cn(2), cs(2), cn(3), cs(3),
          cn(4), cs(4), cn(5), cs(5), cn(6), cs(6))
      }.toDF("Year",
        "Drought_Count", "Drought_Cost", "Flooding_Count", "Flooding_Cost",
        "Freeze_Count", "Freeze_Cost", "Severe_Storm_Count", "Severe_Storm_Cost",
        "Tropical_Cyclone_Count", "Tropical_Cyclone_Cost",
        "Wildfire_Count", "Wildfire_Cost", "Winter_Storm_Count", "Winter_Storm_Cost")
      val types = graft.model.Domain.noaaTypes
      val back = graft.ingest.Unpivot.noaaToWide(
        graft.ingest.Unpivot.noaaToLong(wide, types), types)
      back.orderBy("Year").collect().toSeq ==
        wide.select(back.columns.map(org.apache.spark.sql.functions.col): _*)
          .orderBy("Year").collect().toSeq
    }, (p: org.scalacheck.Test.Parameters) => p.withMinSuccessfulTests(5))
  }

  test("Hdf5: parse-decode round-trip across the swept layout grid") {
    // sweeps what the 13 hand-picked Hdf5Spec cases sample: group style
    // (old symbol-table / compact links / dense fractal-heap) × storage
    // (contiguous / chunked with arbitrary grids, incl. overhang) ×
    // filters (shuffle+deflate on int16 chunks) × element type. The
    // fixture emits the bytes from the format spec; the reader must give
    // back the exact row-major values for EVERY combination.
    val gen = for {
      style <- Gen.oneOf(0, 1, 2)
      n0 <- Gen.choose(1, 4)
      n1 <- Gen.choose(1, 5)
      chunk <- Gen.option(Gen.zip(Gen.choose(1, 5), Gen.choose(1, 6)))
      useShort <- Gen.oneOf(true, false)
      filtered <- if (useShort && chunk.isDefined) Gen.oneOf(true, false)
                  else Gen.const(false)
      vals <- Gen.listOfN(n0 * n1,
        if (useShort) Gen.choose(-32768, 32767).map(_.toDouble)
        else Gen.choose(-1e6, 1e6))
    } yield (style, (n0, n1), chunk, filtered, useShort, vals)
    check(Prop.forAllNoShrink(gen) {
      case (style, shape, chunk, filtered, useShort, vals) =>
        val bytes = Hdf5Fixture.fixtureCustom(style, shape, chunk, filtered,
          useShort, vals)
        new Hdf5.TestReader(bytes).readDoubles("x").toSeq == vals
    }, (p: org.scalacheck.Test.Parameters) => p.withMinSuccessfulTests(80))
  }

  test("Y4M: encode-decode round-trip over random dims (odd included), colorspaces, frame counts") {
    import graft.multimodal.MediaOps
    val gen = for {
      w <- Gen.choose(1, 17)
      h <- Gen.choose(1, 9)
      cs <- Gen.oneOf("444", "422", "420jpeg", "420mpeg2", "mono")
      nFrames <- Gen.choose(1, 3)
      pix <- Gen.listOfN(nFrames * w * h, Gen.choose(0, 255))
    } yield (w, h, cs, nFrames, pix)
    check(Prop.forAllNoShrink(gen) { case (w, h, cs, nFrames, pix) =>
      // grey pixels (R=G=B): chroma is exactly 128 in every colorspace,
      // so subsampling loses nothing and the luma round-trip must land
      // within the single Y-quantization step for ANY dims — odd widths
      // and heights exercise the ceil chroma planes
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val v = pix(f * w * h + y * w + x)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        img
      }
      val decoded = MediaOps.Y4mCodec
        .decode(MediaOps.Y4mCodec.encodeY4m(frames, cs))
        .getOrElse(sys.error(s"writer output must parse ($cs ${w}x$h)"))
      decoded.width == w && decoded.height == h &&
        decoded.frames.size == nFrames &&
        (0 until nFrames).forall { f =>
          (0 until h).forall { y =>
            (0 until w).forall { x =>
              val want = pix(f * w * h + y * w + x)
              val got = decoded.frames(f).getRGB(x, y)
              Seq((got >> 16) & 0xff, (got >> 8) & 0xff, got & 0xff)
                .forall(c => math.abs(c - want) <= 1)
            }
          }
        }
    }, (p: org.scalacheck.Test.Parameters) => p.withMinSuccessfulTests(60))
  }

  test("kmin_values / topk_pairs equal their reference models on random frames") {
    import spark.implicits._
    graft.functions.SketchFunctions.register(spark)
    // values drawn from a small domain so duplicates are common (the
    // dedup path) and groups straddle the k boundary both ways
    val rowsGen = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n,
      for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(0L, 30L)
      } yield (g, v)))
    val kGen = Gen.oneOf(1, 3, 8)
    val partsGen = Gen.oneOf(1, 5)
    check(Prop.forAllNoShrink(rowsGen, kGen, partsGen) { (rows, k, parts) =>
      val df = rows.toDF("g", "v").repartition(parts)
      val kmGot = df
        .groupBy("g")
        .agg(graft.functions.SketchFunctions.kminValues(
          org.apache.spark.sql.functions.col("v"), k).as("km"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val kmWant = rows.groupBy(_._1).map { case (g, v) =>
        g -> v.map(_._2).distinct.sorted.take(k).toSeq
      }
      // topk over (v, rid): rid is a unique per-row id (the total-order
      // tiebreaker contract); score is the value as a double
      val withId = rows.zipWithIndex.map { case ((g, v), i) => (g, v.toDouble, i.toLong) }
      val tkGot = withId.toDF("g", "s", "rid").repartition(parts)
        .groupBy("g")
        .agg(graft.functions.SketchFunctions.topkPairs(
          org.apache.spark.sql.functions.col("s"),
          org.apache.spark.sql.functions.col("rid"), k).as("top"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getLong(1))))
        .toMap
      val tkWant = withId.groupBy(_._1).map { case (g, v) =>
        g -> v.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }.take(k).toSeq
      }
      kmGot == kmWant && tkGot == tkWant
    }, _.withMinSuccessfulTests(15))
  }

  test("cms_counts equals its reference grid on random weighted frames") {
    import spark.implicits._
    graft.functions.SketchFunctions.register(spark)
    // small (d, w) so collisions are common; weights > 1 exercise the
    // weighted child; partitioning exercises the partial merge
    val rowsGen = Gen.choose(0, 50).flatMap(n => Gen.listOfN(n,
      for {
        g <- Gen.oneOf("a", "b")
        h <- Gen.choose(0L, 1L << 40)
        c <- Gen.choose(1L, 5L)
      } yield (g, h, c)))
    val dwGen = for { d <- Gen.oneOf(1, 3); w <- Gen.oneOf(2, 7, 16) } yield (d, w)
    val partsGen = Gen.oneOf(1, 5)
    check(Prop.forAllNoShrink(rowsGen, dwGen, partsGen) { case (rows, (d, w), parts) =>
      val got = rows.toDF("g", "h", "c").repartition(parts)
        .groupBy("g")
        .agg(graft.functions.SketchFunctions.cmsCounts(
          org.apache.spark.sql.functions.col("h"),
          org.apache.spark.sql.functions.col("c"), d, w).as("cms"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val want = rows.groupBy(_._1).map { case (g, v) =>
        val cells = new Array[Long](d * w)
        v.foreach { case (_, h, c) =>
          (0 until d).foreach(r =>
            cells(r * w + graft.functions.CmsCounts.bucket(r, h, w)) += c)
        }
        g -> cells.toSeq
      }
      // grid equality implies the estimate law; check it explicitly for
      // one probe anyway: est >= exact total for any present hash
      val estLaw = rows.headOption.forall { case (g, h, _) =>
        val grid = got(g)
        val est = (0 until d)
          .map(r => grid(r * w + graft.functions.CmsCounts.bucket(r, h, w))).min
        val exact = rows.collect { case (`g`, `h`, c) => c }.sum
        est >= exact
      }
      got == want && estLaw
    }, _.withMinSuccessfulTests(15))
  }

  test("posIndexBatch supersede: any land sequence serves the latest version; every post-merge frontier replays") {
    import spark.implicits._
    import graft.streaming.StreamOps
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val versionGen: Gen[String] = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))).map(_.mkString(" "))
    val waveGen: Gen[Map[Long, String]] = for {
      ids <- Gen.atLeastOne(0L to 5L)
      texts <- Gen.listOfN(ids.size, versionGen)
    } yield ids.toList.zip(texts).toMap
    // waves of doc versions with a coin-flipped segment merge after each
    // land — serving must always see exactly the latest version of every
    // doc, whatever the re-ingest pattern and wherever the merges fall
    val scenarioGen: Gen[List[(Map[Long, String], Boolean)]] = for {
      n <- Gen.choose(2, 4)
      waves <- Gen.listOfN(n, waveGen)
      merges <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield waves.zip(merges)
    check(forAll(scenarioGen) { scenario =>
      val root = java.nio.file.Files.createTempDirectory("posprop")
      try {
        val state = root.resolve("state").toString
        scenario.zipWithIndex.foreach { case ((w, merge), i) =>
          StreamOps.posIndexBatch(w.toSeq.toDF("doc_id", "text"),
            "doc_id", "text", 4, state, i.toLong)
          if (merge) StreamOps.mergePosSegments(spark, state)
        }
        def prefixExpected(upTo: Int): Set[(Long, Int, String)] =
          scenario.take(upTo + 1).map(_._1)
            .foldLeft(Map.empty[Long, String])(_ ++ _)
            .toSeq.flatMap { case (id, t) =>
              t.split(" ").zipWithIndex.map { case (tm, p) => (id, p, tm) }
            }.toSet
        val served = StreamOps.posServeRolling(spark, state, vocab, 4)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
        // time travel: every frontier at or after the LAST merge serves
        // exactly its prefix corpus (earlier frontiers are truncated by
        // the merge's physical reclaim — the documented VACUUM bound)
        val lastMerge = scenario.lastIndexWhere(_._2) max 0
        val asOfExact = (lastMerge until scenario.length).forall { i =>
          StreamOps.posServeRolling(spark, state, vocab, 4, asOf = i.toLong)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
            .toSet == prefixExpected(i)
        }
        served == prefixExpected(scenario.length - 1) && asOfExact
      } finally graft.sources.Sources.deleteRecursively(root.toFile)
    }, _.withMinSuccessfulTests(6))
  }

  test("bm25IndexBatch supersede: rolling scores equal the corpus rescan for any land/merge sequence") {
    import spark.implicits._
    import graft.streaming.StreamOps
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val terms = Seq("alpha", "gamma")
    val versionGen: Gen[String] = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))).map(_.mkString(" "))
    val waveGen: Gen[Map[Long, String]] = for {
      ids <- Gen.atLeastOne(0L to 5L)
      texts <- Gen.listOfN(ids.size, versionGen)
    } yield ids.toList.zip(texts).toMap
    val scenarioGen: Gen[List[(Map[Long, String], Boolean)]] = for {
      n <- Gen.choose(2, 4)
      waves <- Gen.listOfN(n, waveGen)
      merges <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield waves.zip(merges)
    // the stats snapshot (n, sum dl) is maintained by per-land ADDITION
    // and per-supersede SUBTRACTION — the one piece of rolling BM25 a
    // stale-version leak corrupts invisibly (scores drift, no row count
    // changes). Random re-ingest patterns with merges anywhere must
    // serve scores bit-identical to a from-scratch corpus rescan of
    // each doc's latest version.
    check(forAll(scenarioGen) { scenario =>
      val root = java.nio.file.Files.createTempDirectory("bmprop")
      try {
        val state = root.resolve("state").toString
        scenario.zipWithIndex.foreach { case ((w, merge), i) =>
          StreamOps.bm25IndexBatch(w.toSeq.toDF("doc_id", "text"),
            "doc_id", "text", 4, state, i.toLong)
          if (merge) StreamOps.mergeBm25Segments(spark, state)
        }
        val latest = scenario.map(_._1)
          .foldLeft(Map.empty[Long, String])(_ ++ _)
        val expected = graft.operators.KeywordSearch
          .bm25(latest.toSeq.toDF("doc_id", "text"), "doc_id", "text", terms)
          .collect().map(r => r.getLong(0) -> r.getDouble(1))
          .filter { case (id, _) =>
            latest(id).split(" ").exists(terms.contains) }.toMap
        val served = StreamOps.bm25ServeRolling(spark, state, terms, 4)
          .collect().map(r => (r.get(0).toString.toLong, r.getDouble(1))).toMap
        served == expected
      } finally graft.sources.Sources.deleteRecursively(root.toFile)
    }, _.withMinSuccessfulTests(6))
  }
}
