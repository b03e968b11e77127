package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("deterministicSplit: total partition, growth-stable, consistent with the sampler") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val splits = Seq("train" -> 9000, "val" -> 500, "test" -> 500)
    val out = graft.ops.ScaleOps.deterministicSplit(docs, "doc_id", splits)
    // every row gets exactly one label; all labels appear at this size
    assert(out.where($"split".isNull).count() == 0)
    assert(out.count() == docs.count())
    val byLabel = out.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    // stable under corpus growth: splits on a subset equal the
    // restriction of splits on the whole (no train/test contamination
    // across dataset versions)
    val sub = docs.where(pmod($"doc_id", lit(3)) === 0)
    val subSplit = graft.ops.ScaleOps.deterministicSplit(sub, "doc_id", splits)
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wholeSplit = out.select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subSplit.forall { case (id, sp) => wholeSplit(id) == sp })
    // the train partition IS the 9000bp deterministic sample
    val train = out.where($"split" === "train").select($"doc_id").as[Long].collect().toSet
    val sample = graft.ops.ScaleOps.deterministicSampleBp(docs, "doc_id", 9000)
      .select($"doc_id").as[Long].collect().toSet
    assert(train == sample)
    // malformed shares fail fast — including an Int-wrapping sum that
    // lands back on exactly 10000
    intercept[IllegalArgumentException] {
      graft.ops.ScaleOps.deterministicSplit(docs, "doc_id", Seq("a" -> 5000, "b" -> 4000))
    }
    intercept[IllegalArgumentException] {
      graft.ops.ScaleOps.deterministicSplit(docs, "doc_id", Seq("a" -> 5000, "a" -> 5000))
    }
    intercept[IllegalArgumentException] {
      graft.ops.ScaleOps.deterministicSplit(docs, "doc_id",
        Seq("a" -> 2147483647, "b" -> 2147483647, "c" -> 10002))
    }
    // a NULL key has no split — fail loudly, never a silent null label
    val withNull = Seq(Some(1L), None).toDF("doc_id")
    val ex = intercept[Exception] {
      graft.ops.ScaleOps.deterministicSplit(withNull, "doc_id", splits).collect()
    }
    assert(ex.getMessage.contains("NULL values in key column") ||
      Option(ex.getCause).exists(_.getMessage.contains("NULL values in key column")))
  }

  test("weightedSampleBp: rate 0 keeps nothing, 10000 keeps all, NULL drops, clamps, monotone") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    assert(graft.ops.ScaleOps.weightedSampleBp(docs, "doc_id", lit(0)).count() == 0)
    assert(graft.ops.ScaleOps.weightedSampleBp(docs, "doc_id", lit(10000)).count() == docs.count())
    assert(graft.ops.ScaleOps.weightedSampleBp(docs, "doc_id",
      lit(null).cast("long")).count() == 0)
    // clamped: above 10000 behaves as 10000, below 0 as 0
    assert(graft.ops.ScaleOps.weightedSampleBp(docs, "doc_id", lit(99999)).count() == docs.count())
    assert(graft.ops.ScaleOps.weightedSampleBp(docs, "doc_id", lit(-5)).count() == 0)
    // monotone in the rate column, and consistent with the constant-rate sampler
    val r1 = graft.ops.ScaleOps.weightedSampleBp(docs, "doc_id", lit(2500))
      .select($"doc_id").as[Long].collect().toSet
    val r2 = graft.ops.ScaleOps.weightedSampleBp(docs, "doc_id", lit(7500))
      .select($"doc_id").as[Long].collect().toSet
    assert(r1.subsetOf(r2))
    val const = graft.ops.ScaleOps.deterministicSampleBp(docs, "doc_id", 2500)
      .select($"doc_id").as[Long].collect().toSet
    assert(r1 == const)
  }

  test("intervalJoin equals the naive theta join; no nested-loop in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "events")
    val pts = ev.where($"event_type" === "click")
      .select($"event_id".as("pid"), $"ts".as("pt"))
    val ivs = ev.where($"event_type" === "purchase")
      .select($"event_id".as("iid"), ($"ts" - 1800000000000L).as("lo"), $"ts".as("hi"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"iid", $"pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = graft.ops.ScaleOps.intervalJoin(pts, ivs, "pt", "lo", "hi",
      bucketWidth = 1800000000000L)
    val naive = pts.join(ivs, $"pt" >= $"lo" && $"pt" <= $"hi")
    assert(pairs(bucketed) == pairs(naive))
    assert(pairs(bucketed).nonEmpty, "fixture produced no in-window pairs")
    // the whole point: an equi-join plan, not a nested loop
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    // inverted/empty intervals match nothing; NULL points never match
    val bad = Seq((9L, 100L, 50L)).toDF("iid2", "lo2", "hi2")
    assert(graft.ops.ScaleOps.intervalJoin(
      pts.limit(5), bad, "pt", "lo2", "hi2", 10L).count() == 0)
    val nullPts = Seq((1L, Option.empty[Long]), (2L, Some(75L))).toDF("pid2", "pt2")
    val one = Seq((3L, 50L, 100L)).toDF("iid3", "lo3", "hi3")
    val got = graft.ops.ScaleOps.intervalJoin(nullPts, one, "pt2", "lo3", "hi3", 10L)
    assert(got.select($"pid2").as[Long].collect().toSeq == Seq(2L))
    // an ODD width at epoch-nano magnitudes: bucket arithmetic must be
    // integer (a double divide loses bits above 2^53 and shifts buckets
    // off-by-one, silently dropping matches)
    val odd = graft.ops.ScaleOps.intervalJoin(pts, ivs, "pt", "lo", "hi",
      bucketWidth = 1800000000001L)
    assert(pairs(odd) == pairs(naive))
  }
  import spark.implicits._

  test("bucketed tables join without exchanges (shuffle paid at write time)") {
    val li = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val orders = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "orders")
    // the in-memory catalog forgets tables across JVMs but their warehouse
    // locations persist — clear both
    for (t <- Seq("b_lineitem", "b_orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.io.Lake.delete(spark, s"/tmp/graft-warehouse/$t")
    }
    ScaleOps.writeBucketed(li.select($"l_orderkey", $"l_quantity"), "b_lineitem", "l_orderkey", 8)
    ScaleOps.writeBucketed(orders.select($"o_orderkey", $"o_totalprice"), "b_orders", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan.take(800))
      // and it still computes the right thing
      assert(joined.count() ==
        li.join(orders, $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join equals the plain join on skewed data") {
    // 90% of fact rows share one key — the classic hot-key skew
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 1L, s"p$i"))
      .toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three"), (0L, "zero"))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k")).select("k", "payload", "label")
    val salted = ScaleOps.saltedEquiJoin(big, small, "k", saltFactor = 8)
      .select("k", "payload", "label")
    assert(salted.collect().toSet == plain.collect().toSet)
    assert(salted.count() == plain.count())
  }

  test("as-of join: latest right row at or before each left time, left-outer") {
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 150L, "t3"), (3L, 50L, "t4"))
      .toDF("sym", "t_time", "trade")
    val quotes = Seq(
      (1L, 90L, 9.9), (1L, 100L, 10.0), (1L, 200L, 10.5),
      (2L, 149L, 20.0), (2L, 151L, 21.0))
      .toDF("q_sym", "q_time", "px")
    val out = ScaleOps.asofJoinBackward(trades, quotes, "sym", "q_sym", "t_time", "q_time")
      .select("trade", "q_time", "px").collect()
      .map(r => r.getString(0) -> Option(r.get(2)).map(_ => (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("t1").contains((100L, 10.0))) // exact-time match wins
    assert(out("t2").contains((200L, 10.5))) // latest earlier quote
    assert(out("t3").contains((149L, 20.0))) // 151 is later -> excluded
    assert(out("t4").isEmpty) // no quotes for sym 3 -> null right side
  }

  test("salted join rejects outer join types that replication would corrupt") {
    val big = Seq((1L, "a")).toDF("k", "payload")
    val small = Seq((1L, "one")).toDF("k", "label")
    intercept[IllegalArgumentException] {
      ScaleOps.saltedEquiJoin(big, small, "k", saltFactor = 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      ScaleOps.saltedEquiJoin(big, small, "k", saltFactor = 4, joinType = "full_outer")
    }
    // semi/anti still work and match the plain forms
    val semi = ScaleOps.saltedEquiJoin(big, small, "k", 4, "left_semi")
    assert(semi.collect().map(_.getString(1)).toSeq == Seq("a"))
  }

  test("as-of join survives a hot key: linear union-sort plan, no pairwise join") {
    // one key holds 2000 left x 2000 right rows: the naive equi-join +
    // range filter materializes 4M pairs before pruning; the union-sort
    // form touches 4000 rows.
    val trades = (1 to 2000).map(i => (7L, i * 10L, s"t$i")).toDF("sym", "t_time", "trade")
    val quotes = (1 to 2000).map(i => (7L, i * 10L - 5L, i * 1.0)).toDF("q_sym", "q_time", "px")
    val out = ScaleOps.asofJoinBackward(trades, quotes, "sym", "q_sym", "t_time", "q_time")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not materialize pairwise joins:\n" + plan.take(800))
    assert(plan.contains("Window"), plan.take(500))
    val rows = out.collect()
    assert(rows.length == 2000)
    // trade i at time 10i sees quote i at 10i-5 as the latest at-or-before
    val byTrade = rows.map(r => r.getString(2) -> r.getDouble(5)).toMap
    assert(byTrade("t1") == 1.0)
    assert(byTrade("t2000") == 2000.0)
  }

  test("MinHash sketch aggregator: union property and cross-group similarity") {
    import graft.functions.MinHashSketchAgg
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val hashed = docs.select($"source",
      transform(array_distinct(graft.text.TextFunctions.tokens($"text")),
        t => pmod(xxhash64(t), lit(1L << 31))).as("th"))
    val sketches = hashed.groupBy($"source")
      .agg(MinHashSketchAgg.minhashSketch($"th").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sketches.values.forall(_.length == 64))
    // same tiny shared vocabulary -> sources should look near-identical
    val sims = for (Seq(a, b) <- sketches.keys.toSeq.sorted.combinations(2).take(10).toSeq)
      yield MinHashSketchAgg.estimate(sketches(a), sketches(b))
    assert(sims.forall(_ > 0.5), sims.mkString(","))
    // union property: sketch(all docs) == elementwise min of per-source sketches
    val all = hashed.agg(MinHashSketchAgg.minhashSketch($"th").as("sig"))
      .head().getSeq[Long](0)
    val elementwiseMin = sketches.values.reduce((x, y) => x.zip(y).map(p => math.min(p._1, p._2)))
    assert(all == elementwiseMin)

    // estimate-vs-exact bound: sketch agreement must track the true
    // token-set Jaccard within MinHash error (64 hashes -> sigma ~0.06;
    // 0.2 is a >3-sigma bound)
    val tokenSets = docs
      .select($"source", graft.text.TextFunctions.tokens($"text").as("t"))
      .select($"source", explode($"t").as("tok")).distinct()
      .collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getString(1)).toSet }
    val srcs = tokenSets.keys.toSeq.sorted.take(3)
    for (Seq(x, y) <- srcs.combinations(2)) {
      val exact = tokenSets(x).intersect(tokenSets(y)).size.toDouble /
        tokenSets(x).union(tokenSets(y)).size
      val est = MinHashSketchAgg.estimate(sketches(x), sketches(y))
      assert(math.abs(est - exact) <= 0.2, s"$x vs $y: est=$est exact=$exact")
    }
  }

  test("as-of join: NULL keys and times never match, NULL-key left rows pass through") {
    val trades = Seq(
      (1L, Option("A"), Option(100L)),
      (2L, None: Option[String], Option(100L)), // null key
      (3L, Option("A"), None: Option[Long])     // null time
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, Option("A"), Option(50L)),
      (11L, None: Option[String], Option(40L)), // null-key quote: matches nothing
      (12L, Option("A"), None: Option[Long])    // null-time quote: matches nothing
    ).toDF("quote_id", "q_sym", "q_t")
    val out = ScaleOps.asofJoinBackward(trades, quotes, "sym", "q_sym", "t", "q_t")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out == Map(
      1L -> Some(10L), // real match
      2L -> None,      // null key: present, unmatched (not paired with quote 11)
      3L -> None))     // null time: present, unmatched
  }

  test("deterministic sampling: on-rate, repeatable, nested, stratified") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.01", "documents")
      .select($"doc_id", $"source")
    val n = docs.count().toDouble
    val s25 = ScaleOps.deterministicSampleBp(docs, "doc_id", 2500)
    val kept = s25.select("doc_id").as[Long].collect().toSet
    // on-rate within a loose binomial bound
    assert(math.abs(kept.size / n - 0.25) < 0.07, s"off-rate: ${kept.size / n}")
    // repeatable: identical membership on re-evaluation
    assert(ScaleOps.deterministicSampleBp(docs, "doc_id", 2500)
      .select("doc_id").as[Long].collect().toSet == kept)
    // nested: a lower rate is a subset of a higher rate (bucket < r)
    val s10 = ScaleOps.deterministicSampleBp(docs, "doc_id", 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(kept))
    // stratified: listed stratum gets its own rate, others the default
    val srcs = docs.select("source").distinct().as[String].collect().sorted
    val boosted = srcs.head
    val strat = ScaleOps.stratifiedSampleBp(docs, "doc_id", "source",
      Map(boosted -> 10000), defaultBp = 0)
    val bySrc = strat.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet == Set(boosted)) // default 0 drops everything else
    assert(bySrc(boosted) == docs.where($"source" === boosted).count())
  }

  test("token-budget mixing: rates from measured counts, only listed sources, on-share") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.01", "documents")
    val shares = Map("src0" -> 4000, "src1" -> 2000, "src2" -> 1000)
    val (mixed, rates) = ScaleOps.mixByTokenBudget(
      docs, "source", "text", "doc_id", shares, totalTokenBudget = 2000L)
    // rates derive from exact integer arithmetic on measured token counts
    val counts = docs.groupBy($"source")
      .agg(sum(graft.text.TextFunctions.tokenCount($"text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    shares.foreach { case (s, bp) =>
      assert(rates(s) == math.min(10000L, 2000L * bp / counts(s)).toInt, s)
    }
    // only listed sources appear in the mix
    val bySrc = mixed.groupBy($"source")
      .agg(sum(graft.text.TextFunctions.tokenCount($"text")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet.subsetOf(shares.keySet))
    // sampled token mass tracks the 4:2:1 target within sampling noise
    val t0 = bySrc.getOrElse("src0", 0L).toDouble
    val t1 = bySrc.getOrElse("src1", 0L).toDouble
    assert(t0 > t1, s"src0 ($t0 tokens) should outweigh src1 ($t1)")
    assert(math.abs(t0 / (t1.max(1.0)) - 2.0) < 1.2,
      s"src0:src1 token ratio ${t0 / t1} too far from 2.0")
    // malformed shares fail fast
    intercept[IllegalArgumentException] {
      ScaleOps.mixByTokenBudget(docs, "source", "text", "doc_id",
        Map("src0" -> 8000, "src1" -> 5000), 1000L)
    }
  }

  test("deterministic shuffle: exact permutation, partitioning-invariant, actually shuffles") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id")
    val a = ScaleOps.deterministicShufflePos(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = docs.count()
    // a total permutation: positions are exactly 0..n-1
    assert(a.values.toSeq.sorted == (0L until n).toSeq)
    // invariant under input partitioning (rerun on a differently-split input)
    val b = ScaleOps.deterministicShufflePos(docs.repartition(7), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // it is a shuffle, not the identity: sorted-by-id order is broken
    // almost everywhere
    val sortedIds = a.keys.toSeq.sorted
    val inversions = sortedIds.sliding(2).count {
      case Seq(x, y) => a(x) > a(y)
      case _ => false
    }
    assert(inversions > sortedIds.length / 4,
      s"suspiciously ordered: only $inversions inversions in ${sortedIds.length}")
  }

  test("epoch shuffle: independent dense permutation per epoch, partitioning-invariant") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id")
    val n = docs.count()
    val a = ScaleOps.epochShufflePos(docs, "doc_id", epochs = 3)
      .select($"epoch", $"doc_id", $"epoch_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every epoch is a TOTAL dense permutation of the same rows
    for (e <- 0L until 3L) {
      val pos = a.collect { case ((`e`, _), p) => p }.toSeq
      assert(pos.sorted == (0L until n).toSeq, s"epoch $e not a dense permutation")
    }
    // epochs are DIFFERENT permutations (the curriculum changes):
    // almost no doc keeps its epoch-0 position in epoch 1
    val ids = docs.collect().map(_.getLong(0))
    val same = ids.count(id => a((0L, id)) == a((1L, id)))
    assert(same < ids.length / 10,
      s"epochs 0 and 1 agree on $same of ${ids.length} positions — not independent")
    // invariant under input partitioning, and a rerun replays exactly
    val b = ScaleOps.epochShufflePos(docs.repartition(7), "doc_id", epochs = 3)
      .select($"epoch", $"doc_id", $"epoch_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("selectTokenBudgetBy: per-group prefixes == per-group selectTokenBudget, loud guards") {
    val df = Seq(
      ("a", 1L, 50L, 10L), ("a", 2L, 90L, 5L), ("a", 5L, 80L, 4L),
      ("b", 7L, 80L, 4L), ("b", 9L, 10L, 3L), ("b", 3L, 95L, 6L)
    ).toDF("src", "id", "score", "n_tok")
    val budgets = Seq(("a", 9L), ("b", 7L)).toDF("src", "token_budget")
    val got = ScaleOps.selectTokenBudgetBy(df, "id", "score", "n_tok", "src", budgets)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("id"),
        r.getAs[Long]("cum_tokens"))).toSet
    // a: id2(90,5) cum5, id5(80,4) cum9 <= 9; id1 overflows
    // b: id3(95,6) cum6 <= 7; id7(80,4) cum10 overflows (prefix stops)
    assert(got == Set(("a", 2L, 5L), ("a", 5L, 9L), ("b", 3L, 6L)))
    // equivalence: each group independently == the scalar operator
    for ((g, bud) <- Seq(("a", 9L), ("b", 7L))) {
      val scalar = ScaleOps.selectTokenBudget(
          df.where($"src" === g), "id", "score", "n_tok", bud)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum_tokens"))).toSet
      assert(got.collect { case (`g`, i, c) => (i, c) } == scalar, s"group $g diverged")
    }
    // bucketing never changes the result
    for (nb <- Seq(1, 3)) {
      val g2 = ScaleOps.selectTokenBudgetBy(df.repartition(4), "id", "score",
          "n_tok", "src", budgets, numBuckets = nb)
        .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("id"))).toSet
      assert(g2 == got.map(t => (t._1, t._2)), s"numBuckets=$nb diverged")
    }
    // a group with rows but no budget row raises; duplicate budgets raise
    val missing = intercept[Exception] {
      ScaleOps.selectTokenBudgetBy(df, "id", "score", "n_tok", "src",
        budgets.where($"src" === "a")).collect()
    }
    assert(messages(missing).exists(_.contains("no budget row")), missing.toString)
    val dup = intercept[Exception] {
      ScaleOps.selectTokenBudgetBy(df, "id", "score", "n_tok", "src",
        budgets.unionByName(Seq(("a", 1L)).toDF("src", "token_budget"))).collect()
    }
    assert(messages(dup).exists(_.contains("duplicate budget rows")), dup.toString)
    intercept[IllegalArgumentException] {
      ScaleOps.selectTokenBudgetBy(df, "id", "score", "n_tok", "src",
        budgets.withColumnRenamed("token_budget", "b"))
    }
    // reserved staging names fail loudly instead of being overwritten
    intercept[IllegalArgumentException] {
      ScaleOps.selectTokenBudgetBy(df.withColumn("cum_tokens", lit(1L)),
        "id", "score", "n_tok", "src", budgets)
    }
    intercept[IllegalArgumentException] {
      ScaleOps.selectTokenBudget(df.withColumn("__o", lit(1L)),
        "id", "score", "n_tok", 5L)
    }
  }

  test("selectTokenBudget: exact score-ordered prefix, ties by key, stop at first overflow") {
    // order: id2(90,w5) id5(80,w4) id7(80,w4) id1(50,w10) id9(10,w3)
    //   cum:      5          9          13         23         26
    val df = Seq(
      (1L, 50L, 10L), (2L, 90L, 5L), (5L, 80L, 4L), (7L, 80L, 4L), (9L, 10L, 3L)
    ).toDF("id", "score", "n_tok")
    def sel(budget: Long) = ScaleOps.selectTokenBudget(df, "id", "score", "n_tok", budget)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum_tokens"))).toSet
    assert(sel(13L) == Set((2L, 5L), (5L, 9L), (7L, 13L)))
    // 22 < 23: id1 overflows and the prefix stops BEFORE it even though
    // id9 alone would still fit (prefix rule, not knapsack)
    assert(sel(22L) == Set((2L, 5L), (5L, 9L), (7L, 13L)))
    assert(sel(0L) == Set.empty)
    assert(sel(1000L).map(_._1) == Set(1L, 2L, 5L, 7L, 9L))

    // partitioning-invariant; numBuckets (incl. the degenerate single
    // bucket) never changes the result, only the execution layout
    val base = ScaleOps.selectTokenBudget(df, "id", "score", "n_tok", 13L)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    for (nb <- Seq(1, 2, 7)) {
      val got = ScaleOps.selectTokenBudget(df.repartition(5), "id", "score", "n_tok", 13L,
        numBuckets = nb).collect().map(_.getAs[Long]("id")).sorted.toSeq
      assert(got == base, s"numBuckets=$nb diverged")
    }

    // NULL score raises; NULL token count selects as zero-width
    val withNullScore = Seq((1L, Option(5L), 2L), (2L, Option.empty[Long], 2L))
      .toDF("id", "score", "n_tok")
    val e = intercept[Exception] {
      ScaleOps.selectTokenBudget(withNullScore, "id", "score", "n_tok", 10L).collect()
    }
    assert(messages(e).exists(_.contains("NULL values in order column")), e.toString)
    val withNullTok = Seq((1L, 5L, Option(2L)), (2L, 4L, Option.empty[Long]))
      .toDF("id", "score", "n_tok")
    val z = ScaleOps.selectTokenBudget(withNullTok, "id", "score", "n_tok", 2L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum_tokens"))).toSet
    assert(z == Set((1L, 2L), (2L, 2L))) // zero-width row rides along
  }

  test("exactKSample: exact count, partitioning-invariant, schema preserved") {
    import spark.implicits._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    val got = ScaleOps.exactKSample(docs, "doc_id", 7)
    assert(got.count() == 7L)
    assert(got.columns.toSeq == docs.columns.toSeq, "sampling preserves schema")
    // the kept set is a pure function of the keys — identical after an
    // adversarial repartition
    val a = got.select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = ScaleOps.exactKSample(docs.repartition(7), "doc_id", 7)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // k >= corpus keeps everything; plan is TakeOrderedAndProject, not a
    // single-partition global sort
    assert(ScaleOps.exactKSample(docs, "doc_id", 100000).count() == n)
    val plan = ScaleOps.exactKSample(docs, "doc_id", 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("exactKSampleBy: exactly k per stratum, small strata kept whole") {
    import spark.implicits._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val per = ScaleOps.exactKSampleBy(docs, "doc_id", "source", 2)
      .groupBy($"source").count().collect().map(r => r.getLong(1))
    assert(per.nonEmpty && per.forall(_ == 2L), "every stratum yields exactly k")
    // a stratum smaller than k survives whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")).toDF("id", "src")
    val got = ScaleOps.exactKSampleBy(tiny, "id", "src", 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.count(_._2 == "a") == 2 && got.contains((4L, "b")))
    intercept[IllegalArgumentException] {
      ScaleOps.exactKSampleBy(tiny, "id", "src", 0)
    }
    intercept[IllegalArgumentException] {
      ScaleOps.exactKSampleBy(tiny, "id", "id", 2)
    }
  }

  test("assemblePackedSequences: fold-order ids, boundary offsets, nothing lost or duplicated") {
    import spark.implicits._
    val enc = Seq(
      (1L, Seq(11L, 12L, 13L), 3L),
      (2L, Seq(24L), 1L),
      (3L, Seq.empty[Long], 0L),      // zero-token member: repeated offset, no ids
      (4L, Seq(45L, 46L), 2L),
      (5L, Seq(57L, 58L, 59L, 60L), 4L)
    ).toDF("id", "ids", "n_tokens")
    val packed = ScaleOps.packGreedyContiguous(enc, "id", "n_tokens", 5L, numBuckets = 2)
    val out = ScaleOps.assemblePackedSequences(packed, "id", "ids", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3), r.getLong(4), r.getLong(5)))).toMap
    // driver-side replica: fold order is (mix48(polyHash(id)), id) within pack
    val hOf = enc.select($"id", graft.functions.Mix48.mix48(
        graft.text.TextFunctions.polyHash($"id".cast("string"), 1L << 48)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = packed.collect().map(r => (
      r.getAs[Long]("pack_bucket"), r.getAs[Long]("pack_bin"),
      r.getAs[Long]("id"), r.getAs[scala.collection.Seq[Long]]("ids").toSeq,
      r.getAs[Long]("n_tokens")))
    val expected = members.groupBy(m => (m._1, m._2)).map { case (k, ms) =>
      val sorted = ms.sortBy(m => (hOf(m._3), m._3))
      val ids = sorted.flatMap(_._4)
      val offs = sorted.map(_._5).scanLeft(0L)(_ + _).dropRight(1)
      k -> ((ids.mkString(","), offs.mkString(","), sorted.length.toLong, sorted.map(_._5).sum))
    }
    assert(out == expected)
    // conservation: every input id value appears exactly once across all packs
    val allIds = out.values.flatMap(_._1.split(",").filter(_.nonEmpty).map(_.toLong)).toSeq.sorted
    assert(allIds == Seq(11L, 12L, 13L, 24L, 45L, 46L, 57L, 58L, 59L, 60L))
    intercept[IllegalArgumentException] {
      ScaleOps.assemblePackedSequences(enc, "id", "ids", "n_tokens")
    }
  }

  test("curriculumStages: quartile golden, ties share a stage, columns preserved") {
    import spark.implicits._
    val scored = (1L to 8L).map(s => (s * 10, s)).toDF("id", "score")
    val out = ScaleOps.curriculumStages(scored, "score", 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // interior quartiles of 1..8 interpolate to 2.75 / 4.5 / 6.25:
    // stage = 1 + #(boundaries below score)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L))
    // every input column rides through
    assert(ScaleOps.curriculumStages(scored, "score", 4).columns.toSeq ==
      Seq("id", "score", "stage"))
    // all-equal scores: boundaries all tie the value -> everything stage 1
    val flat = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("id", "score")
    val fl = ScaleOps.curriculumStages(flat, "score", 4)
      .collect().map(_.getLong(2)).toSet
    assert(fl == Set(1L), "equal scores must all land in one stage")
  }

  test("curriculumStages: NULL score fails loudly, guards fail fast") {
    import spark.implicits._
    val scored = Seq((1L, Some(5L)), (2L, None)).toDF("id", "score")
    val e = intercept[Exception] {
      ScaleOps.curriculumStages(scored, "score", 2).collect()
    }
    assert(e.getMessage.contains("NULL values in score column") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL values in score column")))
    val ok = Seq((1L, 5L)).toDF("id", "score")
    intercept[IllegalArgumentException] { ScaleOps.curriculumStages(ok, "score", 1) }
    intercept[IllegalArgumentException] {
      ScaleOps.curriculumStages(ok.withColumn("stage", lit(1)), "score", 2)
    }
  }
}
