package graft.ops

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.CorpusStats
import org.apache.spark.sql.functions._

/** Hot-key behavior of the two operators with documented skew caveats:
  * TF-IDF's token-keyed tf⋈df join (a corpus-wide token is hot when the
  * group count is large) and the inverted-index Jaccard's posting
  * self-join (an ultra-common shingle contributes d² candidate pairs).
  * Fixtures make one key orders of magnitude hotter than the median,
  * with AQE skew thresholds forced low enough that a split WILL happen
  * wherever Spark supports it — so each test pins which mitigation
  * actually engages: AQE's skew split for the posting self-join, the
  * df-cap for the tf⋈df shape (where stage reuse blocks AQE). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** Thresholds low enough that any supported skewed join splits. */
  private def withSkewConfs[A](body: => A): A = {
    val pairs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      // coalescing would merge the upstream stage to one mapper, and skew
      // splits happen at mapper granularity — keep the mappers apart
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB")
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Execute the frame's own QueryExecution (no derived count plan) and
    * report whether AQE applied a skew-join split anywhere. */
  private def ranWithSkewSplit(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString.contains("skew=true")
  }

  test("inverted-index Jaccard posting self-join: AQE skew split engages on a hot shingle") {
    // 2000 docs all sharing the token "hot": the posting self-join key
    // carries 2000 rows on each side against a median of one.
    val docs = (0 until 2000).map(i => (i.toLong, s"hot w$i")).toDF("doc_id", "text")
    withSkewConfs {
      val pairs = Dedup.jaccardPairsInverted(docs, "doc_id", "text",
        shingleSize = 1, threshold = 0.0)
      assert(ranWithSkewSplit(pairs),
        "AQE skew-join did not split the hot posting partition")
    }
  }

  test("TF-IDF under a 30000x-hot token: stage reuse blocks AQE, df-cap is the mitigation") {
    // 30000 groups, every document carrying the same hot token plus one
    // group-unique token — the tf⋈df join key "hot" carries 30000 rows
    // while the median key carries one.
    val docs = (0 until 30000).map(g => (s"g$g", s"hot u$g")).toDF("source", "text")
    withSkewConfs {
      // Pin the measured Spark 4.1 behavior the class doc documents: the
      // df side derives from the tf side, the shared stage is reused, and
      // OptimizeSkewedJoin does NOT fire even at these forced thresholds
      // (SortMergeJoin forms, no skew=true). If a Spark upgrade changes
      // this, the doc and the dfCap guidance should be revisited.
      val uncapped = CorpusStats.tfIdfTopTerms(docs, "text", "source", k = 1)
      val split = ranWithSkewSplit(uncapped)
      val plan = uncapped.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a shuffle join:\n$plan")
      assert(!split, "AQE began splitting the tf-df join — update CorpusStats docs")

      // correctness under the hot key: idf of the hot token is ln(N/N)=0,
      // so every group's distinctive term is its unique token
      val rows = uncapped.collect()
      assert(rows.length == 30000)
      rows.foreach { r =>
        assert(r.getAs[String]("term") == "u" + r.getAs[String]("source").drop(1))
      }

      // the df-cap removes the hot key from the join entirely and leaves
      // every surviving row identical to the uncapped run
      val capped = CorpusStats.tfIdfTopTerms(docs, "text", "source", k = 1,
        dfCap = Some(15000L))
      val cappedRows = capped.collect()
      assert(cappedRows.length == 30000)
      assert(cappedRows.map(_.toString).sorted.toSeq ==
        rows.map(_.toString).sorted.toSeq,
        "df-cap changed surviving rankings")
      // and no "hot" row ever reaches the scored frame under the cap:
      // top-2 per group under the cap has only one token per group
      val top2 = CorpusStats.tfIdfTopTerms(docs, "text", "source", k = 2,
        dfCap = Some(15000L))
      assert(top2.where($"term" === "hot").count() == 0)

      // saltFactor: the tf-df join runs salted — the hot token's rows
      // spread over 8 (tok, __salt) reducer keys instead of one — and
      // the result is EXACTLY the plain join's
      val salted = CorpusStats.tfIdfTopTerms(docs, "text", "source", k = 1,
        saltFactor = 8)
      val saltedRows = salted.collect()
      assert(salted.queryExecution.executedPlan.toString.contains("__salt"),
        "saltFactor did not route the tf-df join through the salted form")
      assert(saltedRows.map(_.toString).sorted.toSeq ==
        rows.map(_.toString).sorted.toSeq,
        "salted tf-df join changed results")
    }
  }

  test("unigram surprisal saltFactor: salted postings join is result-identical") {
    val docs = (0 until 500).map(i => (i.toLong, s"hot hot w$i")).toDF("doc_id", "text")
    val plain = CorpusStats.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val salted = CorpusStats.unigramSurprisal(docs, "doc_id", "text", saltFactor = 4)
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
    assert(salted.collect().map(_.toString).sorted.toSeq == plain)
  }

  test("inverted-index Jaccard df-cap: hot shingle dropped, equals pre-filtered exact form") {
    // Every doc shares the token "hot" (df = 200 — the d² key); pairs
    // 2i/2i+1 additionally share three rare tokens (their real signal).
    val docs = (0 until 200).map { i =>
      val p = i / 2
      (i.toLong, s"hot a$p b$p c$p x$i")
    }.toDF("doc_id", "text")
    val capped = Dedup.jaccardPairsInverted(docs, "doc_id", "text",
        shingleSize = 1, threshold = 0.5, maxDf = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ground truth: the same corpus with the hot token physically removed
    val filtered = docs.select($"doc_id",
      regexp_replace($"text", "hot ", "").as("text"))
    val exact = Dedup.jaccardPairsInverted(filtered, "doc_id", "text",
        shingleSize = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == exact, "df-cap must equal exact Jaccard on the capped universe")
    // the signal pairs survive: {a,b,c} shared of {a,b,c,x_i} -> J = 3/5
    assert(capped.size == 100)
    assert(capped.forall { case (a, b, j) => b == a + 1 && math.abs(j - 0.6) < 1e-9 })
    // and the uncapped form on this fixture pairs everything: the hot
    // posting alone yields 200·199/2 candidates — the cap is what keeps
    // the pair join proportional to the true signal
    val uncapped = Dedup.jaccardPairsInverted(docs, "doc_id", "text",
      shingleSize = 1, threshold = 0.0)
    assert(uncapped.count() == 200L * 199 / 2)
  }
}
