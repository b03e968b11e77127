package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Naive Bayes quality classifier (CorpusStats.naiveBayesQuality) and
  * the blocklist screening expression (TextFunctions.blocklistHitsFrom):
  * hand-computed goldens, guard behavior, salt invariance. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Tiny two-class corpus with hand-computable smoothed log-odds:
  //   V=5, T1=T0=5 so (T0+V)=(T1+V)=10 cancels and
  //   s(tok) = ⌊1000·ln((c1+1)/(c0+1))⌋:
  //   good (3,1)→693, fine (1,0)→693, nice (1,0)→693,
  //   bad (0,3)→-1387, awful (0,1)→-694; prior = ⌊1000·ln(3/2)⌋ = 405.
  private def corpus = Seq(
    (1L, "good good fine", 1L),
    (2L, "good nice", 1L),
    (3L, "bad bad awful", 0L),
    (4L, "bad good", 0L),
    (5L, "", 1L)
  ).toDF("doc_id", "text", "y")

  test("naive bayes: hand-computed golden incl. prior-only empty doc") {
    val got = CorpusStats.naiveBayesQuality(corpus, "doc_id", "text", "y")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((1L, 3L, 693L * 3 + 405L, 1L)))
    assert(got(2L) == ((1L, 2L, 693L * 2 + 405L, 1L)))
    assert(got(3L) == ((0L, 3L, -1387L * 2 - 694L + 405L, 0L)))
    assert(got(4L) == ((0L, 2L, -1387L + 693L + 405L, 0L)))
    assert(got(5L) == ((1L, 0L, 405L, 1L)), "token-less doc carries the bare prior")
  }

  test("naive bayes: salted join is result-identical") {
    val plain = CorpusStats.naiveBayesQuality(corpus, "doc_id", "text", "y")
    val salted = CorpusStats.naiveBayesQuality(corpus, "doc_id", "text", "y",
      saltFactor = 4)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("naive bayes: fails loudly on bad labels and one-class corpora") {
    val badLabel = Seq((1L, "a", 2L), (2L, "b", 0L)).toDF("doc_id", "text", "y")
    val e1 = intercept[Exception] {
      CorpusStats.naiveBayesQuality(badLabel, "doc_id", "text", "y").collect()
    }
    assert(messages(e1).exists(_.contains("must be 0 or 1")))
    val nullLabel = Seq((1L, "a", Some(1L)), (2L, "b", None))
      .toDF("doc_id", "text", "y")
    val e2 = intercept[Exception] {
      CorpusStats.naiveBayesQuality(nullLabel, "doc_id", "text", "y").collect()
    }
    assert(messages(e2).exists(_.contains("must be 0 or 1")))
    val oneClass = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("doc_id", "text", "y")
    val e3 = intercept[Exception] {
      CorpusStats.naiveBayesQuality(oneClass, "doc_id", "text", "y").collect()
    }
    assert(messages(e3).exists(_.contains("both classes")))
  }

  test("naive bayes: separates the testdata sources its labels name") {
    // Not a tuning assertion — the classifier trained on src0-3-vs-rest
    // weak labels must at least score its own positive class higher on
    // average than the negative class (otherwise the evidence join or
    // the prior sign is broken).
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("y", when(col("source").isin("src0", "src1", "src2", "src3"), 1L)
        .otherwise(0L))
    val scored = CorpusStats.naiveBayesQuality(docs, "doc_id", "text", "y")
    val means = scored.groupBy(col("label")).agg(avg(col("nb_milli")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    info(s"mean nb_milli: label1=${means(1L)} label0=${means(0L)}")
    assert(means(1L) > means(0L))
  }

  test("blocklist hits: exact token match, case fold, duplicate terms collapse") {
    val ts = TextFunctions.tokens(col("text"))
    val got = Seq(
      (1L, "the Slow slow pass"),     // 2 hits (case-folded), 'pass' is clean
      (2L, "slowest passes"),         // 0 — exact token match, no substring
      (3L, ""),                       // 0 tokens
      (4L, "leak crash leak")         // 3 hits
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.blocklistHitsFrom(ts, Seq("SLOW", "slow", "leak", "crash"))
          .as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 2, 2L -> 0, 3L -> 0, 4L -> 3))
    intercept[IllegalArgumentException] {
      TextFunctions.blocklistHitsFrom(ts, Seq.empty)
    }
  }
}
