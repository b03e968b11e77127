package graft.pipeline

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("full curation pipeline: monotone stages, deterministic, eval-clean, dup-free") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val eval = docs.where($"source" === "src0").select($"text")
    val cfg = Curation.CurationConfig(minQualityMilli = 300, sampleBp = 8000)

    val (out, Some(report)) = Curation.curate(docs, Some(eval), cfg)
    val outRows = out.select($"doc_id").as[Long].collect().toSet

    // stage counts shrink monotonically and the report matches the frame
    assert(report.input >= report.afterCore)
    assert(report.afterCore >= report.afterNearDup)
    assert(report.afterNearDup >= report.afterContamination)
    assert(report.afterContamination >= report.output)
    assert(report.output == outRows.size)
    assert(report.output > 0, "curation must keep something at these settings")

    // deterministic: identical membership on a re-run
    val (out2, _) = Curation.curate(docs, Some(eval), cfg, countStages = false)
    assert(out2.select($"doc_id").as[Long].collect().toSet == outRows)

    // no output text fingerprint appears in the eval set
    val evalFps = eval.select(TextFunctions.fingerprint($"text").as("fp"))
      .as[Long].collect().toSet
    val outFps = out.select(TextFunctions.fingerprint($"text").as("fp"))
      .as[Long].collect()
    assert(outFps.forall(fp => !evalFps.contains(fp)))

    // exact dedup held: all surviving texts distinct
    assert(out.select($"text").distinct().count() == report.output)
  }

  test("span decontamination drops a doc that embeds an eval passage inside larger text") {
    def filler(i: Int, n: Int): String =
      (0 until n).map(k => s"w${i}x$k").mkString(" ")
    val evalText = "the held out benchmark question about spark partitions exactly here"
    val docs = Seq(
      // clean doc, long enough to pass the gate
      (1L, "s0", filler(1, 30)),
      // embeds the 10-token eval passage inside unrelated text: exact
      // whole-doc identity decontamination misses it; span-level must not
      (2L, "s0", filler(2, 15) + " " + evalText + " " + filler(20, 15)),
      (3L, "s0", filler(3, 30))
    ).toDF("doc_id", "source", "text")
    val eval = Seq(Tuple1(evalText)).toDF("text")
    val base = Curation.CurationConfig(minQualityMilli = 0, maxRepetitionBp = 10000)

    // exact-identity-only decontamination keeps the embedding doc
    val (exactOnly, _) = Curation.curate(docs, Some(eval), base, countStages = false)
    assert(exactOnly.where($"doc_id" === 2L).count() == 1)

    // span decontamination at 8 tokens drops it, keeps the clean docs
    val (spanned, _) = Curation.curate(docs, Some(eval),
      base.copy(spanDecontaminationTokens = Some(8)), countStages = false)
    assert(spanned.where($"doc_id" === 2L).isEmpty)
    assert(spanned.where($"doc_id".isin(1L, 3L)).count() == 2)

    // the operator itself reports the leak with its window count
    val leaks = graft.dedup.Dedup.spanContamination(
        docs, "doc_id", "text", eval, "text", spanTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(leaks.keySet == Set(2L))
    assert(leaks(2L) == 3L) // a 10-token passage has 3 8-token windows
  }

  test("incremental recuration: empty-prev degenerates to curate exactly") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val eval = docs.where($"source" === "src0").select($"text")
    val cfg = Curation.CurationConfig(minQualityMilli = 300, sampleBp = 8000)
    val empty = docs.where(lit(false))
    val (full, _) = Curation.curate(docs, Some(eval), cfg, countStages = false)
    val incr = Curation.curateIncrement(empty, empty.select($"doc_id", $"source", $"text"),
      docs, Some(eval), cfg)
    assert(incr.select($"doc_id").as[Long].collect().toSet ==
      full.select($"doc_id").as[Long].collect().toSet)
  }

  test("incremental recuration: idempotent on an unchanged snapshot; removed/changed handled") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val cfg = Curation.CurationConfig(minQualityMilli = 300, sampleBp = 8000)
    val v1 = docs.where(pmod($"doc_id", lit(4)) =!= 0)
    val (out1, _) = Curation.curate(v1, None, cfg, countStages = false)
    val out1Ids = out1.select($"doc_id").as[Long].collect().toSet

    // unchanged snapshot → previous output verbatim
    val same = Curation.curateIncrement(v1, out1, v1, None, cfg)
    assert(same.select($"doc_id").as[Long].collect().toSet == out1Ids)

    // v2: drop ids ≡ 1 mod 16, add the held-out quarter back
    val v2 = docs.where(pmod($"doc_id", lit(16)) =!= 1)
    val incr = Curation.curateIncrement(v1, out1, v2, None, cfg)
    val incrIds = incr.select($"doc_id").as[Long].collect().toSet
    val v2Ids = v2.select($"doc_id").as[Long].collect().toSet
    // outputs only come from the new snapshot; removed docs are gone
    assert(incrIds.subsetOf(v2Ids))
    // carried docs not touched by the delta survive
    assert((out1Ids intersect incrIds).nonEmpty)
    assert(out1Ids.filter(_ % 16 == 1).forall(id => !incrIds.contains(id)))
    // no exact-duplicate texts in the merged output (first-writer-wins held)
    assert(incr.select($"text").distinct().count() == incr.count())
    // deterministic
    val incr2 = Curation.curateIncrement(v1, out1, v2, None, cfg)
    assert(incr2.select($"doc_id").as[Long].collect().toSet == incrIds)
  }
  test("htmlInput: curating HTML-wrapped pages == curating the plain text") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .limit(120)
    // pure-markup wrapper (no textual content of its own) with the
    // extraction traps embedded: bare '<' inside the script, a comment,
    // entities that must NOT appear in the output
    val wrapped = docs.withColumn("text", concat(
      lit("<html><head><style>p { a: 1 < 2 }</style></head>" +
        "<body><!-- wrap --><p class=\"x\">"),
      coalesce($"text", lit("")),
      lit("</p><script>var q = '</p>';</script></body></html>")))
    val cfgPlain = Curation.CurationConfig(minQualityMilli = 300)
    val cfgHtml = cfgPlain.copy(htmlInput = true)
    val plain = Curation.curate(docs, None, cfgPlain, countStages = false)._1
      .collect().map(_.toString).sorted.toSeq
    val fromHtml = Curation.curate(wrapped, None, cfgHtml, countStages = false)._1
      .collect().map(_.toString).sorted.toSeq
    assert(plain.nonEmpty && fromHtml == plain,
      "every stage (quality, fingerprints, near-dup, sample) must see the extracted text")
    // without the flag the markup leaks into the corpus (the guard that
    // proves the flag is load-bearing)
    val leaked = Curation.curate(wrapped, None, cfgPlain, countStages = false)._1
    assert(leaked.where($"text".contains("<p")).count() > 0 ||
      leaked.count() != plain.size)
  }

  test("c4LineClean + gopherRules stages: curate(raw) == curate(hand-precleaned)") {
    // pages crafted around the rule set: a healthy multi-line page, a
    // page whose junk lines clean away, a code page ('{' -> page drop),
    // and a page that survives cleaning but fails Gopher's word count
    def healthy(i: Int) =
      (s"the quick brown fox number $i jumps over the lazy dog and " +
        s"that fence with the friends of fox $i to have some more fun here.\n") * 3
    val docs = Seq(
      (1L, "s0", healthy(1)),
      (2L, "s0", healthy(2) + "junk line without punctuation\nshort one.\n"),
      (3L, "s0", healthy(3) + "var f = function() { return 1; }\n"),
      (4L, "s0", "a tiny kept line with the fox.\n")).toDF("doc_id", "source", "text")
    val cfg = Curation.CurationConfig(minQualityMilli = 0, sampleBp = 10000,
      maxRepetitionBp = 10000, // the repeated healthy line is deliberate
      c4LineClean = true, gopherRules = true)
    val out = Curation.curate(docs, None, cfg, countStages = false)._1
    // 3 drops at page level ('{'), 4 fails gopher word count, junk
    // lines of 2 clean away -> 1 and 2 survive with equal cleaned text?
    // no: different numbers keep them distinct
    val ids = out.select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"expected {1,2}, got $ids")
    // composition law: the staged flags == hand-applied QualityRules
    // then default curate
    val pre = graft.text.QualityRules.c4Clean(docs, "text")
      .where($"keep" === 1L)
      .select($"doc_id", $"source", $"clean_text".as("text"))
    val pre2 = graft.text.QualityRules.gopherRules(pre, "text")
      .where($"keep" === 1L)
      .select($"doc_id", $"source", $"text")
    val manual = Curation.curate(pre2, None,
        cfg.copy(c4LineClean = false, gopherRules = false),
        countStages = false)._1
      .collect().map(_.toString).sorted.toSeq
    assert(out.collect().map(_.toString).sorted.toSeq == manual)
  }

  test("gopherRepetition stage: curate(raw) == curate(hand-pregated)") {
    val docs = Seq(
      (1L, "s0", "the quick brown fox jumps over a lazy dog near town while " +
        "every word here appears once so nothing repeats at all today"),
      (2L, "s0", ("spam ham " * 40).trim), // n-gram stutter: drops
      (3L, "s0", "same line again\nsame line again\nsame line again")) // dup lines
      .toDF("doc_id", "source", "text")
    val cfg = Curation.CurationConfig(minQualityMilli = 0,
      maxRepetitionBp = 10000, gopherRepetition = true)
    val out = Curation.curate(docs, None, cfg, countStages = false)._1
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(1L),
      "the stutter and dup-line pages must drop, the calm page survives")
    val pre = graft.text.QualityRules.gopherRepetition(docs, "doc_id", "text")
      .where($"keep" === 1L)
      .select($"doc_id", $"source", $"text")
    val manual = Curation.curate(pre, None,
        cfg.copy(gopherRepetition = false), countStages = false)._1
      .collect().map(_.toString).sorted.toSeq
    assert(out.collect().map(_.toString).sorted.toSeq == manual,
      "the staged flag must equal the hand-applied gate + default curate")
  }

}
