package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style invariants the reference never tested (SURVEY §5):
  * seeded random inputs, whole-vector evaluation in one Spark job per
  * property. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("binning totality: every double maps to a configured label or null, right-closed") {
    val values = Seq.fill(2000)(rnd.nextDouble() * 250 - 25) ++
      Seq(0.0, 18.0, 18.0000001, 100.0, 100.0000001, -0.0, Double.MinPositiveValue)
    val df = values.toDF("v").select($"v", EtlFunctions.ageGroup($"v").as("g"))
    val got = df.as[(Double, Option[String])].collect()
    val labels = EtlFunctions.AgeLabels.toSet
    assert(got.forall { case (_, g) => g.forall(labels.contains) })
    // right-closed edges: (0,18] Pediatric etc.
    for ((v, g) <- got) {
      val expected =
        if (v > 0 && v <= 18) Some("Pediatric")
        else if (v > 18 && v <= 30) Some("Young Adult")
        else if (v > 30 && v <= 50) Some("Adult")
        else if (v > 50 && v <= 65) Some("Senior")
        else if (v > 65 && v <= 100) Some("Elderly")
        else None
      assert(g == expected, s"v=$v")
    }
  }

  test("phase parser totality: arbitrary strings map into {0, 0.5, 1, 2, 3, 4}") {
    val alphabet = "PHASE IV123E abcxyz-_/|"
    val values = Seq.fill(1000)(
      (0 until rnd.nextInt(20)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("", "PHASE IIII", "PHASEI", "EARLY", "phase iv")
    val got = values.toDF("p")
      .select(EtlFunctions.phaseNumeric($"p").as("n")).as[Double].collect()
    assert(got.forall(Set(0.0, 0.5, 1.0, 2.0, 3.0, 4.0).contains))
  }

  test("keep-first dedup is idempotent and never increases distinct keys") {
    val rows = Seq.fill(500)((rnd.nextInt(50).toString, rnd.nextInt(1000)))
    val df = rows.toDF("k", "v")
    val once = FdaTransform.keepFirst(df, "k")
    val twice = FdaTransform.keepFirst(once, "k")
    assert(once.count() == df.select("k").distinct().count())
    assert(twice.collect().toSet == once.collect().toSet)
  }

  test("normalizeForMatching is idempotent") {
    val values = Seq.fill(500)(
      (0 until rnd.nextInt(30)).map(_ => " AZaz09 ?!"(rnd.nextInt(10))).mkString)
    val df = values.toDF("s").select(
      EtlFunctions.normalizeForMatching($"s").as("n1"),
      EtlFunctions.normalizeForMatching(
        EtlFunctions.normalizeForMatching($"s")).as("n2"))
    assert(df.where($"n1" =!= $"n2").isEmpty)
  }

  test("enrichment zero-fill invariant: trial stats are never null or negative") {
    val conditions = Seq("HEADACHE", "CANCER", "FLU", "DIABETES")
    val fda = (1 to 50).map(i => (s"DRUG${rnd.nextInt(10)}",
      conditions(rnd.nextInt(4)).toLowerCase + (if (rnd.nextBoolean()) "" else "xyz"),
      s"R$i", rnd.nextInt(20).toDouble, rnd.nextInt(2).toLong, rnd.nextInt(2).toLong))
      .toDF("drug_name_clean", "drug_indication", "safetyreportid",
        "severity_score", "seriousnessdeath", "seriousnesshospitalization")
    val ct = (1 to 20).map(i => (conditions(rnd.nextInt(4)), s"NCT$i",
      rnd.nextInt(1000).toDouble, rnd.nextBoolean()))
      .toDF("conditions_clean", "nct_id", "enrollment_count", "is_completed")
    val out = Enrichment.enrich(fda, ct)
    assert(out.where($"trial_count".isNull || $"trial_count" < 0 ||
      $"total_enrollment".isNull || $"total_enrollment" < 0 ||
      $"completed_trials".isNull || $"completed_trials" < 0).isEmpty)
    // every drug from the FDA side survives the left-outer join
    assert(out.count() == fda.select("drug_name_clean").distinct().count())
  }

  test("configurable severity weights flow through the transform") {
    val cfg = graft.pipeline.PipelineConfig(
      severity = graft.pipeline.SeverityWeights(1, 1, 1))
    val df = Seq(("1", 1L, 0L, 1L)).toDF("safetyreportid", "serious",
      "seriousnessdeath", "seriousnesshospitalization")
    assert(FdaTransform(df, cfg).head().getAs[Long]("severity_score") == 2L)
    assert(FdaTransform(df).head().getAs[Long]("severity_score") == 7L)
  }

  test("polyHash range and determinism over random unicode strings") {
    val alphabet = "abz09 .!Ωé中𝄞\t"
    val values = Seq.fill(2000)(
      (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("", " ", "a" * 1000)
    for (mod <- Seq(1L << 31, 1L << 48)) {
      val got = values.toDF("s")
        .select(graft.text.TextFunctions.polyHash($"s", mod).as("h"))
        .as[Long].collect()
      assert(got.forall(h => h >= 0 && h < mod))
      // determinism across evaluations
      val again = values.toDF("s")
        .select(graft.text.TextFunctions.polyHash($"s", mod).as("h"))
        .as[Long].collect()
      assert(got.toSeq == again.toSeq)
    }
  }

  test("sampling monotonicity: kept fraction is non-decreasing in the rate") {
    val docs = spark.range(4000).select($"id".as("k")).toDF()
    val kept = Seq(0, 500, 2500, 5000, 10000).map { bp =>
      bp -> graft.ops.ScaleOps.deterministicSampleBp(docs, "k", bp).count()
    }
    assert(kept.head._2 == 0L && kept.last._2 == 4000L)
    assert(kept.sliding(2).forall { case Seq((_, a), (_, b)) => a <= b })
    // and roughly on-rate in the middle
    val quarter = kept.find(_._1 == 2500).get._2 / 4000.0
    assert(math.abs(quarter - 0.25) < 0.05, s"25% rate kept $quarter")
  }

  test("chunking invariants over random (n, size, stride): coverage, bounds, count") {
    val cases = Seq.fill(120) {
      val size = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(size)
      val n = rnd.nextInt(40)
      (n, size, stride)
    } ++ Seq((0, 5, 5), (1, 1, 1), (39, 12, 1))
    val rows = cases.zipWithIndex.map { case ((n, _, _), i) =>
      (i, (1 to n).map(t => s"w$t").mkString(" "))
    }.toDF("case_id", "text")
    val byCase = cases.zipWithIndex.map { case (c, i) => i -> c }.toMap
    // run every case through the fused expression in one job per (size, stride)
    cases.zipWithIndex.groupBy { case ((_, s, d), _) => (s, d) }.foreach {
      case ((size, stride), group) =>
        val ids = group.map(_._2).toSet
        val got = rows.where($"case_id".isin(ids.toSeq: _*))
          .select($"case_id",
            graft.text.TextFunctions.tokenChunksFrom(
              graft.text.TextFunctions.tokens($"text"), size, stride).as("chunks"))
          .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
        got.foreach { case (id, chunks) =>
          val (n, _, _) = byCase(id)
          if (n == 0) assert(chunks.isEmpty)
          else {
            // expected chunk count: starts 1, 1+stride, … ≤ max(n−size+stride, 1)
            val m = math.max(n - size + stride, 1)
            val expected = (m + stride - 1) / stride
            assert(chunks.length == expected,
              s"n=$n size=$size stride=$stride got ${chunks.length}")
            val toks = chunks.flatMap(_.split(" "))
            // every token covered, in order within each chunk, none invented
            assert(toks.toSet == (1 to n).map(t => s"w$t").toSet,
              s"coverage broken: n=$n size=$size stride=$stride")
            chunks.zipWithIndex.foreach { case (c, ci) =>
              val ws = c.split(" ")
              val start = ci * stride + 1
              assert(ws.toSeq == (start until math.min(start + size, n + 1)).map(t => s"w$t"),
                s"chunk $ci wrong window: n=$n size=$size stride=$stride")
            }
          }
        }
    }
  }

  test("intervalJoin equals the naive theta join on random fixtures across widths") {
    // random points and intervals spanning negatives and zero-length
    // intervals; every width must reproduce the exact theta-join pairs
    val pts = Seq.tabulate(300)(i => (i.toLong, rnd.nextLong() % 10000L))
      .toDF("pid", "pt")
    val ivs = Seq.tabulate(120) { i =>
      val lo = rnd.nextLong() % 10000L
      (1000L + i, lo, lo + rnd.nextInt(800).toLong)
    }.toDF("iid", "lo", "hi")
    val naive = pts.join(ivs, $"pt" >= $"lo" && $"pt" <= $"hi")
      .select($"iid", $"pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture produced no pairs")
    for (w <- Seq(1L, 7L, 100L, 799L, 100000L)) {
      val got = graft.ops.ScaleOps.intervalJoin(pts, ivs, "pt", "lo", "hi", w)
        .select($"iid", $"pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width $w: ${(naive -- got).take(3)} missing, " +
        s"${(got -- naive).take(3)} extra")
    }
  }

  test("zValueN bijectivity and prefix-locality on random coordinates") {
    val dims = 3; val bits = 5
    val coords = Seq.fill(400)((rnd.nextInt(32).toLong, rnd.nextInt(32).toLong,
      rnd.nextInt(32).toLong)).distinct
    val z = coords.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        graft.ops.ZOrder.zValueN(Seq($"a", $"b", $"c"), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    // injective over distinct coordinates, bounded to dims*bits bits
    assert(z.values.toSet.size == coords.size)
    assert(z.values.forall(v => v >= 0 && v < (1L << (dims * bits))))
    // locality: equal high halves of every coordinate ⇒ equal z prefix
    val half = bits / 2 + 1
    z.keys.toSeq.combinations(2).take(2000).foreach { case Seq(p, q) =>
      val sameHigh = Seq(p._1 ^ q._1, p._2 ^ q._2, p._3 ^ q._3)
        .forall(x => (x >> (bits - half)) == 0)
      if (sameHigh)
        assert((z(p) >> (dims * (bits - half))) == (z(q) >> (dims * (bits - half))))
    }
  }
}
