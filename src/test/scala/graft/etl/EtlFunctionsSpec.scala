package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EtlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("severity golden: serious=1,death=0,hosp=1 => 7; all-zero => 0 (tests/test_transformers.py:94-104)") {
    val df = Seq((1, 0, 1), (0, 0, 0)).toDF("serious", "seriousnessdeath", "seriousnesshospitalization")
    val got = df.select(EtlFunctions.severityScore(
      col("serious"), col("seriousnessdeath"), col("seriousnesshospitalization")).as("s"))
      .as[Int].collect()
    assert(got.toSeq == Seq(7, 0))
  }

  test("severity null inputs count as 0") {
    val df = Seq((Some(1), None: Option[Int], Some(1))).toDF("serious", "seriousnessdeath", "seriousnesshospitalization")
    val got = df.select(EtlFunctions.severityScore(
      col("serious"), col("seriousnessdeath"), col("seriousnesshospitalization")).as("s"))
      .as[Int].head()
    assert(got == 7)
  }

  test("phase parser truth table incl. EARLY PHASE 1 => 0.5 (tests/test_transformers.py:141-151)") {
    val cases = Seq(
      "PHASE 4" -> 4.0, "PHASE IV" -> 4.0, "PHASE 3" -> 3.0, "PHASE III" -> 3.0,
      "PHASE 2" -> 2.0, "PHASE II" -> 2.0, "PHASE 1" -> 1.0, "PHASE I" -> 1.0,
      "EARLY PHASE 1" -> 0.5, "EARLY_PHASE1" -> 0.5, "NA" -> 0.0, "" -> 0.0,
      "phase 3" -> 3.0, "PHASE 2, PHASE 3" -> 3.0)
    val df = cases.map(_._1).toDF("phase")
      .withColumn("p", EtlFunctions.phaseNumeric(col("phase")))
    val got = df.select("phase", "p").as[(String, Double)].collect().toMap
    for ((in, want) <- cases) assert(got(in) == want, s"phase '$in'")
    // null => 0.0
    val nullGot = Seq(Option.empty[String]).toDF("phase")
      .select(EtlFunctions.phaseNumeric(col("phase")).as("p")).as[Double].head()
    assert(nullGot == 0.0)
  }

  test("pd.cut age binning: right-closed, left-open; outside => null (SURVEY §7.5 #4)") {
    val cases: Seq[(Option[Double], Option[String])] = Seq(
      Some(0.0) -> None, // left edge excluded
      Some(1.0) -> Some("Pediatric"), Some(18.0) -> Some("Pediatric"),
      Some(18.5) -> Some("Young Adult"), Some(30.0) -> Some("Young Adult"),
      Some(45.0) -> Some("Adult"), Some(65.0) -> Some("Senior"),
      Some(66.0) -> Some("Elderly"), Some(100.0) -> Some("Elderly"),
      Some(101.0) -> None, Some(-5.0) -> None, None -> None)
    val df = cases.map(_._1).toDF("age")
      .select(col("age"), EtlFunctions.ageGroup(col("age")).as("g"))
    val got = df.as[(Option[Double], Option[String])].collect().toMap
    for ((in, want) <- cases) assert(got(in) == want, s"age $in")
  }

  test("study size binning: (0,50] Small ... (1000,inf) Very Large") {
    val cases: Seq[(Option[Double], Option[String])] = Seq(
      Some(0.0) -> None, Some(1.0) -> Some("Small"), Some(50.0) -> Some("Small"),
      Some(51.0) -> Some("Medium"), Some(200.0) -> Some("Medium"),
      Some(1000.0) -> Some("Large"), Some(1001.0) -> Some("Very Large"),
      Some(1e9) -> Some("Very Large"))
    val df = cases.map(_._1).toDF("n")
      .select(col("n"), EtlFunctions.studySizeCategory(col("n")).as("g"))
    val got = df.as[(Option[Double], Option[String])].collect().toMap
    for ((in, want) <- cases) assert(got(in) == want, s"enrollment $in")
  }

  test("normalizeForMatching: lower+trim+strip spaces; null => ''") {
    val df = Seq(Some("  Type 2 Diabetes "), Some("LUNG CANCER"), None)
      .toDF("c").select(EtlFunctions.normalizeForMatching(col("c")).as("n"))
    assert(df.as[String].collect().toSeq == Seq("type2diabetes", "lungcancer", ""))
  }
}
