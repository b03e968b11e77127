package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Substantiates the SCALE.md claim that versioned-lake operations are
  * exchange-free when snapshots are bucketed by the key: writes real
  * bucketed tables and asserts the plans. */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def withTables[A](names: String*)(body: => A): A =
    try body
    finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("bucketed snapshots: Snapshot.diff plans with ZERO exchanges") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    withTables("snap_a", "snap_b") {
      docs.write.mode("overwrite")
        .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("snap_a")
      docs.withColumn("text",
          when($"doc_id" % 10 === 0, concat($"text", lit(" changed"))).otherwise($"text"))
        .write.mode("overwrite")
        .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("snap_b")
      val diff = Snapshot.diff(spark.table("snap_a"), spark.table("snap_b"),
        "doc_id", "text")
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed snapshot diff must be exchange-free:\n$plan")
      // and it is the same answer the unbucketed path gives
      val changed = diff.where($"status" === "changed").count()
      assert(changed == docs.where($"doc_id" % 10 === 0).count())
      assert(diff.where($"status" === "unchanged").count() == docs.count() - changed)
    }
  }

  test("bucketed corpus: exact-identity anti-join (incremental merge shape) is exchange-free on the bucketed side") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    withTables("corpus_b") {
      docs.write.mode("overwrite")
        .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("corpus_b")
      val delta = docs.limit(50)
      // force the shuffle-join form so the exchange count is decisive:
      // exactly ONE shuffle (the delta side repartitioning to the
      // corpus's bucketing); the 100 TB corpus side reads in place
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("corpus_b")
          .join(delta.select($"doc_id"), Seq("doc_id"), "left_anti")
        val plan = joined.queryExecution.executedPlan.toString
        assert(joined.count() == docs.count() - 50)
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(shuffles == 1,
          s"bucketed corpus side must not re-shuffle (want 1 delta-side exchange, got $shuffles):\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }
}
