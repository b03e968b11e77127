package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added / removed / changed / unchanged") {
    val oldSnap = Seq(
      (1L, "alpha beta"), // unchanged
      (2L, "gamma"),      // changed in new
      (3L, "delta"))      // removed
      .toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "alpha beta"),
      (2L, "gamma prime"),
      (4L, "epsilon"))    // added
      .toDF("doc_id", "text")
    val out = Snapshot.diff(oldSnap, newSnap, "doc_id", "text")
      .select($"doc_id", $"status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("whitespace-only edits are identity-preserving (normalized fingerprint)") {
    val oldSnap = Seq((1L, "alpha  beta")).toDF("doc_id", "text")
    val newSnap = Seq((1L, " alpha beta ")).toDF("doc_id", "text")
    val out = Snapshot.diff(oldSnap, newSnap, "doc_id", "text").head()
    assert(out.getAs[String]("status") == "unchanged")
  }

  test("NULL text reads as present, compares null-safely") {
    val oldSnap = Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text")
    val newSnap = Seq((1L, null: String), (2L, "now has text")).toDF("doc_id", "text")
    val out = Snapshot.diff(oldSnap, newSnap, "doc_id", "text")
      .select($"doc_id", $"status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // a present-but-null document is NOT "added"/"removed"; null == null
    // identity is unchanged, null -> text is changed
    assert(out == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("empty snapshots: everything added / everything removed / empty diff") {
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val empty = docs.where(lit(false))
    val allAdded = Snapshot.diff(empty, docs, "doc_id", "text")
      .select($"status").distinct().collect().map(_.getString(0)).toSet
    assert(allAdded == Set("added"))
    val allRemoved = Snapshot.diff(docs, empty, "doc_id", "text")
      .select($"status").distinct().collect().map(_.getString(0)).toSet
    assert(allRemoved == Set("removed"))
    assert(Snapshot.diff(empty, empty, "doc_id", "text").count() == 0)
  }

  test("diffSummary counts cover the id union and match the detail frame") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val oldSnap = docs.where(pmod($"doc_id", lit(5)) =!= 0)
    val newSnap = docs.where(pmod($"doc_id", lit(5)) =!= 1)
      .withColumn("text",
        when(pmod($"doc_id", lit(3)) === 0, concat($"text", lit(" rev2")))
          .otherwise($"text"))
    val detail = Snapshot.diff(oldSnap, newSnap, "doc_id", "text")
    val summary = Snapshot.diffSummary(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = detail.groupBy($"status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == expected)
    assert(summary.keySet == Set("added", "removed", "changed", "unchanged"))
    val unionIds = oldSnap.select("doc_id").union(newSnap.select("doc_id"))
      .distinct().count()
    assert(summary.values.sum == unionIds)
  }

  test("diff raises on NULL and non-numeric ids instead of double-reporting") {
    val good = Seq((1L, "a")).toDF("doc_id", "text")
    val nullId = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      Snapshot.diff(nullId, good, "doc_id", "text").collect()
    }
    assert(messages(e1).exists(_.contains("NULL or non-numeric")), e1.toString)
    val strId = Seq(("not-a-number", "a")).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      Snapshot.diff(good, strId, "doc_id", "text").collect()
    }
    assert(messages(e2).exists(_.contains("NULL or non-numeric")), e2.toString)
  }
}
