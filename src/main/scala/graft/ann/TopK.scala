package graft.ann

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Exact two-level per-query top-k — the scale fix for the coarse-scan
  * ANN family (q58/q110/q181/q182 shape): a bare
  * `Window.partitionBy(query_id)` ranks ALL n corpus candidates for a
  * query inside ONE task, which at 10⁹ vectors is one task sorting 10⁹
  * rows. [[prunePerPartition]] first keeps, per (input partition,
  * query), only the k best rows under the IDENTICAL ordering the final
  * window uses — a bounded insertion top-k inside mapPartitions, the
  * [[Ann.ivfProbes]] fused-kernel discipline — so the window's input
  * shrinks from n to ≤ numPartitions × |Q| × k rows while the final
  * ranking (and therefore every oracle) is bit-identical: per-query
  * top-k is distributive over any partitioning of the candidates, and
  * the (key, id) ordering is total because candidate ids are unique
  * per query at every call site.
  *
  * Ordering contract (must mirror the Spark window
  * `orderBy(col(key).desc, col(id).asc)` exactly): key descending with
  * SQL semantics — nulls LAST (desc default), NaN greatest,
  * -0.0 == 0.0 — ties broken by id ascending. Key types: long / int /
  * double (the fx fixed-point sums and the coarse double scores). */
object TopK {

  /** Keep the per-partition per-query top-k rows of `scored`, schema
    * preserved, output order unspecified (the caller's final window
    * re-sorts). `idCol` must be LongType; `queryCol` is compared by
    * value equality. */
  def prunePerPartition(scored: DataFrame, queryCol: String, keyCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, s"prunePerPartition: k must be positive: $k")
    val schema = scored.schema
    val qi = schema.fieldIndex(queryCol)
    val ki = schema.fieldIndex(keyCol)
    val ii = schema.fieldIndex(idCol)
    // ids dispatch on type like the key does: a caller whose corpus
    // carries int ids ranked fine under the plain window and must keep
    // working through the prune
    val idKind: Int = schema(ii).dataType match {
      case LongType => 0
      case IntegerType => 1
      case dt => throw new IllegalArgumentException(
        s"prunePerPartition: id column '$idCol' must be integral, got $dt")
    }
    val keyKind: Int = schema(ki).dataType match {
      case LongType => 0
      case IntegerType => 1
      case DoubleType => 2
      case dt => throw new IllegalArgumentException(
        s"prunePerPartition: unsupported key type $dt for '$keyCol'")
    }
    scored.mapPartitions { it =>
      // SQL double ordering: -0.0 == 0.0; NaN greatest via Double.compare
      def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      // < 0 iff a ranks strictly before b under (key desc nulls-last, id asc)
      def cmp(a: Row, b: Row): Int = {
        val an = a.isNullAt(ki); val bn = b.isNullAt(ki)
        if (an != bn) { if (an) 1 else -1 }
        else {
          val c = if (an) 0 else keyKind match {
            case 0 => java.lang.Long.compare(b.getLong(ki), a.getLong(ki))
            case 1 => java.lang.Integer.compare(b.getInt(ki), a.getInt(ki))
            case _ =>
              java.lang.Double.compare(norm(b.getDouble(ki)), norm(a.getDouble(ki)))
          }
          if (c != 0) c
          else if (idKind == 0) java.lang.Long.compare(a.getLong(ii), b.getLong(ii))
          else java.lang.Integer.compare(a.getInt(ii), b.getInt(ii))
        }
      }
      val kept = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.ArrayBuffer[Row]]
      it.foreach { r =>
        val buf = kept.getOrElseUpdate(r.get(qi),
          new scala.collection.mutable.ArrayBuffer[Row](k + 1))
        // bounded insertion sort, best-first (k is small — serving top-k)
        if (buf.length < k || cmp(r, buf(buf.length - 1)) < 0) {
          var p = buf.length
          buf += r
          while (p > 0 && cmp(r, buf(p - 1)) < 0) { buf(p) = buf(p - 1); p -= 1 }
          buf(p) = r
          if (buf.length > k) buf.remove(buf.length - 1)
        }
      }
      kept.valuesIterator.flatten
    }(Encoders.row(schema)).toDF()
  }
}
