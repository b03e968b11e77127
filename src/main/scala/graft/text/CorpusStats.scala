package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: TF-IDF-ranked distinctive terms per
  * group (source/domain/shard) — the "what is this slice of the corpus
  * about" audit for training-data mixing decisions.
  *
  * Scale shape: one explode → two hash aggregations (term frequency per
  * (group, token), document frequency per token over the tf table — both
  * partial+final with map-side combine) → a token-keyed join → one
  * window per group for top-k. The df side carries one row per distinct
  * token; a corpus-wide token makes the tok join key hot at extreme
  * group counts. AQE skew-join does NOT engage here — the df side is
  * derived from the tf side, and (measured on Spark 4.1, SkewSpec) the
  * resulting stage reuse blocks OptimizeSkewedJoin even with forced
  * thresholds — so the real mitigation is `dfCap`: drop tokens whose
  * document frequency exceeds the cap before the join. A token in more
  * than ~half the groups has idf ≤ ln 2 and is never "distinctive", so a
  * cap around N/2 changes no meaningful ranking while removing the hot
  * key entirely.
  *
  * Determinism: the score is `tf · floor(1000·ln(N/df))` — integer once
  * floored, so ranking (score desc, token asc) is total and
  * reproducible. The floor is safe cross-engine: df and N are integers,
  * so 1000·ln(N/df) takes finitely many values whose distance from
  * integer boundaries (≥ 0.03 for N ≤ 20) dwarfs any libm ulp
  * divergence.
  */
object CorpusStats {

  /** Top-k distinctive terms per group by the floor-scaled TF-IDF score.
    * Output: (group, rank, term, tf, score). `dfCap`: drop tokens held by
    * more than `dfCap` groups before the join — the hot-key guard (see
    * the class note; capped tokens score at most tf·⌊1000·ln(N/cap)⌋, so
    * a cap near N only removes never-distinctive stopwords). */
  def tfIdfTopTerms(df: DataFrame, textCol: String, groupCol: String,
      k: Int, dfCap: Option[Long] = None): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .repartition(parts)
    val tf = toks.groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreqAll = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val dfreq = dfCap.map(c => dfreqAll.where(col("df") <= c)).getOrElse(dfreqAll)
    val n = df.select(countDistinct(col(groupCol)).as("n"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
      .select(col("grp"), col("tok"), col("tf"),
        (col("tf") * floor(lit(1000.0) * log(col("n").cast("double") / col("df")))
          .cast("long")).as("score"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("grp").as(groupCol), col("rank"), col("tok").as("term"),
        col("tf"), col("score"))
  }
}
