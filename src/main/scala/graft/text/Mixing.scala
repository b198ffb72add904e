package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing / subsampling — the last stage of a training-data
  * pipeline: decide how much of each source goes into the mix, then draw
  * the sample DETERMINISTICALLY so any re-run (or a resumed job, or the
  * eval-set builder excluding the training draw) selects byte-identical
  * rows without storing a selection list.
  */
object Mixing {

  /** 2^60 — the hash space of [[TextOps.portableHash60]]. */
  private val HashSpace = 1L << 60

  /** Deterministic hash sampling: keep a row iff
    * portableHash60(key:salt) < rate·2^60. No RNG, no state — the
    * selection is a pure function of (key, salt), so it is stable under
    * retries, partitioning, AND scale (growing the corpus never flips an
    * existing row's membership, unlike reservoir/limit sampling).
    * The threshold is computed ONCE as an exact integer, so the
    * comparison is integer equality-safe cross-engine.
    */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double,
                 salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val threshold = math.round(rate * HashSpace)
    df.where(
      TextOps.portableHash60(concat(keyCol.cast("string"), lit(":"), lit(salt)))
        < lit(threshold))
  }

  /** Per-stratum deterministic sampling: each stratum (e.g. language,
    * source) gets its own rate — the "cap English, upsample the tail"
    * knob of corpus construction. Strata absent from `rates` keep
    * `defaultRate`. Implemented as ONE broadcast map join (a rates table
    * is eval-set-sized) + the same pure-function filter as
    * [[hashSample]]; the corpus is never shuffled.
    */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = ""): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0.0 && r <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF("__stratum", "__rate")
    df
      .join(broadcast(rateDf), strataCol === col("__stratum"), "left")
      .where(
        TextOps.portableHash60(concat(keyCol.cast("string"), lit(":"), lit(salt)))
          // per-row exact integer threshold: round(rate·2^60) in double is
          // exact for every rate both engines see the same way
          < round(coalesce(col("__rate"), lit(defaultRate)) * HashSpace).cast("long"))
      .drop("__stratum", "__rate")
  }

  /** Temperature-mixing weights at T = 1/2 (the sqrt temperature most
    * multilingual recipes use): per-group weight ∝ sqrt(group token
    * count), normalized. sqrt is IEEE-correctly-rounded in every engine
    * — unlike pow(x, t) — so the weights are reproducible bit-for-bit
    * before the final 6-dp rounding. One partial-aggregated pass for the
    * counts; the normalizer is a 1-row cross join (groups are few).
    *
    * Output: (group, n_docs, n_tokens, weight).
    */
  def sqrtTemperatureWeights(docs: DataFrame, groupCol: Column): DataFrame = {
    val counts = docs
      .groupBy(groupCol.as("group"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(size(TextOps.tokensCol(col("text"))), lit(0)).cast("long")).as("n_tokens"))
    counts
      .crossJoin(counts.agg(sum(sqrt(col("n_tokens"))).as("__z")))
      .select(col("group"), col("n_docs"), col("n_tokens"),
        round(sqrt(col("n_tokens")) / col("__z"), 6).as("weight"))
  }
}
