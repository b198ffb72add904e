package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test decontamination — the training-data-pipeline step that flags
  * corpus documents overlapping an evaluation benchmark (the standard
  * n-gram-collision check run before any pretraining corpus ships: a
  * benchmark answer leaking into training data invalidates the eval).
  *
  * Contract: a corpus document is contaminated iff it shares at least one
  * word `n`-gram with ANY benchmark document. Tokenization is
  * [[TextOps.tokensCol]] (whitespace, empties dropped), grams are
  * space-joined ([[TextOps.shinglesCol]]) and compared as DISTINCT sets
  * per document — `n_contam` counts the document's distinct grams seen in
  * the benchmark, not their occurrences.
  *
  * Scale shape: the benchmark side is an EVAL SET — thousands of
  * documents, millions of grams — while the corpus is the 100 TB side. So
  * the benchmark gram-hash set is built small and broadcast; the corpus
  * explodes its distinct gram hashes map-side, the broadcast hash join
  * keeps ONLY matching rows, and the single shuffle is the per-doc count
  * over those (rare) hits. The corpus text itself never shuffles, and a
  * clean corpus shuffles almost nothing. Grams travel as
  * [[TextOps.portableHash60]] hashes (8 bytes, oracle-replayable), not
  * strings.
  */
object Decontaminate {

  /** Per-corpus-document contamination report:
    * (doc_id, n_grams, n_contam, contaminated). Documents with fewer than
    * `n` tokens have 0 grams and are never contaminated. `docs` rows
    * whose ids appear in `bench` are the caller's concern — pass disjoint
    * sets (the gate query derives bench by id arithmetic and excludes it
    * from the corpus side).
    */
  def run(docs: DataFrame, bench: DataFrame, n: Int = 5,
          hashMode: String = "md5"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val hash = TextOps.hash60(hashMode)
    val gramHashes =
      transform(array_distinct(TextOps.shinglesCol(col("text"), n)),
        g => hash(g))

    val benchSet = bench
      .select(explode(gramHashes).as("h"))
      .distinct()

    val hits = docs
      .select(col("doc_id"), explode(gramHashes).as("h"))
      .join(broadcast(benchSet), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hits"))

    docs
      .select(col("doc_id"), size(gramHashes).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("hits"), lit(0L)).as("n_contam"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }
}
