package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer over a text column — the learned
  * (merge-table) tokenizer an LLM data pipeline trains once and applies
  * corpus-wide (round-13 VERDICT ambition #3; Sennrich et al. 2016's
  * subword BPE, the algorithm behind GPT-2/SentencePiece-BPE vocabs).
  *
  * Two halves, split exactly like the repo's other fit/apply kernels
  * (Pq.fit/encode, Pca.fit/project):
  *
  *  - [[train]]: K iterations of a DISTRIBUTED adjacent-pair count over
  *    the word-frequency relation — the same iterative-aggregate shape
  *    as the AP loop (per-iteration full-relation aggregate, bounded
  *    driver state). The driver holds only the merge table (K rows) and
  *    the per-iteration argmax (ONE row via `limit(1).collect()` — the
  *    house bounded-probe discipline). The word-freq relation is
  *    vocab-sized, not corpus-sized: at 100 TB the explode+groupBy that
  *    builds it is one linear shuffle, and every later iteration runs
  *    over the (much smaller) distinct-word relation.
  *  - [[applyMerges]]: encode with a FIXED merge table — per-row scalar
  *    string work (codegen'd `StringReplace` chain, no shuffle, no UDF),
  *    embarrassingly parallel at any scale.
  *
  * Symbol representation: each symbol is wrapped as `(sym)`, a word
  * starts as `(c)(h)(a)(r)s`. A merge (l, r) is then ONE literal
  * `replace("(l)(r)" → "(lr)")`: matches can only start at symbol
  * boundaries, adjacent matches share no characters, and left-to-right
  * non-overlapping replacement (both Spark's and every other engine's
  * `replace` semantics) IS greedy-left BPE — `(a)(a)(a)(a)` merges to
  * `(aa)(aa)`, `(a)(a)(a)` to `(aa)(a)`. A space-separated
  * representation gets this WRONG: the pattern `" a a "` consumes the
  * boundary space, so the second of two adjacent matches is missed.
  * The wrapper alphabet `()` never collides with symbol text because
  * words are restricted to `[a-z]+` (lower-cased, non-letters are
  * separators) — the same charset discipline as text_tokenize.
  *
  * Determinism: pair counts are exact long sums; the per-iteration
  * argmax tie-breaks (count DESC, left ASC, right ASC). Training twice
  * on the same input yields the identical table.
  */
object Bpe {

  /** Words of `textCol` as a (word, freq) relation: lower-cased,
    * `[a-z]+` runs only. */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** `(c)(h)(a)(r)` wrapping of every character of `c`. */
  private def wrapChars(c: Column): Column =
    regexp_replace(c, "(.)", "($1)")

  /** The symbol array of a wrapped representation. */
  private def symbolsOf(rep: Column): Column =
    split(regexp_replace(rep, "^\\(|\\)$", ""), "\\)\\(")

  /** One merge as a literal replace on the wrapped representation. */
  private def applyOne(rep: Column, l: String, r: String): Column =
    replace(rep, lit(s"($l)($r)"), lit(s"($l$r)"))

  /** Train `merges` BPE merges on the corpus. Each iteration: count
    * adjacent symbol pairs across the word-freq relation (freq-weighted
    * exact long sums), pull the argmax pair to the driver (one row),
    * fold it into the representation. Stops early when no adjacent pair
    * remains (every word fully merged). Returns the merge table in rank
    * order. */
  def train(docs: DataFrame, merges: Int, textCol: String = "text"): Seq[(String, String)] = {
    require(merges > 0, s"Bpe.train: merges must be positive, got $merges")
    val base = wordFreq(docs, textCol)
      .withColumn("rep", wrapChars(col("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      var cur = base
      val table = Seq.newBuilder[(String, String)]
      var done = false
      var rank = 0
      while (rank < merges && !done) {
        val top = cur
          .select(col("freq"), symbolsOf(col("rep")).as("s"))
          .select(col("freq"), explode(zip_with(
            slice(col("s"), lit(1), size(col("s")) - 1),
            slice(col("s"), lit(2), size(col("s")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("c"))
          .orderBy(desc("c"), asc("l"), asc("r"))
          .limit(1).collect() // bounded probe: exactly the argmax row
        if (top.isEmpty) done = true
        else {
          val (l, r) = (top(0).getString(0), top(0).getString(1))
          table += ((l, r))
          cur = cur.withColumn("rep", applyOne(col("rep"), l, r))
          rank += 1
        }
      }
      table.result()
    } finally { base.unpersist(false); () }
  }

  /** Apply a fixed merge table: per document, the `[a-z]+` words are
    * wrapped and the merges replay in rank order (a codegen'd
    * StringReplace chain — table size is a query-compile constant).
    * Returns (doc_id, n_words, n_tokens): documents with no letter runs
    * drop (no words — same as the SQL GROUP BY over the exploded
    * words). Token count = `(`-count of the final representation. */
  def applyMerges(docs: DataFrame, table: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // the (sym) wrapping is collision-free ONLY on the [a-z] charset
    // (scaladoc above); a caller-supplied vocab with a paren or other
    // out-of-charset symbol would silently corrupt the replace chain
    // (round-14 review) — fail loud instead
    require(table.forall { case (l, r) =>
      l.nonEmpty && r.nonEmpty &&
        (l + r).forall(c => c >= 'a' && c <= 'z') },
      "Bpe.applyMerges: merge symbols must be non-empty [a-z] strings — " +
        "the (sym) wrapped representation is only collision-free on that charset")
    val rep = table.foldLeft(wrapChars(col("w"))) {
      case (c, (l, r)) => applyOne(c, l, r)
    }
    docs.select(col(idCol), explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col(idCol),
        (length(rep) - length(replace(rep, lit("(")))).as("n_tok"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
  }
}
