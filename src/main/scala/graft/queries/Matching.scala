package graft.queries

import graft.{QueryGroup, Tables}
import graft.functions.{Bloom, BloomFilterAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-matching operators (SURVEY §2 extensions): the exact
  * fuzzy string join (deletion-neighborhood candidates + edit-distance
  * verify — the SymSpell/FastSS scheme, exact recall by pigeonhole)
  * and the bloom-prefiltered decontamination pipeline (fixed-size
  * approximate membership + exact verify — exact BECAUSE a bloom
  * filter has no false negatives). Both are prefilter-then-verify
  * compositions: the sketch bounds the shuffle, the verify pins the
  * answer, so the keys oracle against plain ground-truth SQL.
  */
object Matching extends QueryGroup {

  /** Exact edit-distance self-join: all pairs (id_a < id_b) with
    * levenshtein ≤ `tau`, found WITHOUT the all-pairs product. Candidate
    * generation is the deletion-neighborhood scheme (FastSS, Bocek et
    * al. 2007; SymSpell): emit every variant of each string with ≤ tau
    * single-character deletions — if lev(s,t) ≤ tau then deleting the
    * edited positions from each side yields a COMMON variant (delete
    * the substituted/inserted characters), so an equi-join on variants
    * has guaranteed recall; a codegen'd `levenshtein` verify on the
    * candidate pairs then removes the false positives (variant overlap
    * only bounds lev ≤ 2·tau — GraftSpec pins that the verify is
    * load-bearing). Scale: the explode is (len+1)^tau rows per string
    * of 8-byte xxhash64 signature keys (hash collisions only ADD
    * candidates — the verify rescues them), every shuffle is keyed on
    * the signature, and candidate buckets are sized by REAL near-match
    * groups — run exact dedup first if the corpus has massive
    * exact-duplicate strings. Variants are emitted as explode(sequence)
    * + substring/concat — codegen operators, not transform() lambdas
    * (interpreted, break whole-stage codegen — the shingles lesson).
    * Duplicate variants of one string (repeated characters) just
    * duplicate candidate pairs; the pair-level distinct absorbs them
    * cheaper than a per-row array_distinct. Input: (id, s), id unique,
    * null strings skipped. Output: (id_a, id_b, lev). */
  private[graft] def fuzzyPairs(rows: DataFrame, tau: Int): DataFrame = {
    require(tau == 1 || tau == 2, s"fuzzyPairs: tau must be 1 or 2, got $tau")
    val base = rows.filter(col("s").isNotNull)
      .withColumn("i", explode(sequence(lit(0), length(col("s")))))
      .withColumn("v1", when(col("i") === 0, col("s"))
        .otherwise(concat(expr("substring(s, 1, i - 1)"), expr("substring(s, i + 1)"))))
    val variants =
      if (tau == 1) base.select(col("id"), col("s"), col("v1").as("v"))
      else base
        // second deletion composes on v1; i=0 keeps j pinned at 0 so the
        // undeleted original is emitted once, not len+1 times
        .withColumn("j", explode(sequence(lit(0),
          when(col("i") === 0, lit(0)).otherwise(length(col("v1"))))))
        .select(col("id"), col("s"),
          when(col("j") === 0, col("v1"))
            .otherwise(concat(expr("substring(v1, 1, j - 1)"),
              expr("substring(v1, j + 1)"))).as("v"))
    val sig = variants.select(col("id"), col("s"), xxhash64(col("v")).as("sig"))
    sig.select(col("id").as("id_a"), col("s").as("s_a"), col("sig"))
      .join(sig.select(col("id").as("id_b"), col("s").as("s_b"), col("sig")), "sig")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("lev"))
      .filter(col("lev") <= tau)
  }

  /** Decontamination with a bloom prefilter — the shape the exact
    * pipeline ([[Dedup.decontaminate]]) degrades AWAY from when the
    * eval gram set outgrows its broadcast cap: instead of shuffling the
    * whole n-gram-exploded train corpus by gram, broadcast a FIXED
    * 128 KiB bloom filter of the eval grams (one-row relation, built by
    * the mergeable [[BloomFilterAgg]], never collected to the driver),
    * drop every train gram that can't be contaminated (a codegen'd
    * shift/mask probe), and exact-verify only the bloom-positive
    * survivors with the real gram join. No false negatives → the
    * verify sees every true hit → the output is EXACTLY
    * pipeline_decontaminate's, and both keys pin the same oracle SQL.
    * Scale: the gram shuffle shrinks from |train grams| to
    * |true hits| + FPR·|train grams| at a constant broadcast size. */
  private[graft] def decontaminateBloom(s: SparkSession, train: DataFrame,
      eval: DataFrame, n: Int = 5, mBits: Int = Bloom.DefaultBits,
      k: Int = Bloom.DefaultK): DataFrame = {
    val h1 = xxhash64(col("shingle"))
    val h2 = xxhash64(col("shingle"), lit(Bloom.H2Salt))
    val bloomUdaf = udaf(new BloomFilterAgg(mBits, k))
    val eg = Dedup.shingles(s, eval, n = n).select("shingle").distinct()
    val bw = eg.agg(bloomUdaf(h1, h2).as("bw"))
    val candidates = Dedup.shingles(s, train, n = n)
      .crossJoin(broadcast(bw))
      .withColumn("h1", h1).withColumn("h2", h2)
      .filter(expr(Bloom.mightContainSql("bw", "h1", "h2", mBits, k)))
      .select("doc_id", "shingle")
    val hits = candidates.join(eg, "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated_grams"))
    train.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated_grams"), lit(0L)).as("n_contaminated_grams"))
  }

  def queries: Seq[(String, Q)] = Seq(
    // Exact fuzzy self-join on customer names, lev ≤ 1 — the fuzzy-KEY
    // join under entity resolution (typo'd identifiers, OCR'd names),
    // subquadratic via deletion-neighborhood candidates where the
    // oracle pays the all-pairs product.
    "join_fuzzy_symdel" -> ((s, dir) =>
      fuzzyPairs(Tables.customer(s, dir)
        .select(col("c_custkey").as("id"), col("c_name").as("s")), tau = 1)
        .orderBy("id_a", "id_b")),

    // Bloom-prefiltered decontamination — same contract (and oracle) as
    // pipeline_decontaminate, constant broadcast size at any eval-set
    // scale.
    "pipeline_decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val isEval = col("doc_id") % 20 === 0
      decontaminateBloom(s, docs.filter(!isEval), docs.filter(isEval))
        .orderBy("doc_id")
    })
  )

  def oracles: Seq[(String, String)] = Seq(
    "join_fuzzy_symdel" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "pipeline_decontaminate_bloom" -> TextOps.decontaminateOracleSql
  )
}
