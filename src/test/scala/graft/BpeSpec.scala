package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Mechanism tests for the distributed BPE tokenizer (round-13 VERDICT
  * ambition #3; `text_bpe_train` / `text_bpe` keys). The value-level
  * certification is the DuckDB oracle (pinned merge tables + an
  * independently-unrolled replace chain); here we pin the algorithmic
  * claims the oracle can't state: greedy-left application semantics,
  * the trainer's argmax/tie-break/early-stop behavior on hand-computed
  * corpora, and bit-for-bit determinism across runs. */
class BpeSpec extends SparkSuite {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("train learns the hand-computed merge sequence and stops early") {
    // wordFreq: abab:1, ab:1. Pairs r1: (a,b)=3, (b,a)=1 → merge (a,b).
    // Reps: (ab)(ab), (ab). Pairs r2: (ab,ab)=1 → merge (ab,ab).
    // Reps: (abab), (ab) — no adjacent pair left → early stop at 2.
    val t = Bpe.train(docs("abab ab"), merges = 5)
    assert(t === Seq(("a", "b"), ("ab", "ab")))
  }

  test("trainer argmax tie-breaks (count desc, left asc, right asc)") {
    // "cd ab": pairs (a,b)=1 and (c,d)=1 — tie; left asc picks (a,b).
    val t = Bpe.train(docs("cd ab"), merges = 1)
    assert(t === Seq(("a", "b")))
  }

  test("frequency weighting: repeated words dominate the pair counts") {
    // 'xy' appears 3 times, 'zq' once → (x,y)=3 beats (z,q)=1.
    val t = Bpe.train(docs("xy xy zq", "xy"), merges = 1)
    assert(t === Seq(("x", "y")))
  }

  test("applyMerges is greedy-left: aaaa→2 tokens, aaa→2, aaaaa→3") {
    val got = Bpe.applyMerges(docs("aaaa", "aaa", "aaaaa"), Seq(("a", "a")))
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 1L, 2L), (1L, 1L, 2L), (2L, 1L, 3L)))
  }

  test("applyMerges replays ranks in order (stacked merges compose)") {
    // Table (a,b) then (ab,c): "abc" → (ab)(c) → (abc) = 1 token.
    val got = Bpe.applyMerges(docs("abc"), Seq(("a", "b"), ("ab", "c"))).collect()
    assert(got.head.getLong(2) === 1L)
  }

  test("word splitting: case-folded [a-z]+ runs; letterless docs drop") {
    val got = Bpe.applyMerges(docs("Ab, cd!", "123 --"), Seq.empty)
      .orderBy("doc_id").collect()
    // doc 0: words ab, cd (2 words, 4 single-char tokens); doc 1 drops.
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 4L)))
  }

  test("training is deterministic across runs") {
    val d = Tables.documents(spark, sf001).limit(200)
    val t1 = Bpe.train(d, merges = 6)
    val t2 = Bpe.train(d, merges = 6)
    assert(t1 === t2)
    assert(t1.size === 6)
  }

  test("applied token count is bounded by [n_words, character count]") {
    val d = Tables.documents(spark, sf001).limit(100)
    val table = Bpe.train(d, merges = 8)
    val bad = Bpe.applyMerges(d, table)
      .join(
        d.select(col("doc_id"),
          length(regexp_replace(lower(col("text")), "[^a-z]", "")).as("n_chars")),
        "doc_id")
      .filter(col("n_tokens") < col("n_words") ||
        col("n_tokens") > col("n_chars"))
      .limit(1).collect() // bounded probe
    assert(bad.isEmpty)
  }
}
