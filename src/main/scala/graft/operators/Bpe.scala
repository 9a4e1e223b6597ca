package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a document corpus.
  *
  * The scale shape: the corpus is scanned ONCE to build the word-frequency
  * table (one shuffle, vocabulary-sized output — at 100 TB the distinct-word
  * table is millions of rows, not billions). Every merge iteration after
  * that runs on the vocab table only: adjacent-pair counting is a
  * vocab-sized explode + partial/final agg, and the single winning pair per
  * round — the merge rule itself, i.e. the model being trained — is the
  * only thing that ever reaches the driver. No per-round corpus rescan,
  * no driver-side data loop.
  *
  * Determinism: winners are chosen by (count DESC, left ASC, right ASC),
  * so the merge sequence is a pure function of the corpus.
  */
object Bpe {

  /** Corpus → (tok, f) word-frequency table. One shuffle on the token. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))

  /** (tok, f) → (tok, f, syms) with syms the initial single-character
    * symbol sequence. */
  def initSymbols(words: DataFrame): DataFrame =
    words.withColumn("syms",
      expr("transform(sequence(1, length(tok)), i -> substr(tok, i, 1))"))

  /** Adjacent-symbol pair counts, frequency-weighted: one row per distinct
    * (left, right) symbol pair with its corpus-wide occurrence count.
    * Vocab-sized explode; partial+final agg. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("f"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> named_struct('a', element_at(syms, i), 'b', element_at(syms, i + 1)))"""
          .stripMargin)).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(sum(col("f")).as("cnt"))

  /** Greedy left-to-right non-overlapping merge of the symbol pair (a, b)
    * inside one symbol array — the standard BPE apply step, as a pure
    * codegen fold (no UDF). State is (emitted prefix, pending symbol). */
  private def mergeOnce(syms: Column, a: Column, b: Column): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("p"))
    aggregate(syms, init,
      (s, x) => {
        val out = s.getField("out"); val p = s.getField("p")
        when(p.isNull, struct(out.as("out"), x.as("p")))
          .when(p === a && x === b,
            struct(concat(out, array(concat(p, x))).as("out"),
              lit(null).cast("string").as("p")))
          .otherwise(struct(concat(out, array(p)).as("out"), x.as("p")))
      },
      s => when(s.getField("p").isNull, s.getField("out"))
        .otherwise(concat(s.getField("out"), array(s.getField("p")))))
  }

  /** Apply an ordered merge table to the corpus — the tokenizer-encode
    * side of [[train]]. Per word, each merge folds over the symbol array
    * in training order (k chained codegen folds; k is the trained vocab
    * depth, not data-sized). Pure stateless projection: zero shuffles,
    * streaming-safe. Adds `bpe_tokens` (the concatenated per-word symbol
    * arrays) and `n_bpe_tokens`. */
  def encode(docs: DataFrame, merges: Seq[(String, String)], textCol: String = "text"): DataFrame = {
    // per-word char arrays; substr needs a Column position, so the split
    // is built as one SQL expression rather than via the Scala DSL
    val charSplit = expr(
      s"""transform(filter(split($textCol, ' '), w -> length(w) > 0),
         |  w -> transform(sequence(1, length(w)), i -> substr(w, i, 1)))""".stripMargin)
    val encoded = merges.foldLeft(charSplit: Column) { case (acc, (a, b)) =>
      transform(acc, syms => mergeOnce(syms, lit(a), lit(b)))
    }
    docs.withColumn("bpe_tokens", flatten(encoded))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }

  /** Train nMerges BPE merges. Returns the ordered merge table
    * (merge_idx, a, b, cnt). Each round: count pairs (distributed),
    * collect exactly ONE winner row, rewrite the vocab's symbol arrays.
    * localCheckpoint every few rounds cuts the transform lineage. */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text"): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    var words = initSymbols(wordFreqs(docs, textCol)).localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top(0)
        val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((r, a, b, c))
        words = words.withColumn("syms", mergeOnce(col("syms"), lit(a), lit(b)))
        if ((r + 1) % 4 == 0) words = words.localCheckpoint(true)
        r += 1
      }
    }
    merges.result()
  }
}
