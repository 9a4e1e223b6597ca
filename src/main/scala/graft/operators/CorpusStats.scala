package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level vocabulary and provenance statistics for training-data
  * pipelines: tokenizer-vocabulary coverage (OOV rate) and cross-source
  * duplication structure. Both deterministic and DuckDB-oracle-replicable
  * (SURVEY.md §2.4 X51/X52).
  */
object CorpusStats {

  // ---- vocabulary coverage / OOV rate ----------------------------------

  /** Top-`vocabSize` unigram vocabulary by corpus frequency (ties broken by
    * token asc — a total order, so the vocabulary is unique) and per-doc
    * coverage against it: token count, out-of-vocabulary token count, and
    * the OOV rate in ppm. The tokenizer-coverage audit run before training:
    * a corpus slice with a high OOV rate against the planned vocabulary is
    * either noise or a language/domain the tokenizer will shred into
    * bytes — and token-budget forecasts made on whitespace counts (x26)
    * silently break there.
    *
    * Returns (doc_id, n_tok, n_oov, oov_ppm); oov_ppm is the exact integer
    * floor(n_oov·10⁶ / n_tok) — Long `div`, engine-independent.
    *
    * Scale shape: the frequency pass is one map-side-combined agg on the
    * token string (hot tokens cost one long per partition — associative
    * count, same argument as x40); the top-N is a TakeOrderedAndProject
    * over the counted frame (never a global sort of the corpus). The
    * vocabulary is `vocabSize` rows — bounded by construction — so it
    * BROADCASTS into the coverage join and the corpus token stream is
    * never shuffled for the lookup; the per-doc agg map-side-combines.
    * Corpus streams twice (count pass, coverage pass), both scan-shaped.
    */
  def vocabOov(docs: DataFrame, vocabSize: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
           sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tok"))
  }

  // ---- bigram repetition (Gopher-style top-2-gram share) ---------------

  /** Per-doc word-bigram repetition signals: total bigram occurrences, the
    * most frequent bigram's count, its share in ppm, and the fraction of
    * bigram occurrences belonging to ANY repeated bigram (dup_ppm). The
    * order-2 companion to x34's unigram most-frequent-token share — the
    * Gopher/MassiveText repetition family: high top-2-gram share is the
    * signature of templated boilerplate and degenerate generation loops
    * that unigram stats under-detect (alternating-token loops have a flat
    * unigram histogram but one dominant bigram).
    *
    * Returns (doc_id, n_bigrams, top_cnt, top_share_ppm, dup_ppm); docs
    * with fewer than 2 tokens have no bigrams and are absent (declared
    * semantics — the oracle drops them identically). Ratios are exact
    * integer floor(x·10⁶ / n) — Long `div`, engine-independent.
    *
    * Scale shape: two shuffles, both map-side-combined — (doc_id, bigram)
    * count then per-doc rollup — and both keys carry doc_id, so a bigram
    * hot across the corpus never concentrates on one reducer (per-doc
    * repetition is a per-doc question; corpus-hot n-grams are x40's job).
    */
  def bigramRepetition(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))")).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
           max(col("cnt")).as("top_cnt"),
           sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_cnt"))
      .select(col("doc_id"), col("n_bigrams"), col("top_cnt"),
        expr("top_cnt * 1000000 div n_bigrams").as("top_share_ppm"),
        expr("dup_cnt * 1000000 div n_bigrams").as("dup_ppm"))

  // ---- rarity score (integer-exact unigram-LM quality proxy) -----------

  /** Per-doc rare-token density: each distinct token weighted by the
    * integer idf surrogate w = floor(10¹²/(df+1)) (x49's weight — exact
    * Long, unlike ln which is only 1-ulp reproducible), rarity = Σ tf·w,
    * normalized per token as exact Long division. The unigram-LM quality
    * proxy run where no language model is available: gibberish and
    * OCR-shredded text is dense in corpus-rare tokens (high rarity), while
    * boilerplate is all head tokens (low rarity) — the two tails a quality
    * gate cuts. Returns (doc_id, n_tok, rarity, rarity_per_tok).
    *
    * Scale shape: tf is one map-side-combined agg on (doc_id, token); the
    * weight table is one row per DISTINCT token — vocabulary-sized, far
    * smaller than the corpus but not bounded by construction, so it joins
    * by shuffle on the token key (x51's broadcast argument does not apply;
    * a hot token's fanout is its tf posting list feeding a map-side-combined
    * per-doc sum). tf is checkpointed once — it feeds both the df count and
    * the scoring join (at cluster scale this is a persisted stage output,
    * same shape). Degenerate bound: w ≥ 0 always; df beyond 10¹² floors to
    * w = 0, harmless (a token in every doc of a 10¹²-doc corpus carries no
    * rarity signal).
    */
  def rarityScore(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // read by the df count AND the scoring join
    val w = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .select(col("tok"), expr("cast(floor(1e12 / (df + 1)) as bigint)").as("w"))
    tf.join(w, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tok"),
           sum(col("tf") * col("w")).as("rarity"))
      .withColumn("rarity_per_tok", expr("rarity div n_tok"))
  }

  // ---- bigram-LM score (order-2 conditional-probability proxy) ---------

  /** Per-doc bigram language-model score: each consecutive token pair
    * (u, v) is weighted by the corpus-wide conditional-probability
    * surrogate w(u,v) = floor(c₂(u,v)·10¹² / c₁(u)) where c₂ counts the
    * bigram's occurrences and c₁(u) counts u's occurrences AS A PREFIX
    * (Σ_v c₂(u,v) — so Σ_v w ≈ 10¹² and every w ∈ [0, 10¹²], an exact-Long
    * probability in 10⁻¹² units). Per doc: the occurrence-weighted mean
    * (lm_mean_e12) and the single most surprising transition (lm_min_e12).
    *
    * The order-2 LM quality proxy on the x54 axis: x54's unigram rarity
    * scores WHICH words a doc uses; this scores whether consecutive words
    * ever FOLLOW each other elsewhere in the corpus — shuffled/garbled
    * text keeps its unigram profile but its transitions crater, which is
    * exactly the KenLM-perplexity signal used to gate crawl text, in
    * ln-free integer arithmetic (ln is only 1-ulp reproducible across
    * engines; the floor-div surrogate is bit-exact and rank-equivalent
    * per prefix). Docs with < 2 tokens have no transitions and are absent
    * (declared semantics — the oracle drops them identically).
    *
    * Scale shape: per-doc bigram tf is one map-side-combined agg keyed by
    * (doc_id, bigram); c₂/c₁ reduce the tf frame (vocabulary²-bounded —
    * far smaller than the corpus but unbounded by construction, so the
    * weight table joins by SHUFFLE on the bigram key, x54's argument); the
    * per-doc sum map-side-combines. tf is checkpointed once for its two
    * readers (counts + scoring join) — at cluster scale a persisted stage
    * output. Overflow bound: c₂·10¹² stays in a Long while the corpus has
    * < ~9.2M bigram occurrences of any one bigram; past that, the same
    * expression in DECIMAL(38,0) (HUGEINT on the oracle side) is the
    * documented escape hatch — w itself always fits (≤ 10¹²).
    */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> struct(element_at(ts, i) AS u, " +
          "concat(element_at(ts, i), ' ', element_at(ts, i + 1)) AS b))")).as("p"))
      .select(col("doc_id"), col("p.u").as("u"), col("p.b").as("b"))
      .groupBy(col("doc_id"), col("u"), col("b")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // read by the corpus counts AND the scoring join
    val c2 = tf.groupBy(col("u"), col("b")).agg(sum(col("tf")).as("c2"))
    val c1 = tf.groupBy(col("u")).agg(sum(col("tf")).as("c1"))
    val w = c2.join(c1, "u")
      .select(col("b"), expr("c2 * 1000000000000L div c1").as("w"))
    tf.join(w, "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
           sum(col("tf") * col("w")).as("wsum"),
           min(col("w")).as("lm_min_e12"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("wsum div n_bigrams").as("lm_mean_e12"), col("lm_min_e12"))
  }

  // ---- cross-corpus smoothed LM score (held-out reference model) -------

  /** CCNet-shaped quality scoring: train the bigram LM on a held-out
    * REFERENCE corpus, score a DIFFERENT target corpus under it. The
    * cross-corpus form is what [[bigramLmScore]] (x62, self-scored) cannot
    * express: a target bigram may be absent from the reference — the whole
    * point of the filter (text unlike the reference scores low) — so the
    * model needs a smoothing story instead of x62's closed-world join:
    *
    *  - known prefix u: add-one-smoothed w = (c₂+1)·10¹² div (c₁+V),
    *    where c₂/c₁ are the reference's bigram/prefix counts and V its
    *    unigram vocabulary size (so Σ_v w ≈ 10¹² still holds).
    *  - unknown prefix u: the uniform prior w = 10¹² div V.
    *
    * Integer-exact throughout (x62's ln-free argument: floor-div in 10⁻¹²
    * units is bit-reproducible cross-engine, rank-equivalent per prefix).
    * Per target doc: occurrence count, smoothed mean, OOV-bigram count
    * (transitions the reference never saw — the garbled-text signal), and
    * an above-corpus-mean flag (the head/tail bucket decision in its
    * 2-bucket form; CCNet's head/middle/tail is the same comparison
    * against two quantiles of this exact score column).
    *
    * Scale shape: the reference model c₂/c₁ is vocabulary²-bounded but
    * unbounded by construction → the scoring joins SHUFFLE on the bigram/
    * prefix keys (x62's argument); V and the corpus mean are single-row
    * aggregates broadcast into the plan (the only cross joins). Per-doc
    * sums map-side-combine. Docs with < 2 tokens have no transitions and
    * are absent (oracle drops them identically). Overflow bound: x62's —
    * (c₂+1)·10¹² needs c₂ < ~9.2M per bigram; DECIMAL(38,0) is the
    * documented escape hatch past that. */
  def lmCrossScore(reference: DataFrame, target: DataFrame): DataFrame = {
    def bigramTf(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(element_at(ts, i) AS u, " +
            "concat(element_at(ts, i), ' ', element_at(ts, i + 1)) AS b))")).as("p"))
        .select(col("doc_id"), col("p.u").as("u"), col("p.b").as("b"))
        .groupBy(col("doc_id"), col("u"), col("b")).agg(count(lit(1)).as("tf"))
    val c2 = bigramTf(reference).groupBy(col("u"), col("b"))
      .agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy(col("u")).agg(sum(col("c2")).as("c1"))
    val v = reference
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val scored = bigramTf(target)
      .join(c2, Seq("u", "b"), "left")
      .join(c1, Seq("u"), "left")
      .crossJoin(broadcast(v)) // single-row vocab size
      .select(col("doc_id"), col("tf"),
        expr("CASE WHEN c1 IS NULL THEN 1000000000000L div v " +
          "ELSE (coalesce(c2, 0L) + 1L) * 1000000000000L div (c1 + v) END").as("w"),
        expr("CASE WHEN c2 IS NULL THEN tf ELSE 0L END").as("oov"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
           expr("sum(tf * w) div sum(tf)").as("score_e12"),
           sum(col("oov")).as("n_oov"))
    // deliberately NOT materialized before the two consumers (mean + final
    // join): the expensive stages end in shuffles whose outputs Spark
    // reuses, so the "second pass" skips straight to the final stage —
    // measured 2× SLOWER with localCheckpoint (x73 1.09 s → 2.23 s)
    val mean = scored.agg(expr("sum(score_e12) div count(*)").as("mean_e12"))
    scored.crossJoin(broadcast(mean)) // single-row corpus mean
      .select(col("doc_id"), col("n_bigrams"), col("score_e12"), col("n_oov"),
        (col("score_e12") >= col("mean_e12")).as("above_avg"))
  }

  // ---- cross-source overlap matrix -------------------------------------

  /** Pairwise source-level shingle-set Jaccard: for every pair of sources
    * sharing at least one word `k`-gram, the shared-shingle count and the
    * Jaccard similarity of their shingle SETS in ppm. The dataset-mixing
    * audit: two crawls/dumps with high source-level overlap double-count
    * their shared content in any mixture weighting, and the overlap matrix
    * is what decides which source is the canonical holder (doc-level dedup
    * x17/x21 removes the copies; this measures WHERE they came from).
    *
    * Returns (src_a, src_b, n_shared, jacc_ppm) for src_a < src_b; pairs
    * with zero shared shingles are absent (declared semantics — the oracle
    * inner-joins identically). jacc_ppm = floor(shared·10⁶ / union) in
    * exact Long arithmetic.
    *
    * Scale shape: the unit of work is the distinct (source, shingle) pair
    * set — one exchange to build (distinct), after which every posting
    * list is bounded by |sources|, so the shingle self-join fans out at
    * most |sources|² rows per shingle into an associative count (map-side
    * combined). Per-source set sizes are a |sources|-row frame →
    * broadcast into the final ratio. Nothing in the plan scales with doc
    * count except the initial distinct; boilerplate shingles shared by
    * every source are the answer here, not a hazard (x40's argument).
    */
  def sourceOverlap(docs: DataFrame, k: Int): DataFrame = {
    // shingles() distincts (doc_id, shingle); passing source as the id
    // yields exactly the distinct (source, shingle) set
    val ss = TextDedup.shingles(
        docs.select(col("source").as("doc_id"), col("text")), k)
      .select(col("doc_id").as("source"), col("shingle"))
      .localCheckpoint(true) // read by sizes + both self-join sides
    val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
    ss.select(col("source").as("src_a"), col("shingle"))
      .join(ss.select(col("source").as("src_b"), col("shingle")), Seq("shingle"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .withColumn("jacc_ppm", expr("n_shared * 1000000 div (na + nb - n_shared)"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("jacc_ppm"))
  }

  // ---- duplicated-n-gram coverage (RefinedWeb/MassiveText filter) ------

  /** Fraction of a doc's tokens COVERED by an n-gram that occurs ≥2
    * times within the SAME doc — the "characters in duplicated n-grams"
    * family of repetition filters (RefinedWeb/Gopher use it at several n
    * alongside the top-n-gram share). Distinct from [[bigramRepetition]]
    * (which counts repeated n-gram OCCURRENCES): coverage measures how
    * much of the document is inside some repeat, so a long doc with one
    * heavily-looped passage scores high even when its global bigram
    * profile looks normal. Returns (doc_id, n_tokens, n_dup_tokens,
    * dup_cov_ppm); docs shorter than n tokens score 0. Ratio is exact
    * integer floor(x·10⁶/n_tokens) — engine-independent.
    *
    * Scale shape: everything is doc-local. The occurrence count groups
    * on (doc_id, shingle) — a corpus-hot shingle never concentrates,
    * because the key carries doc_id; the position-union distinct and the
    * final rollup both key on doc_id. State per group is bounded by doc
    * length (the collect_list holds one doc's occurrence positions of
    * ONE shingle), never by corpus size.
    */
  def dupNgramCoverage(docs: DataFrame, n: Int): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"), col("ts"))
    val sh = base.filter(col("n_tokens") >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ts) - ${n - 1}), " +
          s"i -> struct(i AS i, concat_ws(' ', slice(ts, i, $n)) AS sh))")).as("g"))
      .select(col("doc_id"), col("g.i"), col("g.sh"))
    val dupOcc = sh.groupBy(col("doc_id"), col("sh"))
      .agg(count(lit(1)).as("cnt"), collect_list(col("i")).as("occ"))
      .filter(col("cnt") >= 2)
      .select(col("doc_id"), explode(col("occ")).as("i"))
    val cov = dupOcc
      .select(col("doc_id"), explode(expr(s"sequence(i, i + ${n - 1})")).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_tokens"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        expr("coalesce(n_dup_tokens, 0) * 1000000 div n_tokens").as("dup_cov_ppm"))
  }
}
