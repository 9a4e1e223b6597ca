package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data curation operators beyond dedup: benchmark decontamination,
  * boilerplate n-gram mining, sequence packing, and embedding quantization.
  * All deterministic and DuckDB-oracle-replicable (SURVEY.md §2.4 X38–X41).
  *
  * Scale notes are per-operator; the common theme is one associative
  * shuffle per operator with map-side combine, no driver-side loops, and
  * broadcast for the only genuinely small side (the benchmark probe set).
  */
object Curation {

  // ---- benchmark decontamination ---------------------------------------

  /** Docs that share ≥1 word k-gram with a benchmark ("probe") document —
    * the standard test-set-decontamination gate (a training doc containing
    * a verbatim benchmark n-gram is suspect; k=5 throughout the public
    * decontamination literature's 8–13 token range, scaled to this corpus's
    * short docs).
    *
    * Returns (doc_id, probe_id, n_shared) for every contaminated
    * (corpus doc, probe doc) pair.
    *
    * Scale shape: the probe side is a benchmark suite — bounded and tiny
    * relative to a 100 TB corpus — so its distinct shingle set is
    * BROADCAST; the corpus streams through exactly once with NO
    * corpus-side shuffle before the match. Corpus shingles deliberately
    * skip the per-doc distinct (that would shuffle every corpus shingle);
    * instead the count is `count_distinct(shingle)` AFTER the broadcast
    * match, so the only exchange carries matches — vanishingly rare at
    * contamination-audit scale — not the corpus.
    */
  def decontaminate(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    // positional shingles WITHOUT the distinct (see scale note above) —
    // the ONE shingling spelling (TextFns.explodeShingles, codegen'd)
    val corpusSh = graft.functions.TextFns.explodeShingles(
        corpus.select(col("doc_id"), split(col("text"), " ").as("ts")), "ts", k,
        gramCol = "shingle")
      .select(col("doc_id"), col("shingle"))
    val probeSh = TextDedup.shingles(probes, k)
      .select(col("doc_id").as("probe_id"), col("shingle"))
    corpusSh
      .join(broadcast(probeSh), "shingle")
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(countDistinct(col("shingle")).as("n_shared"))
  }

  /** Multi-resolution decontamination: for each corpus doc sharing at least
    * one `levels.head`-gram with the probe set, the LONGEST level whose
    * n-gram it shares — distinguishing incidental phrase overlap (short
    * span only) from verbatim benchmark inclusion (long span), the signal
    * contamination audits act on.
    *
    * Scale shape: n-gram containment is monotone — a shared k-gram implies
    * shared j-grams for every j < k — so each level above the first scans
    * ONLY the docs matched at the previous level (vanishingly rare at
    * audit scale), never the full corpus; probe shingle sets broadcast at
    * every level (benchmark suites are bounded). Each level's match list is
    * localCheckpoint'ed because it feeds both the answer and the next
    * level's pruning filter.
    */
  def deconSpanLadder(corpus: DataFrame, probes: DataFrame, levels: Seq[Int]): DataFrame = {
    require(levels.nonEmpty && levels == levels.sorted && levels == levels.distinct,
      s"levels must be strictly increasing, got $levels")
    var candidates = corpus
    var acc: Option[DataFrame] = None
    for (k <- levels) {
      val probeSh = TextDedup.shingles(probes, k).select(col("shingle")).distinct()
      val matched = TextDedup.shingles(candidates, k)
        .join(broadcast(probeSh), "shingle")
        .select(col("doc_id")).distinct()
        .withColumn("span", lit(k.toLong))
        .localCheckpoint(true)
      candidates = candidates.join(matched.select(col("doc_id")), "doc_id")
      acc = Some(acc.fold(matched)(_.unionByName(matched)))
    }
    acc.get.groupBy(col("doc_id")).agg(max(col("span")).as("span_max"))
  }

  // ---- boilerplate n-gram mining ---------------------------------------

  /** Word k-grams appearing in ≥ minDf distinct documents — the mining pass
    * behind C4-style boilerplate/template removal (navigation chrome, legal
    * footers, cookie banners repeat verbatim across unrelated pages).
    *
    * Returns (shingle, df) with df = distinct-document frequency.
    *
    * Scale shape: one shuffle on the shingle string with map-side partial
    * aggregation; `shingles` already emits distinct (doc, shingle) pairs so
    * counts are document frequencies directly. Hot shingles are exactly the
    * answer here (not a skew hazard to avoid): count is fully associative,
    * so a 10⁹-doc shingle costs one long per partition, not a fanout.
    */
  def boilerplateNgrams(docs: DataFrame, k: Int, minDf: Long): DataFrame =
    TextDedup.shingles(docs, k)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  // ---- sequence packing (concatenate-and-chunk) ------------------------

  /** GPT-style sequence packing: per language, documents are concatenated
    * in a deterministic order (token count desc, doc_id asc — longest-first
    * keeps chunk fill uniform) and the token stream is split into
    * fixed-capacity chunks. A document may straddle a chunk boundary, as in
    * real concatenate-and-chunk training pipelines.
    *
    * Returns one row per (lang, chunk_id): n_docs contributing tokens to
    * the chunk and n_tokens in the chunk (== capacity except each lang's
    * final chunk).
    *
    * Determinism: the prefix sum is over a total order (n_tok, doc_id), so
    * chunk assignment is partitioning-independent.
    *
    * Scale shape — hierarchical (range-partitioned) prefix sum: a naive
    * `Window.partitionBy(lang)` serializes each language into ONE task, and
    * at 100 TB the head language is most of the corpus. Instead the corpus
    * is range-partitioned on the packing order itself (lang, n_tok desc,
    * doc_id) — a parallel external sort, every range a bounded task — then:
    * per-range local prefix sums (window keyed by (range, lang), never by
    * lang alone), one tiny cumulative pass over the per-range totals
    * (|ranges|·|langs| rows), and the resulting offsets broadcast back.
    * offset + local sum = the global prefix sum, for any range boundaries,
    * so the answer is identical to the single-task window form
    * ([[packChunksWindowed]], kept as the law-test reference) while the
    * largest task is one range partition, not one language. The chunk-span
    * explode is bounded: a doc spans ⌈n_tok/capacity⌉+1 chunks.
    */
  def packChunks(docs: DataFrame, capacity: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast(LongType).as("n_tok"))
    // parallel external sort: range exchange on the full packing order.
    // Range i's keys all precede range i+1's, so for same-lang rows the
    // range id is monotone in (n_tok desc, doc_id) — offsets compose.
    val ranged = toks
      .repartitionByRange(col("lang"), col("n_tok").desc, col("doc_id"))
      .withColumn("rng", spark_partition_id())
      // PIN the partition labels (same discipline as the q68 running-
      // distinct and Ranks.globalRank): this frame feeds both the offsets
      // aggregate and the join; spark_partition_id over a range exchange
      // is only consistent across the two consumers while the exchange is
      // reused — an independently re-executed exchange may be AQE-coalesced
      // to a DIFFERENT partition count (observed dropping 78% of rows in
      // a globalRank composition) or re-sampled to different bounds.
      .localCheckpoint(true)
    // local prefix sums: each (rng, lang) group is at most ONE range
    // partition — the worst task is bounded by the range size, independent
    // of how skewed the language distribution is
    val wLocal = Window.partitionBy(col("rng"), col("lang"))
      .orderBy(col("n_tok").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("local_end", sum(col("n_tok")).over(wLocal))
    // per-(range, lang) totals: a tiny frame (|ranges|·|langs| rows), so
    // the cumulative pass over range totals is one trivial task per lang
    // and the offsets broadcast back into the corpus-sized side
    val wOff = Window.partitionBy(col("lang")).orderBy(col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("rng"), col("lang"))
      .agg(sum(col("n_tok")).as("range_total"))
      .withColumn("offset", coalesce(sum(col("range_total")).over(wOff), lit(0L)))
      .select(col("rng"), col("lang"), col("offset"))
    val cum = local.join(broadcast(offsets), Seq("rng", "lang"))
      .withColumn("cum_end", col("local_end") + col("offset"))
      .withColumn("cum_start", col("cum_end") - col("n_tok"))
    chunkSpans(cum, capacity)
  }

  /** Deterministic balanced shard assignment for distributed training:
    * documents are ranked globally by (token count desc, doc_id) and dealt
    * round-robin onto `numShards` shards — longest-first round-robin is the
    * streaming cousin of LPT scheduling: each shard receives every S-th
    * document of the sorted size order, so shard token totals differ by at
    * most one document per "round" of the deal and the heavy tail never
    * lands on one shard. Returns one row per shard:
    * (shard, n_docs, total_tokens).
    *
    * Determinism: the rank is over the total order (n_tok desc, doc_id),
    * so assignment is partitioning-independent.
    *
    * Scale shape: the global rank is hierarchical, exactly like
    * [[packChunks]]'s prefix sum — a global `row_number()` window would
    * serialize the corpus into ONE task. Range-partition on the rank order
    * itself (parallel external sort), per-range local row numbers, per-range
    * row COUNTS (one tiny row per range) cumulate into rank offsets,
    * broadcast back: offset + local row number = the exact global rank for
    * any range boundaries. The per-shard rollup then combines map-side. */
  def shardAssign(docs: DataFrame, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be > 0, got $numShards")
    globalSizeRank(docs)
      .withColumn("shard", (col("grank") - 1) % numShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
  }

  /** The hierarchical global size rank shared by [[shardAssign]] and
    * [[shardDealIncremental]]: (doc_id, n_tok, grank) with grank the
    * 1-based rank in (n_tok desc, doc_id) order — range exchange,
    * per-range local row numbers, per-range COUNTS cumulated into
    * broadcast offsets; never a single-task global window. */
  private[graft] def globalSizeRank(docs: DataFrame): DataFrame =
    Ranks.globalRank(
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok")),
      Seq(col("n_tok").desc, col("doc_id")))

  /** CONTINUOUS sharding: deal one arriving batch onto the existing
    * shards, least-loaded shard first — the incremental form of
    * [[shardAssign]] for a corpus that grows after the initial deal
    * (x68's operator as a maintained table). The batch is ranked by the
    * same hierarchical (n_tok desc, doc_id) order, and its rank-r doc
    * goes to the shard at position (r−1) mod numShards of the
    * load-ascending shard order — each deal round hands its LARGEST doc
    * to the LIGHTEST shard (the LPT heuristic, batch-granular).
    *
    * From an empty state this reproduces [[shardAssign]] exactly (zero
    * loads order shards by id, so deal position = shard id — law in
    * StreamingIngestSpec along with conservation/balance under folds).
    *
    * Scale shape: `existing` is touched only by a shard-count-sized
    * aggregation (the loads), the shard order is a numShards-row window
    * (bounded by construction, broadcast back), and the batch pays one
    * hierarchical rank — work per trigger ∝ the batch, never the stored
    * corpus. Returns (doc_id, n_tok, shard) for the batch's docs. */
  def shardDealIncremental(existing: DataFrame, batch: DataFrame,
                           numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, s"numShards must be > 0, got $numShards")
    val spark = batch.sparkSession
    val spine = spark.range(numShards).select(col("id").as("shard"))
    val loads = spine.join(
        existing.groupBy(col("shard")).agg(sum(col("n_tok")).as("load")),
        Seq("shard"), "left")
      .select(col("shard"), coalesce(col("load"), lit(0L)).as("load"))
    // numShards rows: the global window is bounded by construction
    val wOrder = Window.orderBy(col("load"), col("shard"))
    val order = loads
      .withColumn("deal_pos", (row_number().over(wOrder) - 1).cast(LongType))
      .select(col("deal_pos"), col("shard"))
    globalSizeRank(batch)
      .withColumn("deal_pos", (col("grank") - 1) % numShards)
      .join(broadcast(order), Seq("deal_pos"))
      .select(col("doc_id"), col("n_tok"), col("shard"))
  }

  /** The single-task-per-language window form of [[packChunks]] — kept as
    * the reference implementation for the hierarchical ≡ windowed law
    * (PropertySpec); not a production path (one task sorts and prefix-sums
    * each whole language). */
  private[graft] def packChunksWindowed(docs: DataFrame, capacity: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_tok").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .withColumn("cum_start", col("cum_end") - col("n_tok"))
    chunkSpans(cum, capacity)
  }

  /** Shared chunking tail: a doc occupies token interval
    * [cum_start, cum_end) → chunks floor(cum_start/C) .. floor((cum_end-1)/C);
    * tokens inside chunk c are min(cum_end,(c+1)C) - max(cum_start, cC). */
  private def chunkSpans(cum: DataFrame, capacity: Int): DataFrame =
    cum
      .withColumn("c0", floor(col("cum_start") / capacity))
      .withColumn("c1", floor((col("cum_end") - 1) / capacity))
      .withColumn("chunk_id", explode(expr("sequence(c0, c1)")))
      .withColumn("tok_in_chunk",
        least(col("cum_end"), (col("chunk_id") + 1) * capacity)
          - greatest(col("cum_start"), col("chunk_id") * capacity))
      .groupBy(col("lang"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok_in_chunk")).as("n_tokens"))

  // ---- overlapping sliding-window chunking (RAG / context windows) ----

  /** Fixed-size overlapping chunks of each document's token stream:
    * chunk i covers tokens [i·stride, i·stride + chunkTokens), for
    * i = 0 .. ceil(max(n − chunkTokens, 0) / stride) — every token is
    * covered, consecutive chunks overlap by (chunkTokens − stride), and
    * the last chunk is the only one that may run short. This is the
    * retrieval / context-window shape (split long docs for embedding or
    * attention windows with overlap so no span is cut at a boundary) —
    * a different animal from [[packChunks]], which concatenates SHORT
    * docs to fill windows; this splits LONG ones.
    *
    * Emits (doc_id, chunk_idx, n_in_chunk, fp) where fp is the
    * oracle-replicable h31 of the chunk's joined tokens — the handle a
    * downstream chunk-level dedup or retrieval index joins on.
    *
    * Scale shape: explode + codegen'd projection, zero shuffles, no
    * window function — each doc expands independently, so parallelism is
    * per-row and a 100 TB corpus chunks in one map stage. */
  def overlapChunks(docs: DataFrame, chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      s"need 0 < stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), col("ts"), size(col("ts")).cast(LongType).as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("chunk_idx", explode(expr(
        s"sequence(cast(0 as bigint), (greatest(n_tok - $chunkTokens, cast(0 as bigint)) + ${stride - 1}) div $stride)")))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(chunkTokens).cast(LongType), col("n_tok") - col("chunk_idx") * stride)
          .as("n_in_chunk"),
        graft.functions.TextFns.h31(
          expr(s"array_join(slice(ts, cast(chunk_idx * $stride + 1 as int), $chunkTokens), ' ')"))
          .as("fp"))
  }

  // ---- number/PII scrubbing (normalizing projection) -------------------

  /** Mask every digit run in `textCol` with the `<num>` placeholder and
    * count the masked runs — the normalization staple of text curation
    * (phone numbers, IDs, timestamps, version strings all collapse to the
    * same token so downstream dedup/n-gram stats see structure, not
    * serial numbers; the same shape handles PII classes with richer
    * patterns). `[0-9]+` is deliberately dialect-neutral: Java regex and
    * RE2-family engines agree on it exactly, so the op stays
    * oracle-replicable.
    *
    * Pure stateless projection — zero shuffles, codegen'd, streaming-safe
    * (same plan over a batch table or a structured stream). */
  def scrubNumbers(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("masked", regexp_replace(col(textCol), "[0-9]+", "<num>"))
      .withColumn("n_masked", regexp_count(col(textCol), lit("[0-9]+")).cast(LongType))

  /** Ordered multi-class PII redaction: each `(class, regex, token)` rule
    * is applied IN ORDER over the progressively-masked text — the rule's
    * hit count is taken on the text as it stands when the rule runs, then
    * every hit is replaced by the class token. Ordered-rules semantics is
    * the production contract (an email must be eaten by the email rule
    * before a broader rule like a hex-run could shadow part of it), and it
    * makes the per-class counts well-defined under overlap.
    *
    * Adds one `n_<class>` count column per rule plus the final `masked`
    * text. Patterns must stay in the Java∩RE2 common dialect (character
    * classes, bounded repetition — no backrefs/lookaround) so the op is
    * oracle-replicable; [[PiiPatterns]] is such a set.
    *
    * Pure stateless projection — zero shuffles, codegen'd, streaming-safe
    * (identical plan over a batch table or a structured stream), so at
    * 100 TB redaction is embarrassingly parallel and fuses into whatever
    * scan feeds it. */
  def redactPii(df: DataFrame, textCol: String,
                patterns: Seq[(String, String, String)] = PiiPatterns): DataFrame =
    patterns.foldLeft(df.withColumn("masked", col(textCol))) {
      case (acc, (cls, rx, token)) =>
        acc.withColumn(s"n_$cls", regexp_count(col("masked"), lit(rx)).cast(LongType))
          .withColumn("masked", regexp_replace(col("masked"), rx, token))
    }

  /** Default redaction rules: email, IPv4, E.164-ish dashed phone, 32-hex
    * API key/digest. Email runs before the hex rule (a 32-hex local part
    * must redact as an email, not a key); the phone and IPv4 shapes are
    * disjoint (dashes vs dots). All four are literal-class patterns both
    * regex dialects match identically, leftmost-greedy. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<email>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<ip>"),
    ("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<phone>"),
    ("hexkey", "[0-9a-f]{32}", "<key>"))

  // ---- Bloom-filter decontamination membership -------------------------

  /** Probe-set membership via a Bloom filter: flags every corpus row whose
    * `keyCol` is in the probe set, plus possible false positives at rate
    * ~`fpp` — NEVER a false negative (the sketch's one-sided contract).
    *
    * This is [[decontaminate]]'s scale escape hatch for the probe side:
    * x38 broadcasts the probe SHINGLE SET (fine for benchmark suites, but
    * O(probe tokens)); the Bloom bitmap is O(expectedItems · ln(1/fpp))
    * BITS regardless of key sizes — a 1M-key suite at fpp 0.03 is ~0.9 MB
    * broadcast against 100 TB. Flagged rows route to exact verification
    * (a join against the real probe set — tiny input by construction).
    *
    * Determinism: the bitmap ORs per-key bit positions, so the built
    * filter — and every mightContain answer — is independent of
    * partitioning and insertion order.
    *
    * The probe scan happens eagerly at call time (sketch build = one
    * collect-to-driver of a fixed-size bitmap, the same shape as
    * `freqItems`/`bloomFilter` everywhere); the returned frame is lazy. */
  def bloomDecontaminate(corpus: DataFrame, probes: DataFrame, keyCol: String,
                         expectedItems: Long, fpp: Double): DataFrame = {
    val bf = probes.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bcast = corpus.sparkSession.sparkContext.broadcast(bf)
    val hit = udf((s: String) => s != null && bcast.value.mightContainString(s))
    corpus.withColumn("bloom_hit", hit(col(keyCol)))
  }

  // ---- quality scoring (streaming-safe projection) ---------------------

  /** Per-doc quality features: token count, type-token ratio, and the
    * composite score 0.5·min(n_tok/100, 1) + 0.5·ttr. A pure stateless
    * projection — the same plan runs unchanged over a batch table or a
    * structured stream (no shuffle, no state; asserted batch ≡ stream in
    * StreamingSpec), which is exactly how a curation gate deploys against
    * a live ingest at scale. */
  def qualityScore(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tok", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_distinct", size(array_distinct(split(col("text"), " "))).cast(LongType))
      .withColumn("ttr", col("n_distinct").cast(DoubleType) / col("n_tok"))
      .withColumn("score",
        lit(0.5) * least(col("n_tok").cast(DoubleType) / 100.0, lit(1.0)) + lit(0.5) * col("ttr"))
      .select(col("doc_id"), col("n_tok"), col("ttr"), col("score"))

  /** Per-doc token CONCENTRATION via the Simpson index: the probability
    * two token draws (without replacement) are the same type,
    * Σ c·(c−1) / (N·(N−1)) — 0 for all-distinct text, →1 as one token
    * dominates. The exact-rational cousin of entropy-based quality
    * signals: every intermediate is integer arithmetic and the index is
    * ONE IEEE division, so the value is bit-identical across engines —
    * no transcendental (ln/log2) whose last-ulp differs by libm.
    * Single-token docs have no pair domain and are excluded.
    *
    * Scale shape: two map-side-combinable hash aggregations — (doc, tok)
    * counts then a per-doc sum/count — the x34 cost shape; no window, no
    * join, partitioned by doc content alone. */
  def tokenDiversity(docs: DataFrame, concentratedAbove: Double = 0.1): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast(LongType).as("n_tok"),
           count(lit(1)).cast(LongType).as("n_distinct"),
           sum(col("n") * (col("n") - 1)).cast(LongType).as("rep_pairs"))
      .filter(col("n_tok") >= 2)
      .withColumn("simpson",
        col("rep_pairs").cast(DoubleType)
          / (col("n_tok") * (col("n_tok") - 1)).cast(DoubleType))
      .withColumn("is_concentrated", col("simpson") > concentratedAbove)

  /** Length-bucketed batching audit: round every doc's token count up to
    * the next multiple of `bucketTokens` (the padded sequence length a
    * bucketed trainer would allocate) and report, per bucket, the doc
    * count, real token mass, and padding waste — the fraction of compute
    * a batcher burns on pad tokens at that bucket size. The standard
    * pre-training-efficiency report that decides bucket boundaries /
    * whether packing (x39) is worth its shuffle.
    *
    * Scale shape: a pure integer projection then one map-side-combinable
    * aggregation keyed on the bucket (cardinality = max_len/bucketTokens,
    * tiny); waste_frac is a single IEEE division per bucket row. */
  def lengthBuckets(docs: DataFrame, bucketTokens: Int = 64): DataFrame = {
    require(bucketTokens > 0, s"bucketTokens must be > 0, got $bucketTokens")
    docs
      .select(size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .withColumn("bucket",
        expr(s"((n_tok + ${bucketTokens - 1}) div $bucketTokens) * $bucketTokens"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("n_tok")).as("total_tokens"))
      .withColumn("padding_waste",
        col("bucket") * col("n_seqs") - col("total_tokens"))
      .withColumn("waste_frac",
        col("padding_waste").cast(DoubleType)
          / (col("bucket") * col("n_seqs")).cast(DoubleType))
  }

  // ---- winnowing fingerprints ------------------------------------------

  /** Winnowing (the MOSS local-fingerprinting scheme): hash every word
    * k-gram in POSITION order, slide a window of `window` consecutive
    * hashes, keep each window's minimum — the selected fingerprints are
    * guaranteed to include at least one hash from every `window`-length
    * run, so any shared substring of ≥ k+window-1 tokens between two docs
    * shares a fingerprint REGARDLESS of where it sits. That positional
    * robustness is what whole-doc schemes (x27's fingerprint, x21's
    * set-level MinHash) can't give: partial overlap (quotes, stitched
    * documents, plagiarized passages) still collides.
    *
    * Returns distinct (doc_id, fp). Docs shorter than k+window-1 tokens
    * select nothing (no full window exists — standard winnowing domain).
    *
    * Scale shape: posexplode + codegen'd hash, then ONE window (partition
    * by doc — parallel across docs, each doc's frame is its own token
    * stream) and a distinct on (doc, fp). Fingerprint density is ~2/(w+1),
    * so the index is a fixed fraction of the corpus independent of doc
    * sizes; the downstream use (join docs on fp) is the same inverted-
    * index shuffle as x29 with the df cap available for hot fingerprints.
    *
    * Determinism: h31 hashes (md5-derived, oracle-replicable) and integer
    * window minima over a total per-doc order. */
  def winnow(docs: DataFrame, k: Int, window: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = graft.functions.TextFns.explodeShingles(
        docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
          .select(col("doc_id"), (size(col("ts")) - (k - 1)).as("m"), col("ts")),
        "ts", k, posCol = "i", gramCol = "g")
      .select(col("doc_id"), col("m"), col("i"),
        graft.functions.TextFns.h31(col("g")).as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, window - 1)
    pos.withColumn("fp", min(col("h")).over(w))
      .filter(col("i") <= col("m") - (window - 1))
      .select(col("doc_id"), col("fp")).distinct()
  }

  // ---- blocked fuzzy near-dup (edit distance) --------------------------

  /** Typo-level near-dup pairs: docs sharing a block key (their first
    * `blockTokens` tokens) whose full-text Levenshtein distance is within
    * `maxRelDist` of the longer text. Edit distance catches the char-level
    * corruption (OCR noise, mojibake, diff-sized whitespace) that
    * token-set Jaccard (x18/x21) and shingles (x29) both miss.
    *
    * Blocking is what makes this runnable at all: Levenshtein is O(len²)
    * per pair, so candidate generation must be an equi join, never a
    * cross. The prefix block rides the standard shuffle-on-key path;
    * verification runs inside the join's codegen (built-in `levenshtein`),
    * so failing candidates die before any further shuffle. Skew = a hot
    * prefix (boilerplate openings): `maxBlockDf` drops blocks whose
    * document frequency exceeds the cap (x29's stop-shingle shape — the
    * hot-block set is tiny by definition, so it broadcasts into an
    * anti-join). Unlike the shingle cap, dropping a block CAN lose pairs
    * (a block is each doc's only key), so the cap is opt-in and the
    * honest semantics are "fuzzy dedup outside boilerplate openings";
    * production pipelines route capped blocks to x21's set-level LSH,
    * where identical openings collapse instead of exploding.
    *
    * Determinism: unit-cost edit distance and integer thresholds —
    * `floor(maxRelDist * longerLen)` is the same IEEE product in any
    * engine. */
  def fuzzyPairs(docs: DataFrame, blockTokens: Int, maxRelDist: Double,
                 maxBlockDf: Option[Long] = None): DataFrame = {
    val blocked0 = docs
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= blockTokens)
      .select(col("doc_id"), col("text"),
        concat_ws(" ", (1 to blockTokens).map(i => expr(s"element_at(ts, $i)")): _*).as("blk"))
    val blocked = maxBlockDf.fold(blocked0) { cap =>
      val hot = blocked0.groupBy(col("blk")).agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select(col("blk"))
      blocked0.join(broadcast(hot), Seq("blk"), "left_anti")
    }
    val a = blocked.select(col("blk"), col("doc_id").as("a_id"), col("text").as("a_text"))
    val b = blocked.select(col("blk"), col("doc_id").as("b_id"), col("text").as("b_text"))
    // thresholded levenshtein: O(len·bound) banded DP with early exit,
    // returning -1 past the bound — vs O(len²) for the unbounded form
    a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .withColumn("bound",
        floor(lit(maxRelDist) * greatest(length(col("a_text")), length(col("b_text"))))
          .cast(IntegerType))
      .withColumn("dist", expr("levenshtein(a_text, b_text, bound)").cast(LongType))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** [[fuzzyPairs]] with winnowing-fingerprint blocking unioned in: a
    * candidate pair shares the `blockTokens`-token prefix block OR at
    * least one winnow fingerprint ([[winnow]] over word k-grams with the
    * given window); every candidate is verified once with the same
    * thresholded Levenshtein. Why: a single prefix key misses any pair
    * whose corruption touches the FIRST tokens — exactly the OCR/head
    * noise fuzzy dedup exists to catch. Winnow fingerprints are the
    * positional-robust second key set: any shared run of ≥ k+window-1
    * tokens collides regardless of where it sits, so a head-corrupted
    * near-dup still blocks together via its intact tail.
    *
    * Scale shape: both key families ride ONE equi-join shuffle — prefix
    * keys and fingerprint keys are tagged into a single key space, so
    * candidate generation stays a self-join on one key column; the
    * distinct pair set then pays the banded-DP Levenshtein once per
    * candidate. Hot keys (boilerplate openings, boilerplate runs) are the
    * skew risk, capped by `maxKeyDf` exactly as in [[fuzzyPairs]]:
    * candidate generation only, verification untouched. Dropping a hot
    * key CAN lose pairs whose only collision it was; unlike the
    * prefix-only form, a pair usually holds several fingerprint keys, so
    * the cap's recall cost shrinks as overlap grows. */
  def fuzzyPairsWinnowed(docs: DataFrame, blockTokens: Int, maxRelDist: Double,
                         k: Int, window: Int,
                         maxKeyDf: Option[Long] = None): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"))
    val bkeys = d.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= blockTokens)
      .select(col("doc_id"), concat(lit("b:"),
        concat_ws(" ", (1 to blockTokens).map(i => expr(s"element_at(ts, $i)")): _*)).as("key"))
    val wkeys = winnow(d, k, window)
      .select(col("doc_id"), concat(lit("w:"), col("fp").cast(StringType)).as("key"))
    // both self-join sides read the key table (and winnow is a pipeline of
    // its own): materialize once
    val keyed0 = bkeys.unionByName(wkeys)
    val keyed = maxKeyDf.fold(keyed0) { cap =>
      val hot = keyed0.groupBy(col("key")).agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select(col("key"))
      keyed0.join(broadcast(hot), Seq("key"), "left_anti")
    }.localCheckpoint(true)
    val cand = keyed.select(col("key"), col("doc_id").as("a_id"))
      .join(keyed.select(col("key"), col("doc_id").as("b_id")), Seq("key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(d.select(col("doc_id").as("a_id"), col("text").as("a_text")), "a_id")
      .join(d.select(col("doc_id").as("b_id"), col("text").as("b_text")), "b_id")
      .withColumn("bound",
        floor(lit(maxRelDist) * greatest(length(col("a_text")), length(col("b_text"))))
          .cast(IntegerType))
      .withColumn("dist", expr("levenshtein(a_text, b_text, bound)").cast(LongType))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  // ---- segment-level exact dedup (C4-style span dedup) -----------------

  /** Exact dedup at SEGMENT granularity: each document is cut into
    * consecutive `segTokens`-token spans (the last span may be shorter) and
    * a span instance survives only if it is the corpus-wide FIRST
    * occurrence of its text (min (doc_id, seg_id) lexicographically) — the
    * C4/MassiveText "remove repeated spans, keep the first" policy, which
    * catches the sub-document duplication (quoted passages, syndicated
    * paragraphs, templated sections) that whole-doc dedup (x17) cannot see
    * and near-dup pair mining (x21/x29) only flags, never excises.
    *
    * Returns one row per doc: n_segs, n_dup_segs (instances whose text
    * appeared earlier), n_tokens_kept (tokens surviving span removal).
    *
    * Scale shape: spans are keyed by sha256(span_text) so the shuffle key
    * is fixed-width regardless of span length. Two exchanges on that key:
    * (1) min-struct first-occurrence agg — map-side combinable, so a
    * billion-fold duplicated span costs one struct per map partition, not
    * a fanout; (2) the instances⋈firsts equi join — the firsts side holds
    * exactly ONE row per distinct span, so join fanout equals the instance
    * count (no hot-key blowup possible). The final per-doc agg is again
    * map-side combinable. Instance rows carry only (hash, doc, seg, len) —
    * span text never crosses an exchange.
    */
  /** Span instances of every doc: (doc_id, s, seg_len, h) with h =
    * sha256 of the `segTokens`-token span starting at position s·segTokens. */
  private def spans(docs: DataFrame, segTokens: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), col("ts"),
        explode(expr(s"sequence(0, ((size(ts) + ${segTokens - 1}) div $segTokens) - 1)")).as("s"))
      .select(col("doc_id"), col("s"),
        least(lit(segTokens), size(col("ts")) - col("s") * segTokens).cast(LongType).as("seg_len"),
        sha2(concat_ws(" ", expr(s"slice(ts, s * $segTokens + 1, $segTokens)")), 256).as("h"))

  def segmentDedup(docs: DataFrame, segTokens: Int): DataFrame = {
    val sp = spans(docs, segTokens)
    val firsts = sp.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("s"))).as("f"))
      .select(col("h"), col("f.doc_id").as("f_doc"), col("f.s").as("f_seg"))
    sp.join(firsts, "h")
      .withColumn("kept", col("doc_id") === col("f_doc") && col("s") === col("f_seg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
           sum(when(col("kept"), 0L).otherwise(1L)).as("n_dup_segs"),
           sum(when(col("kept"), col("seg_len")).otherwise(0L)).as("n_tokens_kept"))
  }

  /** The excision itself: [[segmentDedup]]'s keep decision APPLIED — each
    * document rebuilt from only its first-occurrence spans, emitted as
    * (doc_id, n_tokens_kept, cleaned_fp) with cleaned_fp the h31 of the
    * reconstructed text (the oracle-replicable handle; the text itself is
    * rebuilt in the projection and could be emitted instead). Documents
    * whose every span appeared earlier come back empty (n_tokens_kept 0,
    * fp of "") — C4's remove-repeated-spans policy producing the cleaned
    * corpus, not just x46's report about it.
    *
    * Scale shape: the span DECISIONS travel as (doc_id, s) pairs — span
    * text never crosses an exchange (the [[segmentDedup]] discipline);
    * kept positions fold into one per-doc sorted array (bounded by
    * doc_len/segTokens, a per-doc constant) and the reconstruction is a
    * single codegen projection slicing the doc's own token array. One
    * extra key-aligned join on doc_id beyond segmentDedup's plan. */
  def segmentExcise(docs: DataFrame, segTokens: Int): DataFrame = {
    val sp = spans(docs, segTokens)
    val firsts = sp.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("s"))).as("f"))
      .select(col("h"), col("f.doc_id").as("f_doc"), col("f.s").as("f_seg"))
    val kept = sp.join(firsts, "h")
      .filter(col("doc_id") === col("f_doc") && col("s") === col("f_seg"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("s"))).as("keep_s"),
           sum(col("seg_len")).as("n_tokens_kept"))
    docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .join(kept, Seq("doc_id"), "left")
      .withColumn("cleaned", concat_ws(" ",
        expr(s"transform(coalesce(keep_s, array()), " +
             s"s -> concat_ws(' ', slice(ts, s * $segTokens + 1, $segTokens)))")))
      .select(col("doc_id"),
        coalesce(col("n_tokens_kept"), lit(0L)).cast(LongType).as("n_tokens_kept"),
        graft.functions.TextFns.h31(col("cleaned")).as("cleaned_fp"))
  }

  /** Content-defined chunking (the CDC/rolling-hash segmentation storage
    * dedup uses): a cut falls AFTER token i wherever the hash of the
    * k-gram ENDING at i is ≡ 0 mod `divisor` — boundaries depend only on
    * local content, so a passage shared between two docs chunks
    * identically even when one doc has insertions BEFORE it, the
    * shift-robustness [[segmentDedup]]'s fixed blocks lack (an
    * insertion re-phases every later fixed block; CDC re-synchronizes
    * within one chunk). Expected chunk length ≈ `divisor` tokens.
    * Returns per doc: n_chunks, n_tokens, n_shared (chunk instances
    * whose exact text appears in ≥2 distinct docs), n_shared_tokens,
    * shared_ppm (token-mass share, exact integer ppm).
    *
    * Scale shape: boundary detection, chunk construction, and lengths
    * are ONE codegen projection over each doc's own token array — no
    * explode-and-window, no per-token shuffle. The only exchanges key on
    * sha256(chunk) (fixed width; text never crosses an exchange beyond
    * the local hash): a distinct + count for per-chunk doc counts, and
    * the instances⋈counts join whose build side has one row per
    * DISTINCT chunk. Final rollup is map-side combinable on doc_id.
    */
  def cdcChunks(docs: DataFrame, k: Int, divisor: Int): DataFrame = {
    val gram = s"concat_ws(' ', slice(ts, i - ${k - 1}, $k))"
    val h = s"(cast(conv(substr(md5($gram), 1, 15), 16, 10) as bigint) " +
      s"% ${graft.functions.TextFns.P31})"
    val chunks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      // sequence stays ascending via greatest(); i = size(ts) never cuts
      // (a trailing boundary is implicit), docs shorter than k get none
      .withColumn("cuts", expr(
        s"filter(sequence($k, greatest(size(ts), $k)), " +
          s"i -> i < size(ts) AND $h % $divisor = 0)"))
      .withColumn("bounds", expr("concat(array(0), cuts, array(size(ts)))"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(bounds) - 1), " +
          "j -> struct(cast(element_at(bounds, j + 1) - element_at(bounds, j) as bigint) AS clen, " +
          "concat_ws(' ', slice(ts, element_at(bounds, j) + 1, " +
          "element_at(bounds, j + 1) - element_at(bounds, j))) AS ctext))")))
      .select(col("doc_id"), col("col.clen").as("clen"),
        sha2(col("col.ctext"), 256).as("h"))
    val docCounts = chunks.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
    chunks.join(docCounts, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
           sum(col("clen")).as("n_tokens"),
           sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"),
           sum(when(col("nd") >= 2, col("clen")).otherwise(0L)).as("n_shared_tokens"))
      .withColumn("shared_ppm", expr("n_shared_tokens * 1000000 div n_tokens"))
  }

  /** Incremental [[segmentDedup]]: per-doc stats for the NEW batch only,
    * with first-occurrence judged against existing corpus ∪ batch. Folding
    * doc_id-ordered batches through this function and unioning the outputs
    * reproduces the batch answer exactly (law in CurationSpec): the global
    * first occurrence of a span lives in the earliest batch containing it,
    * where it is also the batch-internal minimum.
    *
    * This is the dedup-append shape at span granularity (the x37 pattern
    * one level down): at scale the existing side is a stored span-hash
    * index — the batch's distinct hashes BROADCAST into a probe of that
    * store, so lookup work is proportional to the batch's spans, and
    * history is never re-segmented (test-scale form derives the store from
    * existingDocs; the stored hash equals the recomputed one because
    * sha256 is deterministic). */
  def segmentDedupIncremental(existingDocs: DataFrame, newDocs: DataFrame,
                              segTokens: Int): DataFrame = {
    val newSpans = spans(newDocs, segTokens)
    val probe = newSpans.select(col("h")).distinct()
    // store lookup: probe-restricted BEFORE any exchange on the store side
    val seen = spans(existingDocs, segTokens).join(broadcast(probe), "h")
      .select(col("h")).distinct().withColumn("seen", lit(true))
    val firsts = newSpans.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("s"))).as("f"))
      .select(col("h"), col("f.doc_id").as("f_doc"), col("f.s").as("f_seg"))
    newSpans.join(firsts, "h").join(seen, Seq("h"), "left")
      .withColumn("kept",
        col("seen").isNull && col("doc_id") === col("f_doc") && col("s") === col("f_seg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
           sum(when(col("kept"), 0L).otherwise(1L)).as("n_dup_segs"),
           sum(when(col("kept"), col("seg_len")).otherwise(0L)).as("n_tokens_kept"))
  }

  // ---- leakage-free train/test split -----------------------------------

  /** Contamination-safe evaluation split: documents are split train/test
    * at the NEAR-DUP-CLUSTER level, not the document level — every member
    * of a transitive near-dup cluster (x35's components over
    * Jaccard-≥-threshold pairs) follows its cluster, so no near-duplicate
    * pair ever straddles the split. Splitting per-document leaks: a test
    * doc's near-copy in train is memorization the eval can't see, the
    * exact failure benchmark decontamination (x38) exists to audit.
    * testPermille/1000 of CLUSTERS (not docs) land in test, selected by
    * the same content-hash bucketing as x33 — reproducible across
    * engines, partitionings, and re-runs. Docs in no cluster are their
    * own singleton (coalesce to doc_id).
    *
    * Returns (doc_id, cluster_id, split) for every input doc.
    *
    * Scale shape: the cluster computation is [[TextDedup.nearDupClusters]]
    * (LSH pair mining + union-find contraction — the scale-adjudicated
    * path); on top of it this adds one left join of docs against labels
    * (equi, key-bounded) and a pure codegen hash projection. Production
    * pipelines reuse the already-materialized x35 labels instead of
    * re-mining — the split is then shuffle-free on the corpus. */
  def leakFreeSplit(docs: DataFrame, threshold: Double,
                    testPermille: Int): DataFrame =
    leakFreeSplit(docs, TextDedup.nearDupClusters(docs, threshold), testPermille)

  /** Same split over PRE-MINED labels (the x35 frame) — the production
    * spelling: cluster labels are a maintained table that every dedup
    * action reads; re-mining per consumer would pay the LSH + union-find
    * cost once per action instead of once per corpus. */
  def leakFreeSplit(docs: DataFrame, labels: DataFrame,
                    testPermille: Int): DataFrame = {
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(graft.functions.TextFns.h31(
          concat(lit("split:"), col("cluster_id").cast(StringType))) % 1000 < testPermille,
          "test").otherwise("train"))
  }

  // ---- duplication-aware sampling weights ------------------------------

  /** Count-aware reweighting over near-dup clusters: every document gets
    * weight_ppm = floor(10⁶ / |its cluster|), so each transitive near-dup
    * CLUSTER contributes total weight ~1 regardless of how many times its
    * content was crawled — the soft alternative to hard dedup (keep one,
    * drop the rest) when downstream training wants the full corpus with
    * duplication-corrected sampling probabilities. Docs in no cluster are
    * their own singleton (weight exactly 10⁶); `labels` is the x35 frame
    * (doc_id, cluster_id) — pass the already-materialized production
    * labels rather than re-mining.
    *
    * Returns (doc_id, cluster_id, cluster_size, weight_ppm) for every
    * input doc.
    *
    * Scale shape: one left equi-join of docs against labels (labels hold
    * only docs that appear in some near-dup pair — much smaller than the
    * corpus, but O(dups) so it joins by shuffle, never broadcast), one
    * map-side-combined count keyed by cluster_id, and one shuffle join of
    * the size frame back on cluster_id. A pathological mega-cluster makes
    * its size row hot on the final join — that join fans out one row per
    * MEMBER (linear, no pair blowup), and AQE's skew split handles the
    * residual imbalance. */
  def duplicationWeights(docs: DataFrame, labels: DataFrame): DataFrame = {
    val all = docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = all.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    all.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        expr("1000000 div cluster_size").as("weight_ppm"))
  }

  // ---- per-source quota cap (two-phase windowed top-k) -----------------

  /** Per-source quota sampling: keep at most `k` documents per source,
    * chosen by deterministic content-hash priority (h31 of the doc id,
    * ties by doc_id) — the C4/CommonCrawl-style per-domain cap that stops
    * any single domain from dominating a training mix, with x33's
    * reproducibility (same doc always makes the same cut).
    *
    * Computed in TWO window phases so no source ever serializes into a
    * single task (the x39 lesson, applied to selection): phase 1 takes the
    * top-k within each (source, salt) group — `salts`-way parallel per
    * source, worst task = one salt's share — and phase 2 re-ranks the
    * ≤ salts·k survivors per source. Exact by the top-k union property:
    * every global top-k row is in its own salt's top-k, so phase 1 never
    * discards a winner. CurationSpec asserts two-phase ≡ single-window.
    *
    * Returns (source, rn, doc_id) for kept docs, rn ∈ [1, k] the global
    * per-source rank.
    *
    * Scale shape: phase 1 shuffles once on (source, salt) — 100 TB of one
    * domain spreads over `salts` reducers, each sorting only its share;
    * phase 2's input is ≤ salts·k rows per source (bounded by
    * construction, independent of corpus size). Salt is content-derived,
    * not random — deterministic under retries and re-runs. */
  def sourceQuota(docs: DataFrame, k: Int, salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = graft.functions.TextFns.h31(concat(lit("quota:"), col("doc_id").cast(StringType)))
    val base = docs.select(col("source"), col("doc_id"), pri.as("pri"),
      pmod(graft.functions.TextFns.h31(concat(lit("qsalt:"), col("doc_id").cast(StringType))),
        lit(salts.toLong)).as("salt"))
    val w1 = Window.partitionBy(col("source"), col("salt")).orderBy(col("pri"), col("doc_id"))
    val survivors = base.withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") <= k).drop("rn1", "salt")
    val w2 = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
    survivors.withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .select(col("source"), col("rn").cast("long").as("rn"), col("doc_id"))
  }

  /** Single-window form of [[sourceQuota]] — the law oracle for the
    * two-phase computation (CurationSpec); never the production path. */
  private[graft] def sourceQuotaWindowed(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = graft.functions.TextFns.h31(concat(lit("quota:"), col("doc_id").cast(StringType)))
    val w = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
    docs.select(col("source"), col("doc_id"), pri.as("pri"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("source"), col("rn").cast("long").as("rn"), col("doc_id"))
  }

  // ---- end-to-end curation funnel (gate → dedup → quota report) --------

  /** The whole curation RECIPE as one plan, reported as a per-source
    * funnel: raw docs → quality gate (token count + type-token ratio) →
    * corpus-wide exact dedup (first-id keeper per sha256) → per-source
    * quota cap ([[sourceQuota]]'s two-phase top-k) — with the doc and
    * token counts each stage retains. This is the accounting a real
    * curation run publishes alongside its output: where the corpus
    * shrank, per source, and how many training tokens survived.
    *
    * Scale shape: every stage keeps its own discipline — the gate is a
    * stateless projection; dedup shuffles a fixed-width hash key into a
    * map-side-combinable min agg, then a key-aligned join on the keeper
    * ids (one row per distinct content, no hot-key fanout); the quota is
    * the salted two-phase top-k (no source serializes into one task);
    * and the report itself only ever joins per-source AGGREGATES
    * (#sources-sized frames, broadcast). */
  def curationFunnel(docs: DataFrame, minTok: Long = 5L, minTtr: Double = 0.3,
                     quotaK: Int = 40): DataFrame = {
    val toks = split(col("text"), " ")
    val feats = docs.select(col("doc_id"), col("source"), col("text"),
      size(toks).cast(LongType).as("n_tok"),
      (size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("ttr"))
    val gated = feats.filter(col("n_tok") >= minTok && col("ttr") >= minTtr)
    val keepIds = gated.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val unique = gated.join(keepIds, "doc_id")
    val kept = sourceQuota(unique, quotaK)
      .join(unique.select(col("doc_id"), col("n_tok")), "doc_id")
    val all = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val g = gated.groupBy(col("source")).agg(count(lit(1)).as("n_gated"))
    val u = unique.groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
    val k = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("tokens_kept"))
    all.join(g, Seq("source"), "left").join(u, Seq("source"), "left")
      .join(k, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_gated"), lit(0L)).as("n_gated"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
  }

  // ---- mixture planning (per-source sampling rates for a token budget) --

  /** Training-mix planner: given a global token budget (a fraction of the
    * corpus) split uniformly across sources, compute each source's
    * sampling rate and achievable token mass in ONE pass — rate =
    * min(1, quota/tokens), so oversized sources downsample to their quota
    * and undersized ones pass through whole, reporting the deficit a
    * second redistribution round would reassign. The planning step that
    * precedes x33/x48's per-doc sampling gates: those execute a rate,
    * this derives it.
    *
    * Determinism: quota is integer arithmetic (floor(total·frac) then an
    * integer div by the source count); rate is a single IEEE division.
    *
    * Scale shape: one map-side-combinable per-source agg, then a
    * broadcast of the single-row total onto the #sources-sized frame —
    * the corpus is read once and nothing bigger than #sources rows ever
    * moves. */
  def mixturePlan(docs: DataFrame, budgetFrac: Double = 0.5): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1, s"budgetFrac in (0,1], got $budgetFrac")
    val per = docs.groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total"), count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("quota_tokens",
        expr(s"cast(floor(cast(total as double) * $budgetFrac) as bigint) div n_sources"))
      .withColumn("rate",
        least(lit(1.0), col("quota_tokens").cast(DoubleType) / col("n_tokens").cast(DoubleType)))
      .withColumn("planned_tokens", least(col("quota_tokens"), col("n_tokens")))
      .withColumn("deficit", col("quota_tokens") - col("planned_tokens"))
      .select(col("source"), col("n_tokens"), col("quota_tokens"),
        col("rate"), col("planned_tokens"), col("deficit"))
  }

  // ---- decontamination EXCISION (positional span removal) --------------

  /** The decontamination ACTION: every corpus token covered by any
    * `k`-gram that also appears in the probe (benchmark) set is removed,
    * and each doc is rebuilt from its surviving tokens — MassiveText's
    * "remove the overlapping span, keep the document" policy, where
    * x38/x67 only REPORT contamination. Returns every corpus doc as
    * (doc_id, n_tokens_kept, n_tokens_removed, cleaned_fp).
    *
    * Scale shape: corpus shingles carry (doc_id, position) and join the
    * DISTINCT probe shingle set on the shingle string (probe side is
    * benchmark-sized → broadcasts; the x38 decontamination shape);
    * covered positions collapse doc-locally (distinct + per-doc sorted
    * array, bounded by doc length) and the rebuild is one codegen
    * projection — `filter` over the position range keeps order by
    * construction, no re-sort. The per-token `array_contains` probe is
    * O(doc_len · covered) in the worst fully-contaminated case — bounded
    * by the doc, never the corpus. */
  def deconExcise(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    // shared shingling spelling; this operator's positions are 0-based
    // (token offsets for excision), so shift the helper's 1-based pos
    def shingled(d: DataFrame) = graft.functions.TextFns.explodeShingles(
        d.select(col("doc_id"), split(col("text"), " ").as("ts")), "ts", k,
        posCol = "pos1", gramCol = "s")
      .select(col("doc_id"), (col("pos1") - 1).as("i"), col("s"))
    val probeSet = shingled(probes).select(col("s")).distinct()
    val covered = shingled(corpus).select(col("doc_id"), col("i"), col("s"))
      .join(broadcast(probeSet), "s")
      .select(col("doc_id"), explode(expr(s"sequence(i, i + ${k - 1})")).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("p"))).as("cov"))
    corpus.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), expr("cast(array() as array<int>)")))
      .withColumn("kept",
        expr("filter(sequence(0, size(ts) - 1), i -> NOT array_contains(cov, i))"))
      .select(col("doc_id"),
        size(col("kept")).cast(LongType).as("n_tokens_kept"),
        (size(col("ts")) - size(col("kept"))).cast(LongType).as("n_tokens_removed"),
        graft.functions.TextFns.h31(
          expr("array_join(transform(kept, i -> element_at(ts, i + 1)), ' ')"))
          .as("cleaned_fp"))
  }

  // ---- curriculum ordering (quality tiers × deterministic shuffle) -----

  /** Curriculum construction: the corpus ordered easy→hard by quality
    * TIER, deterministically shuffled WITHIN each tier — the standard
    * training-order compromise (strict quality-sort over-clusters
    * near-identical documents; pure shuffle wastes the curriculum
    * signal). Tiers are equi-depth deciles of the composite quality
    * score ([[qualityScore]]'s formula), so every tier holds the same
    * document count regardless of the score distribution's shape; the
    * within-tier order is the content-hash shuffle (reproducible across
    * engines and re-runs, unlike rand(seed)).
    *
    * Returns (doc_id, tier, pos): tier ∈ [0, tiers), pos the global
    * 1-based training position.
    *
    * Scale shape: two hierarchical global ranks
    * ([[graft.operators.Ranks.globalRank]] — range exchange + per-range
    * sorts, nothing global) and one single-row broadcast for N; no
    * corpus-sized window anywhere. */
  def curriculumOrder(docs: DataFrame, tiers: Int = 10): DataFrame = {
    require(tiers > 0, s"tiers must be > 0, got $tiers")
    val scored = qualityScore(docs).select(col("doc_id"), col("score"))
    // easy→hard: highest score first → rank by (score desc, doc_id)
    val ranked = Ranks.globalRank(scored, Seq(col("score").desc, col("doc_id")))
    // count the cheap pre-rank input, not the ranked lineage
    val total = scored.agg(count(lit(1)).as("n_total"))
    val tiered = ranked.crossJoin(broadcast(total))
      .withColumn("tier", expr(s"((grank - 1) * $tiers) div n_total"))
      .withColumn("shuf",
        graft.functions.TextFns.h31(concat(lit("cur:"), col("doc_id").cast(StringType))))
      .select(col("doc_id"), col("tier"), col("shuf"))
    Ranks.globalRank(tiered, Seq(col("tier"), col("shuf"), col("doc_id")))
      .select(col("doc_id"), col("tier"), col("grank").as("pos"))
  }

  // ---- span-corruption planning (T5-style objective construction) ------

  /** Denoising-objective plan: each document's token stream is cut into
    * fixed `blockTokens`-token blocks and a block is marked for masking
    * iff h31(doc:block) mod 100 < maskPct — the deterministic,
    * non-overlapping-by-construction form of T5/UL2 span corruption
    * (greedy random span selection needs a per-doc sequential scan; fixed
    * blocks keep the whole plan one vectorized projection). Returns the
    * per-doc plan summary (n_blocks, n_masked, n_masked_tokens,
    * masked_fp) — masked_fp hashes the ordered masked-block list, the
    * handle a downstream pair-builder joins on.
    *
    * Scale shape: explode to (doc, block) → codegen hash gate → one
    * map-side-combinable per-doc agg; no join, no window, no state. */
  def spanCorruptionPlan(docs: DataFrame, blockTokens: Int = 10,
                         maskPct: Int = 15): DataFrame = {
    require(blockTokens > 0 && maskPct >= 0 && maskPct <= 100,
      s"bad blockTokens=$blockTokens maskPct=$maskPct")
    val blocks = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .withColumn("b",
        explode(expr(s"sequence(0, ((n_tok + ${blockTokens - 1}) div $blockTokens) - 1)")))
      .withColumn("b_len",
        least(lit(blockTokens.toLong), col("n_tok") - col("b") * blockTokens))
      .withColumn("masked",
        pmod(graft.functions.TextFns.h31(
          concat(col("doc_id").cast(StringType), lit(":"), col("b").cast(StringType))),
          lit(100L)) < maskPct)
    blocks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("masked"), col("b_len")).otherwise(0L)).as("n_masked_tokens"),
        sort_array(collect_list(when(col("masked"), col("b")))).as("mb"))
      .select(col("doc_id"), col("n_blocks"), col("n_masked"), col("n_masked_tokens"),
        graft.functions.TextFns.h31(
          expr("array_join(transform(mb, x -> cast(x as string)), ',')")).as("masked_fp"))
  }

  // ---- temperature rebalancing (inverse-sqrt language sampler) ---------

  /** Deterministic α=0.5 temperature rebalancing across languages: a doc in
    * language l is kept with rate min(1, k/√n_l) — head languages are
    * downsampled ∝ n_l^(−1/2) (exactly the multilingual temperature-
    * sampling family with α = 1/2, up to the global normalizer), tail
    * languages pass through whole. The per-language-independent form is
    * deliberate: no cross-language float summation (whose order would
    * differ between engines) ever enters the decision, so the gate is
    * bit-reproducible — √, ÷ and ×1e6 are all single correctly-rounded
    * IEEE ops, and the selection compares integer hash buckets against
    * floor(rate·1e6), the same content-hash scheme as x33 (reproducible
    * across engines, partitionings, and re-runs, unlike rand(seed)).
    *
    * Returns one row per lang: n_docs, rate_units (floor(rate·1e6)),
    * n_selected.
    *
    * Scale shape: ZERO corpus shuffles — the per-lang count is one
    * map-side-combined agg producing a |langs|-row frame that broadcasts
    * back; selection is a pure codegen projection; the final count
    * map-side-combines again. The corpus streams exactly twice (count,
    * select) and at 100 TB the count pass is typically already available
    * from catalog/statistics. */
  def rebalanceByLang(docs: DataFrame, k: Double): DataFrame = {
    val rates = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("rate_units",
        least(lit(1000000L),
          floor(lit(k) / sqrt(col("n_docs").cast(DoubleType)) * 1e6).cast(LongType)))
    docs.join(broadcast(rates), "lang")
      .withColumn("bucket",
        graft.functions.TextFns.h31(concat(lit("rebal:"), col("doc_id").cast(StringType))) % 1000000L)
      .groupBy(col("lang"), col("n_docs"), col("rate_units"))
      .agg(sum(when(col("bucket") < col("rate_units"), 1L).otherwise(0L)).as("n_selected"))
      .select(col("lang"), col("n_docs"), col("rate_units"), col("n_selected"))
  }

  // ---- df-weighted token-overlap retrieval (BM25-shaped top-k) ---------

  /** Sparse lexical retrieval: score corpus docs against each query doc by
    * Σ_t tf(t, doc) · w(t) over shared terms, w(t) = floor(1e12/(df_t+1))
    * — the BM25/tf-idf weighting family (monotone-decreasing in document
    * frequency, so rare shared terms dominate) restated in exact integer
    * arithmetic: ln-based idf is only 1-ulp-reproducible across engines,
    * while floor of one IEEE divide is bit-exact, keeping the whole score
    * (an exact Long sum — tf ≤ doc length, w ≤ 1e12, far inside Long)
    * hash-checkable. Terms are word `termK`-grams (positional, so tf
    * counts repeated phrases): k > 1 is the shingle-retrieval form that
    * stays discriminative on small-vocabulary corpora where every unigram
    * is a stopword. Terms with df > maxDfFrac·N are excluded from scoring
    * — standard stopword pruning, part of the declared semantics (a term
    * in a fifth of the corpus carries no retrieval signal) and replicated
    * by the oracle.
    *
    * Returns (q_id, rn, doc_id, score): the top-k corpus docs per query,
    * ties broken by doc_id.
    *
    * Scale shape: the query side is a probe workload — tiny vs a 100 TB
    * corpus — so its distinct term vocabulary BROADCASTS and the corpus
    * term stream is filtered to query-vocabulary matches BEFORE any
    * exchange (x38's decontamination shape): tf, df, and scoring shuffles
    * all carry only matched postings. df is counted per distinct
    * (doc, term) — one map-side-combined agg — and the df/weight frame
    * (query-vocabulary-sized) broadcasts into the scoring join. Final
    * top-k is a per-query window over candidate docs only. */
  def retrieveTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   maxDfFrac: Double, termK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def terms(d: DataFrame): DataFrame =
      graft.functions.TextFns.explodeShingles(
        d.select(col("doc_id"), split(col("text"), " ").as("ts")), "ts", termK,
        gramCol = "tok")
        .select(col("doc_id"), col("tok"))
    val qTok = terms(queries.select(col("doc_id"), col("text")))
      .select(col("doc_id").as("q_id"), col("tok")).distinct()
    val qVocab = qTok.select(col("tok")).distinct()
    // corpus streams once; only query-vocab terms survive to the shuffle
    val matched = terms(corpus.select(col("doc_id"), col("text")))
      .join(broadcast(qVocab), "tok")
    // two consumers (df/weights + scoring) — materialize the matched
    // postings once so the corpus match pass runs once, not twice
    val tf = matched.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val nCorpus = corpus.agg(count(lit(1)).as("n_corpus"))
    val weights = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nCorpus))
      .filter(col("df") <= floor(lit(maxDfFrac) * col("n_corpus")))
      .withColumn("w", floor(lit(1e12) / (col("df") + 1).cast(DoubleType)).cast(LongType))
      .select(col("tok"), col("w"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(weights), "tok")
      .join(broadcast(qTok), "tok")
      .filter(col("q_id") =!= col("doc_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("score"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("doc_id"), col("score"))
  }

  // ---- importance weighting toward a target domain (DSIR-shaped) -------

  /** Per-doc importance toward a TARGET distribution: for each of the
    * doc's distinct word `k`-gram features, the integer ratio surrogate
    * w = (t_df+1)·10¹² div (c_df+1) of the target/corpus document-
    * frequency ratio (add-one smoothed), summed and normalized per
    * feature as exact Long arithmetic. The DSIR-family data-selection
    * shape: given a small target/domain sample, upweight corpus docs
    * whose feature mass looks like the target — the domain-targeting
    * gate x54's corpus-only rarity cannot express (rarity says "unusual",
    * importance says "unusual LIKE THE TARGET"). The ratio surrogate is
    * strictly monotone in the true likelihood ratio per feature, so
    * threshold selection on it orders docs identically; it avoids ln
    * (only 1-ulp reproducible) entirely.
    *
    * Returns (doc_id, n_sh, importance, importance_per_sh) for corpus
    * docs with ≥ k tokens. Overflow bound: per-feature w ≤
    * (|target docs|+1)·10¹², so the Long sum is safe while the target
    * sample stays under ~9·10⁶ docs — the intended regime (a domain
    * sample, not a second corpus); scale the 10¹² constant down if a
    * larger target is ever used.
    *
    * Scale shape: the target's df table is bounded by the target sample
    * size → BROADCASTS into the scoring join (x38's probe argument); the
    * corpus df table is vocabulary-sized → joins by shuffle on the
    * feature key (x54's argument). The corpus shingle set is built once
    * and checkpointed for its two readers (df count + scoring join); the
    * per-doc sum map-side-combines.
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame, k: Int): DataFrame = {
    val cSh = TextDedup.shingles(corpus.select(col("doc_id"), col("text")), k)
      .localCheckpoint(true) // read by the corpus df count AND the scoring join
    val tDf = TextDedup.shingles(target.select(col("doc_id"), col("text")), k)
      .groupBy(col("shingle")).agg(count(lit(1)).as("t_df"))
    val cDf = cSh.groupBy(col("shingle")).agg(count(lit(1)).as("c_df"))
    cSh.join(cDf, "shingle")
      .join(broadcast(tDf), Seq("shingle"), "left")
      .withColumn("w", expr(
        "(coalesce(t_df, cast(0 as bigint)) + 1) * 1000000000000 div (c_df + 1)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"), sum(col("w")).as("importance"))
      .withColumn("importance_per_sh", expr("importance div n_sh"))
  }

  // ---- embedding int8 scalar quantization ------------------------------

  /** Symmetric int8 scalar quantization of an embedding column: per vector,
    * scale = max|x|/127, q_i = floor(x_i/scale + 0.5) ∈ [-127, 127], with a
    * position-weighted checksum of the quantized codes and the max absolute
    * reconstruction error in fixed 1e-6 units.
    *
    * This is the storage/bandwidth path for ANN at scale (4× smaller than
    * float32, 8× smaller than the float64 shuffle form): IVF/SRP candidate
    * generation runs on int8 codes, exact re-rank on the float originals.
    *
    * Determinism: all per-element ops (IEEE divide, floor(+0.5) half-up
    * rounding, multiply-back, abs, max) are elementwise over the same
    * doubles in any engine; the checksum Σ (i+1)·q_i is an exact Long sum.
    * Degenerate case: an all-zero (or empty) vector has scale = 0, where
    * x/scale is NaN in IEEE and engines diverge on NaN handling — but
    * scale = 0 forces every element to 0, so checksum = 0 and
    * max_err_units = 0 ARE the exact answers; both are short-circuited
    * explicitly (here and in the oracle SQL) instead of relying on either
    * engine's NaN semantics.
    *
    * Scale shape: pure projection — zero shuffles, whole-stage codegen,
    * streams the corpus once.
    */
  def quantizeInt8(embs: DataFrame): DataFrame = {
    val v = "cast(embedding as array<double>)"
    embs.select(
      col("vec_id"),
      expr(s"aggregate($v, cast(0.0 as double), (m, x) -> greatest(m, abs(x))) / 127.0").as("scale"),
      col("embedding"))
      .select(
        col("vec_id"),
        when(col("scale") === 0.0, lit(0L)).otherwise(
          expr(s"cast(floor(aggregate(zip_with($v, sequence(1, size(embedding)), " +
            "(x, i) -> i * floor(x / scale + 0.5d)), cast(0.0 as double), (a, e) -> a + e)) as bigint)"))
          .as("checksum"),
        when(col("scale") === 0.0, lit(0L)).otherwise(
          expr(s"cast(floor(aggregate($v, cast(0.0 as double), " +
            "(m, x) -> greatest(m, abs(x - floor(x / scale + 0.5d) * scale))) * 1e6) as bigint)"))
          .as("max_err_units"))
  }
}
