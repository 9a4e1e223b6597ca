package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.Curation

/** Round-3 training-data curation battery (SURVEY.md §2.4 X38–X41 + Q36):
  * benchmark decontamination, sequence packing, boilerplate mining,
  * embedding quantization, and the approx-percentile sketch gate.
  * Operators live in [[graft.operators.Curation]]; this object binds them
  * to the test tables and states each DuckDB oracle.
  */
object TrainingData {

  private def docs(spark: SparkSession, dir: String) = t(spark, dir, "documents")
  private def embs(spark: SparkSession, dir: String) = t(spark, dir, "embeddings")

  // ---- X38: benchmark decontamination ----------------------------------

  /** Probe set = docs with doc_id ≡ 0 (mod 97) — a stand-in benchmark
    * suite (~1% of the corpus). k=3 because this corpus's duplication is
    * token-set-level (x29: order-preserving near-dups are rare), so longer
    * verbatim runs barely exist; production uses k in 8–13. */
  val DecontamK = 3

  def x38Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Curation.decontaminate(
      d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0), DecontamK)
      .orderBy(col("doc_id"), col("probe_id"))
  }

  val x38Sql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
       |       FROM tk, unnest(range(1, len(ts) - ${DecontamK - 2})) AS u(i)
       |       WHERE len(ts) >= $DecontamK)
       |SELECT c.doc_id AS doc_id, p.probe_id, count(*) AS n_shared
       |FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) c
       |JOIN (SELECT doc_id AS probe_id, s FROM sh WHERE doc_id % 97 = 0) p USING (s)
       |GROUP BY 1, 2 ORDER BY doc_id, probe_id""".stripMargin

  // ---- X39: sequence packing (concatenate-and-chunk) -------------------

  /** 256-token chunks (docs average ~54 tokens → ~4–5 docs per chunk). */
  val ChunkCapacity = 256

  def x39SequencePack(spark: SparkSession, dir: String): DataFrame =
    Curation.packChunks(docs(spark, dir), ChunkCapacity)
      .orderBy(col("lang"), col("chunk_id"))

  val x39Sql: String =
    s"""WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |           FROM documents),
       |c AS (SELECT lang, n_tok,
       |        CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY n_tok DESC, doc_id
       |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
       |      FROM d),
       |s AS (SELECT lang, cum_end - n_tok AS cum_start, cum_end FROM c),
       |sp AS (SELECT lang, cum_start, cum_end,
       |         unnest(range(cum_start // $ChunkCapacity, (cum_end - 1) // $ChunkCapacity + 1)) AS chunk_id
       |       FROM s)
       |SELECT lang, chunk_id, count(*) AS n_docs,
       |  CAST(sum(least(cum_end, (chunk_id + 1) * $ChunkCapacity)
       |         - greatest(cum_start, chunk_id * $ChunkCapacity)) AS BIGINT) AS n_tokens
       |FROM sp GROUP BY 1, 2 ORDER BY lang, chunk_id""".stripMargin

  // ---- X40: boilerplate n-gram mining ----------------------------------

  val BoilerplateK = 3
  val BoilerplateMinDf = 5L

  def x40Boilerplate(spark: SparkSession, dir: String): DataFrame =
    Curation.boilerplateNgrams(docs(spark, dir), BoilerplateK, BoilerplateMinDf)
      .orderBy(col("shingle"))

  val x40Sql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
       |       FROM tk, unnest(range(1, len(ts) - ${BoilerplateK - 2})) AS u(i)
       |       WHERE len(ts) >= $BoilerplateK)
       |SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
       |HAVING count(*) >= $BoilerplateMinDf ORDER BY shingle""".stripMargin

  // ---- X41: int8 scalar quantization of embeddings ---------------------

  def x41QuantizeInt8(spark: SparkSession, dir: String): DataFrame =
    Curation.quantizeInt8(embs(spark, dir)).orderBy(col("vec_id"))

  /** Every intermediate is either an exact-in-double integer (the codes,
    * the position-weighted checksum) or an elementwise IEEE op computed
    * identically by both engines — see Curation.quantizeInt8. The scale = 0
    * degenerate case (all-zero vector) is short-circuited to q = 0 in both
    * engines rather than relying on either's x/0 semantics. */
  val x41Sql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale, v FROM e),
      |u AS (SELECT vec_id, scale, v[i] AS x, i FROM s, unnest(range(1, len(v) + 1)) AS t(i)),
      |q AS (SELECT vec_id, i, x, scale,
      |        CASE WHEN scale = 0 THEN 0 ELSE floor(x / scale + 0.5) END AS q FROM u)
      |SELECT vec_id,
      |  CAST(floor(sum(i * q)) AS BIGINT) AS checksum,
      |  CAST(floor(max(abs(x - q * scale)) * 1e6) AS BIGINT) AS max_err_units
      |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---- X55: k-NN majority-vote labeling --------------------------------

  /** Probe set = vec_id ≡ 0 (mod 23) (~4% of vectors — a labeled seed
    * set's scale), corpus = the rest; k = 10 so ties are possible and the
    * deterministic tie-break is actually exercised (this corpus has 10
    * labels, and most probes win with 2–3 of 10 votes). */
  val KnnK = 10

  def x55KnnLabel(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    graft.operators.Similarity.knnClassify(
      e.filter(col("vec_id") % 23 === 0),
      e.filter(col("vec_id") % 23 =!= 0), KnnK)
      .orderBy(col("p_id"))
  }

  /** The neighbor ranking replicates x19's integer-unit cosine CTEs; the
    * vote/tie-break stages are pure integer window logic. */
  val x55Sql: String = {
    val cosSum =
      """CAST(sum(CAST(floor(x*y * 1e9) AS BIGINT)) AS BIGINT) AS dot,
        |  CAST(sum(CAST(floor(x*x * 1e9) AS BIGINT)) AS BIGINT) AS na,
        |  CAST(sum(CAST(floor(y*y * 1e9) AS BIGINT)) AS BIGINT) AS nb""".stripMargin
    val cosR = "CAST(floor((CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * " +
      "CAST(nb AS DOUBLE))) * 1000000.0) AS DOUBLE) / 1000000.0"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT vec_id AS p_id, v AS pv FROM e WHERE vec_id % 23 = 0),
       |c AS (SELECT vec_id AS n_id, CAST(label AS BIGINT) AS n_label, v AS nv
       |      FROM e WHERE vec_id % 23 <> 0),
       |pr AS (SELECT p_id, n_id, n_label, unnest(pv) AS x, unnest(nv) AS y FROM p, c),
       |s AS (SELECT p_id, n_id, n_label, $cosSum FROM pr GROUP BY 1, 2, 3),
       |cc AS (SELECT p_id, n_id, n_label, $cosR AS cos_r FROM s),
       |r AS (SELECT p_id, n_label,
       |        row_number() OVER (PARTITION BY p_id ORDER BY cos_r DESC, n_id ASC) AS rn
       |      FROM cc),
       |v AS (SELECT p_id, n_label, count(*) AS n_votes FROM r WHERE rn <= $KnnK
       |      GROUP BY 1, 2),
       |t AS (SELECT p_id, n_label, n_votes,
       |        row_number() OVER (PARTITION BY p_id ORDER BY n_votes DESC, n_label ASC) AS vr
       |      FROM v)
       |SELECT p_id, n_label AS pred_label, n_votes FROM t WHERE vr = 1
       |ORDER BY p_id""".stripMargin
  }

  // ---- X43: winnowing fingerprints -------------------------------------

  val WinnowK = 3
  val WinnowWindow = 4

  def x43Winnow(spark: SparkSession, dir: String): DataFrame =
    Curation.winnow(docs(spark, dir), WinnowK, WinnowWindow)
      .orderBy(col("doc_id"), col("fp"))

  val x43Sql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |sh AS (SELECT doc_id, i, CAST(len(ts) - ${WinnowK - 1} AS BIGINT) AS m,
       |         ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 15))::BIGINT
       |           % 2147483647 AS h
       |       FROM tk, unnest(range(1, len(ts) - ${WinnowK - 2})) AS u(i)
       |       WHERE len(ts) >= $WinnowK),
       |w AS (SELECT doc_id, i, m,
       |        min(h) OVER (PARTITION BY doc_id ORDER BY i
       |                     ROWS BETWEEN CURRENT ROW AND ${WinnowWindow - 1} FOLLOWING) AS fp
       |      FROM sh)
       |SELECT DISTINCT doc_id, fp FROM w WHERE i <= m - ${WinnowWindow - 1}
       |ORDER BY doc_id, fp""".stripMargin

  // ---- X42: blocked fuzzy near-dup pairs (edit distance) ---------------

  val FuzzyBlockTokens = 3
  val FuzzyMaxRelDist = 0.2

  def x42FuzzyPairs(spark: SparkSession, dir: String): DataFrame =
    Curation.fuzzyPairs(docs(spark, dir), FuzzyBlockTokens, FuzzyMaxRelDist)
      .orderBy(col("a_id"), col("b_id"))

  val x42Sql: String =
    s"""WITH b AS (SELECT doc_id, text, ts[1] || ' ' || ts[2] || ' ' || ts[3] AS blk
       |           FROM (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents)
       |           WHERE len(ts) >= $FuzzyBlockTokens)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
       |FROM b a JOIN b b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |WHERE levenshtein(a.text, b.text) <=
       |      floor($FuzzyMaxRelDist * greatest(len(a.text), len(b.text)))
       |ORDER BY a_id, b_id""".stripMargin

  // ---- X45: winnow-blocked fuzzy near-dup pairs ------------------------

  /** X42's recall fix, scored: candidates = prefix blocks ∪ shared winnow
    * fingerprints, so near-dups whose corruption hits the FIRST tokens
    * (different prefix block) are still recalled via their intact runs.
    * Same thresholded-Levenshtein verification; uncapped x45 ⊇ x42 by
    * construction, asserted in CurationSpec with a head-corrupted
    * fixture.
    *
    * Scored WITH the hot-key df cap (the production form): on this
    * deliberately self-similar corpus, near-dup clusters share most of
    * their fingerprints, so uncapped candidate generation is ~Σ df² ≈
    * quadratic in cluster sizes (336k candidates at sf0.1, 18× the
    * capped count) and the per-candidate Levenshtein — ~1.5 ms each, the
    * most expensive verify in the engine — dominates. The cap bounds
    * candidates by df·|keys| while a true pair is lost only if EVERY
    * shared key is hot; measured on this corpus the cap is lossless
    * (sf0.1: 256/256 true pairs, identical at sf0.01) because fuzzy dups
    * share many keys and corruption zones produce low-df fingerprints.
    * The oracle replicates the cap, keeping the hash gate exact. */
  val FuzzyMaxKeyDf = 4L

  def x45FuzzyWinnowed(spark: SparkSession, dir: String): DataFrame =
    Curation.fuzzyPairsWinnowed(docs(spark, dir), FuzzyBlockTokens, FuzzyMaxRelDist,
      WinnowK, WinnowWindow, maxKeyDf = Some(FuzzyMaxKeyDf))
      .orderBy(col("a_id"), col("b_id"))

  val x45Sql: String =
    s"""WITH tk AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
       |bk AS (SELECT doc_id, 'b:' || ts[1] || ' ' || ts[2] || ' ' || ts[3] AS key
       |       FROM tk WHERE len(ts) >= $FuzzyBlockTokens),
       |sh AS (SELECT doc_id, i, CAST(len(ts) - ${WinnowK - 1} AS BIGINT) AS m,
       |         ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 15))::BIGINT
       |           % 2147483647 AS h
       |       FROM tk, unnest(range(1, len(ts) - ${WinnowK - 2})) AS u(i)
       |       WHERE len(ts) >= $WinnowK),
       |w AS (SELECT doc_id, i, m,
       |        min(h) OVER (PARTITION BY doc_id ORDER BY i
       |                     ROWS BETWEEN CURRENT ROW AND ${WinnowWindow - 1} FOLLOWING) AS fp
       |      FROM sh),
       |wk AS (SELECT DISTINCT doc_id, 'w:' || CAST(fp AS VARCHAR) AS key
       |       FROM w WHERE i <= m - ${WinnowWindow - 1}),
       |keys AS (SELECT * FROM bk UNION ALL SELECT * FROM wk),
       |kdf AS (SELECT key, count(*) AS df FROM keys GROUP BY key),
       |cold AS (SELECT k.doc_id, k.key FROM keys k JOIN kdf USING (key)
       |         WHERE df <= $FuzzyMaxKeyDf),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM cold a JOIN cold b ON a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id, CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist
       |FROM cand JOIN documents ta ON ta.doc_id = a_id
       |          JOIN documents tb ON tb.doc_id = b_id
       |WHERE levenshtein(ta.text, tb.text) <=
       |      floor($FuzzyMaxRelDist * greatest(len(ta.text), len(tb.text)))
       |ORDER BY a_id, b_id""".stripMargin

  // ---- X57: feature resize (adaptive average-pool) ---------------------

  /** 64-dim embeddings pooled to 12 buckets — 12 ∤ 64, so the adaptive
    * bounds produce mixed 5/6-element buckets and the uneven-boundary
    * arithmetic is actually exercised. Scored via the integer-unit
    * sibling (resizePoolUnits) for the same reason x41 scores a
    * checksum: the float path's per-slice fold order is not something a
    * SQL oracle can promise to reproduce bit-for-bit. */
  val ResizeLen = 12

  def x57ResizePool(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.BinaryMedia.resizePoolUnits(
        embs(spark, dir).select(col("vec_id"), col("embedding"))
          .filter(size(col("embedding")) > 0),
        "embedding", ResizeLen)
      .select(col("vec_id"),
        expr("""aggregate(zip_with(resized_units, sequence(1, size(resized_units)),
               |(u, i) -> u * cast(i as bigint)), cast(0 as bigint),
               |(a, x) -> a + x)""".stripMargin).as("checksum"))
      .orderBy(col("vec_id"))

  /** DuckDB list slices are 1-based and end-inclusive, so 0-based bucket
    * [s, e) becomes uv[s+1 : e]. `//` floors, but every operand here is
    * non-negative; the one signed division (unit_sum / len) uses explicit
    * floor() in BOTH engines so negative sums round identically. */
  val x57Sql: String = {
    val m = ResizeLen
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |u AS (SELECT vec_id, list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS uv,
       |             len(v) AS n FROM e),
       |b AS (SELECT vec_id, n, uv, unnest(range(0, $m)) AS i FROM u WHERE n > 0),
       |p AS (SELECT vec_id, i,
       |        CAST(floor(CAST(list_sum(uv[(i*n//$m)+1 : ((i+1)*n+${m - 1})//$m]) AS DOUBLE)
       |             / (((i+1)*n+${m - 1})//$m - i*n//$m)) AS BIGINT) AS pu
       |      FROM b)
       |SELECT vec_id, CAST(sum((i+1) * pu) AS BIGINT) AS checksum
       |FROM p GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  // ---- X58: overlapping sliding-window chunking ------------------------

  /** 32-token chunks at stride 24 (8-token overlap): this corpus's docs
    * average ~54 tokens, so most docs emit exactly 2 overlapping chunks
    * and the short-tail / single-chunk / exact-boundary branches all
    * occur. The fp column is the chunk-level dedup/retrieval handle. */
  val ChunkTok = 32
  val ChunkStride = 24

  def x58OverlapChunks(spark: SparkSession, dir: String): DataFrame =
    Curation.overlapChunks(docs(spark, dir), ChunkTok, ChunkStride)
      .orderBy(col("doc_id"), col("chunk_idx"))

  val x58Sql: String = {
    val fp = graft.functions.TextFns.h31Sql(
      s"array_to_string(ts[i*$ChunkStride+1 : least(n, i*$ChunkStride+$ChunkTok)], ' ')")
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts,
       |                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
       |c AS (SELECT doc_id, ts, n,
       |        unnest(range(0, (greatest(n - $ChunkTok, 0) + ${ChunkStride - 1})//$ChunkStride + 1)) AS i
       |      FROM tk WHERE n > 0)
       |SELECT doc_id, i AS chunk_idx, least($ChunkTok, n - i*$ChunkStride) AS n_in_chunk,
       |  $fp AS fp
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // ---- X59: Bloom-filter decontamination gate --------------------------

  /** Same probe split as x38 (doc_id ≡ 0 mod 97 = the "benchmark suite").
    * Scored q36-style on the sketch's one-sided CONTRACT: every true
    * probe-text match must be flagged (no false negatives — exact by
    * construction), and false positives stay under 5× the nominal-fpp
    * expectation (the filter is sized for 10k keys but holds only the
    * probe set, so its live fp rate is far below nominal; the slack means
    * the gate catches a broken hash or saturated bitmap, not rate noise). */
  val BloomExpected = 10000L
  val BloomFpp = 0.03

  def x59BloomDecon(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val probes = d.filter(col("doc_id") % 97 === 0)
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    val flagged = Curation.bloomDecontaminate(corpus, probes, "text",
      BloomExpected, BloomFpp)
    val truth = probes.select(col("text")).distinct().withColumn("is_probe", lit(true))
    flagged.join(truth, Seq("text"), "left")
      .agg(
        count(lit(1)).as("n_corpus"),
        sum(when(col("is_probe"), 1L).otherwise(0L)).as("n_true_hits"),
        sum(when(col("is_probe") && col("bloom_hit"), 1L).otherwise(0L)).as("n_true_flagged"),
        sum(when(col("bloom_hit") && col("is_probe").isNull, 1L).otherwise(0L)).as("n_fp"))
      .select(col("n_corpus"), col("n_true_hits"),
        (col("n_true_flagged") === col("n_true_hits")).as("no_false_neg"),
        (col("n_fp") <= greatest(lit(10.0), lit(5 * BloomFpp) * col("n_corpus")))
          .as("fp_bounded"))
  }

  val x59Sql: String =
    """WITH c AS (SELECT text FROM documents WHERE doc_id % 97 <> 0),
      |p AS (SELECT DISTINCT text FROM documents WHERE doc_id % 97 = 0)
      |SELECT (SELECT count(*) FROM c) AS n_corpus,
      |  (SELECT count(*) FROM c JOIN p USING (text)) AS n_true_hits,
      |  true AS no_false_neg, true AS fp_bounded""".stripMargin

  // ---- X60: number scrubbing (PII-class masking) -----------------------

  /** Scored on events.props (the one table whose strings actually carry
    * digits — documents is digit-free): mask digit runs, count them, and
    * fingerprint the normalized string. The fp column is what a post-scrub
    * dedup would key on: events differing only in their numeric payload
    * collapse to the same fingerprint. */
  def x60ScrubNumbers(spark: SparkSession, dir: String): DataFrame =
    Curation.scrubNumbers(
        t(spark, dir, "events").select(col("event_id"), col("props")), "props")
      .select(col("event_id"), col("masked"), col("n_masked"),
        graft.functions.TextFns.h31(col("masked")).as("fp"))
      .orderBy(col("event_id"))

  val x60Sql: String = {
    val fp = graft.functions.TextFns.h31Sql("regexp_replace(props, '[0-9]+', '<num>', 'g')")
    s"""SELECT event_id, regexp_replace(props, '[0-9]+', '<num>', 'g') AS masked,
       |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_masked,
       |  $fp AS fp
       |FROM events ORDER BY event_id""".stripMargin
  }

  // ---- Q36: approx-percentile sketch gate ------------------------------

  /** Scores the quantile SKETCH (Spark's Greenwald-Khanna
    * approx_percentile) the way q11 scores HLL: the hashed output is a
    * boolean gate, not the float itself. The gate checks the sketch's
    * actual CONTRACT — rank error: the returned element's rank must sit
    * within n/1000 + 2 of the n/2 target (10× the accuracy-10000
    * guarantee of n/10000). A value-distance gate would be SF-dependent:
    * on small groups the exact interpolated median falls in a gap between
    * elements wider than any fixed tolerance. */
  def q36ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice").cast("double").as("v"))
    val ap = o.groupBy(col("o_orderpriority"))
      .agg(expr("approx_percentile(v, 0.5, 10000)").as("ap"))
    o.join(broadcast(ap), "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(sum(when(col("v") <= col("ap"), 1L).otherwise(0L)).as("n_le"),
           count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        (abs(col("n_le") - col("n") / lit(2.0)) <= col("n") * lit(0.001) + lit(2.0))
          .as("within_rank"))
      .orderBy(col("o_orderpriority"))
  }

  val q36Sql: String =
    """SELECT o_orderpriority, true AS within_rank
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // ---- X65: multimodal frame sampling ----------------------------------

  /** Fixed-stride frame extraction from binary payloads
    * ([[graft.multimodal.BinaryMedia.frameSample]]) scored end-to-end:
    * payload → ≤[[FrameMax]] frames of [[FrameBytes]] bytes → per-frame
    * md5 + length. Pure column ops (transform/substring over binary), so
    * at 100 TB the sampling is embarrassingly parallel with zero shuffle —
    * the only exchange is the final presentation sort, which real
    * pipelines drop. The corpus text is ASCII (asserted by the hash match
    * itself: octet == char positions), letting DuckDB replicate byte
    * slices with substr on VARCHAR. */
  val FrameBytes = 64
  val FrameMax   = 8

  def x65FrameSample(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.BinaryMedia.frameSample(
        docs(spark, dir).select(col("doc_id"),
          col("text").cast(org.apache.spark.sql.types.BinaryType).as("payload")),
        FrameBytes, FrameMax)
      .select(col("doc_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame")).as("frame_md5"),
        octet_length(col("frame")).cast("long").as("n_bytes"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val x65Sql: String = {
    val f = FrameBytes
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) > 0),
       |fr AS (SELECT doc_id, text, n,
       |         unnest(range(0, least((n + ${f - 1})//$f, $FrameMax))) AS i
       |       FROM d)
       |SELECT doc_id, i AS frame_idx,
       |  md5(substr(text, CAST(i*$f+1 AS BIGINT), $f)) AS frame_md5,
       |  CAST(least($f, n - i*$f) AS BIGINT) AS n_bytes
       |FROM fr ORDER BY doc_id, frame_idx""".stripMargin
  }

  // ---- X67: multi-resolution decontamination span ladder ---------------

  /** x38 answers WHO is contaminated; this answers HOW BADLY — the longest
    * shared-span level per contaminated doc, separating incidental phrase
    * overlap (span 3) from verbatim benchmark inclusion (span 8/16).
    * Monotone pruning: levels above the first scan only the previous
    * level's matches, never the corpus ([[Curation.deconSpanLadder]]). */
  val DeconLevels = Seq(3, 8, 16)

  def x67DeconSpan(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Curation.deconSpanLadder(
      d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0), DeconLevels)
      .orderBy(col("doc_id"))
  }

  val x67Sql: String = {
    val tk = "SELECT doc_id, string_split(text, ' ') AS ts FROM documents"
    def lvl(n: Int): String =
      s"""SELECT DISTINCT c.doc_id, CAST($n AS BIGINT) AS span FROM
         |  (SELECT DISTINCT doc_id, array_to_string(ts[i : i+${n - 1}], ' ') AS s
         |   FROM tk, unnest(range(1, len(ts) - ${n - 2})) AS u(i)
         |   WHERE len(ts) >= $n AND doc_id % 97 <> 0) c
         |  JOIN (SELECT DISTINCT array_to_string(ts[i : i+${n - 1}], ' ') AS s
         |        FROM tk, unnest(range(1, len(ts) - ${n - 2})) AS u(i)
         |        WHERE len(ts) >= $n AND doc_id % 97 = 0) p USING (s)""".stripMargin
    s"""WITH tk AS ($tk)
       |SELECT doc_id, max(span) AS span_max FROM (
       |${DeconLevels.map(lvl).mkString("", "\nUNION ALL\n", "")}
       |) GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- X85: decontamination EXCISION (positional removal applied) -------

  val DeconExciseK = 8

  /** The x67 report turned into the ACTION: every token covered by an
    * 8-gram shared with the probe set is excised and the doc rebuilt
    * ([[graft.operators.Curation.deconExcise]]); same probe split as
    * x38/x67 (doc_id ≡ 0 mod 97 = the benchmark suite). The oracle
    * rebuilds each doc positionally and hashes the reconstruction. */
  def x85DeconExcise(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    graft.operators.Curation.deconExcise(
      d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0), DeconExciseK)
      .orderBy(col("doc_id"))
  }

  val x85Sql: String = {
    val k = DeconExciseK
    val fp = graft.functions.TextFns.h31Sql(
      "coalesce(array_to_string(list_transform(kept, i -> ts[i + 1]), ' '), '')")
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |cs AS (SELECT doc_id, i, array_to_string(ts[i + 1 : i + $k], ' ') AS s
       |       FROM tk, unnest(range(0, len(ts) - ${k - 1})) AS u(i)
       |       WHERE len(ts) >= $k AND doc_id % 97 <> 0),
       |ps AS (SELECT DISTINCT array_to_string(ts[i + 1 : i + $k], ' ') AS s
       |       FROM tk, unnest(range(0, len(ts) - ${k - 1})) AS u(i)
       |       WHERE len(ts) >= $k AND doc_id % 97 = 0),
       |mt AS (SELECT DISTINCT cs.doc_id, p
       |       FROM cs JOIN ps USING (s), unnest(range(i, i + $k)) AS v(p)),
       |cov AS (SELECT doc_id, list_sort(list(p)) AS cov FROM mt GROUP BY doc_id),
       |base AS (SELECT tk.doc_id, ts, coalesce(cov, []) AS cov
       |         FROM tk LEFT JOIN cov USING (doc_id) WHERE tk.doc_id % 97 <> 0),
       |kk AS (SELECT doc_id, ts,
       |         list_filter(range(0, len(ts)), i -> NOT list_contains(cov, i)) AS kept
       |       FROM base)
       |SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_tokens_kept,
       |  CAST(len(ts) - len(kept) AS BIGINT) AS n_tokens_removed,
       |  $fp AS cleaned_fp
       |FROM kk ORDER BY doc_id""".stripMargin
  }

  // ---- X97: multi-class PII redaction ----------------------------------

  /** Ordered multi-class PII redaction ([[Curation.redactPii]]) scored on
    * a PII-bearing corpus derived deterministically from `documents` (the
    * driver corpus is digit-free word soup, so the fixture plants each
    * class by doc_id residue — an email on 1/3 of docs, a dashed phone on
    * 1/5, a 32-hex key on 1/7, an IPv4 on every doc — and both engines
    * derive the identical string in-query). The gate scores the
    * ordered-rules contract end-to-end: per-class hit counts, the masked
    * length, and the fingerprint of the fully-masked text. Redaction is a
    * pure stateless projection (zero shuffles; the one exchange below is
    * the presentation sort), so the 100 TB form is scan-fused. */
  def x97PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val pii = d.select(col("doc_id"), concat(
      when(col("doc_id") % 3 === 0,
        concat(lit("contact "), col("lang"), col("doc_id").cast("string"),
          lit("@"), col("source"), lit(".org "))).otherwise(lit("")),
      lit("ip 10."), (col("doc_id") % 256).cast("string"), lit("."),
      ((col("doc_id") * 7) % 256).cast("string"), lit(".1 "),
      when(col("doc_id") % 5 === 0,
        concat(lit("call +1-415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" ")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit("key "), md5(col("doc_id").cast("string").cast("binary")),
          lit(" "))).otherwise(lit("")),
      col("text")).as("ptext"))
    Curation.redactPii(pii, "ptext")
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_phone"),
        col("n_hexkey"), length(col("masked")).cast("long").as("n_chars_masked"),
        graft.functions.TextFns.h31(col("masked")).as("fp"))
      .orderBy(col("doc_id"))
  }

  val x97Sql: String = {
    val Seq((_, rxE, tE), (_, rxI, tI), (_, rxP, tP), (_, rxK, tK)) =
      Curation.PiiPatterns
    s"""WITH p AS (SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN 'contact ' || lang || doc_id || '@' || source || '.org '
       |      ELSE '' END
       |    || 'ip 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.1 '
       |    || CASE WHEN doc_id % 5 = 0
       |      THEN 'call +1-415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' '
       |      ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0 THEN 'key ' || md5(doc_id::VARCHAR) || ' '
       |      ELSE '' END
       |    || text AS t FROM documents),
       |m1 AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(t, '$rxE')) AS BIGINT) AS n_email,
       |    regexp_replace(t, '$rxE', '$tE', 'g') AS t FROM p),
       |m2 AS (SELECT doc_id, n_email,
       |    CAST(len(regexp_extract_all(t, '$rxI')) AS BIGINT) AS n_ipv4,
       |    regexp_replace(t, '$rxI', '$tI', 'g') AS t FROM m1),
       |m3 AS (SELECT doc_id, n_email, n_ipv4,
       |    CAST(len(regexp_extract_all(t, '$rxP')) AS BIGINT) AS n_phone,
       |    regexp_replace(t, '$rxP', '$tP', 'g') AS t FROM m2),
       |m4 AS (SELECT doc_id, n_email, n_ipv4, n_phone,
       |    CAST(len(regexp_extract_all(t, '$rxK')) AS BIGINT) AS n_hexkey,
       |    regexp_replace(t, '$rxK', '$tK', 'g') AS t FROM m3)
       |SELECT doc_id, n_email, n_ipv4, n_phone, n_hexkey,
       |  CAST(len(t) AS BIGINT) AS n_chars_masked,
       |  ${graft.functions.TextFns.h31Sql("t")} AS fp
       |FROM m4 ORDER BY doc_id""".stripMargin
  }
}
