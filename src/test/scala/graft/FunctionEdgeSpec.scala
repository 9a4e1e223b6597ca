package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Aggregators, TextFns}

/** Edge laws for the custom function surface: NaN-safe associativity of
  * the argmax aggregator, overflow-free fingerprints on pathologically
  * long documents, and analysis-time rejection (never a raw throw) for
  * wrong types and wrong arities.
  */
class FunctionEdgeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("MaxByKey merge is associative with NaN values (total order, NaN greatest)") {
    val a = (Double.NaN, 5L); val b = (7.0, 9L); val c = (3.0, 1L)
    val m = Aggregators.MaxByKey
    assert(m.merge(m.merge(a, b), c) == m.merge(a, m.merge(b, c)),
      "IEEE > comparisons would make the winner depend on merge order")
    // NaN sorts greatest (how Spark and DuckDB both order doubles), so the
    // NaN row's key wins regardless of partitioning
    val maxBy = udaf(Aggregators.MaxByKey)
    def run(parts: Int): Long =
      Seq((1L, Double.NaN, 5L), (1L, 7.0, 9L), (1L, 3.0, 1L))
        .toDF("g", "v", "k").repartition(parts)
        .groupBy($"g").agg(maxBy($"v", $"k").as("best"))
        .collect()(0).getAs[Long]("best")
    assert(run(1) == 5L && run(3) == 5L,
      "the NaN row must win deterministically under any partitioning")
  }

  test("fingerprint stays exact on a 200k-token document (per-step modulus)") {
    // a raw running sum of i*h31 would wrap Long around ~90k tokens;
    // mod-at-every-step keeps the accumulator < 2^31 at any length
    val n = 200000
    val toks = Array.tabulate(n)(i => s"tok${i % 997}")
    val got = Seq(toks.mkString(" ")).toDF("text")
      .withColumn("toks", TextFns.tokens($"text"))
      .select(TextFns.fingerprintExpr("toks").as("fp"))
      .collect()(0).getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h31(tok: String): Long = {
      md.reset()
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % TextFns.P31
    }
    val cache = toks.distinct.map(t => t -> h31(t)).toMap
    val want = (toks.iterator.zipWithIndex
      .map { case (t, i) => BigInt(i + 1) * cache(t) }
      .sum % TextFns.P31).toLong
    assert(got == want, "Spark's fold must equal the exact BigInt sum mod p")
    assert(got >= 0 && got < TextFns.P31)
  }

  test("cosine_units rejects wrong element types at ANALYSIS, not codegen") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_units(array(1, 2), array(1.0D, 2.0D)) AS c").collect()
    }
    assert(e.getMessage.contains("array<float|double>"))
  }

  test("wrong arity is an analysis error for both imperative registrations") {
    graft.functions.CosineUnits.register(spark)
    graft.functions.NGramsGen.register(spark)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_units(array(1.0D)) AS c").collect()
    }
    assert(e1.getMessage.contains("cosine_units"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT * FROM (SELECT array('a','b') AS ts) " +
          "LATERAL VIEW ngrams_gen(ts) g AS pos, gram").collect()
    }
    assert(e2.getMessage.contains("ngrams_gen"))
  }

  test("wrong arity is an analysis error through the extension builders too") {
    // checksum_agg's two registration paths must raise the same analysis
    // error: suites share one session and registration is last-wins, so a
    // silently-lenient imperative builder (exprs(0) ignoring extra args)
    // made this flake on suite order until both were arity-checked
    // identically. The extension path is pinned on a FRESH session (its
    // registry holds only the GraftExtensions builder — no imperative
    // replacement can have happened there); the imperative path is then
    // forced explicitly on the shared one.
    val s2 = spark.newSession()
    val e0 = intercept[org.apache.spark.sql.AnalysisException] {
      s2.sql("SELECT checksum_agg('a', 'b') AS c").collect()
    }
    assert(e0.getMessage.contains("checksum_agg"))
    graft.functions.ChecksumAgg.register(spark) // force the imperative path
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT checksum_agg('a', 'b') AS c").collect()
    }
    assert(e.getMessage.contains("checksum_agg"))
  }

  test("MisraGries: candidate superset guarantee, undercount bound, partition independence") {
    import spark.implicits._
    val mg = new Aggregators.MisraGries(8)
    // skewed synthetic stream: token "h" 40%, "g" 20%, tail of 50 rares
    val rows = (Seq.fill(400)("h") ++ Seq.fill(200)("g") ++
      (0 until 400).map(i => s"r${i % 50}"))
    val n = rows.size.toLong
    // arbitrary partitioning must not break the guarantee
    for (parts <- Seq(1, 4, 13)) {
      val sk = spark.createDataset(rows).repartition(parts)
        .select(mg.toColumn).head()
      assert(sk.size <= 8)
      // superset: every item above n/(k+1) is present
      val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      truth.filter(_._2 > n / 9).keys.foreach(t =>
        assert(sk.contains(t), s"parts=$parts lost heavy hitter $t"))
      // undercount bound: recorded <= true, and true - recorded <= n/(k+1)
      sk.foreach { case (t, c) =>
        val tr = truth.getOrElse(t, 0L)
        assert(c <= tr, s"parts=$parts overcounted $t: $c > $tr")
        assert(tr - c <= n / 9 + 1, s"parts=$parts undercount bound broken for $t")
      }
    }
    // sequential reduce-only sanity (single partition, no merge)
    val seqSk = rows.foldLeft(mg.zero)(mg.reduce)
    assert(seqSk.contains("h") && seqSk.contains("g"))
  }
}
