package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  lazy val embs = Tables.t(spark, sf, "embeddings")

  test("cosine is bounded and self-similarity is ~1") {
    val self = embs.limit(20)
      .withColumn("c", Similarity.cosineR("embedding", "embedding"))
      .collect().map(_.getAs[Double]("c"))
    self.foreach(c => assert(c > 0.999999 - 1e-9 && c <= 1.0))
  }

  test("brute-force top-k: k neighbors per probe, ranked descending, no self") {
    val out = Similarity.bruteForceTopK(embs.filter(col("vec_id") < 5), embs, 5).collect()
    val byProbe = out.groupBy(_.getAs[Long]("p_id"))
    assert(byProbe.size == 5)
    byProbe.foreach { case (p, g) =>
      assert(g.length == 5)
      assert(!g.exists(_.getAs[Long]("n_id") == p))
      val cos = g.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos_r"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("SRP buckets: every vector gets a bucket in [0, 16); ANN neighbor shares the bucket") {
    val bucketed = embs.select(col("vec_id"),
      Similarity.bucketCol("embedding").as("bucket")).collect()
    assert(bucketed.forall { r => val b = r.getAs[Long]("bucket"); b >= 0 && b < 16 })
    val buckets = bucketed.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val ann = Similarity.srpNearestNeighbor(embs).collect()
    ann.foreach { r =>
      assert(buckets(r.getAs[Long]("vec_id")) == r.getAs[Long]("bucket"))
      assert(buckets(r.getAs[Long]("n_id")) == r.getAs[Long]("bucket"))
    }
  }
}
