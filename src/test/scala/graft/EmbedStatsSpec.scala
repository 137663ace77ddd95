package graft

import org.apache.spark.sql.Row

import graft.ops.EmbedStatsOps

/** Hand-computed power-iteration fixtures for q218: known dominant
  * direction, sign handling through the truncating basis-point divide,
  * and the rounds guard.
  */
class EmbedStatsSpec extends SparkSpec {
  import spark.implicits._

  test("single vector: loadings are exact basis points of the vector direction") {
    // v = (2, 1): Gram = [[4e6, 2e6], [2e6, 1e6]] (milli-unit squares);
    // every power round keeps the (2, 1) direction -> [10000, 5000]
    val emb = Seq((1L, Seq(2.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = EmbedStatsOps.pcaPowerLoadings(emb).collect()
    assert(out.toSeq === Seq(Row(0, 10000L), Row(1, 5000L)))
  }

  test("negative components keep sign; divide truncates toward zero in both engines") {
    // v = (3, -1): direction (3, -1) -> 10000 and -(1e4/3 truncated) = -3333
    val emb = Seq((1L, Seq(3.0f, -1.0f))).toDF("vec_id", "embedding")
    val out = EmbedStatsOps.pcaPowerLoadings(emb).collect()
    assert(out.toSeq === Seq(Row(0, 10000L), Row(1, -3333L)))
  }

  test("dominant direction wins over a weaker orthogonal one") {
    // three vectors on axis 0, one on axis 1: top eigenvector is axis 0
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = EmbedStatsOps.pcaPowerLoadings(emb).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(0) === 10000L)
    // axis 1 is orthogonal to axis 0 and weaker: its un-normalized
    // component is 1e6^3 vs 3e6 * (3e6)^2 -> 10000/27 truncated
    assert(out(1) === 370L)
  }

  test("label centroid distance: 3-4-5 triangle and averaged centroids, exactly") {
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(3.0f, 4.0f), 1),
      // label 2: centroid of (1,0) and (3,0) is (2,0) -> dist 2 to label 0
      (3L, Seq(1.0f, 0.0f), 2), (4L, Seq(3.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = EmbedStatsOps.labelCentroidDists(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out((0, 1)) === ((1L, 1L, 5.0)))
    assert(out((0, 2)) === ((1L, 2L, 2.0)))
    // label 1 (3,4) vs label 2 centroid (2,0): sqrt(1 + 16)
    assert(out((1, 2)) === ((1L, 2L, math.sqrt(17.0))))
  }

  test("centroid assignment: nearest wins, ties break by label, drift is exact") {
    // old (vec_id % 5 != 0): label 0 centroid (0,0), label 1 at (4,0).
    // deltas (vec_id % 5 == 0): (1,0)->label 0, (3,0)->label 1, and
    // (2,0) EQUIDISTANT -> label tiebreak -> label 0.
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(4.0f, 0.0f), 1),
      (5L, Seq(1.0f, 0.0f), 9), (10L, Seq(3.0f, 0.0f), 9),
      (15L, Seq(2.0f, 0.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = EmbedStatsOps.centroidAssignDrift(emb).collect()
    // label 0 absorbs (1,0),(2,0): centroid 0 -> 1.0, drift 1.0;
    // label 1 absorbs (3,0): 4 -> 3.5, drift 0.5
    assert(out.toSeq === Seq(
      Row(0, 1L, 2L, 1.0), Row(1, 1L, 1L, 0.5)))
  }

  test("a cell absorbing nothing reports zero drift") {
    val emb = Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(9.0f), 1), (5L, Seq(1.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = EmbedStatsOps.centroidAssignDrift(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0) === ((1L, 0.5)))
    assert(out(1) === ((0L, 0.0)))
  }

  test("label cohesion: exact mean squared distance to own centroid") {
    val emb = Seq(
      // label 0: (0,0) and (2,0) -> centroid (1,0), msd = (1+1)/2 = 1
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(2.0f, 0.0f), 0),
      // label 1: singleton -> msd 0
      (3L, Seq(5.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = EmbedStatsOps.labelCohesion(emb).collect()
    assert(out.toSeq === Seq(Row(0, 2L, 1.0), Row(1, 1L, 0.0)))
  }

  test("rounds outside decimal38 headroom are rejected") {
    val emb = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      EmbedStatsOps.pcaPowerLoadings(emb, rounds = 4)
    }
  }

  test("q297 Lloyd: planted point-mass clusters converge in one round " +
    "with zero inertia") {
    val emb = (
      // group A: exact copies of seed 0 at (1, 0)
      Seq((0L, Seq(1.0f, 0.0f)), (10L, Seq(1.0f, 0.0f)),
        (11L, Seq(1.0f, 0.0f)), (12L, Seq(1.0f, 0.0f)),
        // group B: exact copies of seed 1 at (0, 1)
        (1L, Seq(0.0f, 1.0f)), (20L, Seq(0.0f, 1.0f)),
        (21L, Seq(0.0f, 1.0f))) ++
      // seeds 2..7: far-away singletons, each its own cluster
      (2L to 7L).map(i => (i, Seq(10.0f + i, -10.0f - i)))
    ).toDF("vec_id", "embedding")
    val out = EmbedStatsOps.kmeansLloyd(emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == (0L to 7L).toSet)
    assert(out(0L) === ((4L, 0L, 0.0)))
    assert(out(1L) === ((3L, 0L, 0.0)))
    (2L to 7L).foreach(c => assert(out(c) === ((1L, 0L, 0.0))))
  }

  test("q297 Lloyd is repartition-invariant (rational centroids)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = EmbedStatsOps.kmeansLloyd(emb).collect().toSeq
    val b = EmbedStatsOps.kmeansLloyd(emb.repartition(7)).collect().toSeq
    assert(a == b, "Lloyd output must not depend on partitioning")
  }

  /** Two blobs plus an outlier, all low vec_ids inside blob A — the
    * geometry where naive `vec_id < k` seeding fails (every seed lands
    * in A, so B and the outlier get lumped) and D² seeding wins (seed 0
    * in A, then the outlier, then a B member — maximin spreads by
    * construction).
    */
  private def twoBlobsPlusOutlier = (
    (0L to 7L).map(i => (i, Seq(0.001f * i, 0.0f, 0.0f, 0.0f))) ++
      (8L to 15L).map(i =>
        (i, Seq(10.0f + 0.001f * i, 10.0f, 10.0f, 10.0f))) ++
      Seq((16L, Seq(30.0f, 30.0f, 30.0f, 30.0f)))
  ).toDF("vec_id", "embedding")

  test("q299 D2 seeding: inertia <= naive seeding on two blobs + outlier") {
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.collect().map(_.getDouble(3)).sum
    val pp = total(EmbedStatsOps.kmeansPlusPlus(twoBlobsPlusOutlier, k = 3))
    val naive = total(EmbedStatsOps.kmeansLloyd(twoBlobsPlusOutlier, k = 3))
    assert(pp <= naive,
      s"D2-seeded inertia $pp must not exceed naive-seeded $naive")
    // on this planted geometry the win is strict: pp separates A/B/outlier
    // (near-zero intra-blob jitter), naive lumps B with the outlier
    assert(pp < naive * 0.5,
      s"expected a decisive win on the planted geometry: $pp vs $naive")
  }

  test("q299 D2 seeds pick the spread: blob A, outlier, blob B") {
    // k=3 on the planted fixture: every D2-seeded cluster is pure —
    // member counts (8, 8, 1) — while naive seeding cannot produce that
    // split (its three clusters partition blob A's neighborhood)
    val out = EmbedStatsOps.kmeansPlusPlus(twoBlobsPlusOutlier, k = 3)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(out == Seq(1L, 8L, 8L),
      s"expected pure clusters (1, 8, 8), got $out")
  }

  test("q299 is repartition-invariant (integer seeding + rational Lloyd)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = EmbedStatsOps.kmeansPlusPlus(emb).collect().toSeq
    val b = EmbedStatsOps.kmeansPlusPlus(emb.repartition(7)).collect().toSeq
    assert(a == b, "D2-seeded output must not depend on partitioning")
  }

  test("q306 k-means|| seeding: inertia <= q299 with bounded rounds on the fixture") {
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.collect().map(_.getDouble(3)).sum
    // 2 rounds x l=2 gives <= 5 candidates — far fewer scans than
    // q299's k-1 — and must still find the spread seeds here
    val par = total(EmbedStatsOps.kmeansParallel(
      twoBlobsPlusOutlier, k = 3, l = 2, rounds = 2))
    val pp = total(EmbedStatsOps.kmeansPlusPlus(twoBlobsPlusOutlier, k = 3))
    assert(par <= pp,
      s"oversampled seeding $par must not exceed sequential D2 $pp")
    // and the clusters come out pure, like q299's
    val counts = EmbedStatsOps.kmeansParallel(
        twoBlobsPlusOutlier, k = 3, l = 2, rounds = 2)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(counts == Seq(1L, 8L, 8L),
      s"expected pure clusters (1, 8, 8), got $counts")
  }

  test("q306 is repartition-invariant (integer oversampling + rational Lloyd)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = EmbedStatsOps.kmeansParallel(emb).collect().toSeq
    val b = EmbedStatsOps.kmeansParallel(emb.repartition(7)).collect().toSeq
    assert(a == b, "oversampled seeding must not depend on partitioning")
  }
}
