package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashSketch
import graft.ops.DedupOps

class MinHashSketchSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator sketch equals the DataFrame minhash signatures") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val viaAgg = DedupOps.shingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .groupBy("doc_id")
      .agg(udaf(new MinHashSketch(16)).apply(col("s")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaDf = DedupOps.minhashSignatures(docs, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg.keySet == viaDf.keySet)
    viaAgg.foreach { case (id, sig) =>
      assert(sig == viaDf(id), s"signature mismatch for doc $id")
    }
  }

  test("sketch merge is order-insensitive (partial aggregation safe)") {
    val m = new MinHashSketch(8)
    val shingles = Seq("a b c", "b c d", "c d e", "x y z")
    val seq1 = shingles.foldLeft(m.zero)(m.reduce)
    val (l, r) = shingles.splitAt(2)
    val seq2 = m.merge(l.foldLeft(m.zero)(m.reduce), r.reverse.foldLeft(m.zero)(m.reduce))
    assert(seq1.toSeq == seq2.toSeq)
  }
}
