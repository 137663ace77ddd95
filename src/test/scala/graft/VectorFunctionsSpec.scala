package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.SimilarityOps

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val v = SimilarityOps.vectors(spark, sf).limit(100)
    .select(col("vec_id"), col("v"))

  test("native cosine is bit-identical to the higher-order-function fold") {
    val pairs = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
      .limit(500)
    val diffs = pairs
      .select(SimilarityOps.cosineHof("x", "y").as("hof"),
        VectorFunctions.cosineSim(col("x"), col("y")).as("native"))
      .where(col("hof") =!= col("native"))
      .count()
    assert(diffs == 0, "native and HOF cosine must agree exactly")
  }

  test("native cosine participates in whole-stage codegen") {
    val df = v.select(VectorFunctions.cosineSim(col("v"), col("v")).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"expected codegen in:\n$plan")
    // and the expression must not be a fallback: explain(codegen) compiles it
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("CosineSimilarity.compute") || gen.contains("cosinesimilarity"),
      s"expected generated call into compute():\n${gen.take(2000)}")
  }

  test("null and zero-norm semantics") {
    val df = Seq(
      (Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0))),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))), // zero norm -> 0.0
      (None, Some(Seq(1.0, 2.0)))                 // null -> null
    ).toDF("x", "y")
    val out = df.select(VectorFunctions.cosineSim(col("x"), col("y")).as("s"))
      .collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).isNullAt(0))
  }

  test("SQL registration exposes cosine_sim in query text") {
    VectorFunctions.register(spark)
    v.createOrReplaceTempView("vecs_test")
    val r = spark.sql(
      "SELECT MIN(cosine_sim(v, v)) AS s FROM vecs_test").first().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("damerau-levenshtein: true-DL cases match DuckDB's built-in semantics") {
    import graft.functions.StringFunctions
    val cases = Seq(
      ("CA", "ABC", 2),      // TRUE DL, not OSA (OSA would say 3)
      ("teh", "the", 1),     // the fat-finger swap
      ("ab", "ba", 1),
      ("abcd", "acbd", 1),
      ("kitten", "sitting", 3),
      ("", "abc", 3),
      ("abc", "", 3),
      ("same", "same", 0))
    val df = cases.toDF("a", "b", "want")
      .select(col("want"),
        StringFunctions.damerauLevenshtein(col("a"), col("b")).as("got"))
    df.collect().foreach(r =>
      assert(r.getInt(1) === r.getInt(0), s"case $r"))
  }

  test("damerau-levenshtein participates in whole-stage codegen") {
    import graft.functions.StringFunctions
    // parquet-backed input: a LocalRelation would be constant-folded at
    // optimization time and never reach codegen at all
    val df = graft.util.Tables.t(spark, sf, "customer")
      .select(StringFunctions.damerauLevenshtein(
        col("c_name"), reverse(col("c_name"))).as("d"))
    df.collect()
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("DamerauLevenshtein.compute") ||
      gen.contains("dameraulevenshtein"),
      s"expected generated call into compute():\n${gen.take(2000)}")
  }

  test("damerau-levenshtein: null propagates, SQL text path registered") {
    import graft.functions.StringFunctions
    val out = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b")
      .select(StringFunctions.damerauLevenshtein(col("a"), col("b")))
      .first()
    assert(out.isNullAt(0))
    StringFunctions.register(spark)
    assert(spark.sql("SELECT damerau_levenshtein('CA', 'ABC') AS d")
      .first().getInt(0) === 2)
  }
}
