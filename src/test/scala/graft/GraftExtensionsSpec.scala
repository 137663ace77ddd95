package graft

import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}

/** The `spark.sql.extensions` entry point: reflectively instantiable
  * from its conf-string name (exactly what Spark does at session build)
  * and its injection registers the native functions into a registry.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions is conf-instantiable and injects cosine_sim") {
    // the same path Spark takes for --conf spark.sql.extensions=...
    val instance = Class.forName("graft.GraftExtensions")
      .getConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    val ext = new SparkSessionExtensions
    instance(ext)
    GraftBridge.applyInjectedFunctions(ext, spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        " cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }
}
