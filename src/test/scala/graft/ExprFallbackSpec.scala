package graft

import org.apache.spark.sql.functions._

/** The native expressions ship both doGenCode and an interpreted
  * nullSafeEval; Spark silently falls back to eval when a stage exceeds
  * codegen limits, so the two paths must be value-identical.
  */
class ExprFallbackSpec extends SparkSpec {
  import spark.implicits._

  private def computeAll(): Seq[org.apache.spark.sql.Row] = {
    graft.expressions.GraftFunctions.register(spark)
    val emb = sf().embeddings.where($"vec_id" < 50)
      .select($"vec_id", $"embedding")
    val docs = sf().documents.where($"doc_id" < 50)
    val vec = emb.as("a").join(emb.as("b"), $"a.vec_id" + 1 === $"b.vec_id")
      .select($"a.vec_id",
        call_function("graft_dot", $"a.embedding", $"b.embedding").as("dot"))
    val txt = docs.select($"doc_id",
      call_function("graft_simhash32",
        transform(split($"text", " "), t => graft.functions.TextFns.hash32(t))).as("sim"),
      call_function("graft_minhash_sig",
        call_function("graft_shingle_hashes", $"text", lit(3), lit(8)), lit(4)).as("mh"))
    vec.join(txt, $"vec_id" === $"doc_id")
      .orderBy("vec_id").collect().toSeq
  }

  test("detLn builds a pure expression tree: valid in a session that never registered it") {
    // the Column must not depend on a temp-function registration side
    // effect — a fresh session has an empty temp registry, so a
    // registry-routed detLn would fail resolution there
    val c = graft.functions.DetMath.detLn(lit(8.0))
    val s2 = spark.newSession()
    val got = s2.range(1).select(c.as("y")).collect().head.getDouble(0)
    assert(math.abs(got - math.log(8.0)) < 1e-9,
      s"detLn(8.0) in an unregistered session: got $got")
  }

  test("codegen and interpreted eval paths produce identical values") {
    val factory = "spark.sql.codegen.factoryMode"
    val whole = "spark.sql.codegen.wholeStage"
    val prevF = spark.conf.getOption(factory)
    val prevW = spark.conf.getOption(whole)
    try {
      spark.conf.set(factory, "CODEGEN_ONLY")
      spark.conf.set(whole, "true")
      val gen = computeAll()
      spark.conf.set(factory, "NO_CODEGEN")
      spark.conf.set(whole, "false")
      val interp = computeAll()
      assert(gen.nonEmpty)
      assert(gen == interp)
    } finally {
      prevF.fold(spark.conf.unset(factory))(spark.conf.set(factory, _))
      prevW.fold(spark.conf.unset(whole))(spark.conf.set(whole, _))
    }
  }
}
