package graft

import org.apache.spark.sql.functions._
import graft.functions.DetMath

class DetMathSpec extends SparkSpec {
  import spark.implicits._

  test("detLn tracks Math.log within 1e-10 relative across the idf range") {
    val xs = (1 to 2000).map(df => (50000.0 - df + 0.5) / (df + 0.5) + 1.0) ++
      Seq(1.0, 1.5, 2.0, 4.0, 1024.0, 1e6, 3.9999999, 1.0000001)
    val got = xs.toDF("x").select(DetMath.detLn($"x")).as[Double].collect()
    xs.zip(got).foreach { case (x, v) =>
      val ref = math.log(x)
      val tol = math.max(math.abs(ref), 1.0) * 1e-10
      assert(math.abs(v - ref) <= tol, s"detLn($x) = $v vs ${ref}")
    }
  }

  test("exact at powers of two: detLn(2^k) = k * ln2 literal, ln(1) = 0") {
    val xs = Seq(1.0, 2.0, 4.0, 8.0, 1024.0, 65536.0)
    val got = xs.toDF("x").select(DetMath.detLn($"x")).as[Double].collect()
    xs.zip(got).foreach { case (x, v) =>
      val k = (math.log(x) / math.log(2.0)).round
      assert(v == k * DetMath.Ln2.toDouble, s"detLn($x) = $v not exactly $k*ln2")
    }
  }

  test("strictly monotone over integer inputs 1..4096") {
    val got = (1 to 4096).map(_.toDouble).toDF("x")
      .select(DetMath.detLn($"x")).as[Double].collect()
    got.sliding(2).foreach(p => assert(p(0) < p(1)))
  }
}
