package graft

import graft.functions.QuantizedVec
import org.apache.spark.sql.functions._

/** The custom Catalyst expressions: codegen path vs a plain-Scala reference
  * implementation, plus the cosine wiring. */
class QuantizedVecSpec extends SparkTestBase {
  import spark.implicits._

  private def refQ(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
  private def refDot(a: Seq[Float], b: Seq[Float]): Long =
    a.zip(b).map { case (x, y) => refQ(x) * refQ(y) }.sum
  private def refNorm(a: Seq[Float]): Long = a.map(x => { val q = refQ(x); q * q }).sum

  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 20L).map(i => i -> Seq.fill(64)((rnd.nextDouble() - 0.5).toFloat))

  test("qdot/qnormsq match the reference implementation (codegen path)") {
    val df = vecs.toDF("id", "v")
    val paired = df.as("a").crossJoin(df.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"),
        QuantizedVec.qdot($"a.v", $"b.v").as("dot"),
        QuantizedVec.qnormsq($"a.v").as("nsq"))
      .collect()
    val byId = vecs.toMap
    paired.foreach { r =>
      val (ia, ib) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == refDot(byId(ia), byId(ib)), s"dot($ia,$ib)")
      assert(r.getLong(3) == refNorm(byId(ia)), s"nsq($ia)")
    }
  }

  test("quantization is floor(x*scale + 0.5): half-ties round toward +inf") {
    // scale=2: 1.25*2 = 2.5 (exact) → floor(3.0)=3; -1.25*2 = -2.5 →
    // floor(-2.0) = -2. Distinguishes floor(x+0.5) from banker's rounding
    // (2) and from round-half-away (-3).
    val df = Seq((Seq(1.25f, -1.25f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val dot = df.select(QuantizedVec.qdot($"a", $"b", scale = 2.0)).as[Long].head()
    assert(dot == 3L * 2L + -2L * 2L) // q(1.25)=3, q(-1.25)=-2, q(1.0)=2
  }

  test("qcosine of identical vectors is 1.0") {
    val df = vecs.toDF("id", "v")
      .select($"id", $"v", QuantizedVec.qnormsq($"v").as("nsq"))
    val cos = df.select(
      QuantizedVec.qcosine($"v", $"v", $"nsq", $"nsq").as("c")).as[Double].collect()
    cos.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }
}
