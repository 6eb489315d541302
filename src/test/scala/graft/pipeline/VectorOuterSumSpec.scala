package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VectorOuterSumAgg must be output-indistinguishable from the
  * Catalyst formula it replaced (flatten(transform(sequence, i =>
  * transform(sequence, j => q_i * q_j)))) — including the exact
  * Round(HALF_UP) quantization on adversarial doubles where
  * floor(v+0.5) would disagree with BigDecimal.valueOf rounding. */
class VectorOuterSumSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** The pre-r17 formula, verbatim. */
  private def oldFormula(df: DataFrame, vecCol: String, dim: Int,
                         scale: Double): Array[Double] = {
    val q = transform(col(vecCol), x => round(x.cast("double") * scale))
    val prods = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        element_at(col("__q"), i + 1) * element_at(col("__q"), j + 1))))
    df.select(q.as("__q")).select(prods.as("__p"))
      .agg(Tx.vector_sum(col("__p")).as("__sp"))
      .head().getSeq[Double](0).toArray
  }

  private def newAgg(df: DataFrame, vecCol: String, dim: Int,
                     scale: Double): Array[Double] =
    df.agg(Tx.vector_outer_sum(col(vecCol), scale, dim).as("__sp"))
      .head().getSeq[Double](0).toArray

  test("equals the old formula on adversarial quantization values") {
    import spark.implicits._
    // values chosen to stress HALF_UP: exact halves (positive and
    // negative), doubles whose *1000 rendering sits at a half, values
    // where floor(v+0.5) and BigDecimal rounding could diverge
    val rows = Seq(
      Seq(0.0005, -0.0005, 0.0015, -0.0015, 0.49999999999999994 / 1000, 1.0),
      Seq(0.0025, -0.0035, 2.6749999e-3, -2.6749999e-3, 0.001, -1.0),
      Seq(1.0e-9, -1.0e-9, 0.0004999999999999999, 0.123456, -0.654321, 0.5),
      Seq(0.25, -0.75, 0.33333333, -0.66666667, 0.99999999, -0.99999999))
      .map(v => Tuple1(v))
    val df = rows.toDF("v").repartition(3)
    val dim = 6
    assert(newAgg(df, "v", dim, 1000.0).toSeq ==
      oldFormula(df, "v", dim, 1000.0).toSeq)
  }

  test("equals the old formula on a random-ish 64-dim corpus, with nulls") {
    import spark.implicits._
    val rows = (1 to 500).map { r =>
      if (r % 97 == 0) Tuple1(null.asInstanceOf[Seq[Double]])
      else Tuple1((1 to 64).map(i =>
        math.sin(r * 31 + i * 7) * (if ((r + i) % 3 == 0) -1 else 1)))
    }
    val df = rows.toDF("v").repartition(5)
    // null ROWS: the old formula could not tolerate them at all (its
    // product array came out non-null with null ELEMENTS and vector_sum
    // rejected those), so the comparison runs on the null-filtered
    // frame; the aggregate must skip null rows like vector_sum does —
    // i.e. the full frame and the filtered frame agree
    val nonNull = df.where(col("v").isNotNull)
    assert(newAgg(df, "v", 64, 1000.0).toSeq ==
      oldFormula(nonNull, "v", 64, 1000.0).toSeq)
    assert(newAgg(df, "v", 64, 1000.0).toSeq ==
      newAgg(nonNull, "v", 64, 1000.0).toSeq)
    // and the end-to-end stats frame is unchanged in shape + values
    val out = Sketches.vectorCovarianceStats(df.select(col("v").as("embedding")),
      "embedding", dim = 64)
    assert(out.count() == 64L * 65 / 2)
    val r0 = out.where(col("i") === 0 && col("j") === 0).head()
    assert(r0.getLong(2) == newAgg(df, "v", 64, 1000.0)(0).toLong)
  }

  test("longer vectors truncate to dim like the literal-index formula") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0, 4.0)),
      Tuple1(Seq(0.5, -0.5, 1.5, -1.5))).toDF("v")
    assert(newAgg(df, "v", 3, 1000.0).toSeq ==
      oldFormula(df, "v", 3, 1000.0).toSeq)
  }
}
