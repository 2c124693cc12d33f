package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}

import scala.math.BigDecimal.RoundingMode

/** Property tests pinning the cross-engine float-parity rules the oracle
  * gate depends on (Queries.dsum / Money / xsum) — the three traps the
  * synthesized-sf1 decade surfaced (ROUND9_NOTES), generalized from the
  * one value that bit to the whole input domain.
  *
  * The Spark side runs for REAL (cast chains on DataFrames through the
  * shared session). The DuckDB side is a set of JVM models validated
  * against DuckDB 1.0 by tools/proto_parity.py (DuckDB runs driver-side
  * only — Python — so it cannot be invoked from this JVM):
  *
  *   - decimal scale reduction TRUNCATES toward zero (not HALF_UP, not
  *     half-even);
  *   - decimal→double is unscaled→double then a double division by
  *     10^scale (two roundings — inexact above 2^53 unscaled);
  *   - double→decimal has NO stable model (DuckDB's constant-folding
  *     and executor paths disagree with each other), so the rules only
  *     ever cast doubles that sit on a 2-decimal grid, where EVERY
  *     candidate model provably agrees.
  */
class FloatParitySpec extends SparkSpec {

  private def check(label: String, prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$label: ${res.status}")
  }

  // ---- engine models (see scaladoc) --------------------------------

  /** Spark double→decimal: shortest string repr, then HALF_UP
    * (o.a.s.sql.types.Decimal.apply(Double) → BigDecimal.decimal).
    */
  private def sparkDblToDec(d: Double, scale: Int): BigDecimal =
    BigDecimal(java.lang.Double.toString(d)).setScale(scale, RoundingMode.HALF_UP)

  /** DuckDB candidate A: round the exact binary expansion (nearest-even). */
  private def exactBinaryToDec(d: Double, scale: Int): BigDecimal =
    BigDecimal(new java.math.BigDecimal(d)).setScale(scale, RoundingMode.HALF_EVEN)

  /** DuckDB candidate B: scaled double multiply, round half away from zero. */
  private def scaledAwayToDec(d: Double, scale: Int): BigDecimal = {
    val x = d * math.pow(10, scale).toLong
    BigDecimal(math.signum(x).toLong * math.round(math.abs(x)), scale)
  }

  /** DuckDB decimal→double: unscaled→double (one rounding), then a double
    * division by 10^scale (second rounding).
    */
  private def duckDecToDbl(bd: BigDecimal): Double =
    bd.underlying.unscaledValue.doubleValue / math.pow(10, bd.scale)

  /** Spark decimal→double: correctly rounded (Decimal.toDouble →
    * BigDecimal.doubleValue). Asserted against real Spark below.
    */
  private def sparkDecToDbl(bd: BigDecimal): Double = bd.toDouble

  /** DuckDB decimal scale reduction: truncation toward zero. */
  private def duckReduce(bd: BigDecimal, scale: Int): BigDecimal =
    bd.setScale(scale, RoundingMode.DOWN)

  /** Spark decimal scale reduction: HALF_UP (Decimal.changePrecision). */
  private def sparkReduce(bd: BigDecimal, scale: Int): BigDecimal =
    bd.setScale(scale, RoundingMode.HALF_UP)

  // ---- generators ---------------------------------------------------

  /** A value on the 2-decimal grid (what every money/measure column in
    * the fixtures holds), as the nearest double — the only doubles the
    * parity rules ever cast to decimal.
    */
  private val gridGen: Gen[BigDecimal] =
    Gen.chooseNum(0L, 10500000L).map(n => BigDecimal(n, 2))
  private val rateGen: Gen[BigDecimal] =
    Gen.chooseNum(0L, 10L).map(n => BigDecimal(n, 2))

  test("grid doubles cast to DECIMAL identically under Spark and every DuckDB model") {
    check("grid cast", Prop.forAll(gridGen) { bd =>
      val d = bd.toDouble
      sparkDblToDec(d, 2) == bd &&
        exactBinaryToDec(d, 2) == bd &&
        scaledAwayToDec(d, 2) == bd
    })
    // the same claim against REAL Spark, one batched job
    val rnd = new scala.util.Random(20260813L)
    val grid = Seq.fill(512)(BigDecimal(rnd.nextLong(10500000L), 2))
    import spark.implicits._
    val got = grid.map(_.toDouble).toDF("x")
      .select(col("x").cast(DecimalType(12, 2))).as[BigDecimal].collect()
    assert(got.toSeq == grid, "real Spark cast disagrees with the grid")
  }

  test("non-grid doubles are cast-trap territory: Spark follows shortest-repr HALF_UP, not the binary expansion") {
    // 0.285's exact binary expansion is 0.28499999…; shortest-repr
    // HALF_UP gives 0.29. A model difference this large is why the
    // rules never compare a cast of an arbitrary double cross-engine.
    assert(sparkDblToDec(0.285, 2) == BigDecimal("0.29"))
    assert(exactBinaryToDec(0.285, 2) == BigDecimal("0.28"))
    import spark.implicits._
    val got = Seq(0.285, 8.0581925).toDF("x")
      .select(col("x").cast(DecimalType(18, 6)).cast("string")).as[String].collect()
    assert(got(0) == "0.285000", s"Spark cast of 0.285: ${got(0)}")
    assert(got(1) == "8.058193", // shortest repr "8.0581925" HALF_UP — binary expansion would truncate to …92
      s"Spark cast of 8.0581925: ${got(1)}")
  }

  test("xsum: FLOOR-cents exit is rounding-mode-free; rounded reduction diverges cross-engine") {
    val rowGen = Gen.zip(gridGen, rateGen, rateGen)
    val groupGen = Gen.nonEmptyListOf(rowGen).map(_.take(60))
    check("floor exit", Prop.forAll(groupGen) { rows =>
      // exact decimal charge sum, as both engines compute it
      val sum = rows.map { case (p, d, t) => p * (1 - d) * (1 + t) }.sum
      val cents = (sum * 100).setScale(0, RoundingMode.FLOOR)
      // mode-free: FLOOR == truncation on the positive axis; exact in
      // double (bounded: 60 rows × ~1.3e5 ≪ 9e13); one IEEE division
      // per engine afterwards
      cents == (sum * 100).setScale(0, RoundingMode.DOWN) &&
        duckDecToDbl(cents) / 100.0 == cents.toBigInt.toDouble / 100.0 &&
        sparkDecToDbl(cents) / 100.0 == cents.toBigInt.toDouble / 100.0
    })
    // the alternative — reducing the sum's scale — diverges between the
    // engines whenever the sub-cent residue is ≥ 0.005 (Spark rounds
    // HALF_UP, DuckDB truncates): a fixed witness, not a hope
    val sum = BigDecimal("12.345678")
    assert(sparkReduce(sum, 2) == BigDecimal("12.35"))
    assert(duckReduce(sum, 2) == BigDecimal("12.34"))
    // real Spark, end to end: xsum over a generated group matches the
    // exact floor-cents model
    val rnd = new scala.util.Random(7L)
    val rows = Seq.fill(200)((BigDecimal(rnd.nextLong(10500000L), 2),
      BigDecimal(rnd.nextLong(11L), 2), BigDecimal(rnd.nextLong(9L), 2)))
    import spark.implicits._
    val df = rows.map { case (p, d, t) => (p.toDouble, d.toDouble, t.toDouble) }
      .toDF("l_extendedprice", "l_discount", "l_tax")
    val got = df.agg(Queries.xsum(Queries.Money.charge)).as[Double].collect()(0)
    val exact = rows.map { case (p, d, t) => p * (1 - d) * (1 + t) }.sum
    val model = (exact * 100).setScale(0, RoundingMode.FLOOR).toBigInt.toDouble / 100.0
    assert(got == model, s"real Spark xsum $got != exact floor-cents model $model")
  }

  test("dsum: grid addends keep scale reduction exact in both engines, even past 2^53 micro-units") {
    // mix everyday magnitudes with values big enough that the UNREDUCED
    // (38,6) sum exceeds 2^53 micro-units — the regime where a raw
    // decimal→double cast diverges between the engines
    val bigGridGen = Gen.oneOf(
      Gen.chooseNum(0L, 10500000L),
      Gen.chooseNum(450359962737045L, 450359962737047L)).map(BigDecimal(_, 2))
    // ≤ 15 addends keeps the sum inside dsum's documented exactness
    // domain (< ~9e13: cents < 2^53); the cap itself is witnessed below
    val listGen = Gen.nonEmptyListOf(bigGridGen).map(_.take(15))
    check("dsum reduce", Prop.forAll(listGen) { xs =>
      val sum6 = xs.sum.setScale(6) // the (38,6) accumulator — residue is zero by construction
      val reduced = duckReduce(sum6, 2)
      (sum6 * 100).toBigInt < BigInt(2).pow(53) && // generator stays in-domain
        reduced == sparkReduce(sum6, 2) && reduced == xs.sum &&
        // after reduction both engines convert identically: unscaled
        // < 2^53 is exact in double, then one IEEE division each
        duckDecToDbl(reduced) == sparkDecToDbl(reduced)
    })
    // the domain CAP is real: once even the reduced sum's cents exceed
    // 2^53, the engines' decimal→double diverge again — grid data and
    // scale reduction don't rescue a per-group sum above ~9e13 (at that
    // point the oracle needs a string/decimal compare, not a double)
    val over = BigDecimal("90071992547409.93")
    assert(duckDecToDbl(over) != sparkDecToDbl(over),
      "cents above 2^53 should diverge between the engine models")
    // the trap dsum exists to avoid, as a fixed witness: >2^53 unscaled
    // at scale 6 converts DIFFERENTLY per engine without the reduction
    val w = BigDecimal("18014398509.481989")
    assert(duckDecToDbl(w) != sparkDecToDbl(w),
      "witness should diverge between the engines when cast raw")
    // real Spark applies the dsum chain = the HALF_UP-reduce model
    val rnd = new scala.util.Random(11L)
    val xs = Seq.fill(300)(BigDecimal(rnd.nextLong(10500000L), 2)) ++
      Seq.fill(4)(BigDecimal(450359962737046L, 2))
    import spark.implicits._
    val got = xs.map(_.toDouble).toDF("x")
      .agg(Queries.dsum(col("x"))).as[Double].collect()(0)
    assert(got == sparkDecToDbl(xs.sum), s"real Spark dsum $got != model ${sparkDecToDbl(xs.sum)}")
    // and real Spark's RAW decimal→double is the correctly-rounded model
    // (the Spark half of the witness divergence above)
    val rawGot = Seq("18014398509.481989").toDF("s")
      .select(col("s").cast(DecimalType(38, 6)).cast(DoubleType)).as[Double].collect()(0)
    assert(rawGot == sparkDecToDbl(w))
  }
}
