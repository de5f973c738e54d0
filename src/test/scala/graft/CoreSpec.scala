package graft

import graft.functions.{NormCdf, Port}
import graft.operators.{AsOfJoin, Bars}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PortSpec extends AnyFunSuite {
  test("Port.r rounds half-up via pure floor arithmetic") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(1.23456, -1.23456, 2.5, 31.31875).toDF("x")
      .select(Port.r(col("x"), 4).as("r4"), Port.r(col("x"), 0).as("r0"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 1.2346)
    assert(rows(2).getDouble(1) == 3.0) // half-up at integer scale
  }
}

class NormCdfSpec extends AnyFunSuite {
  test("cdf matches known normal quantiles within A&S tolerance") {
    assert(math.abs(NormCdf.cdf(0.0) - 0.5) < 1e-7)
    assert(math.abs(NormCdf.cdf(1.959963985) - 0.975) < 1e-6)
    assert(math.abs(NormCdf.cdf(-1.959963985) - 0.025) < 1e-6)
    assert(NormCdf.cdf(8.0) > 0.9999999)
  }

  test("expression evaluates inside a column pipeline (codegen path)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Seq(0.0, 1.0, -1.0).toDF("x")
      .select(NormCdf(col("x")).as("p")).as[Double].collect()
    assert(math.abs(out(0) - 0.5) < 1e-7)
    assert(math.abs(out(1) + out(2) - 1.0) < 1e-7) // symmetry
  }
}

class BarsSpec extends AnyFunSuite {
  test("ohlcv picks open/close by time, volume sums") {
    val spark = TestSpark.spark
    import spark.implicits._
    // ts in ns; two bars for A, one for B
    val ticks = Seq(
      (0L * 1000000000L, "A", 10.0, 1.0),
      (30L * 1000000000L, "A", 12.0, 2.0),
      (59L * 1000000000L, "A", 11.0, 1.0),
      (70L * 1000000000L, "A", 13.0, 1.0),
      (5L * 1000000000L, "B", 5.0, 1.0)
    ).toDF("ts", "symbol", "price", "volume")
    val bars = Bars.ohlcv(ticks, 60).orderBy("symbol", "bucket_ms").collect()
    val a0 = bars(0)
    assert(a0.getAs[Double]("open") == 10.0)
    assert(a0.getAs[Double]("high") == 12.0)
    assert(a0.getAs[Double]("low") == 10.0)
    assert(a0.getAs[Double]("close") == 11.0)
    assert(a0.getAs[Double]("volume") == 4.0)
    assert(bars.length == 3)
  }
}

class AsOfJoinSpec extends AnyFunSuite {
  test("backward as-of picks latest right value at-or-before, inclusive ties") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(("A", 5L, 1), ("A", 10L, 2), ("A", 15L, 3), ("B", 5L, 4))
      .toDF("symbol", "t", "k")
    val right = Seq(("A", 4L, 100.0), ("A", 10L, 200.0)).toDF("symbol", "t", "v")
    val out = AsOfJoin.backward(left, right, "symbol", "t", Seq("v"))
      .orderBy("symbol", "t").collect()
    assert(out(0).getAs[Double]("v") == 100.0) // t=5 ← right@4
    assert(out(1).getAs[Double]("v") == 200.0) // t=10 tie → inclusive
    assert(out(2).getAs[Double]("v") == 200.0)
    assert(out(3).isNullAt(out(3).fieldIndex("v"))) // B: no right row
  }

  test("valueCols clashing with left's columns are rejected") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(("A", 5L, 1.0)).toDF("symbol", "t", "v")
    val right = Seq(("A", 4L, 100.0)).toDF("symbol", "t", "v")
    val e = intercept[IllegalArgumentException](
      AsOfJoin.backward(left, right, "symbol", "t", Seq("v")))
    assert(e.getMessage.contains("disjoint"))
  }

  test("duplicate right timestamps resolve deterministically to the greatest value") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(("A", 10L, 1)).toDF("symbol", "t", "k")
    val right = Seq(("A", 10L, 100.0), ("A", 10L, 300.0), ("A", 10L, 200.0))
      .toDF("symbol", "t", "v")
    val out = AsOfJoin.backward(left, right, "symbol", "t", Seq("v")).collect()
    assert(out.length == 1 && out(0).getAs[Double]("v") == 300.0)
  }

  test("tolerance nulls out stale matches; forward picks the next right row") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(("A", 10L, 1), ("A", 20L, 2)).toDF("symbol", "t", "k")
    val right = Seq(("A", 4L, 100.0), ("A", 19L, 200.0), ("A", 25L, 300.0))
      .toDF("symbol", "t", "v")
    val tol = AsOfJoin.backward(left, right, "symbol", "t", Seq("v"), tolerance = Some(3L))
      .orderBy("t").collect()
    assert(tol(0).isNullAt(tol(0).fieldIndex("v"))) // t=10 ← right@4, gap 6 > 3
    assert(tol(1).getAs[Double]("v") == 200.0)      // t=20 ← right@19, gap 1
    val fwd = AsOfJoin.forward(left, right, "symbol", "t", Seq("v"))
      .orderBy("t").collect()
    assert(fwd(0).getAs[Double]("v") == 200.0) // t=10 → right@19
    assert(fwd(1).getAs[Double]("v") == 300.0) // t=20 → right@25
    val fwdTol = AsOfJoin.forward(left, right, "symbol", "t", Seq("v"), tolerance = Some(5L))
      .orderBy("t").collect()
    assert(fwdTol(0).isNullAt(fwdTol(0).fieldIndex("v"))) // gap 9 > 5
    assert(fwdTol(1).getAs[Double]("v") == 300.0)         // gap 5 <= 5
  }
}

/** Property-based invariants (scalacheck): the as-of join must agree
  * with the brute-force per-row definition on arbitrary inputs.
  */
class AsOfJoinPropsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("backward/forward as-of equal the brute-force definition on random inputs") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    val genTimes = Gen.listOfN(12, Gen.choose(0L, 30L))
    val prop = Prop.forAll(genTimes, genTimes) { (lts: List[Long], rts: List[Long]) =>
      val left = lts.zipWithIndex.map { case (t, i) => ("A", t, i) }
        .toDF("symbol", "t", "k")
      val right = rts.zipWithIndex.map { case (t, i) => ("A", t, t * 1000.0 + i) }
      val rightDf = right.toDF("symbol", "t", "v")
      val back = AsOfJoin.backward(left, rightDf, "symbol", "t", Seq("v"))
        .collect().map(r => r.getAs[Int]("k") -> Option(r.get(r.fieldIndex("v")))).toMap
      val fwd = AsOfJoin.forward(left, rightDf, "symbol", "t", Seq("v"))
        .collect().map(r => r.getAs[Int]("k") -> Option(r.get(r.fieldIndex("v")))).toMap
      lts.zipWithIndex.forall { case (t, k) =>
        // brute force: max right value among ties at the nearest time
        val bExp = right.filter(_._2 <= t).sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        val fExp = right.filter(_._2 >= t)
          .sortBy(r => (-r._2, r._3)).lastOption.map(_._3)
        back(k).map(_.asInstanceOf[Double]) == bExp &&
          fwd(k).map(_.asInstanceOf[Double]) == fExp
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("multi-column fills with nulls follow the one shared original-tuple order") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // Each fill is last-ignore-nulls PER COLUMN over the single window
    // ordered by (t, tag, v, w) with the ORIGINAL values (nulls first,
    // Spark's ascending default) — the r07 layering pinned that one
    // shared order for every column. Brute force mirrors it exactly.
    val genVal: Gen[Option[Double]] =
      Gen.frequency(3 -> Gen.choose(1, 9).map(i => Some(i.toDouble)), 1 -> Gen.const(None))
    val genRight = Gen.listOfN(10, Gen.zip(Gen.choose(0L, 12L), genVal, genVal))
    val genLts = Gen.listOfN(8, Gen.choose(0L, 12L))
    // None sorts below Some (Spark: nulls first ascending)
    def k(o: Option[Double]): Double = o.getOrElse(Double.NegativeInfinity)
    val prop = Prop.forAll(genLts, genRight) { (lts, rts) =>
      val left = lts.zipWithIndex.map { case (t, i) => ("A", t, i) }
        .toDF("symbol", "t", "idx")
      val rightDf = rts.map { case (t, v, w) =>
          ("A", t, v.map(Double.box).orNull: java.lang.Double,
            w.map(Double.box).orNull: java.lang.Double)
        }
        .toDF("symbol", "t", "v", "w")
      val out = AsOfJoin.backward(left, rightDf, "symbol", "t", Seq("v", "w"))
        .collect().map { r =>
          r.getAs[Int]("idx") ->
            (Option(r.get(r.fieldIndex("v"))), Option(r.get(r.fieldIndex("w"))))
        }.toMap
      lts.zipWithIndex.forall { case (lt, i) =>
        val ordered = rts.filter(_._1 <= lt)
          .sortBy { case (t, v, w) => (t, k(v), k(w)) }
        val vExp = ordered.reverse.collectFirst { case (_, Some(v), _) => v }
        val wExp = ordered.reverse.collectFirst { case (_, _, Some(w)) => w }
        out(i)._1.map(_.asInstanceOf[Double]) == vExp &&
          out(i)._2.map(_.asInstanceOf[Double]) == wExp
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}

class NormalizerSpec extends AnyFunSuite {
  test("coerceTsMs sniffs s/ms/us/ns magnitudes to one ms clock") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = 1704067200L // 2024-01-01 in seconds
    val df = Seq(t, t * 1000L, t * 1000000L, t * 1000000000L).toDF("raw")
      .select(graft.etl.Normalizer.coerceTsMs("raw").as("ms")).as[Long].collect()
    assert(df.toSet == Set(t * 1000L))
  }

  test("Memo.invalidateAll evicts every session memo (stale-read hook)") {
    val spark = TestSpark.spark
    val a = graft.operators.Bars.ohlcvCached(spark, TestSpark.Sf, 60)
    assert(a eq graft.operators.Bars.ohlcvCached(spark, TestSpark.Sf, 60))
    graft.Memo.invalidateAll()
    val b = graft.operators.Bars.ohlcvCached(spark, TestSpark.Sf, 60)
    assert(!(a eq b), "invalidated memo must rebuild")
    assert(b.count() == a.count())
  }
}
