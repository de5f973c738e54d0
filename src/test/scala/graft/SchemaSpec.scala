package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the environment contract: the testdata parquet schemas as the engine
  * tolerates them, and the canonical view `Tables` presents downstream.
  *
  * Round-8 post-mortem: the driver regenerated `events.ts` from parquet
  * timestamp[ns] (read as epoch-ns long under nanosAsLong) to timestamp[us]
  * (read as TIMESTAMP_NTZ), and 56 queries died at analysis time. This spec
  * makes the next such drift a single loud, named failure.
  */
class SchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Temporal feed columns may arrive in any encoding epochNs accepts. */
  private def temporalOk(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | TimestampType | TimestampNTZType |
        DateType | StringType => true
    case _ => false
  }

  private def schemaOf(name: String) =
    spark.read.parquet(s"$sf/$name.parquet").schema

  test("all ten tables ship the columns the engine reads, with tolerated types") {
    val expect: Map[String, Map[String, DataType => Boolean]] = Map(
      "region"   -> Map("r_regionkey" -> (integral _), "r_name" -> (_ == StringType)),
      "nation"   -> Map("n_nationkey" -> (integral _), "n_name" -> (_ == StringType),
                        "n_regionkey" -> (integral _)),
      "customer" -> Map("c_custkey" -> (integral _), "c_name" -> (_ == StringType),
                        "c_nationkey" -> (integral _), "c_acctbal" -> (_ == DoubleType),
                        "c_mktsegment" -> (_ == StringType)),
      "supplier" -> Map("s_suppkey" -> (integral _), "s_name" -> (_ == StringType),
                        "s_nationkey" -> (integral _), "s_acctbal" -> (_ == DoubleType)),
      "part"     -> Map("p_partkey" -> (integral _), "p_name" -> (_ == StringType),
                        "p_brand" -> (_ == StringType), "p_type" -> (_ == StringType),
                        "p_size" -> (integral _), "p_retailprice" -> (_ == DoubleType)),
      "orders"   -> Map("o_orderkey" -> (integral _), "o_custkey" -> (integral _),
                        "o_orderstatus" -> (_ == StringType), "o_totalprice" -> (_ == DoubleType),
                        "o_orderdate" -> temporalOk _, "o_orderpriority" -> (_ == StringType)),
      "lineitem" -> Map("l_orderkey" -> (integral _), "l_partkey" -> (integral _),
                        "l_suppkey" -> (integral _), "l_quantity" -> (_ == DoubleType),
                        "l_extendedprice" -> (_ == DoubleType), "l_discount" -> (_ == DoubleType),
                        "l_tax" -> (_ == DoubleType), "l_returnflag" -> (_ == StringType),
                        "l_linestatus" -> (_ == StringType), "l_shipdate" -> temporalOk _),
      "events"   -> Map("event_id" -> (integral _), "ts" -> temporalOk _,
                        "user_id" -> (integral _), "event_type" -> (_ == StringType),
                        "value" -> (_ == DoubleType), "props" -> (_ == StringType)),
      "documents" -> Map("doc_id" -> (integral _), "text" -> (_ == StringType),
                         "lang" -> (_ == StringType), "source" -> (_ == StringType),
                         "n_chars" -> (integral _)),
      "embeddings" -> Map("vec_id" -> (integral _),
                          "embedding" -> {
                            case ArrayType(FloatType | DoubleType, _) => true
                            case _ => false
                          },
                          "label" -> (integral _))
    )
    val problems = expect.flatMap { case (table, cols) =>
      val actual = schemaOf(table)
      cols.flatMap { case (c, ok) =>
        actual.fields.find(_.name == c) match {
          case None    => Some(s"$table.$c: MISSING (have ${actual.fieldNames.mkString(",")})")
          case Some(f) if !ok(f.dataType) => Some(s"$table.$c: unexpected type ${f.dataType}")
          case _ => None
        }
      }
    }
    assert(problems.isEmpty, s"\ntestdata schema drift:\n  ${problems.mkString("\n  ")}")
  }

  test("embeddings are 64-dimensional (the IVF/ANN oracles unroll range(1,65))") {
    val dims = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(64),
      s"embedding dims ${dims.mkString(",")} != 64 — every ANN oracle SQL must change with it")
  }

  test("canonical view: events.ts and ticks.ts are epoch-ns LongType") {
    assert(Tables.events(spark, sf).schema("ts").dataType == LongType)
    val t = Tables.ticks(spark, sf).schema
    assert(t("ts").dataType == LongType)
    assert(t("price").dataType == DoubleType)
    assert(t("volume").dataType == DoubleType)
    // and the values are plausibly nanoseconds (year 2000..2100 range)
    val Array(mn, mx) = Tables.ticks(spark, sf)
      .agg(min("ts"), max("ts")).collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(mn > 946684800L * 1000000000L, s"min ts $mn below year-2000 epoch-ns")
    assert(mx < 4102444800L * 1000000000L, s"max ts $mx above year-2100 epoch-ns")
  }

  test("epochNs normalizes every tolerated encoding to the same instant") {
    import spark.implicits._
    val ns = 1717200000123456000L // 2024-06-01 00:00:00.123456 UTC
    val longDf = Seq(ns).toDF("ts")
    assert(Tables.epochNs(longDf, "ts").as[Long].head() == ns)

    val ntzDf = Seq(ns / 1000L).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)
    assert(Tables.epochNs(ntzDf, "ts").as[Long].head() == ns)

    val tsDf = Seq(ns / 1000L).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(tsDf.schema("ts").dataType == TimestampType)
    assert(Tables.epochNs(tsDf, "ts").as[Long].head() == ns)

    val strDf = Seq("2024-06-01 00:00:00.123456").toDF("ts")
    assert(Tables.epochNs(strDf, "ts").as[Long].head() == ns)

    val dateDf = Seq("2024-06-01").toDF("s").select(to_date(col("s")).as("ts"))
    assert(Tables.epochNs(dateDf, "ts").as[Long].head() == 1717200000L * 1000000000L)

    // a 32-bit int can only be epoch-SECONDS (ms/ns overflow Int) — a
    // plain Long cast would have read this as 1.7s past the 1970 epoch
    val intDf = Seq(1717200000).toDF("ts")
    assert(intDf.schema("ts").dataType == IntegerType)
    assert(Tables.epochNs(intDf, "ts").as[Long].head() == 1717200000L * 1000000000L)
  }

  test("property: every encoding of a random µs instant normalizes to the same ns") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // epoch-µs range 1970..2200 (timestamp_micros-representable, µs-exact
    // so the string encoding round-trips losslessly)
    val genUs = Gen.choose(0L, 7258118400000000L)
    val prop = Prop.forAll(Gen.listOfN(8, genUs)) { uss: List[Long] =>
      val expected = uss.map(_ * 1000L)
      def ns(df: org.apache.spark.sql.DataFrame): List[Long] =
        Tables.epochNs(df, "ts").select("ts").as[Long].collect().toList
      val base = uss.toDF("us")
      val long = ns(expected.toDF("ts"))
      val tsT = ns(base.select(timestamp_micros(col("us")).as("ts")))
      val ntz = ns(base.select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
      val str = ns(base.select(date_format(timestamp_micros(col("us")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts")))
      long == expected && tsT == expected && ntz == expected && str == expected
    }
    val res = check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("epochNs fails loudly at the boundary on an unsupported type") {
    import spark.implicits._
    val bad = Seq(1.5).toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.epochNs(bad, "ts"))
    assert(e.getMessage.contains("ts"))
    assert(e.getMessage.contains("DoubleType"))
  }
}
