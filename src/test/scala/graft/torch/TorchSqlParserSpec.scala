package graft.torch

import graft.SparkTestSession
import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** DDL surface of reference src/lib.rs:23-100 (CREATE FUNCTION ...
  * LANGUAGE TORCH), including the arg/return type defaulting rules. */
class TorchSqlParserSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("DDL parses with explicit types") {
    val cmd = TorchDdl.parse(
      "CREATE FUNCTION iris(FLOAT[]) RETURNS FLOAT[] LANGUAGE TORCH AS 'model/iris.spt'")
    assert(cmd.contains(CreateTorchFunctionCommand("iris", "model/iris.spt", FloatType, FloatType)))
  }

  test("missing RETURNS defaults to arg type; missing arg type defaults to FLOAT (lib.rs:41-49)") {
    assert(TorchDdl.parse("CREATE FUNCTION f(DOUBLE[]) LANGUAGE TORCH AS 'm.spt'")
      .contains(CreateTorchFunctionCommand("f", "m.spt", DoubleType, DoubleType)))
    assert(TorchDdl.parse("CREATE FUNCTION f() LANGUAGE TORCH AS 'm.spt'")
      .contains(CreateTorchFunctionCommand("f", "m.spt", FloatType, FloatType)))
  }

  test("case-insensitive, multiline, trailing semicolon") {
    val cmd = TorchDdl.parse(
      """create function My_Fn(double[])
        |returns float[]
        |language torch
        |as 'file:/tmp/m.spt';""".stripMargin)
    assert(cmd.contains(CreateTorchFunctionCommand("My_Fn", "file:/tmp/m.spt", DoubleType, FloatType)))
  }

  test("non-TORCH statements are not intercepted") {
    assert(TorchDdl.parse("SELECT 1").isEmpty)
    assert(TorchDdl.parse("CREATE FUNCTION f AS 'com.example.Udf'").isEmpty)
    assert(TorchDdl.parse("CREATE FUNCTION f(FLOAT[]) LANGUAGE PYTHON AS 'x'").isEmpty)
  }

  test("unsupported item type errors loudly") {
    intercept[IllegalArgumentException] {
      TorchDdl.parse("CREATE FUNCTION f(INT[]) LANGUAGE TORCH AS 'm.spt'")
    }
  }

  test("delegating parser: TORCH DDL -> command; everything else -> stock parser") {
    val p = new TorchSqlParser(spark.sessionState.sqlParser)
    val plan = p.parsePlan(
      "CREATE FUNCTION iris2(FLOAT[]) RETURNS FLOAT[] LANGUAGE TORCH AS '/root/reference/model/iris.spt'")
    assert(plan.isInstanceOf[CreateTorchFunctionCommand])
    assert(p.parsePlan("SELECT 1 AS x") != null) // falls through, no exception
  }

  test("end-to-end through the parser: DDL command registers a usable UDF") {
    graft.functions.ArgMax.register(spark)
    val p = new TorchSqlParser(spark.sessionState.sqlParser)
    val cmd = p.parsePlan(
      "CREATE FUNCTION iris_ddl(FLOAT[]) RETURNS FLOAT[] LANGUAGE TORCH AS '/root/reference/model/iris.spt'")
      .asInstanceOf[CreateTorchFunctionCommand]
    cmd.run(spark)
    spark.read.parquet("/root/reference/data/iris.snappy.parquet")
      .coalesce(1).createOrReplaceTempView("iris_ddl_t")
    val got = spark.sql(
      "SELECT argmax(iris_ddl(features)) AS p FROM iris_ddl_t LIMIT 15")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 1, 1))
  }

  test("extension class wires parser + argmax into a fresh session") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new TorchExtensions().apply(ext) // constructs without error
    succeed
  }
}
