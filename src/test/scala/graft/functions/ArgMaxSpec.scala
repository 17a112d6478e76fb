package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class ArgMaxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(sql: String): Any = {
    ArgMax.register(spark)
    spark.sql(sql).collect()(0).get(0)
  }

  test("basic argmax over double array") {
    assert(run("SELECT argmax(array(1.0D, 3.0D, 2.0D))") == 1)
  }

  test("first-max-wins on ties (reference argmax.rs semantics)") {
    assert(run("SELECT argmax(array(5.0D, 1.0D, 5.0D))") == 0)
    assert(run("SELECT argmax(array(1, 7, 7, 2))") == 1)
  }

  test("NaN never wins") {
    assert(run("SELECT argmax(array(double('NaN'), 1.0D, 0.5D))") == 1)
    assert(run("SELECT argmax(array(double('NaN')))") == null)
  }

  test("negative values and -Infinity handled") {
    assert(run("SELECT argmax(array(-5.0D, -2.0D, -9.0D))") == 1)
    assert(run("SELECT argmax(array(double('-Infinity'), -1e300D))") == 1)
  }

  test("empty array and null input yield null") {
    assert(run("SELECT argmax(cast(array() AS array<double>))") == null)
    assert(run("SELECT argmax(cast(null AS array<double>))") == null)
  }

  test("int/long/float element types") {
    assert(run("SELECT argmax(array(1, 9, 3))") == 1)
    assert(run("SELECT argmax(array(1L, 2L, 99999999999L))") == 2)
    assert(run("SELECT argmax(array(float(0.5), float(2.5), float(1.0)))") == 1)
  }

  test("property: argmax == indexOf(max) on seeded random lists") {
    ArgMax.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val data = (0 until 300).map { _ =>
      Tuple1(List.fill(1 + rnd.nextInt(12))(rnd.nextDouble() * 2e6 - 1e6))
    }
    val rows = data.toDF("a").selectExpr("a", "argmax(a) AS am").collect()
    rows.foreach { case Row(a: scala.collection.Seq[_], am: Int) =>
      val xs = a.map(_.asInstanceOf[Double]).toList
      assert(am == xs.indexOf(xs.max))
    }
  }

  test("distributed: argmax over a repartitioned column matches per-row scala") {
    ArgMax.register(spark)
    import spark.implicits._
    val data = (0 until 1000).map(i => Tuple1(Seq(i % 7.0, (i % 3).toDouble, (i % 11).toDouble)))
    val rows = data.toDF("a").repartition(4).selectExpr("a", "argmax(a) AS am").collect()
    rows.foreach { case Row(a: scala.collection.Seq[_], am: Int) =>
      val xs = a.map(_.asInstanceOf[Double])
      assert(am == xs.indexOf(xs.max))
    }
  }
}
