package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

class ScrubSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(texts: String*): Seq[(String, Int, Int, Int)] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), Scrub.scrub(col("text")).as("s"),
        Scrub.emailCount(col("text")).as("e"),
        Scrub.phoneCount(col("text")).as("p"),
        Scrub.ipCount(col("text")).as("ip"))
      .orderBy("id")
      .collect().toSeq
      .map(r => (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))

  test("emails, phones, and IPv4s are redacted; clean text passes through") {
    val got = run(
      "contact jane.doe+spam@example.co.uk for details",
      "call +1 555-867-5309 or 555.123.4567 today",
      "server at 192.168.1.100 responded",
      "nothing sensitive here at all")
    assert(got(0) == ("contact <EMAIL> for details", 1, 0, 0))
    assert(got(1) == ("call +1 <PHONE> or <PHONE> today", 0, 2, 0))
    assert(got(2) == ("server at <IP> responded", 0, 0, 1))
    assert(got(3) == ("nothing sensitive here at all", 0, 0, 0))
  }

  test("redaction order shields email/IP digit runs from the phone pass") {
    // digits in an IP must not be double-redacted as a phone
    val got = run("ip 111.222.333.444 and mail a@b.io")
    assert(got(0)._1 == "ip <IP> and mail <EMAIL>")
  }

  test("mixed document counts every class") {
    val got = run("a@b.co then 10.0.0.1 then 555-867-5309 then c@d.org")
    assert(got(0) == ("<EMAIL> then <IP> then <PHONE> then <EMAIL>", 2, 1, 1))
  }
}
