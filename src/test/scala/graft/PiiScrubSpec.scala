package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class PiiScrubSpec extends AnyFunSuite {
  import TestSpark._

  test("scrubPii redacts emails, phone-like runs and IPs; clean text unchanged") {
    import spark.implicits._
    val rows = Seq(
      ("mail me at jane.doe+spam@example.co.uk today", "mail me at <EMAIL> today"),
      ("call +1 (555) 123-4567 now", "call +<NUMBER> now"),
      ("server at 192.168.0.1 responded", "server at <IP> responded"),
      ("a perfectly clean sentence", "a perfectly clean sentence"),
      ("short num 123 stays", "short num 123 stays"))
      .toDF("text", "expected")
    val got = rows.select(TextFunctions.scrubPii($"text").as("got"), $"expected")
    assert(got.filter($"got" =!= $"expected").count() === 0,
      got.collect().mkString("\n"))
  }

  test("piiCount counts redactable spans") {
    import spark.implicits._
    val df = Seq(
      ("a@b.com and 192.168.0.1 and 555-123-4567", 3),
      ("nothing here", 0)).toDF("text", "n")
    assert(df.filter(TextFunctions.piiCount($"text") =!= $"n").count() === 0)
  }
}
