package graft.llm

import graft.SparkSpec

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): String =
    Seq(text).toDF("text").select(c.as("r")).as[String].head()

  test("stripHtml removes tags and collapses whitespace") {
    val got = one("<html><p>Hello   <b>world</b></p>\n<br/>bye</html>",
      TextClean.stripHtml($"text"))
    assert(got == "Hello world bye")
  }

  test("canonicalize lowercases and collapses runs for stable dedup keys") {
    val a = one("  The   Quick\tBrown\nFox ", TextClean.canonicalize($"text"))
    val b = one("the quick brown fox", TextClean.canonicalize($"text"))
    assert(a == b && a == "the quick brown fox")
  }

  test("redactPii replaces emails, cards, IPs, phones with typed tokens") {
    val got = one(
      "mail a.user+x@example.co.uk or call +1 555-123-4567; " +
        "server 192.168.0.1 card 4111 1111 1111 1111 end",
      TextClean.redactPii($"text"))
    assert(got == "mail <EMAIL> or call <PHONE>; server <IP> card <CARD> end")
  }

  test("card redaction wins over phone on separated PANs (pinned order)") {
    val got = one("pan 4111-1111-1111-1111 only", TextClean.redactPii($"text"))
    assert(got == "pan <CARD> only")
  }

  test("plain prose passes through redaction unchanged") {
    val s = "the quick brown fox jumps over 12 lazy dogs"
    assert(one(s, TextClean.redactPii($"text")) == s)
  }

  test("digit runs inside alphanumeric tokens are NOT phone-redacted") {
    val s = "order X9123456789 shipped"
    assert(one(s, TextClean.redactPii($"text")) == s)
  }
}
