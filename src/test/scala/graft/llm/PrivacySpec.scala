package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the PII redaction patterns on planted strings (the fixture corpus
  * contains no emails/phones/IPs, so the declared query can't exercise
  * them) and the k-anonymity suppression invariants.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("t").select(Privacy.scrub($"t")).as[String].collect().head

  test("scrub redacts emails, IPv4s, and phone runs") {
    assert(scrubOne("contact jane.doe+x@example.co.uk now") == "contact [EMAIL] now")
    assert(scrubOne("host 192.168.001.1 up") == "host [IP] up")
    assert(scrubOne("call +1 (415) 555-0199 today") == "call [PHONE] today")
    assert(scrubOne("a@b.io or 10.0.0.1 or 555-867-5309") == "[EMAIL] or [IP] or [PHONE]")
  }

  test("scrub order: email digits and IP octets are not half-eaten as phones") {
    // an email whose local part is digit-heavy, then an IP — phone pass
    // must not fire inside either replacement
    assert(scrubOne("4155550199@sms.example.com") == "[EMAIL]")
    assert(scrubOne("ip=127.000.000.001;") == "ip=[IP];")
  }

  test("scrub leaves clean text untouched") {
    val s = "the quick brown fox jumped over 42 lazy dogs"
    assert(scrubOne(s) == s)
  }

  test("maskAccounts masks long digit runs only") {
    val got = Seq("Customer#000000042 owes 12 dollars").toDF("t")
      .select(Privacy.maskAccounts($"t")).as[String].collect().head
    assert(got == "Customer#[ACCT] owes 12 dollars")
  }

  test("kAnon releases no group below K and reconciles totals") {
    val dir = "/root/testdata/sf0.001"
    val rows = Privacy.kAnon(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    val (supp, released) = rows.partition(_._2 == "__suppressed__")
    assert(released.forall(_._3 >= Privacy.K))
    assert(supp.size <= 1)
    val total = graft.io.Tables.customer(spark, dir).count()
    assert(rows.map(_._3).sum == total)
  }
}
