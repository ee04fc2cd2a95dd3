package graft

import org.apache.spark.sql.functions._

import graft.text.Redact

/** Pins [[graft.text.Redact]] behavior on text that actually contains
  * PII — the fixture corpus has none, so the oracle query only checks
  * the zero case; the real masking semantics live here.
  */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): (String, Int, Int, Int) = {
    val t1 = regexp_replace(col("t"), Redact.EmailRe, "<email>")
    val t2 = regexp_replace(t1, Redact.Ipv4Re, "<ip>")
    val row = Seq(s).toDF("t")
      .select(
        Redact.redact(col("t")).as("r"),
        Redact.nEmails(col("t")).as("ne"),
        Redact.nIpv4(t1).as("ni"),
        Redact.nPhones(t2).as("np"))
      .head()
    (row.getString(0), row.getInt(1), row.getInt(2), row.getInt(3))
  }

  test("emails, IPs and phones are masked with counts") {
    val (r, ne, ni, np) = redactOne(
      "mail alice.smith+x@example.co.uk or 10.0.0.1, call 555-123-4567.")
    assert(r === "mail <email> or <ip>, call <phone>.")
    assert((ne, ni, np) === (1, 1, 1))
  }

  test("an IPv4 inside an email host is masked as part of the email") {
    val (r, ne, ni, np) = redactOne("x@10.0.0.1.example.com and 192.168.1.1")
    assert(r === "<email> and <ip>")
    assert((ne, ni, np) === (1, 1, 0))
  }

  test("multiple hits per category all redact") {
    val (r, ne, ni, np) = redactOne("a@b.io c@d.io 1.2.3.4 5.6.7.8 555 123 4567 555.123.4567")
    assert(r === "<email> <email> <ip> <ip> <phone> <phone>")
    assert((ne, ni, np) === (2, 2, 2))
  }

  test("clean text is untouched") {
    val (r, ne, ni, np) = redactOne("no pii here, just words and 42 numbers")
    assert(r === "no pii here, just words and 42 numbers")
    assert((ne, ni, np) === (0, 0, 0))
  }
}
