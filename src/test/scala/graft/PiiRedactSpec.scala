package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** redactPii/piiCount edge cases the oracle key's synthesized corpus
  * doesn't isolate: multiple hits per family, family ordering (an email's
  * digits+dots must not half-match IP/phone after partial redaction),
  * and clean-text passthrough. */
class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): (String, Long) = {
    val r = Seq(s).toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("r"),
        TextAnalysis.piiCount(col("t")).as("n"))
      .head()
    (r.getString(0), r.getLong(1))
  }

  test("each family redacts, all occurrences") {
    assert(redact("mail a.b+tag@sub.example.org and c@d.io here") ==
      ("mail <EMAIL> and <EMAIL> here", 2L))
    assert(redact("from 10.0.0.1 to 192.168.255.7") ==
      ("from <IP> to <IP>", 2L))
    assert(redact("call +1-555-0100 or 20 794 6095 plain") ==
      ("call <PHONE> or <PHONE> plain", 2L))
  }

  test("ordering: email digits/dots never half-match IP or phone") {
    assert(redact("u123.456@h7.co")._1 == "<EMAIL>")
    // IP redacted before phone looks: digit runs inside the IP are gone
    assert(redact("1.2.3.4")._1 == "<IP>")
    // an email containing an IP-shaped substring counts ONCE — piiCount
    // mirrors the sequential redaction, not raw-text family overlap
    assert(redact("a@10.2.3.4.example.com") == ("<EMAIL>", 1L))
  }

  test("clean text passes through unchanged") {
    assert(redact("no pii here, just words and 12345 numbers") ==
      ("no pii here, just words and 12345 numbers", 0L))
  }
}
