package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("detects and redacts emails, phones, IPv4s; leaves clean text alone") {
    val rows = Seq(
      (1L, "mail me at jane.doe+spam@sub.example.co.uk today"),
      (2L, "call 555-123-4567 or 555-1234-0000 now"),
      (3L, "server at 192.168.0.1 responded"),
      (4L, "nothing sensitive here at all"),
      (5L, "jane@x.org and 10.0.0.1 and 555-000-1111 together")
    ).toDF("id", "t")
    val out = rows.select($"id",
        Redact.emailCount($"t").as("e"), Redact.phoneCount($"t").as("p"),
        Redact.ipv4Count($"t").as("i"), Redact.redact($"t").as("r"))
      .orderBy($"id").collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1, 0, 0), (0, 2, 0), (0, 0, 1), (0, 0, 0), (1, 1, 1)))
    assert(out(0).getString(4) == "mail me at [PII] today")
    assert(out(1).getString(4) == "call [PII] or [PII] now")
    assert(out(4).getString(4) == "[PII] and [PII] and [PII] together")
    assert(out(3).getString(4) == "nothing sensitive here at all")
    // redacted text carries no residual matches
    val residual = rows.select(Redact.redact($"t").as("r"))
      .select(Redact.emailCount($"r") + Redact.phoneCount($"r") + Redact.ipv4Count($"r"))
      .as[Int].collect()
    assert(residual.forall(_ == 0))
  }
}
