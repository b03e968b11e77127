package graft.text

import graft.SparkSpec

class RobotsSpec extends SparkSpec {

  test("rule matching: prefix, * wildcard, $ anchor (RFC 9309 shapes)") {
    assert(Robots.ruleMatches("/private/", "/private/x"))
    assert(!Robots.ruleMatches("/private/", "/priv"))
    assert(Robots.ruleMatches("/*.php", "/index.php"))
    assert(Robots.ruleMatches("/*.php", "/a/b.php.html"), "prefix after *")
    assert(Robots.ruleMatches("/*.php$", "/a/b.php"))
    assert(!Robots.ruleMatches("/*.php$", "/a/b.php5"), "$ anchors the end")
    assert(Robots.ruleMatches("/fish*.php", "/fishheads/catfish.php?x=1"))
    assert(Robots.ruleMatches("/", "/anything"))
    assert(!Robots.ruleMatches("/x$", "/x/y"))
    assert(Robots.ruleMatches("/x$", "/x"))
  }

  test("longest pattern wins; Allow wins exact length ties") {
    val txt = "User-agent: *\nDisallow: /page\nAllow: /page/open\n"
    assert(!Robots.isAllowed(txt, "bot", "/page"))
    assert(Robots.isAllowed(txt, "bot", "/page/open/x"),
      "the longer Allow overrides the shorter Disallow")
    val tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"
    assert(Robots.isAllowed(tie, "bot", "/dir/a"), "Allow wins length ties")
  }

  test("agent groups: longest token wins, same-token groups merge, * is the fallback") {
    val txt =
      """User-agent: googlebot
        |Disallow: /g/
        |
        |User-agent: googlebot-news
        |Disallow: /news-only/
        |
        |User-agent: *
        |Disallow: /
        |
        |User-agent: googlebot
        |Disallow: /g2/
        |""".stripMargin
    // the news crawler picks ONLY its most-specific group
    assert(!Robots.isAllowed(txt, "Googlebot-News/1.0", "/news-only/a"))
    assert(Robots.isAllowed(txt, "Googlebot-News/1.0", "/g/x"),
      "a more-specific group suppresses the shorter token's rules")
    // plain googlebot merges BOTH googlebot groups
    assert(!Robots.isAllowed(txt, "Googlebot/2.1", "/g/x"))
    assert(!Robots.isAllowed(txt, "Googlebot/2.1", "/g2/x"))
    assert(Robots.isAllowed(txt, "Googlebot/2.1", "/anything-else"))
    // unknown crawlers fall back to * (deny-all here)
    assert(!Robots.isAllowed(txt, "OtherBot", "/whatever"))
  }

  test("empty Disallow is a no-op; comments strip; fields match case-insensitively") {
    val txt = "# site rules\nUSER-AGENT: *  # everyone\nDISALLOW:\n"
    assert(Robots.isAllowed(txt, "bot", "/anything"),
      "the classic allow-all idiom")
    assert(Robots.isAllowed("", "bot", "/x"), "no rules -> allowed")
    assert(Robots.isAllowed(null, "bot", "/x"))
  }

  test("batched decisions match the per-row evaluator") {
    val s = spark
    import s.implicits._
    val txt = "User-agent: *\nDisallow: /private/\n"
    val rows = Seq(
      (1L, txt, "bot", "/private/a"),
      (2L, txt, "bot", "/public/a"))
      .toDF("doc_id", "robots", "agent", "path")
    val out = Robots.decisions(rows, "doc_id", "robots", "agent", "path")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L))
  }
}
