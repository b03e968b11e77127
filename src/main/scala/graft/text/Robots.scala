package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt evaluation (the Robots Exclusion Protocol, RFC 9309) —
  * the crawl-frontier politeness gate: before a URL may be fetched at
  * all, its host's robots rules decide. A 100 TB crawl applies this
  * per (host, agent, path) at frontier scale, so the evaluator is a
  * narrow per-row function (no shuffles).
  *
  * Frozen semantics (RFC 9309, with the convention choices pinned by
  * RobotsSpec hand vectors):
  *  - groups: one or more `User-agent:` lines followed by
  *    Allow/Disallow rules; `#` comments strip; field names match
  *    case-insensitively;
  *  - agent selection: among non-`*` group tokens, the LONGEST token
  *    that prefixes the crawler's (lowercased) product token wins; all
  *    groups carrying exactly that token merge; the `*` groups apply
  *    only when no specific token matches;
  *  - rule matching: byte-wise path prefix with `*` wildcards and a
  *    trailing `$` end anchor; the decision is the rule with the
  *    LONGEST pattern among matches, Allow winning length ties;
  *  - an empty-pattern Disallow is a no-op (the classic allow-all
  *    idiom); no matching rule means allowed. */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Parsed groups: (lowercased agent tokens, rules in file order). */
  private[text] def parseGroups(txt: String): Seq[(Seq[String], Seq[Rule])] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Rule])]
    var inAgents = false // consecutive User-agent lines share one group
    for (raw <- Option(txt).getOrElse("").split('\n')) {
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[Rule]))
              inAgents = true
            }
            groups.last._1 += value.toLowerCase
          case "allow" | "disallow" =>
            inAgents = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(field == "allow", value)
            // an empty-pattern rule is a no-op by the frozen convention
          case _ => inAgents = false // crawl-delay, sitemap, unknown
        }
      }
    }
    groups.map { case (a, r) => (a.toSeq, r.toSeq) }.toSeq
  }

  /** Glob match: `*` spans anything; a trailing `$` anchors the end;
    * otherwise the pattern is a prefix. Iterative with single-star
    * backtracking (patterns are paths, never adversarial regexes). */
  private[text] def ruleMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0
    var si = 0
    var starP = -1
    var starS = -1
    while (si < path.length) {
      if (pi < p.length && p.charAt(pi) == '*') {
        starP = pi; starS = si; pi += 1
      } else if (pi < p.length && p.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (starP >= 0) {
        starS += 1; si = starS; pi = starP + 1
      } else {
        return false
      }
      if (pi == p.length && !anchored) return true // prefix satisfied
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length // anchored (or pattern longer than path)
  }

  /** The access decision for (robots text, crawler agent, path). */
  def isAllowed(txt: String, agent: String, path: String): Boolean = {
    val groups = parseGroups(txt)
    val a = Option(agent).getOrElse("").toLowerCase
    val specific = groups.flatMap { case (agents, rules) =>
      agents.filter(t => t != "*" && a.startsWith(t)).map(t => (t, rules))
    }
    val rules: Seq[Rule] =
      if (specific.nonEmpty) {
        val best = specific.map(_._1.length).max
        specific.collect { case (t, rs) if t.length == best => rs }.flatten
      } else groups.collect { case (agents, rs) if agents.contains("*") => rs }
        .flatten
    val matches = rules.filter(r => ruleMatches(r.pattern, path))
    if (matches.isEmpty) true
    else {
      // longest pattern wins; Allow wins length ties
      val best = matches.map(_.pattern.length).max
      matches.filter(_.pattern.length == best).exists(_.allow)
    }
  }

  final case class RobotsDecision(doc_id: Long, agent: String, path: String,
      allowed: Long)

  /** Batched frontier decisions — the media-decoder plan shape: a
    * per-row narrow map over (id, robots, agent, path), no shuffle. */
  def decisions(df: DataFrame, idCol: String, robotsCol: String,
      agentCol: String, pathCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(robotsCol), col(agentCol),
        col(pathCol))
      .as[(Long, String, String, String)]
      .mapPartitions(_.map { case (id, txt, agent, path) =>
        RobotsDecision(id, agent, path,
          if (isAllowed(txt, agent, path)) 1L else 0L)
      })
      .toDF()
  }
}
