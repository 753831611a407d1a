package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RobotsMatcher._

/** RFC 9309 matcher semantics, pinned against the RFC's own §2.2.2 /
  * §5.2 examples plus the tie and wildcard corner cases. */
class RobotsMatcherSpec extends AnyFunSuite {

  test("prefix matching anchors at the path start") {
    assert(matches("/", "/anything"))
    assert(matches("/fish", "/fish"))
    assert(matches("/fish", "/fish.html"))
    assert(matches("/fish", "/fishheads/yummy.html"))
    assert(!matches("/fish", "/Fish.asp")) // case-sensitive
    assert(!matches("/fish", "/catfish"))  // not mid-path
    assert(!matches("", "/x"))             // empty pattern = no rule
  }

  test("* matches any character sequence, including none") {
    assert(matches("/fish*", "/fish"))
    assert(matches("/fish*.php", "/fishheads/catfish.php"))
    assert(matches("/*.php", "/index.php"))
    assert(matches("/*.php", "/folder/filename.php?parameters"))
    assert(!matches("/*.php", "/"))
    assert(matches("/a*b*c", "/aXbYc-and-more"))
    assert(!matches("/a*b*c", "/acb")) // order matters
  }

  test("$ anchors the pattern at the path end") {
    assert(matches("/*.php$", "/filename.php"))
    assert(!matches("/*.php$", "/filename.php?parameters"))
    assert(!matches("/*.php$", "/filename.php5"))
    assert(matches("/fish$", "/fish"))
    assert(!matches("/fish$", "/fish.html"))
    assert(matches("/p*3$", "/p53"))
    assert(!matches("/p*3$", "/p53.tmp"))
    assert(matches("/a*$", "/anything")) // trailing *$ is vacuous
  }

  test("longest match wins; Allow wins length ties; no match allows") {
    val rules = Seq(
      (false, "/private/"),          // Disallow, len 9
      (true, "/private/pub/"))       // Allow, len 13
    assert(!allowed(rules, "/private/secret"))
    assert(allowed(rules, "/private/pub/data"))
    assert(allowed(rules, "/public/x")) // nothing matches
    // equal-length tie: Allow wins whatever the rule order
    assert(allowed(Seq((false, "/p"), (true, "/p")), "/page"))
    assert(allowed(Seq((true, "/p"), (false, "/p")), "/page"))
    // a LONGER Disallow still beats a shorter Allow
    assert(!allowed(Seq((true, "/p"), (false, "/priv")), "/private"))
  }
}
