package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** B38: dbt-style graph selectors — pure DAG resolution. */
class SelectorSpec extends AnyFunSuite {

  //   a -> b -> c
  //        b -> d     e (isolated)
  private def graph(): DependencyGraph = {
    val g = new DependencyGraph
    g.addModel("a", Set.empty)
    g.addModel("b", Set("a"))
    g.addModel("c", Set("b"))
    g.addModel("d", Set("b"))
    g.addModel("e", Set.empty)
    g
  }
  private val tagFn: String => Seq[String] =
    t => if (t == "x") Seq("c", "e") else Nil

  test("plain name selects just the model") {
    assert(Selector.resolve(graph(), tagFn, Seq("b")) == Seq("b"))
  }

  test("model+ adds the downstream closure") {
    assert(Selector.resolve(graph(), tagFn, Seq("b+")) == Seq("b", "c", "d"))
  }

  test("+model adds the upstream closure") {
    assert(Selector.resolve(graph(), tagFn, Seq("+c")) == Seq("a", "b", "c"))
  }

  test("+model+ adds both closures") {
    assert(Selector.resolve(graph(), tagFn, Seq("+b+")) ==
      Seq("a", "b", "c", "d"))
  }

  test("tag: atom and unions across comma/space-separated atoms") {
    assert(Selector.resolve(graph(), tagFn, Seq("tag:x")) == Seq("c", "e"))
    assert(Selector.resolve(graph(), tagFn, Seq("a,tag:x")) ==
      Seq("a", "c", "e"))
    assert(Selector.resolve(graph(), tagFn, Seq("a e")) == Seq("a", "e"))
    // unknown tag selects nothing (tags are open-world, unlike models)
    assert(Selector.resolve(graph(), tagFn, Seq("tag:nope")) == Nil)
  }

  test("closure operators compose with tag:/state: atoms, never swallowed") {
    // tag:x = {c, e}; + applies the closure to the TAGGED SET — before
    // the fix, "tag:x+" looked up the literal open-world tag "x+" and
    // silently selected nothing (the CI inversion model names fail
    // loudly on).
    assert(Selector.resolve(graph(), tagFn, Seq("tag:x+")) == Seq("c", "e"))
    assert(Selector.resolve(graph(), tagFn, Seq("+tag:x")) ==
      Seq("a", "b", "c", "e"))
    val mod = () => Seq("c")
    assert(Selector.resolve(graph(), tagFn, Seq("+state:modified"), mod) ==
      Seq("a", "b", "c"))
  }

  test("state:modified picks the planner's changed set, + adds dependents") {
    val mod = () => Seq("b")
    assert(Selector.resolve(graph(), tagFn, Seq("state:modified"), mod) ==
      Seq("b"))
    assert(Selector.resolve(graph(), tagFn, Seq("state:modified+"), mod) ==
      Seq("b", "c", "d"))
    // unions with other atoms
    assert(Selector.resolve(graph(), tagFn, Seq("e state:modified"), mod) ==
      Seq("b", "e"))
    // unknown state selectors are loud
    intercept[DependencyError] {
      Selector.resolve(graph(), tagFn, Seq("state:bogus"), mod)
    }
  }

  test("unknown model and malformed atoms are loud DependencyErrors") {
    intercept[DependencyError] {
      Selector.resolve(graph(), tagFn, Seq("nope+"))
    }
    intercept[DependencyError] {
      Selector.resolve(graph(), tagFn, Seq("a+b"))
    }
    intercept[DependencyError] {
      Selector.resolve(graph(), tagFn, Seq("+"))
    }
  }
}
