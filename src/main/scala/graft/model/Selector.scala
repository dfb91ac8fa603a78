package graft.model

/** dbt-style node selection over the model DAG (dbt "graph operators";
  * beyond the reference CLI, which takes only plain model names —
  * cli.py:45-50 `nargs=-1`). A selector is a comma- or space-separated
  * list of atoms, unioned:
  *
  *   - `model`    the model itself
  *   - `model+`   the model and everything downstream of it
  *                ("rebuild what my change affects")
  *   - `+model`   the model and everything upstream of it (note the
  *                runner already materializes upstreams of any target,
  *                so this mostly documents intent)
  *   - `+model+`  both closures
  *   - `tag:x`    every model carrying tag x
  *   - `state:modified` — models whose SQL or config hash differs from
  *                the recorded state (the Planner's Create/Update set):
  *                dbt's CI workhorse, "run only what this change
  *                touches"
  *
  * The `+` closure operators compose with EVERY atom form — `tag:x+`
  * is "the tagged models and everything downstream", `+state:modified`
  * "the changed models and their upstreams" — parsed BEFORE method
  * dispatch, so an operator can never be swallowed into a tag/state
  * name and silently select nothing (tags are open-world: the literal
  * tag "x+" would resolve to an empty set and "succeed" by running
  * nothing — the CI inversion the model-name branch fails loudly on).
  *
  * Resolution is pure driver-side graph walking (the DAG is model-count
  * sized — thousands at most, never data-sized). Unknown model names
  * are a loud [[DependencyError]] — a typo'd selector silently matching
  * nothing would "succeed" by running nothing.
  */
object Selector {

  /** Resolve selector atoms to the union of selected model names,
    * sorted for deterministic run listings. `tagged` maps a tag to its
    * models (supply [[ModelRunner.modelsByTag]]); `modified` supplies
    * the Planner's changed-model set, called at most once and only if a
    * `state:` atom appears (the state lookup costs a store read). */
  def resolve(
      graph: DependencyGraph, tagged: String => Seq[String],
      atoms: Seq[String],
      modified: () => Seq[String] = () => Seq.empty): Seq[String] = {
    val known = graph.models.toSet
    lazy val changed = modified()
    val picked = atoms.flatMap(_.split("[,\\s]+")).filter(_.nonEmpty).flatMap {
      atom =>
        // Operators first, dispatch second: a trailing/leading `+` left
        // inside a tag:/state: lookup would select nothing, silently.
        val down = atom.endsWith("+")
        val up = atom.startsWith("+")
        val core = atom.stripPrefix("+").stripSuffix("+")
        if (core.isEmpty || core.contains("+"))
          throw new DependencyError(
            s"malformed selector atom '$atom'", Map("atom" -> atom))
        val base: Seq[String] =
          if (core == "state:modified") changed
          else if (core.startsWith("state:"))
            throw new DependencyError(
              s"unknown state selector '$atom' (supported: [+]state:modified[+])",
              Map("atom" -> atom))
          else if (core.startsWith("tag:")) tagged(core.stripPrefix("tag:"))
          else if (!known.contains(core))
            throw new DependencyError(
              s"selector names unknown model '$core'",
              Map("atom" -> atom, "model" -> core))
          else Seq(core)
        base ++
          (if (down) base.flatMap(graph.allDependents) else Nil) ++
          (if (up) base.flatMap(graph.allDependencies) else Nil)
    }
    picked.distinct.sorted
  }
}
