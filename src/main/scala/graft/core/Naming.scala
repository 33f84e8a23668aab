package graft.core

/** Versioned-naming state machine.
  *
  * Time series are globally addressed as `"{signal}#{sv}_{SERIES}#{tv}"`
  * (e.g. `CODs#1_RAW#1`): exactly one `_` separates the signal part from the
  * series part, `#N` counters are auto-assigned and auto-incremented so
  * re-running a step never overwrites.
  * Ref: /root/reference/src/meteaudata/types.py:608-676 (signal-level),
  * types.py:1233-1260 (dataset-level), CHANGELOG.md:20-26. We implement the
  * *intended* semantics pinned by tests/test_metEAUdata.py:252-321, not the
  * reference's string-`max` quirk (types.py:646-658; SURVEY.md §7.4 item 3).
  */
object Naming {

  /** Split a fully-qualified series key on its single `_`.
    * Ref: types.py:662, types.py:1393-1396. Signal/series names must not
    * contain `_` (suffixes use `-`, reference README.md:203). */
  def splitKey(key: String): (String, String) = {
    val i = key.indexOf('_')
    require(i >= 0, s"series key '$key' has no '_' separator")
    require(key.indexOf('_', i + 1) < 0,
      s"series key '$key' has more than one '_'")
    (key.substring(0, i), key.substring(i + 1))
  }

  /** Split `name#N` into (base, Some(N)); `name` into (name, None). */
  def baseAndVersion(part: String): (String, Option[Int]) = {
    val i = part.lastIndexOf('#')
    if (i < 0) (part, None)
    else {
      val num = part.substring(i + 1)
      if (num.nonEmpty && num.forall(_.isDigit))
        (part.substring(0, i), Some(num.toInt))
      else (part, None)
    }
  }

  /** `name` or `name#k` -> `name#N` where N = max existing version of
    * `name` + 1 (1 if none exist). Ref: types.py:660-676
    * (`update_numbered_ts_name`/`max_ts_name_number`) and types.py:1233-1260
    * (dataset-level twin). `existing` are sibling parts at the same level
    * (series parts within a signal, or signal names within a dataset). */
  def nextVersioned(existing: Iterable[String], candidate: String): String = {
    val (base, _) = baseAndVersion(candidate)
    val maxN = existing.iterator
      .map(baseAndVersion)
      .collect { case (`base`, v) => v.getOrElse(1) }
      .maxOption
      .getOrElse(0)
    s"$base#${maxN + 1}"
  }

  /** Normalize an unnumbered part to `#1`, keep numbered parts as-is.
    * Ref: tests/test_metEAUdata.py:252-321 — unnumbered inputs get `#1`,
    * numbered are preserved. */
  def ensureNumbered(part: String): String =
    baseAndVersion(part) match {
      case (base, None)    => s"$base#1"
      case (_, Some(_)) => part
    }

  /** Name for a new derived series: keep the (versioned) signal part,
    * replace the series part with `suffix` (version assigned separately).
    * Ref: types.py:608-620 (`new_ts_name`). */
  def newSeriesName(signalPart: String, suffix: String): String =
    s"${ensureNumbered(signalPart)}_$suffix"
}
