package graft

/** Shared argument handling for the runnable mains (CurationRun,
  * PipelineRun): ONE implementation of --help precedence,
  * unknown/malformed-flag rejection and the single optional <sfDir>
  * positional, so the entry points cannot drift apart (they briefly
  * did: different help precedence and two spellings of the same
  * error). Validation runs before any Spark work. */
private[graft] object Cli {

  /** Validates args and resolves the sfDir positional.
    * Returns None after printing usage when --help is present (callers
    * return immediately); throws IllegalArgumentException with the
    * usage text on unknown/malformed flags or extra positionals.
    * `boolFlags` match as exact `--name`; `valueFlags` require
    * `--name=value` — a value flag typed without '=' must abort, never
    * silently drop the gate and misparse its value as sfDir. */
  def sfDirOf(args: Array[String], usage: String,
      boolFlags: Set[String] = Set.empty,
      valueFlags: Set[String] = Set.empty): Option[String] = {
    // --help wins over every validation error: a user asking for help
    // from a botched invocation gets the usage text, not the complaint
    if (args.contains("--help")) { println(usage); return None }
    val bad = args.filter(_.startsWith("--")).filterNot(a =>
      boolFlags.contains(a.drop(2)) ||
        valueFlags.exists(n => a.startsWith(s"--$n=")))
    require(bad.isEmpty,
      s"unknown or malformed flags: ${bad.mkString(", ")}\n$usage")
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.length <= 1,
      s"at most one positional <sfDir> allowed, got: ${positional.mkString(", ")}\n$usage")
    Some(positional.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")))
  }

  /** The value of `--name=value`, if present. */
  def value(args: Array[String], name: String): Option[String] =
    args.collectFirst { case a if a.startsWith(s"--$name=") =>
      a.drop(name.length + 3) }
}
