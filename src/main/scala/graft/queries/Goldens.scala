package graft.queries

/** Single definition of where the committed golden fixtures live, shared
  * by the oracle-SQL builders (q14/q27 read them through DuckDB) and
  * [[graft.tools.MakeGoldens]] (which writes them) — the two halves can
  * never disagree about the location, and nothing hardcodes a checkout
  * path: the root comes from `-Dgraft.repo.dir`, else the JVM working
  * directory (sbt sets it to the checkout root for every entry point the
  * driver runs).
  */
object Goldens {

  def repoDir: String =
    sys.props.get("graft.repo.dir").getOrElse(sys.props("user.dir"))

  /** Absolute path of one committed golden parquet directory. */
  def path(name: String): String =
    s"$repoDir/src/test/resources/golden/$name"
}
