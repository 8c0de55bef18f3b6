ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkextspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/verify contract wants the ONE JSON line as the LAST line of
// the run's output: sbt's default LoggedOutput prefixes forked stdout
// with "[info] " and then prints "[success] Total time: ..." AFTER the
// JSON, which has kept the driver's structured `parsed` field null for
// three rounds. StdoutOutput passes the forked process's stdout through
// raw (no prefix), and showSuccess drops the trailing success line, so
// `sbt -batch "runMain graft.Bench"` ends with the bare JSON line.
ThisBuild / showSuccess := false
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
// both keys are consumed at command time (runMain falls back to run's
// settings), which sbt's static lintUnused pass can't see
Global / excludeLintKeys ++= Set(showSuccess, Compile / runMain / outputStrategy)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---------------------------------------------------------------------------
// Lint gate (reference parity: scalastyle runs before tests there —
// reference project/TestSettings.scala:14-16). scalastyle itself can't
// resolve offline, so the file-level checks from the reference's
// scalastyle-config.xml are enforced directly: no tabs, no trailing
// whitespace, max line length 130 (imports exempt), newline at EOF, and
// no ??? stubs in src/main. Wired as a `test` dependency so `sbt test`
// fails on style violations, exactly like the reference build.
// ---------------------------------------------------------------------------
val lint = taskKey[Unit]("scalastyle-equivalent source checks")
lint := {
  val log = streams.value.log
  val files =
    ((Compile / scalaSource).value ** "*.scala").get ++
    ((Test / scalaSource).value ** "*.scala").get
  val errs = scala.collection.mutable.ArrayBuffer.empty[String]
  for (f <- files) {
    val text = IO.read(f)
    val rel = f.getPath.stripPrefix(baseDirectory.value.getPath + "/")
    if (!text.endsWith("\n")) errs += s"$rel: missing newline at EOF"
    val inMain = rel.startsWith("src/main/")
    text.split("\n", -1).zipWithIndex.foreach { case (line, i) =>
      val where = s"$rel:${i + 1}"
      if (line.contains("\t")) errs += s"$where: tab character"
      if (line != line.replaceAll("\\s+$", "")) errs += s"$where: trailing whitespace"
      if (line.length > 130 && !line.trim.startsWith("import "))
        errs += s"$where: line longer than 130 chars (${line.length})"
      val trimmed = line.trim
      val isComment = trimmed.startsWith("*") || trimmed.startsWith("/*") ||
        trimmed.startsWith("//")
      if (inMain && !isComment && line.contains("???"))
        errs += s"$where: ??? stub in main source"
    }
  }
  if (errs.nonEmpty) {
    errs.foreach(e => log.error(e))
    sys.error(s"lint: ${errs.size} violation(s)")
  } else log.info(s"lint: ${files.size} files clean")
}
Test / test := (Test / test).dependsOn(lint).value
