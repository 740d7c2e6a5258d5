package graft

import scala.sys.process.{Process, ProcessLogger}

/** Shared subprocess scaffolding for the rehearsal specs (RetryRehearsal,
  * SpillRehearsal, their streaming twins, CompactCrashRehearsal). One place
  * owns the JDK-17 `--add-opens` list (mirrors build.sbt's javaOptions for
  * Spark 4 outside spark-submit) and the output pump, so a future JDK
  * module change is a one-file fix instead of a three-spec drift hazard.
  */
object RehearsalSpawn {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Run `mainClass` in a fresh JVM with this JVM's java binary and
    * classpath; returns (exitCode, interleaved stdout+stderr lines).
    * The sink is thread-safe on purpose: ProcessLogger pumps stdout and
    * stderr on two threads, and a lost append can drop a *JSON evidence
    * line flakily.
    */
  def run(mainClass: String, heap: String, args: String*): (Int, Seq[String]) = {
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      heap, "-XX:+UseG1GC", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"), mainClass) ++ args
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val exit = Process(cmd).!(ProcessLogger(out.add(_), out.add(_)))
    import scala.jdk.CollectionConverters._
    (exit, out.asScala.toSeq)
  }
}
