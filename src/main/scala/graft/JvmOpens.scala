package graft

/** JDK17 `--add-opens` set Spark executors need when launched outside
  * spark-submit (matches launcher JavaModuleOptions) — shared by every
  * entrypoint that spawns local-cluster executor JVMs, so the list can't
  * drift between them. */
object JvmOpens {
  val forExecutors: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
    "java.security.jgss/sun.security.krb5")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
}
