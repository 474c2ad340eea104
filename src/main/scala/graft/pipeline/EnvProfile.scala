package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Environment config profiles — ref src/utils/config.py:7-26 and
  * config/{dev,test,prod}.env. Selection mirrors the reference exactly:
  * explicit env argument wins, else the `ENV` variable, else "dev"; a
  * missing profile file falls back to `dev.env`. File format: KEY=VALUE
  * lines; blank lines and #-comments ignored; keys case-sensitive. */
object EnvProfile {

  def parse(file: Path): Map[String, String] =
    Files.readAllLines(file).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i).trim -> l.substring(i + 1).trim
      }.toMap

  /** Profile path for `env` under `confDir` — ref config.py:12-18
    * (ENV var default "dev", dev.env fallback for unknown names). */
  def resolve(confDir: String, env: Option[String],
      sysEnv: Map[String, String] = sys.env): Path = {
    val name = env.orElse(sysEnv.get("ENV")).getOrElse("dev").toLowerCase
    val p = Paths.get(confDir, s"$name.env")
    if (Files.exists(p)) p else Paths.get(confDir, "dev.env")
  }

  def load(confDir: String, env: Option[String]): Map[String, String] =
    parse(resolve(confDir, env))
}
