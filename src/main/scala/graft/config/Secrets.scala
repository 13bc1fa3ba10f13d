package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Warehouse-credential injection — the S8 inventory row.
  *
  * The reference resolves `redshift_secret_id` through AWS Secrets
  * Manager and lets the returned SecretString JSON override any
  * explicitly-configured username/password
  * (`cdc_util/redshift_sink.py:101-110,621-645`). A local/portable
  * engine can't assume that service, so the same contract is kept with
  * pluggable schemes in the reference id's place:
  *
  *   - `env:NAME`    — the secret is the value of environment var NAME
  *   - `file:/path`  — the secret is the file's contents (k8s/Docker
  *                     mounted-secret convention)
  *   - `literal:...` — inline (tests only)
  *
  * The resolved SecretString uses the reference's dict shape
  * (`{"username": ..., "password": ..., "host": ..., "port": ...}`), and
  * — like the reference — whatever the secret provides WINS over the
  * explicit properties. Values never appear in toString/logs.
  */
object Secrets {

  /** JDBC credentials; toString is redacted so a config dump or log line
    * can never leak the password. */
  final case class Credentials(username: Option[String], password: Option[String],
                               host: Option[String], port: Option[Int],
                               database: Option[String] = None) {
    override def toString: String =
      s"Credentials(username=${username.map(_ => "***")}, password=${password.map(_ => "***")}, " +
        s"host=$host, port=$port, database=$database)"
    /** Explicit properties as the base, secret values on top (the
      * reference's precedence, redshift_sink.py:104-110). */
    def over(explicitUser: Option[String], explicitPassword: Option[String]): Credentials =
      copy(username = username.orElse(explicitUser),
        password = password.orElse(explicitPassword))

    /** Full-endpoint variant: the reference also configures
      * `redshift_host`/`redshift_port`/`redshift_database` explicitly
      * (cdc_redshift.py:80-90) and the secret overrides whichever parts
      * it carries. */
    def overEndpoint(explicitHost: Option[String], explicitPort: Option[Int],
                     explicitDatabase: Option[String]): Credentials =
      copy(host = host.orElse(explicitHost), port = port.orElse(explicitPort),
        database = database.orElse(explicitDatabase))

    /** Rewrite a `jdbc:engine://host[:port]...` URL's endpoint with the
      * secret's host and/or port — a rotated secret that moves the
      * warehouse must win over the configured URL, exactly like
      * username/password (the reference builds its whole endpoint from
      * the secret). A port-only secret rewrites just the port. The host
      * ends at the first `/`, `;` or `?` so driver suffixes
      * (`;databaseName=…`, `?useSSL=…`) survive, and a bracketed IPv6
      * authority is treated as one host token. URLs without an authority
      * (e.g. `jdbc:derby:memory:db`) and secrets without host/port pass
      * through unchanged. */
    def applyTo(url: String): String = {
      val auth =
        "^(jdbc:[a-zA-Z0-9]+://)(\\[[^\\]]+\\]|[^/:;?]+)(?::(\\d+))?((?:[/;?].*)?)$".r
      if (host.isEmpty && port.isEmpty && database.isEmpty) url
      else url match {
        case auth(prefix, oldHost, oldPort, rest) =>
          val h = host.getOrElse(oldHost)
          val p = port.map(_.toString).orElse(Option(oldPort))
          // The reference builds its endpoint's database from the secret
          // too (redshift_sink.py:106-115): swap the first path segment,
          // preserving any ?query / ;attr suffix.
          val r = database match {
            case Some(db) =>
              val seg = "^/([^/;?]*)((?:[;?].*)?)$".r
              rest match {
                case seg(_, suffix) => s"/$db$suffix"
                case "" => s"/$db"
                case other => other // ;attr-only suffixes carry no db segment
              }
            case None => rest
          }
          s"$prefix$h${p.map(":" + _).getOrElse("")}$r"
        case _ => url
      }
    }
  }

  /** Resolve a secret reference to its raw SecretString. `env` is
    * injectable for tests (defaults to the process environment). A
    * `b64+` prefix base64-decodes the resolved value — the reference's
    * SecretBinary arm (redshift_sink.py:640-645: a secret stored as
    * binary arrives base64-encoded and is decoded before parsing). */
  def resolve(ref: String, env: String => Option[String] = sys.env.get): String =
    if (ref.startsWith("b64+"))
      new String(java.util.Base64.getDecoder.decode(resolve(ref.drop(4), env).trim),
        StandardCharsets.UTF_8)
    else ref.split(":", 2) match {
      case Array("env", name) =>
        env(name).getOrElse(
          throw new IllegalArgumentException(s"secret env var not set: $name"))
      case Array("file", path) =>
        new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8).trim
      case Array("literal", v) => v
      case _ => throw new IllegalArgumentException(
        s"unsupported secret scheme (want [b64+]env:/file:/literal:): $ref")
    }

  /** JSON string unescape for the SecretString values (quotes,
    * backslashes, `\\uXXXX`, and the common control escapes — passwords
    * legally contain any of them, and ensure-ascii JSON encoders emit
    * `\\uXXXX` for every non-ASCII character). */
  private def unescape(s: String): String =
    "\\\\u([0-9a-fA-F]{4})|\\\\([\"\\\\/bfnrt])".r.replaceAllIn(s, m =>
      if (m.group(1) != null)
        java.util.regex.Matcher.quoteReplacement(
          Integer.parseInt(m.group(1), 16).toChar.toString)
      else m.group(2) match {
        case "b" => "\b"; case "f" => "\f"; case "n" => "\n"
        case "r" => "\r"; case "t" => "\t"
        case c => java.util.regex.Matcher.quoteReplacement(c)
      })

  /** Parse the SecretString. A JSON object uses the reference's dict
    * shape; anything else is treated as a bare password (the common
    * mounted-file convention). String values may contain escaped quotes
    * and backslashes. */
  def parse(secretString: String): Credentials = {
    val s = secretString.trim
    if (s.startsWith("{")) {
      val kvPat = "\"((?:[^\"\\\\]|\\\\.)+)\"\\s*:\\s*(\"((?:[^\"\\\\]|\\\\.)*)\"|-?[0-9]+)".r
      val m = kvPat.findAllMatchIn(s)
        .map(g => unescape(g.group(1)) ->
          Option(g.group(3)).map(unescape).getOrElse(g.group(2))).toMap
      Credentials(m.get("username"), m.get("password"), m.get("host"),
        m.get("port").flatMap(_.toIntOption), m.get("database"))
    } else Credentials(None, Some(s), None, None)
  }

  /** One-call path: resolve + parse + apply the secret-wins precedence
    * over every explicit connection property. */
  def credentials(ref: Option[String],
                  explicitUser: Option[String], explicitPassword: Option[String],
                  env: String => Option[String] = sys.env.get,
                  explicitHost: Option[String] = None,
                  explicitPort: Option[Int] = None,
                  explicitDatabase: Option[String] = None): Credentials =
    (ref match {
      case Some(r) => parse(resolve(r, env)).over(explicitUser, explicitPassword)
      case None => Credentials(explicitUser, explicitPassword, None, None)
    }).overEndpoint(explicitHost, explicitPort, explicitDatabase)
}
