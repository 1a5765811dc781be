package graft

/** Consolidated engine configuration with fail-fast validation — every
  * deployment-shaped knob (store location, at-rest precision, embedder
  * dimensionality, serving ports, sync inputs) validated in ONE place with
  * a specific message per violation, before any Spark work starts.
  *
  * Mirrors the reference's settings object, which validates its
  * backend/deployment matrix at startup and refuses to boot on an
  * inconsistent combination (readwise_vector_db/config.py:10-97 — e.g.
  * "SUPABASE_DB_URL is required when DB_BACKEND is 'supabase'"): this
  * engine's matrix is smaller (store dir + fp16 mode + ports + sync
  * inputs), but the failure discipline is the same — ALL violations are
  * collected and reported together, not first-error-wins, and the process
  * exits before touching the cluster. Values load from explicit arguments
  * or from `GRAFT_`-prefixed environment variables (case-insensitive keys,
  * like the reference's env loading).
  */
final case class GraftConfig(
    storeDir: String,
    fp16: Boolean = false,
    embedderDim: Int = GraftConfig.DefaultEmbedderDim,
    httpPort: Int = GraftConfig.DefaultHttpPort,
    mcpPort: Int = GraftConfig.DefaultMcpPort,
    pagesDir: Option[String] = None,
    checkpointDir: Option[String] = None) {

  /** The embedder this configuration describes. */
  def embedder: graft.embed.Embedder =
    graft.embed.HashNgramEmbedder(dim = embedderDim)
}

object GraftConfig {

  val DefaultEmbedderDim = 64
  val DefaultHttpPort = 8000
  val DefaultMcpPort = 8375

  /** Validate a candidate configuration; Left = every violation, each with
    * a message specific enough to fix the config without reading code. */
  def validated(config: GraftConfig): Either[List[String], GraftConfig] = {
    val errs = List.newBuilder[String]
    if (config.storeDir == null || config.storeDir.trim.isEmpty)
      errs += "STORE_DIR is required (non-empty path to the highlight store)"
    if (config.embedderDim <= 0)
      errs += s"EMBEDDER_DIM must be a positive integer, got ${config.embedderDim}"
    for ((name, p) <- Seq("HTTP_PORT" -> config.httpPort,
        "MCP_PORT" -> config.mcpPort))
      if (p < 0 || p > 65535)
        errs += s"$name must be in [0, 65535] (0 = ephemeral), got $p"
    if (config.httpPort != 0 && config.httpPort == config.mcpPort)
      errs += s"HTTP_PORT and MCP_PORT must differ when fixed, both are ${config.httpPort}"
    if (config.pagesDir.isDefined && config.checkpointDir.isEmpty)
      errs += "CHECKPOINT_DIR is required when PAGES_DIR is set (sync mode " +
        "cannot track its watermark without a checkpoint location)"
    errs.result() match {
      case Nil => Right(config)
      case es  => Left(es)
    }
  }

  /** Resolve a configuration from CLI flags layered over `GRAFT_`-prefixed
    * environment entries (keys matched case-insensitively — the reference
    * accepts `deploy_target` and `DEPLOY_TARGET` alike), then validate.
    * Precedence per knob: explicit flag → env var → default, the same
    * layering the reference's settings object gives CLI args over its env
    * file. Unparseable values are reported through the same error channel
    * as matrix violations.
    *
    * `flags` keys are the CLI spellings (`store`, `http-port`, `mcp-port`,
    * `embed-dim`, `pages-dir`, `ckpt`); `fp16Flag` is the presence of the
    * boolean `--fp16` switch (true forces fp16 regardless of env).
    * `syncKnobs = false` ignores pages-dir/ckpt entirely — read-only
    * commands (search, serve) must not refuse to run because ambient
    * GRAFT_PAGES_DIR from a sync workflow trips the sync matrix rule. */
  def resolve(flags: Map[String, String], env: Map[String, String],
      fp16Flag: Boolean = false,
      syncKnobs: Boolean = true): Either[List[String], GraftConfig] = {
    val norm = env.map { case (k, v) => k.toUpperCase -> v }
    def e(key: String): Option[String] = norm.get(s"GRAFT_$key")
    val errs = List.newBuilder[String]
    def str(flag: String, key: String): Option[String] =
      flags.get(flag).orElse(e(key))
    def int(flag: String, key: String, default: Int): Int =
      str(flag, key) match {
        case None => default
        case Some(v) => v.toIntOption.getOrElse {
          errs += s"$key (--$flag / GRAFT_$key) must be an integer, got '$v'"
          default
        }
      }
    val fp16 = fp16Flag || (e("FP16") match {
      case None => false
      case Some(v) => v.toLowerCase match {
        case "true" | "1"  => true
        case "false" | "0" => false
        case other =>
          errs += s"GRAFT_FP16 must be true/false, got '$other'"; false
      }
    })
    val candidate = GraftConfig(
      storeDir = str("store", "STORE_DIR").getOrElse(""),
      fp16 = fp16,
      embedderDim = int("embed-dim", "EMBEDDER_DIM", DefaultEmbedderDim),
      httpPort = int("http-port", "HTTP_PORT", DefaultHttpPort),
      mcpPort = int("mcp-port", "MCP_PORT", DefaultMcpPort),
      pagesDir = if (syncKnobs) str("pages-dir", "PAGES_DIR") else None,
      checkpointDir = if (syncKnobs) str("ckpt", "CHECKPOINT_DIR") else None)
    errs.result() match {
      case Nil => validated(candidate)
      case es  => Left(es ++ validated(candidate).left.getOrElse(Nil))
    }
  }

  /** [[resolve]] with no flag layer — pure environment loading. */
  def fromEnv(env: Map[String, String]): Either[List[String], GraftConfig] =
    resolve(Map.empty, env)

  /** Fail-fast form: throw with all messages joined — the startup path. */
  def orThrow(result: Either[List[String], GraftConfig]): GraftConfig =
    result.fold(
      es => throw new IllegalArgumentException(
        s"invalid configuration:\n  ${es.mkString("\n  ")}"),
      identity)
}
