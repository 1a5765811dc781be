package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fail-fast config validation — the analog of the reference's settings
  * matrix tests (tests/test_config.py: defaults, backend-requires-url,
  * case-insensitive env keys, specific messages). Pure (no Spark). */
class ConfigSpec extends AnyFunSuite {

  test("defaults validate clean") {
    val c = GraftConfig.orThrow(GraftConfig.validated(GraftConfig("/tmp/store")))
    assert(!c.fp16)
    assert(c.embedderDim == 64)
    assert(c.httpPort == 8000 && c.mcpPort == 8375)
    assert(c.pagesDir.isEmpty && c.checkpointDir.isEmpty)
  }

  test("every violation is reported, each with a specific message") {
    val bad = GraftConfig(storeDir = " ", embedderDim = 0,
      httpPort = 70000, mcpPort = -1, pagesDir = Some("/p"),
      checkpointDir = None)
    val Left(errs) = GraftConfig.validated(bad): @unchecked
    assert(errs.size == 5, errs.mkString("; "))
    assert(errs.exists(_.contains("STORE_DIR (--store / GRAFT_STORE_DIR) is required")))
    assert(errs.exists(_.contains(
      "EMBEDDER_DIM (--embed-dim / GRAFT_EMBEDDER_DIM) must be a positive integer, got 0")))
    assert(errs.exists(e => e.contains("HTTP_PORT") && e.contains("70000")))
    assert(errs.exists(e => e.contains("MCP_PORT") && e.contains("-1")))
    assert(errs.exists(_.contains("CHECKPOINT_DIR (--ckpt / GRAFT_CHECKPOINT_DIR) is required when PAGES_DIR is set")))
  }

  test("serving ports must differ when fixed; both-ephemeral is allowed") {
    val Left(errs) = GraftConfig.validated(
      GraftConfig("/s", httpPort = 9000, mcpPort = 9000)): @unchecked
    assert(errs.exists(_.contains("must differ when fixed, both are 9000")))
    assert(GraftConfig.validated(
      GraftConfig("/s", httpPort = 0, mcpPort = 0)).isRight)
  }

  test("dense-index matrix: ivf+pq refuse together; pq-refine < 2 refuses") {
    val Left(errs) = GraftConfig.validated(GraftConfig("/s",
      ivfIndexDir = Some("/i"), pqIndexDir = Some("/p"),
      pqRefine = 1)): @unchecked
    assert(errs.exists(_.contains("mutually exclusive")), errs)
    assert(errs.exists(e => e.contains("PQ_REFINE") && e.contains("got 1")),
      errs)
    assert(GraftConfig.validated(
      GraftConfig("/s", pqIndexDir = Some("/p"))).isRight)
    assert(GraftConfig.orThrow(GraftConfig.validated(
      GraftConfig("/s"))).pqRefine == 64) // the measured default rung
    // pqRefine is validated ONLY when the PQ path is selected — ambient
    // GRAFT_PQ_REFINE garbage must not refuse an unrelated serve config
    assert(GraftConfig.validated(GraftConfig("/s", pqRefine = 1)).isRight)
    assert(GraftConfig.validated(GraftConfig("/s",
      ivfIndexDir = Some("/i"), pqRefine = 1)).isRight)
  }

  test("graph serving matrix: exclusivity, knob gating, flag scoping") {
    // three-way exclusivity: graph joins the one-dense-index rule
    val Left(e1) = GraftConfig.validated(GraftConfig("/s",
      ivfIndexDir = Some("/i"), graphIndexDir = Some("/g"))): @unchecked
    assert(e1.exists(e => e.contains("mutually exclusive")
      && e.contains("GRAPH_INDEX_DIR")), e1)
    val Left(e2) = GraftConfig.validated(GraftConfig("/s",
      pqIndexDir = Some("/p"), graphIndexDir = Some("/g"))): @unchecked
    assert(e2.exists(_.contains("mutually exclusive")), e2)
    // walk knobs validate only when the graph path is selected
    val Left(e3) = GraftConfig.validated(GraftConfig("/s",
      graphIndexDir = Some("/g"), graphEf = 0, graphHops = -1)): @unchecked
    assert(e3.exists(_.contains("GRAPH_EF")) &&
      e3.exists(_.contains("GRAPH_HOPS")), e3)
    assert(GraftConfig.validated(GraftConfig("/s", graphEf = 0)).isRight)
    // entry selection pairs with the graph mode
    val Left(e4) = GraftConfig.validated(GraftConfig("/s",
      graphEntryIvfDir = Some("/i"))): @unchecked
    assert(e4.exists(_.contains("requires")), e4)
    assert(GraftConfig.validated(GraftConfig("/s",
      graphIndexDir = Some("/g"), graphEntryIvfDir = Some("/i"))).isRight)
    // defaults are the gate-measured config
    val c = GraftConfig.orThrow(GraftConfig.validated(
      GraftConfig("/s", graphIndexDir = Some("/g"))))
    assert(c.graphEf == 20 && c.graphHops == 3)
    // resolve: explicit walk-knob flags without the mode are rejected,
    // ambient env garbage is not
    val Left(e5) = GraftConfig.resolve(Map("graph-ef" -> "8"),
      Map.empty, GraftConfig.Command.Serve): @unchecked
    assert(e5.exists(_.contains("--graph-ef requires --graph-index")), e5)
    assert(GraftConfig.resolve(Map("store" -> "/s"),
      Map("GRAFT_GRAPH_EF" -> "junk-ignored-out-of-mode", // parsed only in scope
        "GRAFT_STORE_DIR" -> "/s"),
      GraftConfig.Command.Search).isRight)
    // graph flags are serve-scoped: rejected for search
    val Left(e6) = GraftConfig.resolve(
      Map("store" -> "/s", "graph-index" -> "/g"),
      Map.empty, GraftConfig.Command.Search): @unchecked
    assert(e6.exists(_.contains("--graph-index is not a search option")), e6)
    // env-layered serve config resolves the graph mode end-to-end
    val Right(r) = GraftConfig.resolve(Map("graph-hops" -> "4"),
      Map("GRAFT_STORE_DIR" -> "/s", "GRAFT_GRAPH_INDEX_DIR" -> "/g",
        "GRAFT_GRAPH_EF" -> "40"),
      GraftConfig.Command.Serve): @unchecked
    assert(r.graphIndexDir.contains("/g") && r.graphEf == 40
      && r.graphHops == 4)
  }

  test("graph-resident: requires the graph mode; env form parses and validates") {
    // the resident walk serves the flat layout's pq-code sidecar — no
    // meaning without --graph-index
    val Left(e1) = GraftConfig.validated(GraftConfig("/s",
      graphResident = true)): @unchecked
    assert(e1.exists(e => e.contains("GRAPH_RESIDENT")
      && e.contains("GRAPH_INDEX_DIR")), e1)
    assert(GraftConfig.validated(GraftConfig("/s",
      graphIndexDir = Some("/g"), graphResident = true)).isRight)
    // flag layer (value-less, like --pooled) composes with the mode
    val Right(r1) = GraftConfig.resolve(
      Map("store" -> "/s", "graph-index" -> "/g"), Map.empty,
      GraftConfig.Command.Serve, graphResidentFlag = true): @unchecked
    assert(r1.graphResident)
    // env layer parses true/false and rejects garbage
    val Right(r2) = GraftConfig.resolve(Map("store" -> "/s",
      "graph-index" -> "/g"), Map("GRAFT_GRAPH_RESIDENT" -> "1"),
      GraftConfig.Command.Serve): @unchecked
    assert(r2.graphResident)
    val Left(e2) = GraftConfig.resolve(Map("store" -> "/s",
      "graph-index" -> "/g"), Map("GRAFT_GRAPH_RESIDENT" -> "maybe"),
      GraftConfig.Command.Serve): @unchecked
    assert(e2.exists(_.contains("GRAFT_GRAPH_RESIDENT")), e2)
    // ambient env garbage outside serve scope stays ignored
    assert(GraftConfig.resolve(Map("store" -> "/s"),
      Map("GRAFT_GRAPH_RESIDENT" -> "junk", "GRAFT_STORE_DIR" -> "/s"),
      GraftConfig.Command.Search).isRight)
  }

  test("hnsw serving mode: exclusivity, walk knobs apply, entry-ivf rejected") {
    // hnsw joins the one-dense-index rule
    val Left(e1) = GraftConfig.validated(GraftConfig("/s",
      graphIndexDir = Some("/g"), hnswIndexDir = Some("/h"))): @unchecked
    assert(e1.exists(e => e.contains("mutually exclusive")
      && e.contains("HNSW_INDEX_DIR")), e1)
    val Left(e2) = GraftConfig.validated(GraftConfig("/s",
      pqIndexDir = Some("/p"), hnswIndexDir = Some("/h"))): @unchecked
    assert(e2.exists(_.contains("mutually exclusive")), e2)
    // the shared walk knobs validate under the hnsw mode too
    val Left(e3) = GraftConfig.validated(GraftConfig("/s",
      hnswIndexDir = Some("/h"), graphEf = 0)): @unchecked
    assert(e3.exists(_.contains("GRAPH_EF")), e3)
    // entry-ivf pairs with the FLAT walk only — the stack descends its
    // own upper layers
    val Left(e4) = GraftConfig.validated(GraftConfig("/s",
      hnswIndexDir = Some("/h"), graphEntryIvfDir = Some("/i"))): @unchecked
    assert(e4.exists(_.contains("GRAPH_ENTRY_IVF")), e4)
    // walk-knob flags are accepted with --hnsw-index
    val Right(r) = GraftConfig.resolve(
      Map("graph-ef" -> "32", "graph-hops" -> "4"),
      Map("GRAFT_STORE_DIR" -> "/s", "GRAFT_HNSW_INDEX_DIR" -> "/h"),
      GraftConfig.Command.Serve): @unchecked
    assert(r.hnswIndexDir.contains("/h") && r.graphEf == 32
      && r.graphHops == 4)
    // serve-scoped like the other index flags
    val Left(e5) = GraftConfig.resolve(
      Map("store" -> "/s", "hnsw-index" -> "/h"),
      Map.empty, GraftConfig.Command.Search): @unchecked
    assert(e5.exists(_.contains("--hnsw-index is not a search option")), e5)
  }

  test("sync matrix: PAGES_DIR without CHECKPOINT_DIR refuses; with it, validates") {
    val Left(errs) = GraftConfig.validated(
      GraftConfig("/s", pagesDir = Some("/p"))): @unchecked
    assert(errs == List("CHECKPOINT_DIR (--ckpt / GRAFT_CHECKPOINT_DIR) is required when PAGES_DIR is set " +
      "(sync mode cannot track its watermark without a checkpoint location)"))
    assert(GraftConfig.validated(GraftConfig("/s", pagesDir = Some("/p"),
      checkpointDir = Some("/c"))).isRight)
  }

  test("env loading: GRAFT_ prefix, case-insensitive keys, typed parses") {
    val Right(c) = GraftConfig.fromEnv(Map(
      "graft_store_dir" -> "/env/store", // lowercase key accepted
      "GRAFT_FP16" -> "true",
      "GRAFT_EMBEDDER_DIM" -> "128",
      "GRAFT_HTTP_PORT" -> "8080")): @unchecked
    assert(c.storeDir == "/env/store" && c.fp16 && c.embedderDim == 128)
    assert(c.httpPort == 8080 && c.mcpPort == GraftConfig.DefaultMcpPort)
    assert(c.embedder.dim == 128)
  }

  test("env loading: unparseable values get their own messages plus matrix errors") {
    val Left(errs) = GraftConfig.fromEnv(Map(
      "GRAFT_FP16" -> "maybe",
      "GRAFT_MCP_PORT" -> "not-a-port")): @unchecked
    assert(errs.exists(_.contains("GRAFT_FP16 must be true/false, got 'maybe'")))
    assert(errs.exists(e => e.contains("GRAFT_MCP_PORT") &&
      e.contains("must be an integer, got 'not-a-port'")))
    assert(errs.exists(_.contains("STORE_DIR (--store / GRAFT_STORE_DIR) is required"))) // matrix error rides along
  }

  test("resolve: flags layer over env vars, flag wins per knob") {
    val env = Map("GRAFT_STORE_DIR" -> "/env/store",
      "GRAFT_HTTP_PORT" -> "9100", "GRAFT_MCP_PORT" -> "9200")
    // flag overrides env for http-port; env fills store and mcp-port
    val Right(c) = GraftConfig.resolve(
      Map("http-port" -> "7000"), env, GraftConfig.Command.Serve): @unchecked
    assert(c.storeDir == "/env/store")
    assert(c.httpPort == 7000 && c.mcpPort == 9200)
    // --fp16 switch forces fp16 even when env says false
    val Right(c2) = GraftConfig.resolve(
      Map("store" -> "/s", "pages-dir" -> "/p", "ckpt" -> "/c"),
      Map("GRAFT_FP16" -> "false"), GraftConfig.Command.Sync,
      fp16Flag = true): @unchecked
    assert(c2.fp16 && c2.storeDir == "/s")
  }

  test("command scoping: out-of-scope env is ignored, out-of-scope flags are rejected") {
    // ambient sync/serve junk can't stop a read-only search...
    val Right(c) = GraftConfig.resolve(Map("store" -> "/s"),
      Map("GRAFT_PAGES_DIR" -> "/p", "GRAFT_HTTP_PORT" -> "junk",
        "GRAFT_FP16" -> "maybe"), GraftConfig.Command.Search): @unchecked
    assert(c.storeDir == "/s" && c.pagesDir.isEmpty && !c.fp16)
    // ...but an explicit flag the command can't honor is an error, not
    // a silent drop
    val Left(errs) = GraftConfig.resolve(
      Map("store" -> "/s", "pages-dir" -> "/p"),
      Map.empty, GraftConfig.Command.Search): @unchecked
    assert(errs == List("--pages-dir is not a search option"))
    // sync's pages-dir requirement is computed inside resolve, together
    // with every other violation
    val Left(errs2) = GraftConfig.resolve(Map.empty, Map.empty,
      GraftConfig.Command.Sync): @unchecked
    assert(errs2.exists(_.contains("PAGES_DIR is required for sync")))
    assert(errs2.exists(_.contains("STORE_DIR (--store / GRAFT_STORE_DIR) is required")))
  }

  test("orThrow joins all messages into one fail-fast exception") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig.orThrow(GraftConfig.validated(
        GraftConfig("", embedderDim = -3)))
    }
    assert(e.getMessage.contains("invalid configuration:"))
    assert(e.getMessage.contains("STORE_DIR"))
    assert(e.getMessage.contains("EMBEDDER_DIM"))
  }

  test("Cli sync constructs through the config: missing ckpt fails fast with exit 2") {
    // no Spark touched: validation fails before any session use (null is
    // safe here precisely because the path must not reach Spark). env is
    // injected empty so ambient GRAFT_* vars on the host can't satisfy
    // the matrix and push the run past validation.
    val code = Cli.run(Array("sync", "--pages-dir", "/tmp/nope",
      "--store", "/tmp/store"), null, env = Map.empty)
    assert(code == 2)
  }

  test("Cli search ignores ambient sync/serve env; bad --k fails with exit 2") {
    // ambient GRAFT_* junk from other workflows must not make a
    // read-only command refuse to run; it fails later (exit 1) on the
    // missing store, not on config validation (exit 2)
    val c1 = Cli.run(Array("search", "q", "--store", "/nonexistent-store"),
      SparkTestBase.spark, env = Map("GRAFT_PAGES_DIR" -> "/p",
        "GRAFT_HTTP_PORT" -> "junk"))
    assert(c1 == 1)
    val c2 = Cli.run(Array("search", "q", "--store", "/s", "--k", "abc"),
      null, env = Map.empty)
    assert(c2 == 2)
  }

  test("Cli sync: --since conflicts with --backfill; malformed --since exits 2") {
    val conflict = Cli.run(Array("sync", "--backfill",
      "--since", "2024-01-01T00:00:00Z", "--pages-dir", "/p",
      "--store", "/s", "--ckpt", "/c"), null, env = Map.empty)
    assert(conflict == 2)
    val malformed = Cli.run(Array("sync", "--since", "not-a-date",
      "--pages-dir", "/p", "--store", "/s", "--ckpt", "/c"),
      null, env = Map.empty)
    assert(malformed == 2)
  }
}
