package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import graft.expr.Crypto
import graft.jobs.{FixtureFetcher, IngestionJob, Secrets, SecretKeys}

/** Env-based secret loading with fail-fast — parity with the reference's
  * import-time key loading (`/root/reference/ingestion/crypto_utils.py:25-49`):
  * `.env` then environment (env wins), `KeyError`-style failure naming the
  * missing variable, malformed key material rejected at load. Keys never
  * appear in error messages or toString.
  */
class SecretsSpec extends SparkSpec {

  private val goodFernet =
    Base64.getUrlEncoder.encodeToString(Array.fill[Byte](32)(7))
  private val goodEnv = Map(
    "PEPPER" -> "spec-pepper",
    "FERNET_KEY" -> goodFernet,
    "BLIND_INDEX_KEY" -> Base64.getEncoder.encodeToString(
      "spec-bidx-key-32-bytes-of-stuff!".getBytes(StandardCharsets.UTF_8)))

  test("a missing variable fails fast naming the variable, not its value") {
    for (missing <- Seq("PEPPER", "FERNET_KEY", "BLIND_INDEX_KEY")) {
      val e = intercept[IllegalStateException] {
        Secrets.fromEnv(goodEnv - missing)
      }
      assert(e.getMessage.contains(s"missing required secret: $missing"))
      // no key VALUE leaks into the failure
      goodEnv.values.foreach(v => assert(!e.getMessage.contains(v)))
    }
  }

  test("malformed key material fails at load, not first use") {
    val badB64 = intercept[IllegalStateException] {
      Secrets.fromEnv(goodEnv + ("FERNET_KEY" -> "!!not-base64!!"))
    }
    assert(badB64.getMessage.contains("FERNET_KEY"))
    val shortKey = intercept[IllegalStateException] {
      Secrets.fromEnv(goodEnv + ("FERNET_KEY" ->
        Base64.getUrlEncoder.encodeToString(Array.fill[Byte](16)(1))))
    }
    assert(shortKey.getMessage.contains("32 bytes"))
    val badBidx = intercept[IllegalStateException] {
      Secrets.fromEnv(goodEnv + ("BLIND_INDEX_KEY" -> "%%%"))
    }
    assert(badBidx.getMessage.contains("BLIND_INDEX_KEY"))
  }

  test(".env is read when present, the real environment wins over it " +
      "(python-dotenv no-override default)") {
    val dir = Files.createTempDirectory("graft_secrets")
    val dotenv = dir.resolve(".env")
    Files.write(dotenv, Seq(
      "# comment line",
      "",
      s"export PEPPER='dotenv-pepper'",
      s"""FERNET_KEY="$goodFernet"""",
      s"BLIND_INDEX_KEY=${goodEnv("BLIND_INDEX_KEY")}").asJava,
      StandardCharsets.UTF_8)

    // all three from .env: export prefix and both quote styles stripped
    val fromFile = Secrets.fromEnv(env = Map.empty, dotenv = Some(dotenv))
    assert(fromFile === SecretKeys("dotenv-pepper", goodFernet,
      goodEnv("BLIND_INDEX_KEY")))

    // the process environment overrides the file
    val overridden = Secrets.fromEnv(
      env = Map("PEPPER" -> "env-pepper"), dotenv = Some(dotenv))
    assert(overridden.pepper === "env-pepper")

    // a missing .env is a silent no-op (load_dotenv semantics) — the
    // variables are then simply missing and the fail-fast path fires
    val e = intercept[IllegalStateException] {
      Secrets.fromEnv(env = Map.empty, dotenv = Some(dir.resolve("absent")))
    }
    assert(e.getMessage.contains("missing required secret"))
  }

  test("unquoted inline comments are stripped, quoted hashes kept " +
      "(python-dotenv parity)") {
    // `PEPPER=abc # prod` must load as "abc" on BOTH stacks — a trailing
    // comment kept in the value would silently change every Argon2 hash
    // and blind index relative to the reference's load_dotenv
    val dir = Files.createTempDirectory("graft_dotenv_comments")
    val dotenv = dir.resolve(".env")
    def pepperFrom(line: String): String = {
      Files.write(dotenv, java.util.Arrays.asList(
        line,
        s"BLIND_INDEX_KEY=${goodEnv("BLIND_INDEX_KEY")}",
        s"""FERNET_KEY="$goodFernet""""),
        StandardCharsets.UTF_8)
      Secrets.fromEnv(env = Map.empty, dotenv = Some(dotenv)).pepper
    }
    assert(pepperFrom("PEPPER=abc # trailing comment") === "abc")
    // quoted values keep '#' verbatim
    assert(pepperFrom("PEPPER='kept#hash'") === "kept#hash")
    // '#' with no whitespace before it is NOT a comment
    assert(pepperFrom("PEPPER=no#comment-without-space")
      === "no#comment-without-space")
    // quoted value + trailing comment: quotes stripped, comment dropped
    assert(pepperFrom("""PEPPER="abc" # prod pepper""") === "abc")
    // comment starts at the first WHITESPACE-preceded '#', not the first '#'
    assert(pepperFrom("PEPPER=a#b #prod") === "a#b")
    // '#' at value start is NOT a comment (python-dotenv loads "# x")
    assert(pepperFrom("PEPPER= # all comment") === "# all comment")
  }

  test("SecretKeys never renders key material") {
    val keys = Secrets.fromEnv(goodEnv)
    val s = keys.toString
    assert(s.contains("redacted"))
    goodEnv.values.foreach(v => assert(!s.contains(v)))
  }

  test("an ingestion run under env-loaded keys mints real Fernet tokens " +
      "that decrypt back") {
    val keys = Secrets.fromEnv(goodEnv)
    val fixture = sys.env.getOrElse("GRAFT_REPO", "/root/repo") +
      "/data/fixtures/users_fixture.json"
    val store = Files.createTempDirectory("graft_env_store").toString + "/st"
    val m = IngestionJob.run(spark, new FixtureFetcher(fixture), store, keys)
    assert(m.rowsAfterDedup === 5)

    val persisted = spark.read.parquet(store)
    import org.apache.spark.sql.functions.col
    val rows = persisted
      .select(col("email_enc"),
        Crypto.fernetDecrypt(col("email_enc"), keys.fernetKey).as("email"))
      .collect()
    assert(rows.nonEmpty)
    // structural Fernet: version byte 0x80 ⇒ the familiar gAAAAA prefix
    assert(rows.forall(_.getString(0).startsWith("gAAAAA")))
    assert(rows.forall(_.getString(1).contains("@")))
    // plaintext PII is not persisted
    assert(!persisted.columns.contains("email"))
  }

  private implicit class SeqOps(s: Seq[String]) {
    def asJava: java.util.List[String] = {
      val l = new java.util.ArrayList[String]()
      s.foreach(l.add)
      l
    }
  }
}
