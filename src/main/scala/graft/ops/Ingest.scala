package graft.ops

import graft.Q
import graft.expr.Crypto
import graft.jobs.IngestionJob
import graft.schema.Tables
import org.apache.spark.sql.functions._

/** Ingestion-parity pillars as oracle-checked queries (SURVEY.md §2.1-2.4):
  * nested-struct flatten, keep-first upsert, and the PII-securing transform.
  * The testdata has no nested columns, so q20 builds a depth-3 struct from
  * `customer` on the fly and flattens it back — the oracle states the
  * expected flat result directly. Nondeterministic crypto outputs are
  * checked by INVARIANT (format/length/round-trip), not by value
  * (SURVEY.md §4.3).
  */
object Ingest {

  private val AesKey = "0123456789abcdef"
  private val BidxKey = "test-blind-index-key"

  val catalog: Seq[Q] = Seq(

    // ---- P1 recursive flatten of a depth-3 struct (json_normalize twin)
    Q("q20_flatten",
      (s, d) => Flatten.flatten(
        Tables.customer(s, d).select(
          col("c_custkey"),
          struct(
            col("c_name").as("name"),
            struct(
              col("c_acctbal").as("acctbal"),
              struct(col("c_mktsegment").as("segment")).as("market")
            ).as("account")
          ).as("profile")))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
              c_name AS profile_name,
              c_acctbal AS profile_account_acctbal,
              c_mktsegment AS profile_account_market_segment
              FROM customer ORDER BY c_custkey""")),

    // ---- U1-U3 keep-first upsert: existing (keys ≡ 0 mod 3) wins over an
    // incoming batch (keys ≡ 0 mod 2, price doubled); the oracle states the
    // winner per key in closed form.
    Q("q21_upsert",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val existing = orders.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey").as("key"),
            round(col("o_totalprice"), 2).as("price"), lit("old").as("src"))
        val incoming = orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("key"),
            round(col("o_totalprice") * 2, 2).as("price"), lit("new").as("src"))
        Upsert.keepFirst(existing, incoming, Seq("key"), Seq(col("key")))
          .orderBy(col("key"))
      },
      Some("""SELECT o_orderkey AS key, round(o_totalprice, 2) AS price,
                'old' AS src
              FROM orders WHERE o_orderkey % 3 = 0
              UNION ALL
              SELECT o_orderkey, round(o_totalprice * 2, 2), 'new'
              FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0
              ORDER BY key""")),

    // ---- insert-if-absent (anti-join formulation of the upsert)
    Q("q21b_insert_if_absent",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val existing = orders.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey").as("key"), lit("old").as("src"))
        val incoming = orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("key"), lit("new").as("src"))
        Upsert.insertIfAbsent(existing, incoming, Seq("key"))
          .orderBy(col("key"))
      },
      Some("""SELECT o_orderkey AS key, 'old' AS src
              FROM orders WHERE o_orderkey % 3 = 0
              UNION ALL
              SELECT o_orderkey, 'new'
              FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0
              ORDER BY key""")),

    // ---- F1-F5 secure transform, invariant-checked: normalize is
    // value-exact; blind index / password hash / encryption are checked by
    // length, format, and decrypt-round-trip (random salt/IV make the raw
    // values nondeterministic by design). The hash is real Argon2id
    // (RFC 9106, from scratch — the reference's KDF) with the cost knob
    // sized to the row count: this query hashes EVERY customer row (150k at
    // sf0.1), so m=16 KiB / t=1; the reference's 64 MiB × 3 cost at the
    // reference's ~10-row batch size lives in q23/Argon2Spec.
    Q("q22_secure_transform",
      // repartition before the KDF projection: the single-file scan is one
      // task and per-row crypto is the cost — the same reason a real
      // secure-ingest job repartitions after reading few large source files.
      // The width is PINNED to the core count (round 18): a bare
      // repartition(col) is REPARTITION_BY_COL, which AQE coalesces by
      // BYTES (minPartitionSize 1 MB) — 312 KB of customer rows collapsed
      // to a single task and 150k Argon2 hashes ran serially (measured:
      // 5 tasks / 3.2 task-s / 2.80 s steady; the whole query IS this
      // projection). Per-row KDF cost is invisible to byte-based sizing;
      // cores-derived width is the scale-adaptive spread (at 100 TB the
      // scan supplies ≥ cores splits and the exchange stays one pass).
      (s, d) => Tables.customer(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("c_custkey"))
        .select(
          col("c_custkey"),
          Crypto.normalizeEmail(col("c_name")).as("name_norm"),
          length(Crypto.blindIndex(col("c_name"), BidxKey)).as("bidx_len"),
          (Crypto.decrypt(Crypto.encrypt(col("c_name"), AesKey), AesKey)
            === col("c_name")).as("roundtrip"),
          Crypto.hashPassword(col("c_name"), "pepper", timeCost = 1, memoryKib = 16)
            .rlike("^\\$argon2id\\$v=19\\$m=16,t=1,p=1\\$[A-Za-z0-9+/]+\\$[A-Za-z0-9+/]+$")
            .as("hash_format_ok"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, lower(trim(c_name)) AS name_norm,
              CAST(64 AS INTEGER) AS bidx_len,
              true AS roundtrip, true AS hash_format_ok
              FROM customer ORDER BY c_custkey""")),

    // ---- F2' Fernet BYTE-FORMAT parity (the reference's actual token
    // format, `crypto_utils.py:84-88`): spec-conformant tokens — version
    // 0x80 + BE timestamp + IV + AES128-CBC-PKCS7 + HMAC-SHA256, base64url
    // — minted and verified with JDK primitives only. The oracle states the
    // invariants: round-trip identity and the canonical "gAAAAA" prefix
    // (version byte + zero high-order timestamp bytes).
    Q("q22b_fernet",
      (s, d) => {
        // base64url("ABCDEFGHIJKLMNOPABCDEFGHIJKLMNOP") — 16B sign + 16B enc
        val key = java.util.Base64.getUrlEncoder.encodeToString(
          "ABCDEFGHIJKLMNOPABCDEFGHIJKLMNOP".getBytes("US-ASCII"))
        Tables.customer(s, d).select(
          col("c_custkey"),
          (Crypto.fernetDecrypt(Crypto.fernetEncrypt(col("c_name"), key), key)
            === col("c_name")).as("roundtrip"),
          Crypto.fernetEncrypt(col("c_name"), key).startsWith("gAAAAA")
            .as("format_ok"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, true AS roundtrip, true AS format_ok
              FROM customer ORDER BY c_custkey""")),

    // ---- encryption key rotation (q120): the crypto-ops task the
    // reference's key-from-.env design eventually forces (README.md:19-23
    // documents key GENERATION; rotation is its lifecycle sequel). An
    // encrypted store at rest (name_enc under k1 + deterministic blind
    // index) is read back and re-encrypted under k2 in ONE map-side pass —
    // decrypt(k1) → encrypt(k2), no shuffle, each partition rewrites
    // independently (at 100 TB: partition-parallel rewrite, old-key reads
    // keep working until cutover because versions/partitions rotate
    // independently). The blind index is HMAC over the PLAINTEXT, so
    // rotation must NOT disturb it — equality-search keys survive
    // re-encryption, which is the whole point of the blind-index design
    // (SURVEY §2.3 F4). Oracle carries REAL values: the decrypted-under-k2
    // name must equal lower(trim(c_name)) byte-for-byte — a broken rotate
    // (wrong key, double-encrypt, truncation) mismatches every row hash;
    // bidx stability is compared on the actual hex digests.
    Q("q120_key_rotation",
      (s, d) => {
        val k2 = "fedcba9876543210"
        // per-run unique store dir (ADVICE r10: fixed tmp paths collide
        // across concurrent sessions)
        val store = TempDirs.scratch("graft_rot_store_")
        Tables.customer(s, d)
          .select(col("c_custkey"),
            Crypto.encrypt(Crypto.normalizeEmail(col("c_name")), AesKey)
              .as("name_enc"),
            Crypto.blindIndex(col("c_name"), BidxKey).as("name_bidx"))
          .write.mode("overwrite").parquet(store)
        val rotated = s.read.parquet(store)
          .select(col("c_custkey"), col("name_bidx"),
            Crypto.encrypt(Crypto.decrypt(col("name_enc"), AesKey), k2)
              .as("name_enc"))
        rotated
          .select(col("c_custkey"),
            Crypto.decrypt(col("name_enc"), k2).as("name_norm"),
            (col("name_bidx") ===
              Crypto.blindIndex(Crypto.decrypt(col("name_enc"), k2), BidxKey))
              .as("bidx_unchanged"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, lower(trim(c_name)) AS name_norm,
              true AS bidx_unchanged
              FROM customer ORDER BY c_custkey""")),

    // ---- S2/S3 CSV source/sink parity (the reference's store format is
    // headered CSV, `io_utils.py:21,37`): write a slice as CSV, read it
    // back with an EXPLICIT schema (inference is nondeterministic and
    // unaffordable at scale), verify the round-trip aggregate against the
    // parquet source of truth. CSV degrades timestamps to strings — the
    // pinned read schema restores types, which is the point of the test.
    Q("q24_csv_roundtrip",
      (s, d) => {
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_csv_store"
        val src = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        src.write.mode("overwrite").option("header", true).csv(dir)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("o_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("o_orderstatus",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("o_totalprice",
            org.apache.spark.sql.types.DoubleType)))
        s.read.option("header", true).schema(schema).csv(dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              round(sum(o_totalprice), 2) AS total
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- ORC roundtrip (q167): the third columnar format in the
    // source/sink family (parquet q21, CSV q24) — ORC ships in Spark's
    // core distribution and is the interchange format a warehouse
    // migration actually hands you. The roundtrip writes events
    // partitioned by type (so the read-back proves partition discovery
    // too), reads it back and aggregates — equality with the
    // parquet-side oracle proves type fidelity (longs, doubles, strings)
    // through the format. Values sum as integer CENTS (the q127
    // discipline) so the proof is bit-exact, not rounded. PlanHygieneSpec
    // asserts predicate pushdown reaches the ORC scan (PushedFilters),
    // same as the parquet hygiene assertions.
    Q("q167_orc_roundtrip",
      (s, d) => {
        val dir = TempDirs.scratch("graft_orc_store_")
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("user_id"),
            col("value"))
          .write.mode("overwrite").partitionBy("event_type").orc(dir)
        s.read.orc(dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(expr("CAST(round(value * 100) AS BIGINT)"))
              .as("value_cents"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
              count(DISTINCT user_id) AS n_users,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                AS value_cents
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- Avro roundtrip (q183, VERDICT r11 #8): the fourth interchange
    // format (parquet q21, CSV q24, ORC q167). spark-avro does NOT ship
    // in this container, but avro-core DOES (Spark depends on it), so the
    // roundtrip runs the REAL codec path at the mapPartitions kernel
    // boundary instead of declining the format: each partition writes one
    // Avro Object Container File (schema JSON header, sync markers,
    // deflate-compressed blocks) through DataFileWriter, and the read
    // side streams GenericRecords back through DataFileReader. Types
    // cross the format as long/string(Utf8)/double; aggregate equality
    // with the parquet-side oracle — counts + integer-cents sums (the
    // q167 discipline) — proves fidelity bit-exactly. The two driver-side
    // actions are bounded by construction: 8 (path, row-count) rows from
    // the write pass, 8 paths listed for the read. At scale the same
    // kernels run per-shard with paths on shared storage — write
    // fan-out = partition count, read fan-out = file count, payload rows
    // never touch the driver.
    Q("q183_avro_roundtrip",
      (s, d) => {
        import s.implicits._
        val dir = TempDirs.scratch("graft_avro_store_")
        val schemaJson =
          """{"type":"record","name":"Order","fields":[
            {"name":"o_orderkey","type":"long"},
            {"name":"o_orderstatus","type":"string"},
            {"name":"o_totalprice","type":"double"}]}"""
        val written = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
          .as[(Long, String, Double)]
          .repartition(8)
          .mapPartitions { rows =>
            val schema =
              new org.apache.avro.Schema.Parser().parse(schemaJson)
            val f = java.io.File.createTempFile("orders_", ".avro",
              new java.io.File(dir))
            val w = new org.apache.avro.file.DataFileWriter(
              new org.apache.avro.generic.GenericDatumWriter[
                org.apache.avro.generic.GenericRecord](schema))
            w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
            w.create(schema, f)
            var n = 0L
            rows.foreach { case (k, st, tp) =>
              val r = new org.apache.avro.generic.GenericData.Record(schema)
              r.put("o_orderkey", k)
              r.put("o_orderstatus", st)
              r.put("o_totalprice", tp)
              w.append(r)
              n += 1
            }
            w.close()
            Iterator.single(n)
          }.collect() // bounded: one row count per partition
        require(written.length == 8, s"expected 8 avro shards: $written")
        val files = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).toSeq
        s.createDataset(files).repartition(files.size)
          .mapPartitions(_.flatMap { p =>
            val rd = new org.apache.avro.file.DataFileReader(
              new java.io.File(p),
              new org.apache.avro.generic.GenericDatumReader[
                org.apache.avro.generic.GenericRecord]())
            val buf = scala.collection.mutable.ArrayBuffer
              .empty[(Long, String, Double)]
            while (rd.hasNext) {
              val r = rd.next()
              buf += ((r.get("o_orderkey").asInstanceOf[Long],
                r.get("o_orderstatus").toString,
                r.get("o_totalprice").asInstanceOf[Double]))
            }
            rd.close()
            buf.iterator
          })
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("o_orderkey")).as("n_keys"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .as("price_cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              count(DISTINCT o_orderkey) AS n_keys,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS price_cents
              FROM orders GROUP BY o_orderstatus
              ORDER BY o_orderstatus""")),

    // ---- S1' DataSource V2 load generator: 10k deterministic users in 16
    // partitions through the full secure transform. The source has no
    // DuckDB twin, but its generator is pure arithmetic
    // (GraftUserSource: country = countries[idx % 8], uuid unique per idx)
    // so the per-country counts have a CLOSED FORM the oracle states:
    // 10000 users over 8 countries = 1250 each, all uuids distinct
    // (VERDICT r1 #3). GraftUserSourceSpec covers determinism, pruning,
    // and partition planning.
    Q("q25_generated_users",
      (s, _) => IngestionJob.secureTransform(
        s.read.format("graft-users")
          .option("numUsers", 10000).option("numPartitions", 16).load(),
        // low KDF cost: 10k hashes in the bench path would otherwise
        // measure nothing but Argon2id (the reference's designed bottleneck,
        // BASELINE.md — cost is a config knob, not a fixed price)
        "pepper", AesKey, BidxKey, kdfTimeCost = 1, kdfMemoryKib = 16)
        .groupBy(col("location_country"))
        .agg(count(lit(1)).as("n_users"),
          countDistinct(col("login_uuid")).as("n_unique"))
        .orderBy(col("location_country")),
      Some("""SELECT * FROM (VALUES
              ('Brazil', CAST(1250 AS BIGINT), CAST(1250 AS BIGINT)),
              ('France', 1250, 1250), ('Germany', 1250, 1250),
              ('India', 1250, 1250), ('Japan', 1250, 1250),
              ('Spain', 1250, 1250), ('United Kingdom', 1250, 1250),
              ('United States', 1250, 1250))
              AS t(location_country, n_users, n_unique)
              ORDER BY location_country""")),

    // ---- O1-O4 full pipeline e2e through the REAL acquisition path: a
    // loopback HTTP server serves the canned fixture, `HttpUserFetcher`
    // GETs it (socket, status code, observed retries — zero egress), two
    // runs land in a fresh store; run 2 re-ingests the same batch —
    // keep-first dedup must leave counts unchanged. Every emitted value is
    // a real measurement with a known expected value, so the oracle states
    // them as constants (VERDICT r1 #3/#5): status 200, 0 retries, 6
    // fetched (the fixture carries 6 users, one a duplicate uuid), 5 after
    // dedup, both runs.
    Q("q23_ingest_e2e",
      (s, _) => {
        val repo = sys.env.getOrElse("GRAFT_REPO", "/root/repo")
        val store = s"${System.getProperty("java.io.tmpdir")}/graft_ingest_store"
        val fs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(store), true)
        val fixture = s"$repo/data/fixtures/users_fixture.json"
        val body = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(fixture)), java.nio.charset.StandardCharsets.UTF_8)
        // batch-of-6 regime: the run is ~a dozen tiny sequential jobs, so
        // right-size the shuffle like the streaming queries do — 32
        // partitions of a 6-row window is pure task overhead
        val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "2")
        val (m1, m2) =
          try graft.jobs.LoopbackApi.withServer(body) { url =>
            val first = IngestionJob.run(s, new graft.jobs.HttpUserFetcher(url),
              store, "test-pepper", AesKey, BidxKey)
            val second = IngestionJob.run(s, new graft.jobs.HttpUserFetcher(url),
              store, "test-pepper", AesKey, BidxKey) // idempotent re-ingest
            (first, second)
          } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        import s.implicits._
        Seq(m1, m2).zipWithIndex.map { case (m, i) =>
          (s"run${i + 1}", m.httpStatus.getOrElse(-1),
            m.retriesUsed.getOrElse(-1), m.rowsFetched, m.rowsAfterDedup)
        }.toDF("run", "http_status", "retries_used",
          "rows_fetched", "rows_after_dedup")
      },
      Some("""SELECT * FROM (VALUES
              ('run1', CAST(200 AS INTEGER), CAST(0 AS INTEGER),
               CAST(6 AS BIGINT), CAST(5 AS BIGINT)),
              ('run2', 200, 0, 6, 5))
              AS t(run, http_status, retries_used, rows_fetched,
                   rows_after_dedup)
              ORDER BY run"""))
  )
}
