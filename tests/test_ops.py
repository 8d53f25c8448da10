"""Ops layer tests: small-file compaction, table health stats,
EXPLAIN capture, query history ring buffer + cache."""

from __future__ import annotations

from pyspark.sql import functions as F

from building_energy_data_pipeline_spark.ops import (
    QueryHistory,
    compact,
    explain_analyze,
    explain_str,
    recover_compact,
    restore_table,
    snapshot_table,
    table_health,
)


class TestMaintenance:
    def test_health_and_compaction(self, spark, tmp_path):
        p = str(tmp_path / "t")
        # 64 partitions of a small table → 64 tiny files
        spark.range(10_000).withColumn("part", F.col("id") % 2).repartition(
            64
        ).write.partitionBy("part").parquet(p)

        before = table_health(spark, p)
        assert before.n_files > 60
        assert before.small_files == before.n_files
        assert set(before.partitions) == {"part=0", "part=1"}
        assert before.skew_ratio >= 1.0

        n_after = compact(spark, p)
        assert n_after < before.n_files
        after = table_health(spark, p)
        assert after.n_files == n_after
        # data preserved through the swap
        assert spark.read.parquet(p).count() == 10_000

    def test_clustered_compaction_disjoint_ranges(self, spark, tmp_path):
        # cluster_by must leave each output file owning a disjoint id
        # range — that's what makes parquet min/max stats skip files
        import pyarrow.parquet as pq

        p = str(tmp_path / "t")
        spark.range(50_000).withColumn(
            "shuffled", F.pmod(F.hash("id"), F.lit(97))
        ).repartition(16).write.parquet(p)

        compact(spark, p, target_file_bytes=200_000, cluster_by=["id"])

        ranges = []
        for root, _dirs, files in __import__("os").walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    md = pq.ParquetFile(f"{root}/{f}").metadata
                    lo = min(
                        md.row_group(i).column(0).statistics.min
                        for i in range(md.num_row_groups)
                    )
                    hi = max(
                        md.row_group(i).column(0).statistics.max
                        for i in range(md.num_row_groups)
                    )
                    ranges.append((lo, hi))
        assert len(ranges) > 1  # actually split into multiple files
        ranges.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, _hi2)}"
        assert spark.read.parquet(p).count() == 50_000

    def test_health_empty_dir(self, spark, tmp_path):
        (tmp_path / "empty").mkdir()
        h = table_health(spark, str(tmp_path / "empty"))
        assert h.n_files == 0 and h.skew_ratio == 0.0

    def test_health_explicit_file_scheme(self, spark, tmp_path):
        """The Hadoop FS path resolves by URI scheme — an os.walk
        implementation would be blind to anything but bare paths."""
        p = str(tmp_path / "t")
        spark.range(1_000).write.parquet(p)
        h = table_health(spark, f"file://{p}")
        assert h.n_files >= 1 and h.total_bytes > 0

    def test_health_partition_attribution_any_path_spelling(
        self, spark, tmp_path
    ):
        """Partition dirs must be attributed correctly however the
        caller spells the root: Hadoop's listing normalizes to
        'file:/x' while a caller may pass '/x' or 'file:///x' — a raw
        string split on the caller's spelling lumps every file into
        one bogus partition."""
        p = str(tmp_path / "t")
        spark.range(1_000).withColumn("part", F.col("id") % 3).write.partitionBy(
            "part"
        ).parquet(p)
        expected = {"part=0", "part=1", "part=2"}
        for spelling in (p, f"file://{p}", f"file:{p}"):
            h = table_health(spark, spelling)
            assert set(h.partitions) == expected, spelling

    def test_recover_after_crash_between_swap_renames(self, spark, tmp_path):
        """Simulate a crash after `path -> backup` but before
        `tmp -> path`: the table dir is GONE, backup + compacted tmp
        both exist. recover_compact must restore the table and clear
        the leftovers; the next compact() heals automatically too."""
        import os

        p = str(tmp_path / "t")
        spark.range(5_000).repartition(8).write.parquet(p)

        # build a real compacted tmp copy, then crash mid-swap
        spark.read.parquet(p).repartition(1).write.parquet(p + "._compacting")
        os.rename(p, p + "._precompact")
        assert not os.path.exists(p)

        assert recover_compact(spark, p) is True
        assert os.path.exists(p)
        assert not os.path.exists(p + "._precompact")
        assert not os.path.exists(p + "._compacting")
        assert spark.read.parquet(p).count() == 5_000

    def test_zorder_compaction_prunes_both_dimensions(self, spark, tmp_path):
        """Z-order rewrite must leave every file covering a small
        RECTANGLE of (x, y): a lexicographic sort on x gives each
        file the full y range (no y pruning); Morton interleaving
        bounds both. Assert via footer min/max spans."""
        import os

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        p = str(tmp_path / "t")
        # two independent uniform dimensions
        spark.range(40_000).select(
            F.pmod(F.hash("id"), F.lit(10_000)).cast("long").alias("x"),
            F.pmod(F.hash(F.col("id") + 1), F.lit(10_000)).cast("long").alias("y"),
        ).repartition(8).write.parquet(p)

        compact(spark, p, target_file_bytes=120_000, zorder_by=["x", "y"])

        spans = {"x": [], "y": []}
        for root, _dirs, files in os.walk(p):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(f"{root}/{f}").metadata
                for col_idx, col in enumerate(("x", "y")):
                    lo = min(
                        md.row_group(i).column(col_idx).statistics.min
                        for i in range(md.num_row_groups)
                    )
                    hi = max(
                        md.row_group(i).column(col_idx).statistics.max
                        for i in range(md.num_row_groups)
                    )
                    spans[col].append((hi - lo) / 10_000.0)
        n_files = len(spans["x"])
        assert n_files > 3  # actually split
        # Morton order: BOTH dimensions bounded per file — neither
        # span average may approach the full range (a lex sort on x
        # would put y's average at ~1.0)
        for col in ("x", "y"):
            avg_span = sum(spans[col]) / n_files
            assert avg_span < 0.75, (col, avg_span, n_files)
        assert spark.read.parquet(p).count() == 40_000

    def test_zorder_key_stays_below_sign_bit(self, spark, tmp_path):
        """4 columns at the default 16 bits/col would interleave bits
        past position 63 (the BIGINT sign bit), turning high-bucket
        keys negative and inverting part of the Morton order — the
        effective width must be capped at 63 // n_cols."""
        from building_energy_data_pipeline_spark.ops.maintenance import (
            zorder_key,
        )

        df = spark.range(2_000).select(
            F.col("id").alias("a"),
            (F.col("id") * 3 % 2_000).alias("b"),
            (F.col("id") * 7 % 2_000).alias("c"),
            (F.col("id") * 11 % 2_000).alias("d"),
        )
        keyed, key = zorder_key(spark, df, ["a", "b", "c", "d"])
        lo = keyed.agg(F.min(key)).collect()[0][0]
        assert lo >= 0

    def test_cluster_and_zorder_mutually_exclusive(self, spark, tmp_path):
        import pytest

        p = str(tmp_path / "t")
        spark.range(100).write.parquet(p)
        with pytest.raises(ValueError, match="not both"):
            compact(spark, p, cluster_by=["id"], zorder_by=["id", "id"])

    def test_compact_self_heals_crashed_swap(self, spark, tmp_path):
        import os

        p = str(tmp_path / "t")
        spark.range(5_000).repartition(8).write.parquet(p)
        os.rename(p, p + "._precompact")  # crash with only backup left

        n = compact(spark, p)
        assert n >= 1
        assert spark.read.parquet(p).count() == 5_000
        assert not os.path.exists(p + "._precompact")


class TestSnapshotRestore:
    def test_restore_returns_table_to_snapshot_state(self, spark, tmp_path):
        p = str(tmp_path / "t")
        snap = str(tmp_path / "snap")
        spark.range(100).write.parquet(p)

        n_copied = snapshot_table(spark, p, snap)
        assert n_copied >= 1
        # snapshot is byte-identical: same file names and sizes
        from building_energy_data_pipeline_spark.ops.maintenance import (
            _data_files,
        )
        orig = sorted((f.rsplit("/", 1)[1], s) for f, s in _data_files(spark, p))
        copy = sorted((f.rsplit("/", 1)[1], s) for f, s in _data_files(spark, snap))
        assert orig == copy

        # mutate the live table (append + rewrite), then restore
        spark.range(500, 600).write.mode("append").parquet(p)
        assert spark.read.parquet(p).count() == 200
        restore_table(spark, p, snap)
        restored = spark.read.parquet(p)
        assert restored.count() == 100
        assert restored.agg(F.max("id")).first()[0] == 99
        # snapshot itself untouched — restorable again
        assert spark.read.parquet(snap).count() == 100

    def test_restore_missing_snapshot_raises(self, spark, tmp_path):
        p = str(tmp_path / "t")
        spark.range(10).write.parquet(p)
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            restore_table(spark, p, str(tmp_path / "nope"))
        # table untouched by the failed restore
        assert spark.read.parquet(p).count() == 10

    def test_restore_into_empty_target(self, spark, tmp_path):
        # restore must also work when the live table dir was lost
        p = str(tmp_path / "t")
        snap = str(tmp_path / "snap")
        spark.range(50).write.parquet(p)
        snapshot_table(spark, p, snap)
        fs_path = tmp_path / "t"
        import shutil

        shutil.rmtree(fs_path)
        restore_table(spark, p, snap)
        assert spark.read.parquet(p).count() == 50


class TestObserve:
    def test_explain_capture(self, spark):
        df = spark.range(10).filter(F.col("id") > 5).select("id")
        plan = explain_str(df, "formatted")
        assert "Range" in plan
        plan_ext = explain_str(df, "extended")
        assert "Parsed Logical Plan" in plan_ext

    def test_explain_analyze_runtime_metrics(self, spark, sf_dir):
        # a registered query run: runtime metrics must surface real
        # numbers (rows produced per operator), not just the static plan
        from building_energy_data_pipeline_spark.plans import REGISTRY

        df = REGISTRY["q01_pricing_summary"].spark(spark, sf_dir)
        out = explain_analyze(df)
        assert out["result"] > 0 and out["duration_s"] > 0
        ops = out["operators"]
        assert ops, "executed plan traversal found no operators"
        names = [o["operator"] for o in ops]
        assert any("Scan" in n for n in names)
        assert any("Aggregate" in n for n in names)
        # the scan actually reports runtime output rows (metric keys
        # are Spark's internal SQLMetric names, e.g. numOutputRows)
        scan_rows = max(
            o["metrics"].get("numOutputRows", 0)
            for o in ops
            if "Scan" in o["operator"]
        )
        assert scan_rows > 0

    def test_probe_failures_log_at_debug(self, caplog):
        # VERDICT r11 #8: the advisory plan-introspection guards must
        # LOG their misses (debug level) instead of silently passing,
        # so JVM API drift across Spark versions surfaces in test
        # output. Force a probe failure with a node whose wrapper
        # accessors raise.
        import logging

        from building_energy_data_pipeline_spark.ops.observe import (
            _walk_plan,
        )

        class _EmptyIter:
            def hasNext(self):
                return False

        class _Children:
            def iterator(self):
                return _EmptyIter()

        class _FakeNode:
            def executedPlan(self):
                raise RuntimeError("forced probe failure")

            def plan(self):
                raise RuntimeError("forced probe failure")

            def children(self):
                return _Children()

        with caplog.at_level(
            logging.DEBUG,
            logger="building_energy_data_pipeline_spark.ops.observe",
        ):
            nodes = list(_walk_plan(_FakeNode()))
        assert len(nodes) == 1  # probe failures don't break the walk
        misses = [
            r
            for r in caplog.records
            if "probe" in r.message and "forced probe failure" in r.message
        ]
        assert len(misses) == 2  # .executedPlan() and .plan()

    def test_history_analyze_records_operators(self, spark):
        h = QueryHistory()
        n = h.run("ranged", lambda: spark.range(1000), analyze=True)
        assert n == 1000
        rec = h.records[-1]
        assert rec.operators and any(
            "Range" in o["operator"] for o in rec.operators
        )

    def test_history_records_and_stats(self, spark):
        h = QueryHistory(maxlen=3)
        for i in range(5):
            h.run(f"q{i}", lambda: spark.range(10))
        assert len(h.records) == 3  # ring buffer capped
        assert [r.name for r in h.records] == ["q2", "q3", "q4"]
        s = h.stats()
        assert s["n_queries"] == 3 and s["max_s"] >= s["p50_s"]

    def test_history_cache_reuses_df(self, spark):
        h = QueryHistory()
        builds = []

        def build():
            builds.append(1)
            return spark.range(100)

        assert h.run("q", build, cache=True) == 100
        assert h.run("q", build, cache=True) == 100
        assert len(builds) == 2  # fn called, but...
        assert len(h._cached) == 1  # ...the cached DataFrame is reused
        h.clear_cache()
        assert not h._cached


class TestSessionControl:
    def test_fast_action_completes_under_timeout(self, spark):
        from building_energy_data_pipeline_spark.ops import run_with_timeout

        n = run_with_timeout(spark, lambda: spark.range(1000).count(), 60)
        assert n == 1000

    def test_slow_action_is_cancelled(self, spark):
        """statement_timeout analogue: a quadratic job must be killed
        at the deadline, not run to completion."""
        import time

        import pytest
        from pyspark.sql import functions as F

        from building_energy_data_pipeline_spark.ops import run_with_timeout

        def slow():
            big = spark.range(200_000)
            return (
                big.alias("a")
                .crossJoin(big.alias("b"))
                .select(F.md5(F.expr("cast(a.id + b.id as string)")).alias("h"))
                .filter(F.col("h").startswith("ffffffffff"))
                .count()
            )

        t0 = time.time()
        with pytest.raises(TimeoutError, match="cancelled"):
            run_with_timeout(spark, slow, 3)
        assert time.time() - t0 < 40  # cancelled, not run to completion

    def test_errors_propagate(self, spark):
        import pytest

        from building_energy_data_pipeline_spark.ops import run_with_timeout

        with pytest.raises(ValueError, match="boom"):
            run_with_timeout(
                spark, lambda: (_ for _ in ()).throw(ValueError("boom")), 10
            )

    def test_job_group_tag_cleared_after_run(self, spark):
        from building_energy_data_pipeline_spark.ops import (
            cancel_job_group,
            run_in_job_group,
        )

        out = run_in_job_group(
            spark, "unit-group", lambda: spark.range(10).count(), "unit"
        )
        assert out == 10
        # cancelling the finished group must not affect later actions
        cancel_job_group(spark, "unit-group")
        assert spark.range(5).count() == 5


class TestAccessControl:
    def test_grant_revoke_and_inheritance(self, spark, tmp_path):
        from building_energy_data_pipeline_spark.ops import AccessControl

        acl = AccessControl(str(tmp_path / "acl.json"))
        acl.create_role("analyst")
        acl.create_role("intern", memberof=["analyst"])
        acl.create_role("admin", superuser=True)
        acl.grant("SELECT", "orders", "analyst")

        assert acl.check("analyst", "orders", "SELECT")
        # inherited through memberof
        assert acl.check("intern", "orders", "SELECT")
        assert not acl.check("intern", "orders", "INSERT")
        # superuser bypasses grants
        assert acl.check("admin", "lineitem", "DELETE")
        # unknown role never passes
        assert not acl.check("ghost", "orders", "SELECT")

        acl.revoke("SELECT", "orders", "analyst")
        assert not acl.check("intern", "orders", "SELECT")

    def test_all_privilege_and_enforced_read(self, spark, tmp_path):
        from building_energy_data_pipeline_spark.ops import AccessControl

        p = str(tmp_path / "t")
        spark.range(10).write.parquet(p)
        acl = AccessControl()
        acl.create_role("writer")
        acl.grant("ALL", "t", "writer")
        assert acl.check("writer", "t", "UPDATE")
        assert acl.read_table(spark, "writer", "t", p).count() == 10

        acl.create_role("nobody")
        import pytest as _pytest

        with _pytest.raises(PermissionError, match="SELECT"):
            acl.read_table(spark, "nobody", "t", p)

    def test_audit_queries_match_reference_shape(self, spark, tmp_path):
        from building_energy_data_pipeline_spark.ops import AccessControl

        acl = AccessControl(str(tmp_path / "acl.json"))
        acl.create_role("analyst")
        acl.create_role("intern", memberof=["analyst"])
        acl.grant("SELECT", "orders", "analyst")
        acl.grant("INSERT", "orders", "intern")

        audit = {
            r["rolname"]: r
            for r in acl.audit_user_permissions(spark).collect()
        }
        assert audit["intern"]["memberof"] == ["analyst"]
        assert audit["analyst"]["privileges"] == ["SELECT"]

        tbl = {
            r["grantee"]: r["privileges"]
            for r in acl.get_table_access_privileges(spark, "orders").collect()
        }
        assert tbl == {"analyst": "SELECT", "intern": "INSERT"}

    def test_state_survives_sessions(self, spark, tmp_path):
        from building_energy_data_pipeline_spark.ops import AccessControl

        path = str(tmp_path / "acl.json")
        acl = AccessControl(path)
        acl.create_role("analyst")
        acl.grant("SELECT", "orders", "analyst")

        reloaded = AccessControl(path)  # fresh instance, same file
        assert reloaded.check("analyst", "orders", "SELECT")
        reloaded.drop_role("analyst")
        assert not AccessControl(path).check("analyst", "orders", "SELECT")

    def test_cyclic_membership_terminates(self, spark, tmp_path):
        from building_energy_data_pipeline_spark.ops import AccessControl

        acl = AccessControl()
        acl.create_role("a")
        acl.create_role("b", memberof=["a"])
        acl.roles["a"].memberof.add("b")  # force a cycle
        acl.grant("SELECT", "t", "a")
        assert acl.check("b", "t", "SELECT")  # no infinite loop


class TestAccessControlHardening:
    def test_create_role_refuses_overwrite(self, tmp_path):
        import pytest as _pytest

        from building_energy_data_pipeline_spark.ops import AccessControl

        acl = AccessControl(str(tmp_path / "acl.json"))
        acl.create_role("admins", superuser=True)
        acl.create_role("analyst", memberof=["admins"])
        # silent replace would reset memberships/superuser while the
        # role's grants survive — must raise like PostgreSQL
        with _pytest.raises(ValueError, match="already exists"):
            acl.create_role("analyst")
        assert acl.roles["analyst"].memberof == {"admins"}

    def test_alter_role_changes_attrs_in_place(self, tmp_path):
        from building_energy_data_pipeline_spark.ops import AccessControl

        acl = AccessControl(str(tmp_path / "acl.json"))
        acl.create_role("ops", superuser=False)
        acl.grant("SELECT", "t", "ops")
        acl.alter_role("ops", superuser=True)
        assert acl.roles["ops"].superuser
        assert acl.check("ops", "anything", "DELETE")
        # grants untouched
        assert acl.grants[("t", "ops")] == {"SELECT"}

    def test_nologin_role_cannot_act(self, spark, tmp_path):
        import pytest as _pytest

        from building_energy_data_pipeline_spark.ops import AccessControl

        p = str(tmp_path / "t")
        spark.range(5).write.parquet(p)
        acl = AccessControl()
        acl.create_role("group_role", can_login=False)
        acl.grant("SELECT", "t", "group_role")
        # the group's privileges flow to members...
        acl.create_role("member", memberof=["group_role"])
        assert acl.read_table(spark, "member", "t", p).count() == 5
        # ...but the NOLOGIN container itself cannot act
        with _pytest.raises(PermissionError, match="log in"):
            acl.read_table(spark, "group_role", "t", p)


class TestTlsLifecycle:
    """Reference parity: ``CaManager`` cert generation / validation /
    SSL-config round trip (``src/ca_managing/ca_manager.py``,
    ``tests/test_ca_manager.py`` — same generate-to-temp-paths,
    custom-CN, and error-contract assertions)."""

    def test_generate_and_validate(self, tmp_path):
        import os

        from building_energy_data_pipeline_spark.ops import (
            generate_self_signed_cert,
            validate_certificate,
        )

        cert = str(tmp_path / "server.crt")
        key = str(tmp_path / "server.key")
        generate_self_signed_cert(cert, key, common_name="example.com")
        assert os.path.exists(cert) and os.path.exists(key)
        # private key locked down (the reference chmods 0600)
        assert oct(os.stat(key).st_mode & 0o777) == "0o600"
        details = validate_certificate(cert, show_details=True)
        assert details["common_name"] == "example.com"
        assert details["not_valid_before"] < details["not_valid_after"]
        # key matches cert: sign/verify round trip
        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding

        with open(key, "rb") as f:
            priv = serialization.load_pem_private_key(f.read(), None)
        with open(cert, "rb") as f:
            pub = x509.load_pem_x509_certificate(f.read()).public_key()
        sig = priv.sign(b"probe", padding.PKCS1v15(), hashes.SHA256())
        pub.verify(sig, b"probe", padding.PKCS1v15(), hashes.SHA256())

    def test_validate_rejects_garbage_and_expired(self, tmp_path):
        import pytest

        from building_energy_data_pipeline_spark.ops import (
            generate_self_signed_cert,
            validate_certificate,
        )

        bad = tmp_path / "bad.crt"
        bad.write_text("not a certificate")
        with pytest.raises(Exception):
            validate_certificate(str(bad))
        expired = str(tmp_path / "expired.crt")
        key = str(tmp_path / "expired.key")
        generate_self_signed_cert(expired, key, days=0)
        with pytest.raises(ValueError, match="validity window"):
            validate_certificate(expired)

    def test_openssl_error_contract(self, tmp_path):
        import pytest

        from building_energy_data_pipeline_spark.ops.tls import (
            generate_cert_with_openssl,
        )

        with pytest.raises(FileNotFoundError):
            generate_cert_with_openssl(
                str(tmp_path / "c.crt"),
                str(tmp_path / "k.key"),
                openssl_path="/nonexistent/openssl",
            )

    def test_ssl_config_round_trip_idempotent(self, tmp_path):
        from building_energy_data_pipeline_spark.ops import (
            configure_spark_ssl,
        )

        conf = str(tmp_path / "spark-defaults.conf")
        with open(conf, "w") as f:
            f.write("spark.sql.shuffle.partitions 32\n")
        configure_spark_ssl(conf, "/a.crt", "/a.key", enable=True)
        configure_spark_ssl(conf, "/a.crt", "/a.key", enable=True)
        content = open(conf).read()
        # idempotent: repeated enable leaves exactly one stanza, and
        # unrelated lines survive
        assert content.count("spark.ssl.enabled true") == 1
        assert content.count("spark.ssl.certFile") == 1
        assert "spark.sql.shuffle.partitions 32" in content
        configure_spark_ssl(conf, "/a.crt", "/a.key", enable=False)
        content = open(conf).read()
        assert "spark.ssl.enabled false" in content
        assert "certFile" not in content


class TestExpectations:
    def test_primitives_on_crafted_frame(self, spark):
        from building_energy_data_pipeline_spark.ops import expect

        df = spark.createDataFrame(
            [
                (1, "a", 5.0),
                (1, "a", 5.0),      # duplicate id
                (2, None, 0.5),     # null name
                (3, "zz", -1.0),    # bad value + out of range
            ],
            "id bigint, name string, v double",
        )
        u = expect.unique_violations(df, ["id"]).first()
        assert (u["chk"], u["n_violations"]) == ("unique", 1)
        counts = {
            r["chk"]: r["n_violations"]
            for r in expect.violation_counts(
                df,
                {
                    "name_not_null": expect.not_null("name"),
                    "name_accepted": expect.accepted(
                        "name", ["a", "b"]
                    ),
                    "v_range": expect.in_range("v", 0.0, 10.0),
                },
            ).collect()
        }
        # accepted treats NULL as violating too (2 bad: null + zz)
        assert counts == {
            "name_not_null": 1,
            "name_accepted": 2,
            "v_range": 1,
        }
        parent = spark.createDataFrame(
            [(1,), (2,)], "id bigint"
        )
        fk = expect.fk_violations(df, "id", parent, "id").first()
        assert fk["n_violations"] == 1  # id=3 orphaned

    def test_single_scan_compilation(self, spark, sf_dir):
        from building_energy_data_pipeline_spark.ops import expect

        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        df = expect.violation_counts(
            o,
            {
                "a": expect.not_null("o_custkey"),
                "b": expect.in_range("o_totalprice", 0, 1e9),
                "c": expect.accepted("o_orderstatus", ["P"]),
            },
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # adding checks must not add scans
        assert plan.count("orders.parquet") == 1
