""".env / environment CLI configuration (A35 — envfile.py), pinned to the
reference's loadEnvFile semantics (cmd/repair/main.go:591-630)."""

from __future__ import annotations

import pytest

from prom_etl_db_spark.envfile import ENV_KEYS, load_env_file, resolve_setting


def test_env_file_parsing_quotes_comments_and_malformed_lines(tmp_path):
    f = tmp_path / ".env"
    f.write_text(
        "\n".join([
            "# a comment",
            "",
            "PLAIN=value",
            '  DOUBLE = "quoted value" ',
            "SINGLE='single quoted'",
            "EQ_IN_VALUE=a=b=c",
            "MISMATCHED=\"keeps quotes'",
            "NO_EQUALS_SIGN",
            "EMPTY=",
            'HALF="unbalanced',
        ])
    )
    env: dict[str, str] = {}
    applied = load_env_file(f, env)
    assert applied == env
    assert env == {
        "PLAIN": "value",
        "DOUBLE": "quoted value",
        "SINGLE": "single quoted",
        "EQ_IN_VALUE": "a=b=c",          # split on FIRST '=' only
        "MISMATCHED": "\"keeps quotes'",  # only a MATCHING pair strips
        "EMPTY": "",
        "HALF": '"unbalanced',
    }


def test_env_file_never_overrides_real_environment(tmp_path):
    # reference precedence: .env < environment (os.Getenv(key)=="" gate)
    f = tmp_path / ".env"
    f.write_text("KEY=from_file\nOTHER=file_only\n")
    env = {"KEY": "from_env"}
    applied = load_env_file(f, env)
    assert env["KEY"] == "from_env"
    assert env["OTHER"] == "file_only"
    assert applied == {"OTHER": "file_only"}


def test_env_file_missing_is_fine(tmp_path):
    assert load_env_file(tmp_path / "nope.env", {}) == {}


def test_resolve_setting_flag_beats_env():
    env = {"PROM_ETL_SPARK_STORE": "/from/env"}
    assert resolve_setting("/from/flag", "PROM_ETL_SPARK_STORE", env) == "/from/flag"
    assert resolve_setting(None, "PROM_ETL_SPARK_STORE", env) == "/from/env"
    assert resolve_setting(None, "PROM_ETL_SPARK_AUDIT", env) is None


def test_cli_resolves_paths_from_env_and_env_file(
    spark, tmp_path, monkeypatch
):
    # full precedence chain through the real CLI: --store flag beats the
    # env var, --configs comes from the environment, --audit and --sf-dir
    # come from the .env file
    import prom_etl_db_spark.__main__ as cli
    import prom_etl_db_spark.session as sess
    from prom_etl_db_spark.config import QueryConfig, upsert_config

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    catalog = str(tmp_path / "configs")
    upsert_config(
        spark, catalog,
        QueryConfig(
            query_id="e1", name="sum", query="sum(click) by (k)",
            time_range_type="range",
            time_range_start="-1d", time_range_end="now", time_range_step="1h",
        ),
    )
    envf = tmp_path / "cli.env"
    envf.write_text(
        f"PROM_ETL_SPARK_AUDIT={tmp_path / 'audit'}\n"
        "PROM_ETL_SPARK_SF_DIR=/root/testdata/sf0.001\n"
        "PROM_ETL_SPARK_STORE=/env/file/loses/to/flag\n"
    )
    monkeypatch.setenv("PROM_ETL_SPARK_CONFIGS", catalog)
    for k in ("PROM_ETL_SPARK_STORE", "PROM_ETL_SPARK_AUDIT", "PROM_ETL_SPARK_SF_DIR"):
        monkeypatch.delenv(k, raising=False)
    store = str(tmp_path / "metrics")
    rc = cli.main([
        "run-once", "--env-file", str(envf), "--store", store,
        "--now", "2024-01-31T00:00:00", "--no-sleep",
    ])
    assert rc == 0
    assert spark.read.parquet(store).count() > 0  # flag won for --store
    assert spark.read.parquet(str(tmp_path / "audit")).count() == 1  # from .env


def test_cli_missing_required_path_errors(monkeypatch, tmp_path):
    import prom_etl_db_spark.__main__ as cli

    for key in ENV_KEYS.values():
        monkeypatch.delenv(key, raising=False)
    with pytest.raises(SystemExit):
        cli.main([
            "run-once", "--env-file", str(tmp_path / "absent.env"),
            "--now", "2024-01-31T00:00:00",
        ])
