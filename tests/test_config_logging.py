"""Config manager + logging configuration units, mirroring the
reference's ``tests/test_config_manager.py:8-50`` and
``tests/test_logging.py:10-188``."""

from __future__ import annotations

import logging
from logging.handlers import RotatingFileHandler
from pathlib import Path

import pytest

from building_energy_data_pipeline_spark.config import (
    DEFAULT_CONFIG_FILES,
    ConfigManager,
)
from building_energy_data_pipeline_spark.logging_setup import setup_logging


@pytest.fixture()
def config_dir(tmp_path):
    (tmp_path / "app_config.yaml").write_text(
        """
project_data:
  record_id: "3887306"
  raw_data_file_path: "./data_sources/raw_data"
ssl:
  ssl_cert_path: "cert.pem"
default_database:
  host: "localhost"
  port: 5432
warehouse_path: "/tmp/wh"
"""
    )
    (tmp_path / "project_structure_config.yaml").write_text(
        """
project_structure:
  data_sources: {}
"""
    )
    return tmp_path


class TestConfigManager:
    def test_default_config_files(self, config_dir):
        cm = ConfigManager(base_path=str(config_dir))
        assert cm._config_files == DEFAULT_CONFIG_FILES
        # both defaults merged
        assert "project_data" in cm.config
        assert "project_structure" in cm.config

    def test_custom_config_files_and_base_path(self, tmp_path):
        (tmp_path / "custom.yaml").write_text("a: 1\n")
        cm = ConfigManager(["custom.yaml"], base_path=str(tmp_path))
        assert cm._config_files == ["custom.yaml"]
        assert cm.base_path == Path(str(tmp_path))
        assert cm.config == {"a": 1}

    def test_missing_file_skipped(self, tmp_path):
        cm = ConfigManager(["nope.yaml"], base_path=str(tmp_path))
        assert cm.config == {}

    def test_later_file_wins(self, tmp_path):
        (tmp_path / "a.yaml").write_text("k: 1\nonly_a: true\n")
        (tmp_path / "b.yaml").write_text("k: 2\n")
        cm = ConfigManager(["a.yaml", "b.yaml"], base_path=str(tmp_path))
        assert cm.get("k") == 2
        assert cm.get("only_a") is True

    def test_dot_path_get(self, config_dir):
        cm = ConfigManager(base_path=str(config_dir))
        assert cm.get("project_data.record_id") == "3887306"
        assert cm.get("default_database.port") == 5432
        assert cm.get("project_data.nope", "dflt") == "dflt"
        assert cm.get("nope.deep.deeper", 7) == 7
        assert cm.get("", "empty") == "empty"
        # non-dict midway returns default rather than raising
        assert cm.get("warehouse_path.sub", "d") == "d"

    def test_getitem_contract(self, config_dir):
        cm = ConfigManager(base_path=str(config_dir))
        assert cm["warehouse_path"] == "/tmp/wh"
        assert "ssl" in cm
        with pytest.raises(KeyError):
            cm["missing_key"]

    def test_validate_config_ok(self, config_dir):
        cm = ConfigManager(base_path=str(config_dir))
        cm.validate_config()  # ssl / default_database / project_data present

    def test_validate_config_missing(self, tmp_path):
        (tmp_path / "a.yaml").write_text("ssl: {cert: x}\n")
        cm = ConfigManager(["a.yaml"], base_path=str(tmp_path))
        with pytest.raises(ValueError, match="default_database"):
            cm.validate_config()

    def test_invalid_yaml_raises(self, tmp_path):
        (tmp_path / "bad.yaml").write_text("a: [unclosed\n")
        with pytest.raises(Exception):
            ConfigManager(["bad.yaml"], base_path=str(tmp_path))

    def test_pipeline_accepts_config_manager(self, spark, config_dir):
        from building_energy_data_pipeline_spark.pipeline import Pipeline

        p = Pipeline(spark, ConfigManager(base_path=str(config_dir)))
        assert p.warehouse == "/tmp/wh"

    def test_pipeline_config_manager_validation(self, spark, tmp_path):
        from building_energy_data_pipeline_spark.pipeline import Pipeline

        (tmp_path / "a.yaml").write_text("unrelated: 1\n")
        with pytest.raises(ValueError, match="warehouse_path"):
            Pipeline(spark, ConfigManager(["a.yaml"], base_path=str(tmp_path)))


class TestLoggingSetup:
    @pytest.fixture(autouse=True)
    def restore_root(self):
        root = logging.getLogger()
        saved_handlers, saved_level = root.handlers.copy(), root.level
        yield
        root.handlers = saved_handlers
        root.setLevel(saved_level)

    def test_handlers_levels_and_rotation_params(self, tmp_path):
        log_file = tmp_path / "logs" / "application.log"
        root = setup_logging(log_file)
        assert root.level == logging.DEBUG
        ours = [h for h in root.handlers if getattr(h, "_bedp_spark_logging_handler", False)]
        assert len(ours) == 2
        by_type = {type(h): h for h in ours}
        assert by_type[logging.StreamHandler].level == logging.INFO
        fh = by_type[RotatingFileHandler]
        assert fh.level == logging.DEBUG
        assert fh.baseFilename == str(log_file)
        assert fh.maxBytes == 5 * 1024 * 1024
        assert fh.backupCount == 3

    def test_custom_parameters(self, tmp_path):
        root = setup_logging(
            tmp_path / "c.log", max_bytes=1024 * 1024, backup_count=5
        )
        fh = next(h for h in root.handlers if isinstance(h, RotatingFileHandler))
        assert fh.maxBytes == 1024 * 1024
        assert fh.backupCount == 5

    def test_rotation(self, tmp_path):
        log_file = tmp_path / "r.log"
        setup_logging(log_file, max_bytes=100, backup_count=3)
        logger = logging.getLogger("rot_test")
        for _ in range(10):
            logger.info("X" * 50)
        assert log_file.exists()
        assert (tmp_path / "r.log.1").exists()

    def test_format_and_levels(self, tmp_path):
        log_file = tmp_path / "f.log"
        setup_logging(log_file)
        logger = logging.getLogger("fmt_test")
        logger.debug("Debug message")
        logger.info("Info message")
        content = log_file.read_text()
        assert "fmt_test" in content and " - " in content
        assert "Debug message" in content  # DEBUG reaches the file handler
        assert "Info message" in content

    def test_repeat_calls_do_not_stack_handlers(self, tmp_path):
        setup_logging(tmp_path / "m.log")
        n1 = len(logging.getLogger().handlers)
        setup_logging(tmp_path / "m.log")
        n2 = len(logging.getLogger().handlers)
        assert n1 == n2

    def test_creates_missing_log_dir(self, tmp_path):
        log_file = tmp_path / "deep" / "nested" / "app.log"
        setup_logging(log_file)
        logging.getLogger("mk_test").info("hello")
        assert log_file.exists()
