"""Configuration management (SURVEY §3 supporting surface) — the
engine's equivalent of the reference's YAML config manager
(``src/configuration_managing/config_manager.py:8-182``, tested at
``reference/tests/test_config_manager.py:8-50``):

- load + shallow-merge an ordered list of YAML files from a base dir
  (later files win key-by-key, ``config_manager.py:98-110``);
- dot-path ``get("a.b.c", default)`` over nested dicts
  (``config_manager.py:112-149``);
- ``validate_config`` raising ``ValueError`` for missing required
  top-level keys (``config_manager.py:152-182``, default key set kept).

Driver-side only — config never touches executors; whatever the
engine needs on the cluster travels through SparkConf / broadcast.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

try:  # PyYAML is present in this environment; gate anyway (import-try)
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

#: mirrors the reference's default file list (``config_manager.py:33-38``)
DEFAULT_CONFIG_FILES = ["project_structure_config.yaml", "app_config.yaml"]

#: mirrors the reference's required key set (``config_manager.py:168``)
REQUIRED_KEYS = ["ssl", "default_database", "project_data"]

logger = logging.getLogger("ConfigManager")


class ConfigManager:
    """Ordered-merge YAML settings with dot-path access."""

    def __init__(
        self,
        config_files: list[str] | None = None,
        base_path: str = "./config",
    ) -> None:
        self.base_path = Path(base_path)
        self.config: dict[str, Any] = {}
        self._config_files = (
            list(DEFAULT_CONFIG_FILES) if config_files is None else config_files
        )
        self._load_configs(self._config_files)

    # -- loading ----------------------------------------------------------
    def _load_yaml_file(self, file_path: Path) -> dict[str, Any]:
        if yaml is None:  # pragma: no cover
            raise ImportError("PyYAML is required for YAML config files")
        with open(file_path, "r") as fh:
            try:
                loaded = yaml.safe_load(fh) or {}
            except yaml.YAMLError:
                logger.error("Error parsing YAML file %s", file_path)
                raise
        if not isinstance(loaded, dict):
            raise ValueError(
                f"Config file {file_path} must contain a mapping at top level"
            )
        return loaded

    def _load_configs(self, config_files: list[str] | None = None) -> None:
        """Merge each existing file into ``self.config`` in list order;
        a missing file is a warning, not an error (the reference skips
        it the same way, ``config_manager.py:108-110``)."""
        for name in config_files or self._config_files:
            file_path = self.base_path / name
            if file_path.exists():
                self.config.update(self._load_yaml_file(file_path))
                logger.info("Loaded config file: %s", name)
            else:
                logger.warning("Config file %s not found. Skipping.", name)

    # -- access -----------------------------------------------------------
    def get(self, key: str, default: Any = None) -> Any:
        """Dot-path lookup: ``get("project_data.record_id")`` walks
        nested dicts; any missing segment (or a non-dict midway)
        returns ``default``."""
        if not key:
            return default
        value: Any = self.config
        for part in key.split("."):
            if not isinstance(value, dict):
                return default
            value = value.get(part)
            if value is None:
                return default
        return value

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __getitem__(self, key: str) -> Any:
        """Dict-style access (dot-paths allowed) so a ``ConfigManager``
        is a drop-in for the plain dict ``Pipeline`` historically took."""
        value = self.get(key)
        if value is None:
            raise KeyError(key)
        return value

    # -- validation -------------------------------------------------------
    def validate_config(self, required_keys: list[str] | None = None) -> None:
        """Raise ``ValueError`` on the first missing/empty required key."""
        for key in REQUIRED_KEYS if required_keys is None else required_keys:
            if not self.get(key):
                msg = f"Missing required configuration: {key}"
                logger.error(msg)
                raise ValueError(msg)
        logger.info("Configuration validation successful.")
