"""Pipeline config loading (reference parity: `config_loader.py:4-26`).

YAML -> validated dict. Same error surface as the reference (missing
file, parse error) but returns typed dataclasses instead of raw dicts
so pipeline construction fails at load time, not mid-build.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - PyYAML ships with pyspark images
    yaml = None


class ConfigError(ValueError):
    """Invalid or missing pipeline configuration."""


@dataclass
class SourceConfig:
    type: str  # kafka | parquet | json | csv | rate | memory
    options: dict[str, Any] = field(default_factory=dict)
    schema: str | None = None  # registered schema name to apply
    path: str | None = None
    streaming: bool = True


@dataclass
class ProcessorConfig:
    name: str  # registry name or dotted path
    params: dict[str, Any] = field(default_factory=dict)


@dataclass
class SinkConfig:
    type: str  # kafka | parquet | console | memory | noop
    options: dict[str, Any] = field(default_factory=dict)
    path: str | None = None
    output_mode: str = "append"
    checkpoint_location: str | None = None
    query_name: str | None = None
    trigger: dict[str, Any] | None = None


@dataclass
class PipelineConfig:
    name: str
    source: SourceConfig
    processors: list[ProcessorConfig]
    sink: SinkConfig


def load_config(path: str) -> dict[str, Any]:
    """YAML file -> dict (reference `load_config`, `config_loader.py:4-26`)."""
    if yaml is None:
        raise ConfigError("PyYAML not available")
    if not os.path.exists(path):
        raise ConfigError(f"config file not found: {path}")
    with open(path) as f:
        try:
            cfg = yaml.safe_load(f)
        except yaml.YAMLError as ex:
            raise ConfigError(f"invalid YAML in {path}: {ex}") from ex
    if not isinstance(cfg, dict):
        raise ConfigError(f"config root must be a mapping, got {type(cfg).__name__}")
    return cfg


def parse_pipeline_config(cfg: dict[str, Any]) -> PipelineConfig:
    """Validate + type a raw config dict into a PipelineConfig."""
    for key in ("source", "sink"):
        if key not in cfg:
            raise ConfigError(f"pipeline config missing required section {key!r}")
    src = cfg["source"]
    if "type" not in src:
        raise ConfigError("source config missing 'type'")
    sink = cfg["sink"]
    if "type" not in sink:
        raise ConfigError("sink config missing 'type'")
    procs = []
    for i, p in enumerate(cfg.get("processors", []) or []):
        if "name" not in p and "class" not in p:
            raise ConfigError(f"processor #{i} missing 'name' (or 'class')")
        procs.append(
            ProcessorConfig(
                name=p.get("name") or p.get("class"),
                params=p.get("params", {}) or {},
            )
        )
    return PipelineConfig(
        name=cfg.get("name", "pipeline"),
        source=SourceConfig(
            type=src["type"],
            options={k: v for k, v in src.items() if k not in ("type", "schema", "path", "streaming")},
            schema=src.get("schema"),
            path=src.get("path"),
            streaming=bool(src.get("streaming", True)),
        ),
        processors=procs,
        sink=SinkConfig(
            type=sink["type"],
            options={
                k: v
                for k, v in sink.items()
                if k
                not in (
                    "type",
                    "path",
                    "output_mode",
                    "checkpoint_location",
                    "query_name",
                    "trigger",
                )
            },
            path=sink.get("path"),
            output_mode=sink.get("output_mode", "append"),
            checkpoint_location=sink.get("checkpoint_location"),
            query_name=sink.get("query_name"),
            trigger=sink.get("trigger"),
        ),
    )


def load_pipeline_config(path: str) -> PipelineConfig:
    return parse_pipeline_config(load_config(path))
