"""Environment configuration (C11 — VL_claims variable library,
VL/variables.json:1-87 with Prod overrides in valueSets/Prod.json).

The reference resolves per-environment values (lakehouse/warehouse
ids, connection strings) through a Fabric variable library; here a
frozen dataclass with per-env constructors replaces the whole
mechanism — values flow into the runner as plain arguments.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from fabric_claims_spark.pipeline.silver import DEFAULT_SALT


@dataclass(frozen=True)
class EngineConfig:
    env: str = "dev"
    lake_root: str = "/tmp/fabric_claims_lake"
    landing_dir: str = "landing"
    hash_salt: str = DEFAULT_SALT
    date_spine_start: str = "2015-01-01"
    date_spine_end: str = "2030-12-31"
    # Spark tuning (cluster deployments override)
    shuffle_partitions: int | None = None
    prefer_delta: bool = False
    extra_spark_conf: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls) -> "EngineConfig":
        """12-factor override path (Prod valueSet analog)."""
        return cls(
            env=os.environ.get("CLAIMS_ENV", "dev"),
            lake_root=os.environ.get("CLAIMS_LAKE_ROOT", cls.lake_root),
            hash_salt=os.environ.get("CLAIMS_HASH_SALT", DEFAULT_SALT),
            prefer_delta=os.environ.get("CLAIMS_PREFER_DELTA", "") == "1",
        )
