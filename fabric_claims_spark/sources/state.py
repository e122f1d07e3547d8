"""Watermark state documents (SURVEY.md §2.9 I1-I4, S4/S5/S11).

The reference keeps a one-document JSON watermark per layer
(``Files/watermarks/Watermark.json`` = {"lastModified": ts},
NBclaims_bronze_watermark.Notebook/notebook-content.py:39-46) and
compares it against source file modification times (GetMetadata,
PLclaims_bronze.DataPipeline/pipeline-content.json:5-46). Timestamps
are UTC ISO-8601 seconds ('%Y-%m-%dT%H:%M:%SZ').

The clock is injectable so tests are deterministic (SURVEY.md §7 risk
register: F15).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from datetime import datetime, timezone

WM_FORMAT = "%Y-%m-%dT%H:%M:%SZ"
EPOCH = "1970-01-01T00:00:00Z"


def utc_now() -> datetime:
    return datetime.now(timezone.utc)


class WatermarkStore:
    """One JSON state doc per named layer under ``root``."""

    def __init__(self, root: str, clock: Callable[[], datetime] = utc_now):
        self.root = root
        self.clock = clock
        os.makedirs(root, exist_ok=True)

    def _path(self, layer: str) -> str:
        return os.path.join(self.root, f"{layer}.json")

    def read(self, layer: str) -> str:
        """Stored watermark, or epoch when the layer has never run
        (gold lookup COALESCE semantics, PL_GOLD:74)."""
        try:
            with open(self._path(layer)) as f:
                return json.load(f)["lastModified"]
        except FileNotFoundError:
            return EPOCH

    def write(self, layer: str, ts: str | datetime | None = None) -> str:
        """Commit a watermark AFTER a successful transform (I3 ordering,
        PL_BRONZE:208-265)."""
        if ts is None:
            ts = self.clock()
        if isinstance(ts, datetime):
            ts = ts.astimezone(timezone.utc).strftime(WM_FORMAT)
        tmp = self._path(layer) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"lastModified": ts}, f)
        os.replace(tmp, self._path(layer))
        return ts

    @staticmethod
    def is_newer(source_ts: str, stored_ts: str) -> bool:
        """The IfCondition @greater gate (PL_BRONZE:114-118) — ISO-8601
        UTC strings compare lexicographically."""
        return source_ts > stored_ts


def file_modified_utc(path: str) -> str:
    """GetMetadata lastModified analog (S5, PL_BRONZE:5-46)."""
    mtime = os.stat(path).st_mtime
    return datetime.fromtimestamp(mtime, tz=timezone.utc).strftime(WM_FORMAT)
