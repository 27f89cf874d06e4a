"""Per-partition build checkpoints: manifests with lineage + metrics.

North-rule requirement: index builds resume from per-partition
checkpoints carrying lineage and throughput metrics.  Each build
stage (staging, every chunk, finalize) writes a small JSON manifest
*atomically* (tmp file + ``os.replace``) after its output is fully
committed; resume skips any stage whose manifest is present and whose
input fingerprint still matches.  The reference has no analog — its
build is all-or-nothing in RAM (templates/archi.html:102).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


def manifest_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "manifests", f"{name}.json")


def write_manifest(out_dir: str, name: str, payload: dict[str, Any]) -> None:
    path = manifest_path(out_dir, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = dict(payload)
    payload.setdefault("manifest", name)
    payload.setdefault("written_at_unix", time.time())
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_manifest(out_dir: str, name: str) -> dict[str, Any] | None:
    path = manifest_path(out_dir, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def stage_complete(out_dir: str, name: str,
                   fingerprint: dict[str, Any] | None = None) -> bool:
    m = read_manifest(out_dir, name)
    if m is None:
        return False
    if fingerprint is not None and m.get("fingerprint") != fingerprint:
        return False
    return True
