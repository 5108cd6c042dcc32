"""Checkpoint / resume for long batch jobs.

The reference persists nothing mid-flow (results land in txt files,
``NTT_PCIECommunication.c:106-120``).  Production batch multiplication
over huge workloads needs restartable progress: this module provides a
chunked driver that persists completed chunks + a manifest (npz) and
resumes from the last complete chunk after a crash — the
checkpoint/resume auxiliary subsystem of SURVEY.md §5.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

__all__ = ["CheckpointedRun", "save_array", "load_array"]


def save_array(path, arr) -> None:
    np.savez_compressed(str(path), data=np.asarray(arr))


def load_array(path) -> np.ndarray:
    with np.load(str(path)) as z:
        return z["data"]


class CheckpointedRun:
    """Chunked, restartable elementwise batch job.

    >>> run = CheckpointedRun(dir, total=len(a), chunk=4096)
    >>> for lo, hi in run.pending():
    ...     run.complete(lo, hi, engine.multiply(a[lo:hi], b[lo:hi]))
    >>> c = run.gather()
    """

    def __init__(self, directory, total: int, chunk: int,
                 fingerprint: str | None = None):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.total, self.chunk = total, chunk
        self.fingerprint = fingerprint
        self.manifest = self.dir / "manifest.json"
        self._done = self._load_manifest()

    def _load_manifest(self) -> set[int]:
        if self.manifest.exists():
            meta = json.loads(self.manifest.read_text())
            if meta["total"] != self.total or meta["chunk"] != self.chunk:
                raise ValueError("manifest disagrees with job shape — "
                                 "refusing to resume into a different job")
            if (self.fingerprint is not None
                    and meta.get("fingerprint") not in (None,
                                                        self.fingerprint)):
                raise ValueError(
                    "manifest fingerprint disagrees — the checkpoint "
                    "directory holds chunks from DIFFERENT inputs/params; "
                    "refusing to mix stale results into this job")
            return set(meta["done"])
        return set()

    def _save_manifest(self) -> None:
        self.manifest.write_text(json.dumps(
            {"total": self.total, "chunk": self.chunk,
             "fingerprint": self.fingerprint,
             "done": sorted(self._done)}))

    def pending(self):
        for lo in range(0, self.total, self.chunk):
            if lo not in self._done:
                yield lo, min(lo + self.chunk, self.total)

    def complete(self, lo: int, hi: int, result) -> None:
        save_array(self.dir / f"chunk_{lo}.npz", result)
        self._done.add(lo)
        self._save_manifest()

    @property
    def finished(self) -> bool:
        return len(self._done) == -(-self.total // self.chunk)

    def gather(self) -> np.ndarray:
        if not self.finished:
            raise RuntimeError("job incomplete; call pending() first")
        parts = [load_array(self.dir / f"chunk_{lo}.npz")
                 for lo in range(0, self.total, self.chunk)]
        return np.concatenate(parts, axis=0)
