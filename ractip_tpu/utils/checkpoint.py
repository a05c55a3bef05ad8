"""Checkpoint / resume for long batched sweeps.

The reference never needs checkpoints (runs are seconds-long); the batched
TPU workloads -- thousand-decoy z-score sweeps, multi-thousand-pair corpus
scans sharded over a mesh -- do (SURVEY.md section 5, "checkpoint = saved
probability matrices / solver state for long batched sweeps").

Design: a sweep is a deterministic list of work chunks.  Each completed chunk
is written as `chunk_{i:06d}.npz` (numpy arrays, including unicode bracket
arrays) plus a JSON manifest keyed by a caller-supplied fingerprint of the
workload; on resume, chunks whose files exist are skipped and their stored
results returned.  Files are written atomically (tmp + rename) so a killed
run never leaves a half-written chunk behind.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np


class SweepCheckpoint:
    """Chunk-granular checkpoint store under one directory."""

    def __init__(self, directory: str, fingerprint: str = ""):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.manifest_path = os.path.join(directory, "MANIFEST.json")
        self.manifest = {"fingerprint": fingerprint, "chunks": {}}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                old = json.load(f)
            if fingerprint and old.get("fingerprint") not in ("", fingerprint):
                raise ValueError(
                    f"checkpoint dir {directory} belongs to a different "
                    f"workload (fingerprint {old.get('fingerprint')!r} != "
                    f"{fingerprint!r})")
            self.manifest = old
            self.manifest["fingerprint"] = fingerprint

    def _chunk_path(self, i: int) -> str:
        return os.path.join(self.dir, f"chunk_{i:06d}.npz")

    def has(self, i: int) -> bool:
        return str(i) in self.manifest["chunks"] \
            and os.path.exists(self._chunk_path(i))

    def load(self, i: int) -> dict[str, np.ndarray]:
        with np.load(self._chunk_path(i), allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    def save(self, i: int, arrays: dict[str, np.ndarray]):
        """Atomic write of one chunk + manifest update."""
        path = self._chunk_path(i)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **{k: np.asarray(v) for k, v in arrays.items()})
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
        self.manifest["chunks"][str(i)] = os.path.basename(path)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)

    def map_chunks(self, n_chunks: int, run_chunk):
        """run_chunk(i) -> dict[str, array] for chunks not yet done; returns
        the full ordered list of chunk dicts (stored + fresh)."""
        out = []
        for i in range(n_chunks):
            if self.has(i):
                out.append(self.load(i))
            else:
                res = run_chunk(i)
                self.save(i, res)
                out.append(res)
        return out
