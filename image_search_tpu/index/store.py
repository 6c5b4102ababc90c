"""On-disk embedding store: append-only shards + JSON manifest.

Replaces the reference's external SurrealDB instance (`image` table
``{id, image_path, embedding}`` with an MTREE index,
``/root/reference/server/src/clip.rs:135-143``) with plain files:

- ``shard_NNNNN.npy``  — float32 [n, dim] raw (unnormalized) embeddings,
  exactly what the model produced (the reference also stores unnormalized
  vectors, ``clip.rs:124``)
- ``shard_NNNNN.paths.json`` — the image paths for those rows
- ``manifest.json`` — dim + shard list, written atomically last, so an
  interrupted ingest resumes at the last complete flush (SURVEY.md §5's
  checkpoint/resume requirement)

Dedup-on-ingest mirrors the reference's per-chunk
``SELECT image_path ... WHERE image_path IN $paths`` (clip.rs:74-87) via the
in-memory path set.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Iterator, List, Sequence, Set, Tuple

import numpy as np


class EmbeddingStore:
    """Append-only persistent (path, embedding) store."""

    MANIFEST = "manifest.json"

    def __init__(self, directory: str, dim: int):
        self.directory = directory
        self.dim = dim
        self._shards: List[str] = []
        self._paths: List[str] = []
        self._path_set: Set[str] = set()
        os.makedirs(directory, exist_ok=True)
        self._load_manifest()

    # -- persistence --------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.directory, self.MANIFEST)

    def _load_manifest(self) -> None:
        mp = self._manifest_path()
        if not os.path.exists(mp):
            return
        with open(mp) as f:
            m = json.load(f)
        if m["dim"] != self.dim:
            raise ValueError(f"store dim {m['dim']} != requested {self.dim}")
        self._shards = list(m["shards"])
        for shard in self._shards:
            with open(os.path.join(self.directory, shard + ".paths.json")) as f:
                paths = json.load(f)
            self._paths.extend(paths)
            self._path_set.update(paths)

    def _write_manifest(self) -> None:
        data = json.dumps({"dim": self.dim, "version": 1, "shards": self._shards})
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(data)
        os.replace(tmp, self._manifest_path())  # atomic on POSIX

    # -- API ----------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._paths)

    @property
    def paths(self) -> List[str]:
        return self._paths

    def existing(self, paths: Sequence[str]) -> Set[str]:
        """Which of `paths` are already stored (the clip.rs:74-87 dedup)."""
        return {p for p in paths if p in self._path_set}

    def filter_new(self, paths: Sequence[str]) -> List[str]:
        return [p for p in paths if p not in self._path_set]

    def append(self, paths: Sequence[str], embeddings: np.ndarray) -> int:
        """Persist a batch; silently drops already-stored paths. Returns #added."""
        embeddings = np.asarray(embeddings, np.float32)
        assert embeddings.ndim == 2 and embeddings.shape[1] == self.dim, embeddings.shape
        assert len(paths) == embeddings.shape[0], (len(paths), embeddings.shape)
        keep = [i for i, p in enumerate(paths) if p not in self._path_set]
        if not keep:
            return 0
        paths = [paths[i] for i in keep]
        embeddings = embeddings[keep]

        shard = f"shard_{len(self._shards):05d}"
        np.save(os.path.join(self.directory, shard + ".npy"), embeddings)
        with open(os.path.join(self.directory, shard + ".paths.json"), "w") as f:
            json.dump(list(paths), f)
        self._shards.append(shard)
        self._paths.extend(paths)
        self._path_set.update(paths)
        self._write_manifest()
        return len(paths)

    def iter_shards(self) -> Iterator[Tuple[List[str], np.ndarray]]:
        for shard in self._shards:
            emb = np.load(os.path.join(self.directory, shard + ".npy"))
            with open(os.path.join(self.directory, shard + ".paths.json")) as f:
                paths = json.load(f)
            yield paths, emb

    def load_all(self) -> Tuple[List[str], np.ndarray]:
        if not self._shards:
            return [], np.zeros((0, self.dim), np.float32)
        chunks = [emb for _, emb in self.iter_shards()]
        return list(self._paths), np.concatenate(chunks, axis=0)
