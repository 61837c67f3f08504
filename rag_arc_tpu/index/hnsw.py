"""HNSW index (host C++ behind ctypes).

Capability parity with the reference's FAISS ``IndexHNSWFlat`` (M=32,
``VectorStore_Faiss.py:120``), implemented from scratch in
``native/hnsw.cpp``. Presents the same interface as the device indexes
(add / search / mark_deleted / take / stats) so ``TPUVectorStore`` treats
all three index types uniformly. Use for latency-critical single-query
traffic on host; the HBM flat/IVF indexes are the TPU-native throughput
paths.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from rag_arc_tpu.native.build import load_library

_METRIC_CODE = {"cosine": 0, "ip": 0, "l2": 1}


def _bind():
    lib = load_library("hnsw")
    lib.hnsw_create.restype = ctypes.c_void_p
    lib.hnsw_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_int,
    ]
    lib.hnsw_is_quantized.restype = ctypes.c_int
    lib.hnsw_is_quantized.argtypes = [ctypes.c_void_p]
    lib.hnsw_free.argtypes = [ctypes.c_void_p]
    lib.hnsw_add.restype = ctypes.c_int64
    lib.hnsw_add.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.hnsw_search.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hnsw_mark_deleted.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.hnsw_size.restype = ctypes.c_int64
    lib.hnsw_size.argtypes = [ctypes.c_void_p]
    lib.hnsw_count_deleted.restype = ctypes.c_int64
    lib.hnsw_count_deleted.argtypes = [ctypes.c_void_p]
    lib.hnsw_get_vector.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    lib.hnsw_save.restype = ctypes.c_int
    lib.hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.hnsw_load.restype = ctypes.c_void_p
    lib.hnsw_load.argtypes = [ctypes.c_char_p]
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class HNSWIndex:
    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        M: int = 32,
        ef_construction: int = 200,
        ef_search: int = 64,
        seed: int = 0,
        quantize: bool = False,
        _handle: Optional[int] = None,
    ):
        if metric not in _METRIC_CODE:
            raise ValueError(f"metric must be one of {sorted(_METRIC_CODE)}")
        self._lib = _bind()
        self.dim = dim
        self.metric = metric
        self.M = M
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        # SQ8: vectors store as per-vector-scaled symmetric int8 inside the
        # C++ engine — 4x less resident memory than f32 (FAISS IndexHNSWSQ
        # parity); graph traversal and scores use the quantized metric
        self.quantize = bool(quantize)
        self.n_deleted = 0
        self._handle = _handle if _handle is not None else self._lib.hnsw_create(
            dim, M, ef_construction, _METRIC_CODE[metric], seed,
            1 if quantize else 0,
        )

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.hnsw_free(handle)
            self._handle = None

    # -- interface shared with the device indexes ---------------------------

    def _prep(self, vectors: np.ndarray) -> np.ndarray:
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if self.metric == "cosine":
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12
            )
            vectors = np.ascontiguousarray(vectors)
        return vectors

    def add(self, vectors: np.ndarray) -> np.ndarray:
        vectors = self._prep(np.atleast_2d(vectors))
        if vectors.shape[1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {vectors.shape[1]}")
        n = vectors.shape[0]
        if n == 0:
            return np.empty((0,), dtype=np.int64)
        start = self._lib.hnsw_add(self._handle, _fptr(vectors), n)
        return np.arange(start, start + n, dtype=np.int64)

    def search(
        self, queries: np.ndarray, k: int, ef: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        queries = self._prep(np.atleast_2d(queries))
        if k <= 0:
            raise ValueError("k must be positive")
        nq = queries.shape[0]
        scores = np.empty((nq, k), dtype=np.float32)
        ids = np.empty((nq, k), dtype=np.int64)
        self._lib.hnsw_search(
            self._handle,
            _fptr(queries),
            nq,
            k,
            int(ef or self.ef_search),
            _fptr(scores),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        scores = np.where(ids < 0, -np.inf, scores)
        return scores, ids

    def mark_deleted(self, positions: np.ndarray) -> None:
        positions = np.ascontiguousarray(positions, dtype=np.int64)
        if positions.size == 0:
            return
        self._lib.hnsw_mark_deleted(
            self._handle,
            positions.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            positions.size,
        )
        self.n_deleted += int(positions.size)

    def take(self, positions: np.ndarray) -> np.ndarray:
        out = np.empty((len(positions), self.dim), dtype=np.float32)
        for i, p in enumerate(positions):
            self._lib.hnsw_get_vector(self._handle, int(p), _fptr(out[i]))
        return out

    @property
    def size(self) -> int:
        return int(self._lib.hnsw_size(self._handle))

    @property
    def n_active(self) -> int:
        return self.size - self.n_deleted

    def stats(self) -> Dict[str, object]:
        return {
            "kind": "hnsw",
            "dim": self.dim,
            "metric": self.metric,
            "M": self.M,
            "ef_construction": self.ef_construction,
            "ef_search": self.ef_search,
            "size": self.size,
            "active": self.n_active,
            "deleted": self.n_deleted,
            "quantized": self.quantize,
            "vector_bytes": self.size * self.dim * (1 if self.quantize else 4),
            "backend": "native-c++",
        }

    # -- persistence ---------------------------------------------------------

    def save(self, path: str | Path) -> None:
        rc = self._lib.hnsw_save(self._handle, str(path).encode())
        if rc != 0:
            raise IOError(f"hnsw_save failed for {path}")

    @classmethod
    def load(
        cls,
        path: str | Path,
        metric: str = "cosine",
        ef_search: int = 64,
    ) -> "HNSWIndex":
        lib = _bind()
        handle = lib.hnsw_load(str(path).encode())
        if not handle:
            raise IOError(f"hnsw_load failed for {path}")
        # dim/M recovered via a probe search call is overkill; stash them in
        # the python wrapper by reading the snapshot header
        import struct

        with open(path, "rb") as f:
            magic = f.read(8)
            dim, M, efc, metric_code, _ = struct.unpack("<5i", f.read(20))
        index = cls.__new__(cls)
        index._lib = lib
        index._handle = handle
        index.dim = dim
        index.M = M
        index.ef_construction = efc
        index.metric = metric if metric_code == 0 else "l2"
        index.ef_search = ef_search
        index.quantize = bool(lib.hnsw_is_quantized(handle))
        # the snapshot preserves per-node deleted flags; count them so
        # n_active / compaction-threshold logic stays correct after load
        index.n_deleted = int(lib.hnsw_count_deleted(handle))
        return index
