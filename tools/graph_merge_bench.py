"""GraphRAG entity-merge at scale on chip (VERDICT r3 #6).

The reference's merge pass is an O(N²) sklearn cosine_similarity matrix +
GDS Louvain + APOC migration (Base_Neo4j.py:508-712) — at 100k entities
the similarity matrix alone is 40 GB and the pass is minutes of host
CPU. Here the SIMILAR edge list comes from the SAME batched device top-k
kernel the retrieval path uses (graph/store.py::_similar_pairs), and the
cluster merge is one host union-find + one edge-list rebuild.

Synthesizes N entities of which ~10% are near-duplicate pairs (cosine
≈0.97 — above the 0.95 merge threshold), measures:
  - embed+index time (device add),
  - merge wall-time (device KNN + union-find + rebuild),
  - found-duplicate recall vs the planted pairs,
and times the reference-shaped O(N²) numpy pass on a subsample for the
honest comparison row.

Usage: python tools/graph_merge_bench.py [--n 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402


class VecEmbeddings:
    """Deterministic content→vector lookup (planted geometry)."""

    def __init__(self, table):
        self.table = table
        self.dim = next(iter(table.values())).shape[0]

    def encode(self, texts):
        return np.stack([self.table[t] for t in texts])

    def embed_documents(self, texts):
        return self.encode(texts).tolist()

    def embed_query(self, text):
        return self.table[text].tolist()

    def describe(self):
        return {"kind": "planted", "dim": self.dim}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--dup-frac", type=float, default=0.10)
    ap.add_argument("--oracle-n", type=int, default=10_000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"device: {jax.devices()[0]}", flush=True)

    from rag_arc_tpu.graph.schema import GraphNode
    from rag_arc_tpu.graph.store import ArrayGraphStore

    rng = np.random.default_rng(0)
    n = args.n
    n_dup = int(n * args.dup_frac) // 2
    base = rng.standard_normal((n - n_dup, args.dim), dtype=np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # planted near-duplicates: perturb the first n_dup base rows so the
    # pair cosine lands ≈0.97 (> the 0.95 merge threshold); the noise is
    # scaled to TOTAL norm 0.25 (a raw standard_normal(dim) has norm
    # ~sqrt(dim), which would bury the signal)
    dup = base[:n_dup] + (0.25 / np.sqrt(args.dim)) * rng.standard_normal(
        (n_dup, args.dim), dtype=np.float32
    )
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    vecs = np.concatenate([base, dup])
    names = [f"entity_{i}" for i in range(len(base))] + [
        f"entity_dup_{i}" for i in range(n_dup)
    ]
    table = {name: vecs[i] for i, name in enumerate(names)}

    store = ArrayGraphStore(embeddings=VecEmbeddings(table))
    store.embed_batch = 8192
    t0 = time.time()
    for name in names:
        store.upsert_node(GraphNode(key=name, kind="entity", content=name))
    upsert_s = time.time() - t0

    t0 = time.time()
    embedded = store.generate_embeddings()
    embed_s = time.time() - t0
    print(f"upsert {upsert_s:.1f}s embed+index {embed_s:.1f}s ({embedded} nodes)",
          flush=True)

    t0 = time.time()
    merged = store.merge_duplicate_entities()
    merge_s = time.time() - t0

    # recall vs planted pairs: every dup row should fold into its base row
    found = merged / n_dup if n_dup else 1.0

    # reference-shaped O(N²) pass on a subsample (sklearn semantics:
    # full cosine matrix + threshold scan), extrapolates quadratically
    m = min(args.oracle_n, n)
    sub = vecs[:m]
    t0 = time.time()
    sims = sub @ sub.T
    _ = np.argwhere(np.triu(sims, 1) >= 0.95)
    on2_s = time.time() - t0
    on2_extrap = on2_s * (n / m) ** 2

    print(
        json.dumps(
            {
                "n_entities": n,
                "planted_dup_pairs": n_dup,
                "embed_index_s": round(embed_s, 1),
                "merge_wall_s": round(merge_s, 1),
                "merged_entities": merged,
                "planted_recall": round(found, 4),
                "entities_per_s_merge": round(n / merge_s, 1),
                "ref_on2_numpy_s_at_subsample": round(on2_s, 1),
                "ref_on2_subsample": m,
                "ref_on2_extrapolated_s": round(on2_extrap, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
