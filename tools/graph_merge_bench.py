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


def run_hard(args) -> None:
    """Hard-corpus merge stress (VERDICT r4 #9). Geometry: orthogonal
    noise of total norm t gives adjacent cosine ≈ 1/sqrt(1+t²); chains
    random-walk, so cos(v0, v_k) ≈ 1/sqrt(1+k·t²) — at t=0.28 adjacent
    pairs sit at ≈0.963 (merge) while 4+ steps apart drops under 0.95
    (must still fold via union-find transitivity). Negatives use t=0.375
    (cos≈0.936, > 4 bf16-scoring sigmas below the threshold)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"device: {jax.devices()[0]} (hard corpus)", flush=True)

    from rag_arc_tpu.graph.schema import GraphEdge, GraphNode
    from rag_arc_tpu.graph.store import ArrayGraphStore

    rng = np.random.default_rng(0)
    n, dim = args.n, args.dim
    t_pos, t_neg = 0.28, 0.375

    def walk(v0, steps, t):
        out = [v0]
        for _ in range(steps):
            nxt = out[-1] + (t / np.sqrt(dim)) * rng.standard_normal(
                dim
            ).astype(np.float32)
            out.append(nxt / np.linalg.norm(nxt))
        return out

    t0 = time.time()
    vecs: list = []
    names: list = []
    clusters: list = []  # planted positive clusters (lists of names)
    neg_pairs: list = []  # boundary negatives (must NOT merge)
    i = 0
    # ~20% of entities live in chained clusters, ~4% in negative pairs
    n_cluster_rows = int(n * 0.20)
    n_neg_rows = int(n * 0.04)
    while sum(len(c) for c in clusters) < n_cluster_rows:
        size = int(rng.integers(2, 9))
        v0 = rng.standard_normal(dim).astype(np.float32)
        v0 /= np.linalg.norm(v0)
        chain = walk(v0, size - 1, t_pos)
        members = []
        for v in chain:
            nm = f"c{len(clusters)}_m{len(members)}_{i}"
            names.append(nm)
            vecs.append(v)
            members.append(nm)
            i += 1
        clusters.append(members)
    for j in range(n_neg_rows // 2):
        v0 = rng.standard_normal(dim).astype(np.float32)
        v0 /= np.linalg.norm(v0)
        _, v1 = walk(v0, 1, t_neg)
        a, b = f"neg{j}_a_{i}", f"neg{j}_b_{i + 1}"
        names += [a, b]
        vecs += [v0, v1]
        neg_pairs.append((a, b))
        i += 2
    while len(names) < n:
        v = rng.standard_normal(dim).astype(np.float32)
        names.append(f"bg_{i}")
        vecs.append(v / np.linalg.norm(v))
        i += 1
    vec_arr = np.stack(vecs)
    print(f"corpus built {time.time()-t0:.0f}s: {len(clusters)} clusters "
          f"(sizes 2-8), {len(neg_pairs)} boundary negatives", flush=True)

    store = ArrayGraphStore(embeddings=VecEmbeddings(
        dict(zip(names, vec_arr))))
    store.embed_batch = 8192
    t0 = time.time()
    for name in names:
        store.upsert_node(GraphNode(key=name, kind="entity", content=name))
    # ~2 relations/entity incl. intra-cluster edges (the migration load)
    edge_count = 0
    for members in clusters:
        for a, b in zip(members, members[1:]):
            if store.add_edge(GraphEdge(src=a, dst=b,
                                        edge_type="ENTITY_RELATION")):
                edge_count += 1
    rnd = rng.integers(0, len(names), size=(2 * n - 2 * edge_count, 2))
    for a_i, b_i in rnd:
        if a_i != b_i and store.add_edge(GraphEdge(
                src=names[a_i], dst=names[b_i],
                edge_type="ENTITY_RELATION")):
            edge_count += 1
    upsert_s = time.time() - t0
    t0 = time.time()
    embedded = store.generate_embeddings()
    embed_s = time.time() - t0
    print(f"upsert+edges {upsert_s:.0f}s embed+index {embed_s:.0f}s "
          f"({embedded} nodes, {edge_count} edges)", flush=True)

    t0 = time.time()
    merged = store.merge_duplicate_entities()
    merge_s = time.time() - t0

    # planted-cluster collapse: every chain must fold to ONE survivor
    live = store.nodes["entity"]
    fully, partial = 0, 0
    for members in clusters:
        remaining = sum(1 for m in members if m in live)
        if remaining == 1:
            fully += 1
        elif remaining < len(members):
            partial += 1
    # boundary negatives must both survive
    neg_ok = sum(1 for a, b in neg_pairs if a in live and b in live)
    # migration correctness: no dangling edge endpoints, no entity
    # self-loops
    dangling = sum(
        1 for e in store.edges if e.src not in live or e.dst not in live)
    self_loops = sum(
        1 for e in store.edges
        if e.src == e.dst and e.edge_type == "ENTITY_RELATION")

    print(json.dumps({
        "mode": "hard", "n_entities": n,
        "clusters": len(clusters),
        "merge_wall_s": round(merge_s, 1),
        "merged_entities": merged,
        "clusters_fully_collapsed": fully,
        "clusters_partial": partial,
        "cluster_collapse_rate": round(fully / len(clusters), 4),
        "boundary_negatives_preserved": f"{neg_ok}/{len(neg_pairs)}",
        "dangling_edges": dangling,
        "entity_self_loops": self_loops,
        "edges_after": len(store.edges),
        "entities_per_s_merge": round(n / merge_s, 1),
    }), flush=True)
    assert dangling == 0, "edge migration left dangling endpoints"
    assert self_loops == 0, "merge left entity self-loops"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--dup-frac", type=float, default=0.10)
    ap.add_argument("--oracle-n", type=int, default=10_000)
    ap.add_argument(
        "--hard", action="store_true",
        help="hard corpus (VERDICT r4 #9): chained near-dup clusters of "
        "size 2-8 whose ADJACENT cosines sit just above the 0.95 merge "
        "threshold while distant chain members fall below it (stresses "
        "union-find transitivity), boundary NEGATIVE pairs at cos≈0.936 "
        "that must NOT merge, plus ~2 relations/entity whose endpoints "
        "are asserted dangling-free after migration",
    )
    args = ap.parse_args()
    if args.hard:
        return run_hard(args)

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
