"""Vector-store persistence.

Parity with the reference's ``save_local``/``load_local``
(``VectorStore_Faiss.py:432-482``: ``faiss.write_index`` + pickled
docstore sidecar) — redesigned as a directory of plain artifacts instead
of pickles: a JSON manifest, JSON docstore, and ``.npy`` arrays for the
device state (flat: embeddings + validity; IVF: centroids + padded lists +
bookkeeping). Arrays re-shard onto whatever mesh the loading process uses,
so a checkpoint written single-chip restores onto an 8-chip mesh.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np

from rag_arc_tpu.index.flat import DeviceFlatIndex
from rag_arc_tpu.index.hnsw import HNSWIndex
from rag_arc_tpu.index.ivf import DeviceIVFIndex
from rag_arc_tpu.index.vector_store import TPUVectorStore
from rag_arc_tpu.models.embeddings import Embeddings
from rag_arc_tpu.utils.data_model import Document

FORMAT = "rag_arc_tpu.store.v1"

logger = logging.getLogger(__name__)


def save_store(store: TPUVectorStore, path: str | Path) -> Path:
    from rag_arc_tpu.index.blob_docstore import BlobDocstore

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    index = store.index
    if isinstance(store.docstore, BlobDocstore):
        # disk-backed store: snapshot blob + numpy indexes, never
        # materialize the corpus in RAM
        store.docstore.save(path / "docstore_blob")
        docstore_kind = "blob"
    else:
        docstore_rows = []
        for doc_id, doc in store.docstore.items():
            docstore_rows.append(
                {
                    "id": doc_id,
                    "content": doc.content,
                    "metadata": doc.metadata,
                    "position": store.docstore.position_of(doc_id),
                }
            )
        (path / "docstore.json").write_text(
            json.dumps(docstore_rows, ensure_ascii=False), encoding="utf-8"
        )
        docstore_kind = "json"
    manifest: Dict[str, Any] = {
        "docstore": docstore_kind,
        "format": FORMAT,
        "metric": store.metric,
        "index_type": store.index_type,
        "dim": store._dim,
        "nlist": store.nlist,
        "nprobe": store.nprobe,
        "train_threshold": store.train_threshold,
        "index_kind": None if index is None else index.stats()["kind"],
        # recall-affecting search knob (quantized-rescore over-fetch):
        # restores must keep the builder's QPS/recall operating point
        "kf_mult": getattr(store, "kf_mult", None),
        "ivf_spill": getattr(store, "ivf_spill", 1),
        "ivf_spill_cap": getattr(store, "ivf_spill_cap", 1.25),
        # which query embedder produced these rows — load-time serving
        # rebuilds an equivalent one (or refuses) instead of guessing
        "embedding": store.embedding.describe(),
    }
    if isinstance(index, DeviceFlatIndex):
        import jax.numpy as jnp

        # storage dtype: without it a bf16 store reloads as f32 (2x HBM)
        manifest["dtype"] = jnp.dtype(index.dtype).name
        if getattr(index, "quantized", False):
            # snapshot RAW int8 codes + per-row (block) scales: bit-exact
            # round trip — re-adding dequantized rows would re-normalize
            # (dequantized rows are not unit-norm) and perturb every code
            np.save(
                path / "emb.npy",
                np.asarray(jax.device_get(index.emb[: index.size])),
            )
            np.save(
                path / "scales.npy",
                np.asarray(jax.device_get(index.sqnorm[: index.size])),
            )
        else:
            np.save(
                path / "emb.npy",
                np.asarray(
                    jax.device_get(index.emb[: index.size]), dtype=np.float32
                ),
            )
        np.save(path / "valid.npy", np.asarray(jax.device_get(index.valid[: index.size])))
        manifest["size"] = index.size
        manifest["quantized"] = bool(getattr(index, "quantized", False))
        manifest["n_deleted"] = index.n_deleted
        manifest["gap_rows"] = index._gap_rows
        manifest["refine"] = getattr(index, "refine", None)
        if getattr(index, "refine", None):
            # residual sidecar (int4/int8 ladder codes + per-row scales):
            # not recomputable from the primary codes, so it snapshots too
            np.save(
                path / "res.npy",
                np.asarray(jax.device_get(index.res[: index.size])),
            )
            np.save(
                path / "res_scales.npy",
                np.asarray(jax.device_get(index.res_scale[: index.size])),
            )
    elif isinstance(index, DeviceIVFIndex):
        np.save(path / "centroids.npy", np.asarray(jax.device_get(index.centroids)))
        # quantized lists snapshot as raw int8 residual codes (+ scales in
        # sqnorm.npy) — bit-exact round trip, 4x smaller on disk
        lists_np = np.asarray(jax.device_get(index.lists))
        if not index.quantized:
            lists_np = lists_np.astype(np.float32)
        np.save(path / "lists.npy", lists_np)
        np.save(path / "sqnorm.npy", np.asarray(jax.device_get(index.sqnorm)))
        np.save(path / "valid.npy", np.asarray(jax.device_get(index.valid)))
        np.save(path / "pos.npy", np.asarray(jax.device_get(index.pos)))
        np.save(path / "fill.npy", index._fill)
        manifest.update(
            {
                "size": index.size,
                "lmax": index.lmax,
                "n_deleted": index.n_deleted,
                "quantized": bool(index.quantized),
                "spill": index.spill,
                "spill_cap": index.spill_cap,
            }
        )
    elif isinstance(index, HNSWIndex):
        # the native snapshot carries vectors, links, and deleted flags
        index.save(path / "hnsw.bin")
        manifest.update(
            {"size": index.size, "M": index.M, "ef_search": index.ef_search}
        )
    elif index is not None:
        raise NotImplementedError(
            f"save_store has no serializer for index kind {type(index).__name__};"
            " refusing to write a vectorless snapshot"
        )
    (path / "manifest.json").write_text(json.dumps(manifest), encoding="utf-8")
    return path


def load_store(
    path: str | Path, embedding: Embeddings, mesh=None, dtype=None
) -> TPUVectorStore:
    import jax.numpy as jnp

    path = Path(path)
    manifest = json.loads((path / "manifest.json").read_text(encoding="utf-8"))
    if manifest.get("format") != FORMAT:
        raise ValueError(f"unrecognized store snapshot format in {path}")
    blob_backed = manifest.get("docstore") == "blob"
    if manifest.get("quantized"):
        if dtype is None:
            dtype = jnp.int8  # restore int8 storage without caller plumbing
        elif jnp.dtype(dtype) != jnp.int8:
            # the snapshot holds RAW int8 codes + block scales; pasting them
            # into a float index would score garbage silently
            raise ValueError(
                f"snapshot at {path} stores int8 codes; load with "
                f"dtype=None (or int8), not {dtype}"
            )
    elif dtype is None and manifest.get("dtype"):
        dtype = jnp.dtype(manifest["dtype"])  # restore the saved storage dtype
    spec = manifest.get("embedding")
    if spec:
        have = embedding.describe()
        if spec.get("dim") and have.get("dim") and spec["dim"] != have["dim"]:
            raise ValueError(
                f"snapshot was embedded at dim {spec['dim']} but the "
                f"supplied embedder is dim {have['dim']}"
            )
        if spec.get("kind") != have.get("kind"):
            logger.warning(
                "snapshot was embedded with %r but loading with %r — "
                "queries will score garbage unless these are equivalent",
                spec.get("kind"), have.get("kind"),
            )
    store = TPUVectorStore(
        embedding=embedding,
        dim=manifest["dim"],
        metric=manifest["metric"],
        mesh=mesh,
        dtype=dtype,
        # capacity from the snapshot: default-capacity growth DOUBLES, so a
        # 10M-row restore would land on 16.8M rows — 2x HBM, an OOM for the
        # flagship 10M int8 corpus (growth headroom stays available)
        capacity=max(int(manifest.get("size") or 0), 1024),
        index_type=manifest["index_type"],
        nlist=manifest["nlist"],
        nprobe=manifest["nprobe"],
        # legacy snapshots (no kf_mult key) were built and validated under
        # the historical effective kf_mult=4 — restores keep the builder's
        # operating point; only newly-saved stores get the r4 knee (=2)
        kf_mult=manifest.get("kf_mult") or 4,
        ivf_spill=manifest.get("ivf_spill", 1),
        ivf_spill_cap=manifest.get("ivf_spill_cap", 1.25),
        train_threshold=manifest["train_threshold"],
        # blob-backed snapshots reattach in place: the loaded store reads
        # (and, if mutated, appends) in the snapshot directory
        docstore_path=str(path / "docstore_blob") if blob_backed else None,
    )
    kind = manifest.get("index_kind")
    if kind == "flat":
        emb = np.load(path / "emb.npy")
        valid = np.load(path / "valid.npy")
        if emb.size:
            if manifest.get("quantized") and (path / "scales.npy").exists():
                # raw-code snapshot: place codes directly, bit-exact
                has_res = (
                    manifest.get("refine") and (path / "res.npy").exists()
                )
                store.index.restore_rows(
                    emb,
                    np.load(path / "scales.npy"),
                    valid,
                    n_deleted=manifest.get("n_deleted", 0),
                    gap_rows=manifest.get("gap_rows", 0),
                    res=np.load(path / "res.npy") if has_res else None,
                    res_scale=(
                        np.load(path / "res_scales.npy") if has_res else None
                    ),
                    refine=manifest.get("refine"),
                )
            else:
                # f32 snapshot (incl. legacy quantized ones): rows already
                # went through add-time preprocessing (cosine rows are
                # unit-norm, so re-adding is a no-op transform)
                store.index.add(emb)
                dead = np.nonzero(~valid)[0]
                if dead.size:
                    store.index.mark_deleted(dead)
    elif kind == "ivf":
        index = DeviceIVFIndex(
            dim=manifest["dim"],
            nlist=manifest["nlist"],
            nprobe=manifest["nprobe"],
            metric=manifest["metric"],
            dtype=jnp.int8 if manifest.get("quantized") else jnp.float32,
            mesh=mesh,
            spill=manifest.get("spill", 1),
            spill_cap=manifest.get("spill_cap", 1.25),
        )
        centroids = np.load(path / "centroids.npy")
        lists = np.load(path / "lists.npy")
        # pad the cluster axis up to the loading topology's requirement
        # (snapshots may come from a different shard count)
        saved_pad = centroids.shape[0]
        if index.nlist_pad < saved_pad:
            index.nlist_pad = saved_pad
        if index.nlist_pad % index.n_shards:
            # a snapshot from a different topology may carry a pad that the
            # loading shard count doesn't divide — re-pad, or _place fails
            # on the uneven cluster axis
            index.nlist_pad += index.n_shards - index.nlist_pad % index.n_shards
        extra = index.nlist_pad - saved_pad

        def pad0(a, fill=0):
            if extra == 0:
                return a
            widths = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, widths, constant_values=fill)

        cluster_valid = np.zeros(index.nlist_pad, dtype=bool)
        cluster_valid[: manifest["nlist"]] = True
        index._centroids_np = centroids[: manifest["nlist"]].astype(np.float32)
        index.lmax = manifest["lmax"]
        index._place(
            pad0(lists),
            pad0(np.load(path / "sqnorm.npy")),
            pad0(np.load(path / "valid.npy")),
            pad0(np.load(path / "pos.npy"), fill=-1),
            pad0(centroids),
            cluster_valid,
        )
        index._fill = np.load(path / "fill.npy")
        index.size = manifest["size"]
        index.n_deleted = manifest["n_deleted"]
        pos_host = np.asarray(jax.device_get(index.pos))
        cl, sl = np.nonzero(pos_host >= 0)
        p = pos_host[cl, sl]
        size = manifest["size"]
        index._pos_cluster = np.full(size, -1, dtype=np.int32)
        index._pos_slot = np.full(size, -1, dtype=np.int32)
        if index.spill > 1:
            # spilled rows appear once per copy: occurrence 0 feeds the
            # primary maps, the rest the extra maps (mark_deleted must be
            # able to clear EVERY copy)
            index._pos_xcluster = np.full(
                (size, index.spill - 1), -1, dtype=np.int32
            )
            index._pos_xslot = np.full(
                (size, index.spill - 1), -1, dtype=np.int32
            )
            order = np.argsort(p, kind="stable")
            ps, cls, sls = p[order], cl[order], sl[order]
            occ = np.arange(len(ps)) - np.searchsorted(ps, ps, side="left")
            prim = occ == 0
            index._pos_cluster[ps[prim]] = cls[prim].astype(np.int32)
            index._pos_slot[ps[prim]] = sls[prim].astype(np.int32)
            extra = ~prim
            index._pos_xcluster[ps[extra], occ[extra] - 1] = cls[extra].astype(
                np.int32
            )
            index._pos_xslot[ps[extra], occ[extra] - 1] = sls[extra].astype(
                np.int32
            )
        else:
            index._pos_cluster[p] = cl.astype(np.int32)
            index._pos_slot[p] = sl.astype(np.int32)
        store.index = index
    elif kind == "hnsw":
        store.index = HNSWIndex.load(
            path / "hnsw.bin",
            metric=manifest["metric"],
            ef_search=manifest.get("ef_search", 64),
        )
    # docstore (blob-backed stores reattached via docstore_path above)
    if not blob_backed:
        rows = json.loads((path / "docstore.json").read_text(encoding="utf-8"))
        docs = [
            Document(content=r["content"], metadata=r["metadata"], id=r["id"])
            for r in rows
        ]
        store.docstore.add(docs, [r["position"] for r in rows])
    return store
