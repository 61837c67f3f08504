"""Corpus ingestion CLI: files → parse → chunk → embed → index → snapshot.

One command covers the reference's manual pipeline (parser CLIs feeding
``FaissVectorStore.from_texts``, VectorStore_Faiss.py:150-190 +
multi_parser.py:14-47): walk a directory with the multi-parser (md/html/
docx/xlsx/pptx/csv/txt; PDFs via the OCR parser when a VLM endpoint is
up), split with the recursive character splitter, embed in batches, and
save a reloadable snapshot.

    python tools/ingest.py DOCS_DIR --out INDEX_DIR [--dim 256]
        [--chunk-size 800 --chunk-overlap 120]
        [--embeddings hash|flax] [--dtype bfloat16|int8]
        [--docstore-blob]  # disk-backed docstore for huge corpora

Serve the result:
    python -m rag_arc_tpu.serving.app --store INDEX_DIR
or load it in code: ``rag_arc_tpu.index.persistence.load_store``.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("root", help="file or directory to ingest")
    ap.add_argument("--out", required=True, help="snapshot directory")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--chunk-size", type=int, default=800)
    ap.add_argument("--chunk-overlap", type=int, default=120)
    ap.add_argument("--embeddings", choices=("hash", "flax"), default="hash")
    ap.add_argument("--dtype", choices=("float32", "bfloat16", "int8"),
                    default="bfloat16")
    ap.add_argument("--metric", default="cosine")
    ap.add_argument("--batch", type=int, default=256,
                    help="embed/ingest batch size")
    ap.add_argument("--docstore-blob", action="store_true",
                    help="disk-backed docstore (bounded host RAM)")
    ap.add_argument("--vlm-url", default=None,
                    help="OCR VLM endpoint for PDF/image files")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from rag_arc_tpu.chunking.splitters import RecursiveCharacterTextSplitter
    from rag_arc_tpu.index.persistence import save_store
    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.parsing.multi import MultiParser

    if args.embeddings == "flax":
        from rag_arc_tpu.models.flax_embeddings import FlaxEncoderEmbeddings

        embedding = FlaxEncoderEmbeddings(dim=args.dim)
    else:
        from rag_arc_tpu.models.embeddings import HashEmbeddings

        embedding = HashEmbeddings(dim=args.dim)

    t0 = time.time()
    parser = MultiParser(vlm_url=args.vlm_url)
    root = Path(args.root)
    parsed = (
        parser.parse_tree(root) if root.is_dir() else {str(root): parser.parse(root)}
    )
    if not parsed:
        print(f"no parseable files under {root}", file=sys.stderr)
        return 1
    print(f"parsed {len(parsed)} files in {time.time()-t0:.1f}s", flush=True)

    splitter = RecursiveCharacterTextSplitter(
        chunk_size=args.chunk_size, chunk_overlap=args.chunk_overlap
    )
    chunks = splitter.split_documents(p.to_document() for p in parsed.values())
    print(f"{len(chunks)} chunks", flush=True)

    out = Path(args.out)
    store = TPUVectorStore(
        embedding=embedding,
        dim=args.dim,
        metric=args.metric,
        capacity=max(4096, len(chunks)),
        dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16,
               "int8": jnp.int8}[args.dtype],
        docstore_path=str(out / "docstore_blob") if args.docstore_blob else None,
    )
    t0 = time.time()
    for s in range(0, len(chunks), args.batch):
        store.add_documents(chunks[s : s + args.batch])
        done = min(s + args.batch, len(chunks))
        if done % (args.batch * 8) == 0 or done == len(chunks):
            print(f"  indexed {done}/{len(chunks)}", flush=True)
    print(f"embedded+indexed in {time.time()-t0:.1f}s", flush=True)

    save_store(store, out)
    print(f"snapshot: {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
