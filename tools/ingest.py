"""Corpus ingestion CLI: files → parse → chunk → embed → index → snapshot.

Thin launcher for :mod:`rag_arc_tpu.tools.ingest` (one implementation, two
entry points). One command covers the reference's manual pipeline (parser
CLIs feeding ``FaissVectorStore.from_texts``, VectorStore_Faiss.py:150-190 +
multi_parser.py:14-47):

    python tools/ingest.py DOCS_DIR --out INDEX_DIR [--dim 256]
        [--chunker recursive --chunk-size 800 --chunk-overlap 120]
        [--embeddings hash|flax] [--dtype bfloat16|int8] [--bm25]
        [--docstore-blob]  # disk-backed docstore for huge corpora

Serve the result (the dense snapshot lands in INDEX_DIR/dense; serving's
--store finds it from INDEX_DIR and picks up the optional BM25 twin):
    python -m rag_arc_tpu.serving.app --store INDEX_DIR
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from rag_arc_tpu.tools.ingest import ingest, main  # noqa: E402,F401

if __name__ == "__main__":
    raise SystemExit(main())
