"""Chinese BM25 retrieval, out of the box.

Mirrors the reference's Chinese BM25 demo
(``examples/test/tantivy_example.py:17-78`` there), which needed tantivy
(Rust) plus jieba pre-tokenization to make Chinese text retrievable. Here
the corpus tokenizer auto-upgrades to an in-tree character-bigram
tokenizer when CJK text is detected, so the same demo is two calls and no
extra dependencies — and the index persists/loads like any other.

    python examples/chinese_bm25.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rag_arc_tpu.retrieval.bm25 import BM25Retriever

# The reference demo's HVAC corpus (titles kept as metadata).
DOCS = [
    ("制冷系统", "蒸发器是制冷系统中的重要部件，它的作用是吸收热量。"),
    ("空调原理", "空调通过压缩机、冷凝器、蒸发器等部件实现制冷和制热。"),
    ("换热器", "换热器用于不同介质之间的热量交换。"),
]


def main() -> None:
    retriever = BM25Retriever.from_texts(
        [body for _, body in DOCS],
        metadatas=[{"title": title} for title, _ in DOCS],
        k=10,
    )
    info = retriever.get_bm25_info()
    print(f"索引创建完成：{info['num_documents']} docs, "
          f"vocab {info['vocab_size']} (tokenizer: {info['preprocess_func']})")

    query = "蒸发器是什么"
    print(f"\n搜索：{query}\n" + "-" * 50)
    for doc, score in retriever.get_top_k_with_scores(query, k=10):
        print(f"评分: {score:.4f}")
        print(f"标题: {doc.metadata.get('title', '')}")
        print(f"内容: {doc.content}")
        print("-" * 50)

    # Persistence round-trip (the reference demo reopened its index dir).
    with tempfile.TemporaryDirectory() as tmp:
        snap = Path(tmp) / "index_cn.json"
        retriever.save_to_disk(snap)
        reloaded = BM25Retriever.load_from_disk(snap)
        top = reloaded.invoke(query)[0]
        print(f"\n重新加载后 top-1: {top.metadata.get('title', '')} — {top.content}")


if __name__ == "__main__":
    main()
