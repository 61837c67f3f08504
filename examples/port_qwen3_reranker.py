"""Run a real Qwen3-Reranker checkpoint on TPU.

Requires the HF checkpoint on local disk (this image has no egress):

    python examples/port_qwen3_reranker.py /path/to/Qwen3-Reranker-0.6B

The torch state_dict ports into the Flax Qwen3 implementation
(numeric parity vs torch is covered by tests/test_qwen3.py), and the
reranker scores every candidate in one TPU dispatch.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rag_arc_tpu.models.qwen3 import load_hf_qwen3
from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
from rag_arc_tpu.utils.data_model import Document


def main(path: str) -> None:
    model, params, tokenizer = load_hf_qwen3(path)
    reranker = CrossEncoderReranker.from_causal_lm(model, params, tokenizer)
    docs = [
        Document(content="TPU pods use a high-bandwidth ICI mesh."),
        Document(content="A recipe for chocolate cake."),
        Document(content="Reciprocal rank fusion merges retriever outputs."),
    ]
    for doc in reranker.rerank("how do tpu chips communicate?", docs):
        print(f"{doc.metadata['rerank_score']:.4f}  {doc.content}")


if __name__ == "__main__":
    main(sys.argv[1])
