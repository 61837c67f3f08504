from rag_arc_tpu.llm.base import LLMBase
from rag_arc_tpu.llm.fake import FakeLLM
from rag_arc_tpu.llm.openai_compat import OpenAICompatLLM

__all__ = ["LLMBase", "FakeLLM", "OpenAICompatLLM"]
