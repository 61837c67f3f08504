from rag_arc_tpu.framework.config import AbstractConfig
from rag_arc_tpu.framework.module import AbstractModule
from rag_arc_tpu.framework.registry import Register, singleton

__all__ = ["AbstractConfig", "AbstractModule", "Register", "singleton"]
