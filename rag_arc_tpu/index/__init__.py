from rag_arc_tpu.index.blob_docstore import BlobDocstore
from rag_arc_tpu.index.docstore import Docstore
from rag_arc_tpu.index.flat import DeviceFlatIndex
from rag_arc_tpu.index.vector_store import TPUVectorStore, VectorStore

__all__ = ["BlobDocstore", "Docstore", "DeviceFlatIndex", "TPUVectorStore", "VectorStore"]
