"""Native (C++) components.

Build artifacts land in ``native/build/`` (gitignored); ``load_library``
compiles on first use with g++ and caches the .so keyed on source mtime.
"""

from rag_arc_tpu.native.build import load_library

__all__ = ["load_library"]
