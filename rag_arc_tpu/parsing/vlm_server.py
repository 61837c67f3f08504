"""Layout-VLM server launcher.

Parity with the reference's ``vllm_launch.py`` (which shells out to
``vllm serve`` and sed-patches the CLI to register its custom model). The
TPU-native equivalent launches any OpenAI-compatible serving command —
vLLM on GPU hosts, a JAX serving stack on TPU hosts — waits for the
endpoint to come up, and hands back a ready ``OpenAIVisionClient``.
"""

from __future__ import annotations

import logging
import os
import shlex
import subprocess
import time
import urllib.error
import urllib.request
from typing import List, Optional, Sequence

logger = logging.getLogger(__name__)

DEFAULT_COMMAND = "vllm serve {model} --port {port} --tensor-parallel-size {tp}"


class VLMServer:
    """Manage an external OpenAI-compatible VLM serving process."""

    def __init__(
        self,
        model: str,
        port: int = 8000,
        tensor_parallel: int = 1,
        command_template: str = DEFAULT_COMMAND,
        extra_args: Optional[Sequence[str]] = None,
        env: Optional[dict] = None,
    ):
        self.model = model
        self.port = port
        self.command: List[str] = shlex.split(
            command_template.format(model=model, port=port, tp=tensor_parallel)
        ) + list(extra_args or [])
        self.env = {**os.environ, **(env or {})}
        self.process: Optional[subprocess.Popen] = None

    @property
    def base_url(self) -> str:
        return f"http://localhost:{self.port}/v1"

    def launch(self, wait_timeout: float = 300.0, poll_s: float = 2.0) -> None:
        logger.info("launching VLM server: %s", " ".join(self.command))
        self.process = subprocess.Popen(self.command, env=self.env)
        self.env.setdefault("OPENAI_API_BASE", self.base_url)
        deadline = time.time() + wait_timeout
        while time.time() < deadline:
            if self.process.poll() is not None:
                raise RuntimeError(
                    f"VLM server exited with code {self.process.returncode}"
                )
            try:
                with urllib.request.urlopen(f"{self.base_url}/models", timeout=5):
                    logger.info("VLM server ready at %s", self.base_url)
                    return
            except (urllib.error.URLError, TimeoutError, ConnectionError):
                time.sleep(poll_s)
        self.shutdown()
        raise TimeoutError(f"VLM server not ready within {wait_timeout}s")

    def client(self, **kwargs):
        from rag_arc_tpu.parsing.ocr import OpenAIVisionClient

        return OpenAIVisionClient(model=self.model, base_url=self.base_url, **kwargs)

    def shutdown(self, grace_s: float = 10.0) -> None:
        if self.process is None or self.process.poll() is not None:
            return
        self.process.terminate()
        try:
            self.process.wait(timeout=grace_s)
        except subprocess.TimeoutExpired:
            self.process.kill()

    def __enter__(self) -> "VLMServer":
        self.launch()
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
