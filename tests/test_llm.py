"""LLM adapter tests: base validation, FakeLLM determinism, and the
OpenAI-compatible client against an in-process HTTP server."""

import asyncio
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import List

import pytest
from pydantic import BaseModel

from rag_arc_tpu.llm import FakeLLM, LLMBase, OpenAICompatLLM


class Answer(BaseModel):
    title: str
    tags: List[str]
    confidence: float


class TestBase:
    def test_validate_input(self):
        with pytest.raises(ValueError):
            LLMBase.validate_input([])
        with pytest.raises(ValueError):
            LLMBase.validate_input([{"role": "nope", "content": "x"}])
        with pytest.raises(ValueError):
            LLMBase.validate_input([{"content": "x"}])
        LLMBase.validate_input([{"role": "user", "content": "hi"}])

    def test_format_messages(self):
        msgs = LLMBase.format_messages(
            "q", system="sys", history=[{"role": "assistant", "content": "prev"}]
        )
        assert [m["role"] for m in msgs] == ["system", "assistant", "user"]


class TestFake:
    def test_deterministic_chat(self):
        llm = FakeLLM()
        m = [{"role": "user", "content": "hello"}]
        assert llm.chat(m) == llm.chat(m)

    def test_canned_queue(self):
        llm = FakeLLM(responses=["first", "second"])
        m = [{"role": "user", "content": "x"}]
        assert llm.chat(m) == "first"
        assert llm.chat(m) == "second"

    def test_parse_chat_synthesizes_valid_instance(self):
        llm = FakeLLM()
        out = llm.parse_chat([{"role": "user", "content": "extract"}], Answer)
        assert isinstance(out, Answer)
        assert isinstance(out.tags, list)

    def test_parse_chat_canned_dict(self):
        llm = FakeLLM(responses=[{"title": "t", "tags": ["a"], "confidence": 0.9}])
        out = llm.parse_chat([{"role": "user", "content": "x"}], Answer)
        assert out.title == "t" and out.tags == ["a"]

    def test_responder_hook(self):
        llm = FakeLLM(responder=lambda msgs, fmt: "hook:" + msgs[-1]["content"])
        assert llm.chat([{"role": "user", "content": "abc"}]) == "hook:abc"

    def test_usage_tracking(self):
        llm = FakeLLM(track_usage=True)
        llm.chat([{"role": "user", "content": "hello world"}])
        info = llm.get_model_info()
        assert info["usage"]["requests"] == 1

    def test_async(self):
        llm = FakeLLM(responses=["async-answer"])

        async def go():
            return await llm.achat([{"role": "user", "content": "x"}])

        assert asyncio.run(go()) == "async-answer"

    def test_embed(self):
        vecs = FakeLLM().embed(["a", "b"])
        assert len(vecs) == 2 and len(vecs[0]) == 64


class _Handler(BaseHTTPRequestHandler):
    """Minimal OpenAI-protocol server: echoes deterministic payloads."""

    fail_first_n = 0  # class-level: simulate transient failures
    failures = 0

    def log_message(self, *args):  # silence
        pass

    def do_POST(self):
        if _Handler.failures < _Handler.fail_first_n:
            _Handler.failures += 1
            self.send_response(500)
            self.end_headers()
            return
        length = int(self.headers["Content-Length"])
        payload = json.loads(self.rfile.read(length))
        if payload.get("messages") and payload["messages"][-1]["content"] == "RAISE400":
            body = json.dumps({"error": {"message": "bad schema"}}).encode()
            self.send_response(400)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path.endswith("/embeddings"):
            data = {
                "data": [
                    {"index": i, "embedding": [float(len(t)), 1.0]}
                    for i, t in enumerate(payload["input"])
                ],
                "usage": {"prompt_tokens": 3, "completion_tokens": 0},
            }
        elif payload.get("stream"):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            for piece in ["Hel", "lo"]:
                # real OpenAI SSE carries "usage": null on EVERY delta
                # chunk when include_usage is on
                chunk = {
                    "choices": [{"delta": {"content": piece}}],
                    "usage": None,
                }
                self.wfile.write(f"data: {json.dumps(chunk)}\n\n".encode())
            if (payload.get("stream_options") or {}).get("include_usage"):
                final = {
                    "choices": [],
                    "usage": {"prompt_tokens": 5, "completion_tokens": 2},
                }
                self.wfile.write(f"data: {json.dumps(final)}\n\n".encode())
            self.wfile.write(b"data: [DONE]\n\n")
            return
        else:
            if "response_format" in payload:
                content = json.dumps(
                    {"title": "parsed", "tags": ["x"], "confidence": 0.5}
                )
            else:
                content = f"echo:{payload['messages'][-1]['content']}"
            data = {
                "choices": [{"message": {"content": content}}],
                "usage": {"prompt_tokens": 5, "completion_tokens": 7},
            }
        body = json.dumps(data).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}/v1"
    httpd.shutdown()


class TestOpenAICompat:
    def test_chat(self, server):
        llm = OpenAICompatLLM("test-model", base_url=server, track_usage=True)
        out = llm.chat([{"role": "user", "content": "ping"}])
        assert out == "echo:ping"
        assert llm.usage.total_tokens == 12

    def test_parse_chat(self, server):
        llm = OpenAICompatLLM("test-model", base_url=server)
        out = llm.parse_chat([{"role": "user", "content": "x"}], Answer)
        assert out.title == "parsed" and out.confidence == 0.5

    def test_stream(self, server):
        llm = OpenAICompatLLM("test-model", base_url=server)
        pieces = list(llm.stream_chat([{"role": "user", "content": "x"}]))
        assert "".join(pieces) == "Hello"

    def test_embed_requires_embedding_model(self, server):
        llm = OpenAICompatLLM("gpt-x", base_url=server)
        with pytest.raises(ValueError, match="embedding"):
            llm.embed(["a"])

    def test_embed(self, server):
        llm = OpenAICompatLLM("text-embedding-test", base_url=server)
        vecs = llm.embed(["abc", "de"])
        assert vecs == [[3.0, 1.0], [2.0, 1.0]]

    def test_retry_then_success(self, server):
        _Handler.fail_first_n = 2
        _Handler.failures = 0
        try:
            llm = OpenAICompatLLM("test-model", base_url=server, max_retries=3)
            out = llm.chat([{"role": "user", "content": "retry"}])
            assert out == "echo:retry"
        finally:
            _Handler.fail_first_n = 0

    def test_http_400_surfaces_immediately_with_detail(self, server):
        """Permanent 4xx must not burn retries and then masquerade as
        'unreachable' — surface the server's error body at once."""
        import time as _time

        llm = OpenAICompatLLM("m", base_url=server, max_retries=3)
        t0 = _time.time()
        with pytest.raises(RuntimeError, match="HTTP 400.*bad schema"):
            llm.chat([{"role": "user", "content": "RAISE400"}])
        assert _time.time() - t0 < 1.0  # no retry backoff burned

    def test_streaming_usage_counts_one_request(self, server):
        """'usage': null rides every SSE delta chunk; only the real final
        usage object may count (requests was inflated by chunk count)."""
        llm = OpenAICompatLLM("m", base_url=server, track_usage=True)
        pieces = list(llm.stream_chat([{"role": "user", "content": "hi"}]))
        assert "".join(pieces) == "Hello"
        assert llm.usage.requests == 1
        assert llm.usage.completion_tokens == 2

    def test_astream_chat_yields_incrementally(self, server):
        import asyncio

        llm = OpenAICompatLLM("m", base_url=server)

        async def collect():
            out = []
            async for piece in llm.astream_chat([{"role": "user", "content": "hi"}]):
                out.append(piece)
            return out

        assert "".join(asyncio.run(collect())) == "Hello"

    def test_astream_chat_early_break_stops_pump(self):
        """Breaking out of the async generator must not raise
        'async generator ignored GeneratorExit' nor keep the pump thread
        draining the stream (an abandoned executor slot per request)."""
        import time

        pulled = []
        release = threading.Event()

        class Slow(FakeLLM):
            def stream_chat(self, messages, **kw):
                for i in range(1000):
                    pulled.append(i)
                    yield f"p{i} "
                    # after the consumer breaks, the pump must stop at the
                    # next piece boundary instead of draining all 1000
                    release.wait(0.005)

        llm = Slow()

        async def take_two():
            out = []
            async for piece in llm.astream_chat([{"role": "user", "content": "x"}]):
                out.append(piece)
                if len(out) == 2:
                    break
            return out

        assert len(asyncio.run(take_two())) == 2
        # asyncio.run shut the async generator down (stop flag set); if the
        # pump ignored it, releasing the waits lets it blast through all
        # 1000 pieces within milliseconds
        release.set()
        time.sleep(0.3)
        assert len(pulled) < 1000, "pump kept draining after break"

    def test_unreachable_raises_connectionerror(self):
        llm = OpenAICompatLLM(
            "m", base_url="http://127.0.0.1:9", max_retries=2, timeout=0.3
        )
        with pytest.raises(ConnectionError):
            llm.chat([{"role": "user", "content": "x"}])


class _ModelsHandler(_Handler):
    def do_GET(self):
        body = json.dumps({"data": [{"id": "m-1"}, {"id": "m-2"}]}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_get_available_models():
    httpd = HTTPServer(("127.0.0.1", 0), _ModelsHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        llm = OpenAICompatLLM("m", base_url=f"http://127.0.0.1:{httpd.server_port}/v1")
        assert llm.get_available_models() == ["m-1", "m-2"]
    finally:
        httpd.shutdown()
