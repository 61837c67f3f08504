"""VLM server launcher tests (against a fake OpenAI-compatible process)."""

import sys

import pytest

from rag_arc_tpu.parsing.vlm_server import VLMServer

FAKE_SERVER = (
    "import json, sys\n"
    "from http.server import BaseHTTPRequestHandler, HTTPServer\n"
    "class H(BaseHTTPRequestHandler):\n"
    "    def log_message(self, *a): pass\n"
    "    def do_GET(self):\n"
    "        body = json.dumps({'data': [{'id': 'layout-vlm'}]}).encode()\n"
    "        self.send_response(200); self.send_header('Content-Length', str(len(body)))\n"
    "        self.end_headers(); self.wfile.write(body)\n"
    "HTTPServer(('127.0.0.1', int(sys.argv[1])), H).serve_forever()\n"
)


def test_launch_ready_shutdown(tmp_path, unused_port=18955):
    script = tmp_path / "srv.py"
    script.write_text(FAKE_SERVER)
    server = VLMServer(
        model="layout-vlm",
        port=unused_port,
        command_template=f"{sys.executable} {script} {{port}}",
    )
    with server:
        assert server.base_url.endswith(f":{unused_port}/v1")
        client = server.client()
        assert client._llm.base_url == server.base_url
    assert server.process.poll() is not None  # terminated


def test_launch_failure_raises(tmp_path):
    server = VLMServer(
        model="m",
        port=18956,
        command_template=f"{sys.executable} -c 'import sys; sys.exit(3)'",
    )
    with pytest.raises(RuntimeError, match="exited"):
        server.launch(wait_timeout=10)
