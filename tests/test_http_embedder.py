"""HTTP embedding provider against a local in-process fake server:
batching ≤128, timeout plumbing, 4xx→client-error (no retry),
5xx→retry-then-upstream-error — the reference's embed.py:10-57 contract."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from vectordb_from_scratch_spark.functions.http_embedder import (
    EmbedClientError,
    EmbedUpstreamError,
    http_embedder,
)

DIMS = 4


class _FakeEmbedHandler(BaseHTTPRequestHandler):
    """Deterministic fake: vector = [len(text), i, batch_no, 1]. Records
    every batch size; can be armed to fail N times with a given status."""

    server_version = "FakeEmbed/1.0"

    def do_POST(self):
        cfg = self.server.cfg
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        texts = body["texts"]
        cfg["batch_sizes"].append(len(texts))
        if cfg["fail_times"] > 0:
            cfg["fail_times"] -= 1
            self.send_response(cfg["fail_status"])
            self.end_headers()
            return
        embeddings = [
            [float(len(t)), float(i), float(len(cfg["batch_sizes"])), 1.0]
            for i, t in enumerate(texts)
        ]
        out = json.dumps({"embeddings": embeddings}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *args):
        pass


@pytest.fixture()
def fake_server():
    srv = HTTPServer(("127.0.0.1", 0), _FakeEmbedHandler)
    srv.cfg = {"batch_sizes": [], "fail_times": 0, "fail_status": 500}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}/embed"
    srv.shutdown()


def test_batches_capped_at_128(fake_server):
    srv, url = fake_server
    embed = http_embedder(url, dims=DIMS)
    out = embed([f"text {i}" for i in range(300)])
    assert out.shape == (300, DIMS)
    assert srv.cfg["batch_sizes"] == [128, 128, 44]
    # deterministic content: first vec of first batch is len("text 0")=6
    assert out[0, 0] == 6.0


def test_4xx_maps_to_client_error_no_retry(fake_server):
    srv, url = fake_server
    srv.cfg.update(fail_times=1, fail_status=422)
    embed = http_embedder(url, dims=DIMS, max_retries=3, backoff=0.01)
    with pytest.raises(EmbedClientError):
        embed(["a"])
    assert len(srv.cfg["batch_sizes"]) == 1  # exactly one request: no retry


def test_5xx_retried_then_succeeds(fake_server):
    srv, url = fake_server
    srv.cfg.update(fail_times=2, fail_status=503)
    embed = http_embedder(url, dims=DIMS, max_retries=2, backoff=0.01)
    out = embed(["hello"])
    assert out.shape == (1, DIMS)
    assert len(srv.cfg["batch_sizes"]) == 3  # two failures + one success


def test_5xx_exhausts_retries_maps_to_upstream_error(fake_server):
    srv, url = fake_server
    srv.cfg.update(fail_times=10, fail_status=500)
    embed = http_embedder(url, dims=DIMS, max_retries=1, backoff=0.01)
    with pytest.raises(EmbedUpstreamError):
        embed(["hello"])
    assert len(srv.cfg["batch_sizes"]) == 2


def test_connection_refused_maps_to_upstream_error():
    embed = http_embedder(
        "http://127.0.0.1:1/embed", dims=DIMS, max_retries=1, backoff=0.01, timeout=0.5
    )
    with pytest.raises(EmbedUpstreamError):
        embed(["hello"])


def test_dim_mismatch_is_client_error(fake_server):
    srv, url = fake_server
    embed = http_embedder(url, dims=99)
    with pytest.raises(EmbedClientError):
        embed(["hello"])


def test_registered_in_providers_and_runs_in_embed_texts(fake_server, spark):
    """End-to-end through the engine plumbing: embed_texts with the http
    provider attaches a correct-shape vector column."""
    srv, url = fake_server
    from vectordb_from_scratch_spark.functions import embedder

    assert "http" in embedder.PROVIDERS
    df = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(10)], "doc_id long, text string"
    )
    out = embedder.embed_texts(
        df, dims=DIMS, provider="http", url=url, max_texts_per_call=4
    )
    rows = out.collect()
    assert len(rows) == 10
    assert all(len(r["embedding"]) == DIMS for r in rows)
    assert np.array(srv.cfg["batch_sizes"]).max() <= 4
