"""HTTP embedding provider — the reference's network-embedder shape
(``app/api/routes/embed.py:10-57``): batched POST calls capped at 128
texts per request, request timeout, and the reference's error mapping
(provider 4xx → client error / HTTP 400; provider 5xx or connection
failure → upstream error / HTTP 502, after bounded retries).

The engine side stays identical to the ``hashed`` provider: this factory
returns a plain ``(list[str]) -> np.ndarray`` callable that plugs into
``embedder.PROVIDERS`` and runs inside ``embed_texts``'s ``mapInPandas``
batching loop — executors each hold their own connection, batches are
already bounded to ``MAX_TEXTS_PER_CALL`` before the provider sees them.
Uses only the standard library (urllib), no vendor SDK.

Scale note: at ingest scale the network call dominates, so throughput is
(executors × batches/sec) — exactly why the batching lives in
``embed_texts`` (Arrow batch → ≤128-text provider calls) and not per-row.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import numpy as np


class EmbedClientError(ValueError):
    """Provider rejected the request (HTTP 4xx) — the caller's fault; maps
    to the reference's HTTP 400 response (embed.py:37-44). Never retried."""


class EmbedUpstreamError(RuntimeError):
    """Provider failed (HTTP 5xx / connection error) after retries — maps
    to the reference's HTTP 502 response (embed.py:45-52)."""


def http_embedder(
    url: str,
    dims: int,
    timeout: float = 10.0,
    max_retries: int = 2,
    backoff: float = 0.2,
    max_texts_per_call: int = 128,
    normalize: bool = False,
    **_ignored,
):
    """Provider factory: POST ``{"texts": [...]}`` to ``url``, expect
    ``{"embeddings": [[...], ...]}``. Enforces the ≤128-texts-per-request
    cap itself (defense in depth — ``embed_texts`` already batches), so a
    caller handing it 1000 texts still makes spec-compliant requests."""

    def _call(texts: list[str]) -> list[list[float]]:
        body = json.dumps({"texts": texts}).encode("utf-8")
        last_err: Exception | None = None
        for attempt in range(max_retries + 1):
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"}
            )
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    payload = json.loads(resp.read().decode("utf-8"))
                    return payload["embeddings"]
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500:  # client error: never retry
                    raise EmbedClientError(
                        f"embedding provider rejected request: HTTP {e.code}"
                    ) from e
                last_err = e  # 5xx: retry
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last_err = e  # connection-level: retry
            if attempt < max_retries:
                time.sleep(backoff * (2**attempt))
        raise EmbedUpstreamError(
            f"embedding provider unavailable after {max_retries + 1} attempts: {last_err}"
        ) from last_err

    def embed(texts: list[str]) -> np.ndarray:
        chunks = []
        for lo in range(0, len(texts), max_texts_per_call):
            vecs = _call(texts[lo : lo + max_texts_per_call])
            if len(vecs) != len(texts[lo : lo + max_texts_per_call]):
                raise EmbedUpstreamError(
                    f"provider returned {len(vecs)} vectors for "
                    f"{len(texts[lo : lo + max_texts_per_call])} texts"
                )
            for v in vecs:
                if len(v) != dims:
                    raise EmbedClientError(
                        f"provider returned dim {len(v)} != expected {dims}"
                    )
            chunks.append(np.asarray(vecs, dtype="float64"))
        if not chunks:
            return np.zeros((0, dims), dtype="float64")
        out = np.concatenate(chunks)
        if normalize:
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            out = out / np.where(norms == 0, 1.0, norms)
        return out

    return embed
