"""Pluggable HTTP embedding-service client — the adapter a user plugs
in when they have a REAL vectorizer service instead of the in-process
deterministic embedder (``embedder.py``).

Wire-parity with the reference client
(``app/core/document_ingestor.py:605-618`` single-string path,
``:648-673`` docstring contract, ``:706-730`` list path):

* endpoints ``{base}/vectorizer/string/`` and ``{base}/vectorizer/list/``;
* request bodies ``{"text": chunk}`` / ``{"texts": chunks}`` with
  ``Content-Type: application/json`` + ``Accept: application/json``;
* up to **5 attempts, no backoff**, per-request **timeout 10 s**;
* only HTTP 200 counts as success — any other status (or a transport
  error) consumes an attempt;
* the response vector field is **JSON-string-encoded**: the body is
  ``{"vectorized text": "[0.1, 0.2, ...]"}`` (note: a string holding
  JSON, not a nested array), parsed with a second ``json.loads`` —
  exactly the reference's double-decode;
* after 5 failures, ``ValueError`` carrying the last response text.

stdlib ``urllib`` only (the container has no ``requests``; the wire
format is identical).

Scale posture: ``with_http_embeddings`` shapes the remote call as
``mapInPandas`` — ONE ``/vectorizer/list/`` POST per Arrow batch per
executor, not one per row.  On a 1000-executor cluster the embedding
service sees O(partitions × batches) requests of ~10k texts each; the
retry loop rides inside the Python worker so a flaky service degrades
to 5× request amplification worst-case, never a failed stage on the
first blip.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_ATTEMPTS = 5  # reference document_ingestor.py:648 ("for _ in range(5)")
TIMEOUT_S = 10.0  # reference document_ingestor.py:652 ("timeout = 10")

_HEADERS = {"Content-Type": "application/json", "Accept": "application/json"}


def _post_json(url: str, payload: dict, timeout: float) -> tuple[int, str]:
    """One POST; returns (status, body_text). Transport errors surface
    as a pseudo-status 0 so they consume an attempt like the
    reference's raised-through ``requests`` exceptions would not — we
    are deliberately *more* robust here: a connection refused mid-roll
    retries instead of aborting the whole stage."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers=_HEADERS,
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:  # non-2xx still has a body
        return e.code, e.read().decode("utf-8", errors="replace")
    except (urllib.error.URLError, OSError) as e:
        return 0, str(e)


def _request_with_retries(url: str, payload: dict, timeout: float) -> str:
    last_body = ""
    for _ in range(MAX_ATTEMPTS):
        status, body = _post_json(url, payload, timeout)
        last_body = body
        if status == 200:
            return body
    # Mirrors reference document_ingestor.py:668-673 / :727-730.
    raise ValueError(f"Failed to vectorize input: \n\n{last_body}")


class HttpEmbedder:
    """Client for a reference-compatible vectorizer service.

    >>> emb = HttpEmbedder("127.0.0.1", 8001)
    >>> vec = emb.embed_text("hello")          # -> list[float]
    >>> vecs = emb.embed_texts(["a", "b"])     # -> list[list[float]]
    """

    def __init__(self, host: str, port: int, timeout: float = TIMEOUT_S):
        base = f"http://{host}:{port}"
        # reference document_ingestor.py:605-607
        self.embed_str_address = f"{base}/vectorizer/string/"
        self.embed_list_address = f"{base}/vectorizer/list/"
        self.timeout = timeout

    def embed_text(self, text: str) -> list[float]:
        body = _request_with_retries(
            self.embed_str_address, {"text": text}, self.timeout
        )
        # Double decode: the field VALUE is a JSON string of the vector
        # (reference document_ingestor.py:655-656).
        return json.loads(json.loads(body)["vectorized text"])

    def embed_texts(self, texts: Sequence[str]) -> list[list[float]]:
        body = _request_with_retries(
            self.embed_list_address, {"texts": list(texts)}, self.timeout
        )
        # reference document_ingestor.py:713-714
        return json.loads(json.loads(body)["vectorized texts"])


def with_http_embeddings(
    df: DataFrame,
    host: str,
    port: int,
    text_col: str = "text",
    out_col: str = "embedding",
    timeout: float = TIMEOUT_S,
) -> DataFrame:
    """Append an embedding column produced by a remote vectorizer
    service — the drop-in twin of ``embedder.with_embeddings`` at the
    same ``mapInPandas`` seam (same schema contract: input columns +
    ``out_col ARRAY<FLOAT>``), batching one ``/vectorizer/list/`` call
    per Arrow batch.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )
    list_url = f"http://{host}:{port}/vectorizer/list/"

    # Self-contained closure (stdlib only) — cloudpickle ships
    # module-level helpers by reference, so inline the client.
    def embed_batches(batches):
        import json as _json
        import urllib.error as _ue
        import urllib.request as _ur

        def _call(texts):
            payload = _json.dumps({"texts": texts}).encode("utf-8")
            last = ""
            for _ in range(5):
                req = _ur.Request(
                    list_url,
                    data=payload,
                    headers={
                        "Content-Type": "application/json",
                        "Accept": "application/json",
                    },
                    method="POST",
                )
                try:
                    with _ur.urlopen(req, timeout=timeout) as resp:
                        if resp.status == 200:
                            body = resp.read().decode("utf-8")
                            return _json.loads(_json.loads(body)["vectorized texts"])
                except _ue.HTTPError as e:
                    last = e.read().decode("utf-8", errors="replace")
                except (_ue.URLError, OSError) as e:
                    last = str(e)
            raise ValueError(f"Failed to vectorize input: \n\n{last}")

        for pdf in batches:
            pdf = pdf.copy()
            # Null text -> null embedding, never sent to the service
            # (astype(str) would ship the literal string 'None' and
            # get a real vector back for a row that has no text).
            mask = pdf[text_col].notna()
            texts = pdf.loc[mask, text_col].astype(str).tolist()
            vecs = _call(texts) if texts else []
            out = [None] * len(pdf)
            for i, v in zip(mask.to_numpy().nonzero()[0], vecs):
                out[i] = v
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(embed_batches, schema=out_schema)
