"""Multimodal (binary-column) stages.

Treats opaque ``binary`` payloads (here: ``pages.html``; images/audio
at scale) as first-class columns with typed metadata. The Ray-side
plumbing — schema, actor signature, batch sizing for wide binary rows —
is real and tested; the actual media decode is STUBBED (the
image/audio libraries are not in this container): ``DecodeStubActor``
raises ``NotImplementedError`` for real codecs and provides a
deterministic fake for 'html' so pipelines exercise the layout.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

BINARY_META_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_bytes", pa.int64()),
        ("sha1_prefix", pa.string()),
        ("media_type", pa.string()),
    ]
)


def binary_meta_batch(batch: pa.Table, payload_col: str = "html") -> pa.Table:
    """Typed metadata for a binary payload column (vectorizable part of
    the multimodal path; no decode)."""
    payloads = batch[payload_col].to_pylist()
    n_bytes = [len(p) for p in payloads]
    sha1 = [hashlib.sha1(p).hexdigest()[:12] for p in payloads]
    media = [
        "html" if p[:20].lstrip().lower().startswith(b"<html") else "unknown"
        for p in payloads
    ]
    return pa.table(
        {
            "url": batch["url"],
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "sha1_prefix": pa.array(sha1, pa.string()),
            "media_type": pa.array(media, pa.string()),
        }
    )


class DecodeStubActor:
    """Actor-pool decode stage for binary media.

    For ``media_type='html'`` emits a deterministic fake "feature":
    (n_bytes, sha1-derived 8-dim feature vector). For image/audio/video
    codecs raises ``NotImplementedError`` — the real decoder drops into
    ``_decode`` with the same signature; batch sizes for such stages
    should be small (large payload × batch must fit worker heap, see
    ray_guide 'Memory-aware').
    """

    def __init__(self, codec: str = "html"):
        if codec not in ("html",):
            raise NotImplementedError(
                f"codec {codec!r} requires media libraries not present in "
                "this environment; plug a real decoder here"
            )
        self.codec = codec

    def _decode(self, payload: bytes) -> list[float]:
        h = hashlib.sha1(payload).digest()
        return [b / 255.0 for b in h[:8]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch["html"].to_pylist()]
        return pa.table(
            {
                "url": batch["url"],
                "feature": pa.array(feats, pa.list_(pa.float64(), 8)),
            }
        )
