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


class ResizeStubActor:
    """Actor-pool resize stage for image payloads. Real codecs raise
    (no image libraries in this container); the 'html' codec provides a
    deterministic fake — truncate-or-pad the payload to ``target_bytes``
    — so the Ray-side plumbing (actor signature, small-batch sizing for
    wide rows, output schema with target dims) is real and tested. A
    real implementation swaps ``_resize`` for PIL/cv2 and keeps
    everything else."""

    def __init__(self, codec: str = "html", target: tuple = (64, 64)):
        if codec not in ("html",):
            raise NotImplementedError(
                f"codec {codec!r} requires image libraries not present "
                "in this environment; plug a real resizer here"
            )
        self.codec = codec
        self.target = target
        self.target_bytes = target[0] * target[1]

    def _resize(self, payload: bytes) -> bytes:
        if len(payload) >= self.target_bytes:
            return payload[: self.target_bytes]
        return payload + b"\0" * (self.target_bytes - len(payload))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize(p) for p in batch["html"].to_pylist()]
        return pa.table(
            {
                "url": batch["url"],
                "resized": pa.array(out, pa.binary()),
                "width": pa.array([self.target[0]] * batch.num_rows, pa.int32()),
                "height": pa.array([self.target[1]] * batch.num_rows, pa.int32()),
            }
        )


class FrameSampleStubActor:
    """Actor-pool frame-sampling stage for video payloads: emits one
    output row per sampled frame (a flat_map-shaped batch transform —
    the fan-out layout a real decoder needs). Real codecs raise; the
    'html' codec deterministically chunks the payload into
    ``frame_bytes`` pieces and keeps every ``stride``-th chunk."""

    def __init__(
        self,
        codec: str = "html",
        frame_bytes: int = 256,
        stride: int = 4,
        max_frames: int = 8,
    ):
        if codec not in ("html",):
            raise NotImplementedError(
                f"codec {codec!r} requires video libraries not present "
                "in this environment; plug a real frame sampler here"
            )
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, idxs, frames = [], [], []
        for url, p in zip(
            batch["url"].to_pylist(), batch["html"].to_pylist()
        ):
            n_chunks = max(1, len(p) // self.frame_bytes)
            taken = 0
            for ci in range(0, n_chunks, self.stride):
                if taken >= self.max_frames:
                    break
                urls.append(url)
                idxs.append(ci)
                frames.append(
                    p[ci * self.frame_bytes : (ci + 1) * self.frame_bytes]
                )
                taken += 1
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "frame_index": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def byte_features_batch(batch: pa.Table, payload_col: str = "html") -> pa.Table:
    """REAL (non-stub) codec-free feature extraction over binary
    payloads: 256-bin byte histogram, Shannon entropy (bits/byte) and
    the modal byte — the standard cheap signals for content-type
    detection and binary-junk filtering in web-crawl curation. Fully
    vectorized (one ``np.bincount`` per row on a zero-copy buffer
    view); no media library needed, so unlike the decode/resize stubs
    this stage runs for every codec as-is."""
    import numpy as np

    urls = batch["url"]
    hists, ents, modes = [], [], []
    for p in batch[payload_col].to_pylist():
        arr = np.frombuffer(p, dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.int64)
        n = int(arr.size)
        if n:
            pr = hist[hist > 0] / n
            ent = float(-(pr * np.log2(pr)).sum())
            mode = int(hist.argmax())
        else:
            ent, mode = 0.0, 0
        hists.append(hist.tolist())
        ents.append(round(ent, 6))
        modes.append(mode)
    return pa.table(
        {
            "url": urls,
            "entropy": pa.array(ents, pa.float64()),
            "modal_byte": pa.array(modes, pa.int32()),
            "byte_hist": pa.array(hists, pa.list_(pa.int64(), 256)),
        }
    )
