"""Multimodal binary-column plumbing: metadata extraction, the decode /
resize / frame-sample actor-pool stages (deterministic 'html' fakes;
real codecs raise — the environment ships no media libraries), and the
small-batch actor wiring end-to-end through Ray."""

import pyarrow as pa
import pytest
import ray.data

from finance_sc_relations_ray.stages.multimodal import (
    DecodeStubActor,
    FrameSampleStubActor,
    ResizeStubActor,
    binary_meta_batch,
)


def _pages_tbl(n=20) -> pa.Table:
    return pa.table(
        {
            "url": [f"https://x.example/{i}" for i in range(n)],
            "html": [
                f"<html><body>{'z' * (100 + 97 * i)}</body></html>".encode()
                for i in range(n)
            ],
        }
    )


def test_binary_meta_schema_and_values():
    out = binary_meta_batch(_pages_tbl(5))
    assert out.column_names == ["url", "n_bytes", "sha1_prefix", "media_type"]
    assert out["n_bytes"].to_pylist() == [
        len(p) for p in _pages_tbl(5)["html"].to_pylist()
    ]
    assert set(out["media_type"].to_pylist()) == {"html"}


def test_real_codecs_raise_not_implemented():
    for cls in (DecodeStubActor, ResizeStubActor, FrameSampleStubActor):
        with pytest.raises(NotImplementedError):
            cls(codec="jpeg")


def test_resize_truncates_and_pads():
    actor = ResizeStubActor(target=(8, 8))  # 64 bytes
    out = actor(_pages_tbl(3))
    assert out.column_names == ["url", "resized", "width", "height"]
    for r in out["resized"].to_pylist():
        assert len(r) == 64
    assert out["width"].to_pylist() == [8, 8, 8]


def test_frame_sample_fanout_deterministic():
    actor = FrameSampleStubActor(frame_bytes=50, stride=2, max_frames=3)
    tbl = _pages_tbl(4)
    out = actor(tbl)
    # fan-out: >= one frame per page, capped at max_frames
    per_url = {}
    for u in out["url"].to_pylist():
        per_url[u] = per_url.get(u, 0) + 1
    assert set(per_url) == set(tbl["url"].to_pylist())
    assert all(1 <= c <= 3 for c in per_url.values())
    # stride respected and frames are real payload slices
    assert all(i % 2 == 0 for i in out["frame_index"].to_pylist())
    out2 = actor(tbl)
    assert out.equals(out2)  # deterministic


def test_actor_pool_wiring_small_batches():
    ds = ray.data.from_arrow(_pages_tbl(40))
    resized = ds.map_batches(
        ResizeStubActor,
        batch_format="pyarrow",
        batch_size=8,  # small batches: wide binary rows
        concurrency=(1, 2),
        num_cpus=0.5,
    )
    frames = ds.map_batches(
        FrameSampleStubActor,
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 2),
        num_cpus=0.5,
    )
    assert resized.count() == 40
    assert frames.count() >= 40


def test_byte_features_known_payload():
    import math

    import pyarrow as pa

    from finance_sc_relations_ray.stages.multimodal import byte_features_batch

    batch = pa.table(
        {
            "url": pa.array(["u0", "u1", "u2"], pa.string()),
            "html": pa.array([b"aaaabbbb", b"", b"\x00" * 16], pa.binary()),
        }
    )
    out = byte_features_batch(batch)
    ents = out["entropy"].to_pylist()
    assert ents[0] == 1.0  # two equiprobable symbols
    assert ents[1] == 0.0 and ents[2] == 0.0
    assert out["modal_byte"].to_pylist()[2] == 0
    h0 = out["byte_hist"].to_pylist()[0]
    assert len(h0) == 256 and h0[ord("a")] == 4 and h0[ord("b")] == 4
    assert sum(h0) == 8
