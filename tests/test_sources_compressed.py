"""Mixed-codec JSONL shard reading (sources.read_pages_jsonl_compressed).

Corpora ship as .jsonl.{gz,bz2,xz,zst,br} — one directory, often
mixed. Authoring here uses REFERENCE encoders only: the stdlib for
gz/bz2/xz, zstd-jni (Spark's bundled real zstd) for zst, and
libbrotlienc via ctypes for br — so the read path is pinned against
real-world artifacts, not self-written streams.
"""
from __future__ import annotations

import base64
import bz2
import gzip
import json
import lzma

import pytest


def _lines(tag: str, n: int = 5) -> str:
    return "\n".join(json.dumps({
        "url": f"https://ex.com/{tag}{i}",
        "html_b64": base64.b64encode(
            f"<p>{tag}{i}</p>".encode()).decode(),
        "text": f"doc {tag}{i}", "lang": "en"}) for i in range(n))


def test_mixed_codec_shard_directory(spark, tmp_path):
    from goose_parser_spark.sources import read_pages_jsonl_compressed

    (tmp_path / "a.jsonl").write_text(_lines("plain"))
    (tmp_path / "b.jsonl.gz").write_bytes(
        gzip.compress(_lines("gz").encode()))
    (tmp_path / "c.jsonl.bz2").write_bytes(
        bz2.compress(_lines("bz").encode()))
    (tmp_path / "d.jsonl.xz").write_bytes(
        lzma.compress(_lines("xz").encode()))
    Z = spark._jvm.com.github.luben.zstd.Zstd
    (tmp_path / "e.jsonl.zst").write_bytes(
        bytes(Z.compress(_lines("zs").encode(), 9)))
    tags = ["plain", "gz", "bz", "xz", "zs"]
    try:
        from tests.test_brotli import _ref_encoder
        enc = _ref_encoder()
    except Exception:  # pragma: no cover - lib present in container
        enc = None
    if enc is not None:
        (tmp_path / "f.jsonl.br").write_bytes(
            enc(_lines("br").encode()))
        tags.append("br")
    # a malformed shard must be skipped, not fail the read
    (tmp_path / "junk.jsonl.gz").write_bytes(b"\x1f\x8bgarbage")

    df = read_pages_jsonl_compressed(spark, str(tmp_path))
    rows = {r.url: (bytes(r.html), r.text) for r in df.collect()}
    assert len(rows) == 5 * len(tags)
    for tag in tags:
        assert rows[f"https://ex.com/{tag}2"] == \
            (f"<p>{tag}2</p>".encode(), f"doc {tag}2")


def test_inflate_budget_skips_bombs():
    from goose_parser_spark.sources.jsonl import _inflate_shard
    import goose_parser_spark.sources.jsonl as jl
    old = jl._SHARD_BUDGET
    jl._SHARD_BUDGET = 1 << 16
    try:
        bomb = bz2.compress(b"\x00" * (1 << 22))
        assert _inflate_shard("x.jsonl.bz2", bomb) is None
        bomb = gzip.compress(b"\x00" * (1 << 22))
        assert _inflate_shard("x.jsonl.gz", bomb) is None
        bomb = lzma.compress(b"\x00" * (1 << 22))
        assert _inflate_shard("x.jsonl.xz", bomb) is None
        ok = gzip.compress(b"hello")
        assert _inflate_shard("x.jsonl.gz", ok) == b"hello"
    finally:
        jl._SHARD_BUDGET = old


def test_unknown_suffix_and_garbage_skipped():
    from goose_parser_spark.sources.jsonl import _inflate_shard
    assert _inflate_shard("x.jsonl.rar", b"whatever") is None
    assert _inflate_shard("x.jsonl.xz", b"\xfd7zXZ garbage") is None
    assert _inflate_shard("x.jsonl", b"raw ok") == b"raw ok"


def test_multimember_shards_fully_inflate():
    """cat a.gz b.gz is a valid gzip file and pbzip2 emits many bz2
    streams back to back — the reader must inflate ALL members
    (code-review finding: first-member-only truncation was silent
    data loss)."""
    from goose_parser_spark.sources.jsonl import _inflate_shard
    a, b = b'{"x": 1}\n', b'{"x": 2}\n'
    assert _inflate_shard("s.jsonl.gz",
                          gzip.compress(a) + gzip.compress(b)) == a + b
    assert _inflate_shard("s.jsonl.bz2",
                          bz2.compress(a) + bz2.compress(b)) == a + b
    assert _inflate_shard("s.jsonl.xz",
                          lzma.compress(a) + lzma.compress(b)) == a + b


def test_truncated_member_rejected():
    """A shard cut mid-transfer must be skipped, not silently
    trimmed to the bytes that happened to inflate."""
    from goose_parser_spark.sources.jsonl import _inflate_shard
    full = gzip.compress(b"x" * 10000)
    assert _inflate_shard("s.jsonl.gz", full[:-20]) is None
    fullb = bz2.compress(b"y" * 10000)
    assert _inflate_shard("s.jsonl.bz2", fullb[:-20]) is None
