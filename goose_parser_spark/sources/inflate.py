"""Budget-bounded, MULTI-MEMBER stream inflation shared by the
compressed sources (JSONL shards, wiki dumps).

Real-world shards are concatenations of independent compressed
members: ``cat a.gz b.gz`` is a spec-valid gzip file, pbzip2 output
is many bz2 streams back to back, and Wikipedia's standard
``pages-articles-multistream.xml.bz2`` is exactly that shape. The
stdlib's one-shot decompressors stop at the FIRST member boundary
and leave the rest in ``unused_data`` — a reader that ignores it
silently drops almost all of a multi-GB dump (code-review finding,
session 6). This helper loops members until the input is exhausted,
carries one output budget across all of them, and REJECTS streams
whose final member never reaches EOF (a shard cut mid-transfer is
corruption, not content).
"""
from __future__ import annotations

__all__ = ["inflate_members"]


def inflate_members(data: bytes, codec: str, budget: int) -> bytes | None:
    """Inflate ``data`` as one or more concatenated ``codec``
    members (``gz``, ``bz2`` or ``xz``). Returns None — shard
    skipped, best-effort contract — on malformed input, an
    unfinished final member, or output past ``budget``."""
    import bz2
    import lzma
    import zlib

    out = bytearray()
    rest = data
    try:
        while rest:
            if codec == "gz":
                d = zlib.decompressobj(wbits=31)
            elif codec == "bz2":
                d = bz2.BZ2Decompressor()
            elif codec == "xz":
                d = lzma.LZMADecompressor()
            else:
                return None
            out += d.decompress(rest, budget + 1 - len(out))
            if len(out) > budget:
                return None
            if not d.eof:
                return None  # truncated member: reject, don't trim
            rest = d.unused_data.lstrip(b"\x00")  # bz2 pads with NULs
    except Exception:  # noqa: BLE001 — malformed member
        return None
    return bytes(out)
