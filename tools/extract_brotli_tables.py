"""Regenerate goose_parser_spark/ops/_brotli_data.py from a system
libbrotlicommon shared library.

The brotli format (RFC 7932) hard-codes several PUBLIC data tables —
the 122,784-byte static dictionary (Appendix A), the 121 word
transforms (Appendix B), the literal context lookup table (§7.1) and
the block-count code (§6) — that are impractical to retype from the
specification text. This tool extracts them from the BSD-licensed
reference library present on the host (exported symbols
``BrotliGetDictionary`` / ``BrotliGetTransforms`` /
``_kBrotliContextLookupTable`` / ``_kBrotliPrefixCodeRanges``) and
embeds them as a generated Python module, so the decoder in
ops/brotlicodec.py stays pure-stdlib at runtime.

Transforms are derived BEHAVIORALLY: each transform index is applied
via ``BrotliTransformDictionaryWord`` to probe words and classified
as (prefix, kind, param, suffix); the ferment (uppercase) rule for
non-ASCII bytes is then property-checked against the library over
random byte words before the module is written.

Usage: python tools/extract_brotli_tables.py [path/to/libbrotlicommon.so]
"""

from __future__ import annotations

import base64
import ctypes
import glob
import random
import sys
import zlib

OUT = "goose_parser_spark/ops/_brotli_data.py"


def find_lib() -> str:
    if len(sys.argv) > 1:
        return sys.argv[1]
    pats = [
        "/usr/lib/x86_64-linux-gnu/libbrotlicommon.so*",
        "/root/miniconda/pkgs/libbrotlicommon-*/lib/libbrotlicommon.so.1",
        "/usr/lib/libbrotlicommon.so*",
    ]
    for p in pats:
        hits = sorted(glob.glob(p))
        if hits:
            return hits[0]
    raise SystemExit("no libbrotlicommon found; pass a path")


class _Dict(ctypes.Structure):
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8))]


class _Transforms(ctypes.Structure):
    _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                ("prefix_suffix", ctypes.c_void_p),
                ("prefix_suffix_map", ctypes.c_void_p),
                ("num_transforms", ctypes.c_uint32),
                ("transforms", ctypes.c_void_p)]


def ferment(buf: bytearray, pos: int) -> int:
    """RFC 7932 uppercasing step at ``pos``; returns bytes consumed."""
    c = buf[pos]
    if c < 192:
        if 97 <= c <= 122:
            buf[pos] ^= 32
        return 1
    if c < 224:
        if pos + 1 < len(buf):
            buf[pos + 1] ^= 32
        return 2
    if pos + 2 < len(buf):
        buf[pos + 2] ^= 5
    return 3


def apply_derived(entry, word: bytes) -> bytes:
    prefix, kind, n, suffix = entry
    w = bytearray(word)
    if kind == "omit_first":
        w = w[n:] if n < len(w) else bytearray()
    elif kind == "omit_last":
        w = w[:len(w) - n] if n < len(w) else bytearray()
    elif kind == "upper_first":
        if w:
            ferment(w, 0)
    elif kind == "upper_all":
        i = 0
        while i < len(w):
            i += ferment(w, i)
    return prefix + bytes(w) + suffix


def main() -> None:
    path = find_lib()
    lib = ctypes.CDLL(path)
    lib.BrotliGetDictionary.restype = ctypes.POINTER(_Dict)
    d = lib.BrotliGetDictionary().contents
    assert d.data_size == 122784, d.data_size  # RFC 7932 Appendix A size
    dict_data = ctypes.string_at(d.data, d.data_size)
    size_bits = list(d.size_bits_by_length)
    offsets = list(d.offsets_by_length)

    ctx = bytes((ctypes.c_uint8 * 2048).in_dll(
        lib, "_kBrotliContextLookupTable"))
    pcr = (ctypes.c_uint32 * 26).in_dll(lib, "_kBrotliPrefixCodeRanges")
    block_len_code = [(v & 0xFFFF, (v >> 16) & 0xFF) for v in pcr]

    lib.BrotliGetTransforms.restype = ctypes.c_void_p
    tr = lib.BrotliGetTransforms()
    ts = ctypes.cast(tr, ctypes.POINTER(_Transforms)).contents
    assert ts.num_transforms == 121, ts.num_transforms
    lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
    lib.BrotliTransformDictionaryWord.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int]

    def apply_ref(idx: int, word: bytes) -> bytes:
        dst = ctypes.create_string_buffer(len(word) + 64)
        n = lib.BrotliTransformDictionaryWord(dst, word, len(word), tr, idx)
        return dst.raw[:n]

    w1 = b"abcdefghijklmnopqrstuvwx"
    w2 = b"zyxwvutsrqponmlkjihgfedc"
    transforms = []
    for i in range(121):
        o1, o2 = apply_ref(i, w1), apply_ref(i, w2)
        p = 0
        while p < min(len(o1), len(o2)) and o1[p] == o2[p]:
            p += 1
        s = 0
        while (s < min(len(o1), len(o2)) - p
               and o1[len(o1) - 1 - s] == o2[len(o2) - 1 - s]):
            s += 1
        prefix = o1[:p]
        suffix = o1[len(o1) - s:] if s else b""
        mid = o1[p:len(o1) - s] if s else o1[p:]
        if mid == w1:
            kind, n = "ident", 0
        elif w1.endswith(mid):
            kind, n = "omit_first", len(w1) - len(mid)
        elif w1.startswith(mid):
            kind, n = "omit_last", len(w1) - len(mid)
        elif mid == w1.upper():
            kind, n = "upper_all", 0
        elif mid == w1[:1].upper() + w1[1:]:
            kind, n = "upper_first", 0
        else:
            raise SystemExit(f"unclassifiable transform {i}: {mid!r}")
        transforms.append((prefix, kind, n, suffix))

    # property-check the derived table (incl. the non-ASCII ferment
    # rule) against the reference implementation
    rng = random.Random(7932)
    for trial in range(500):
        wl = rng.randrange(4, 25)
        word = bytes(rng.randrange(256) for _ in range(wl))
        idx = rng.randrange(121)
        got = apply_derived(transforms[idx], word)
        want = apply_ref(idx, word)
        assert got == want, (idx, word, got, want)

    comp = base64.b64encode(zlib.compress(dict_data, 9)).decode()
    ctx_b64 = base64.b64encode(ctx).decode()

    def wrap(s: str, indent: str = "    ") -> str:
        return "\n".join(f'{indent}"{s[i:i + 68]}"'
                         for i in range(0, len(s), 68))

    with open(OUT, "w") as fh:
        fh.write('"""GENERATED by tools/extract_brotli_tables.py — '
                 'do not edit.\n\n'
                 'Public RFC 7932 data tables (static dictionary, word\n'
                 'transforms, context lookup, block-count code) extracted\n'
                 'from the BSD-licensed brotli reference library and\n'
                 'behaviorally verified against it (see the tool for the\n'
                 'derivation + 500-trial property check). This is spec\n'
                 'data, not code: the same bytes appear in RFC 7932\n'
                 'Appendices A and B.\n"""\n\n'
                 "import base64 as _b64\nimport zlib as _zlib\n\n")
        fh.write("DICTIONARY = _zlib.decompress(_b64.b64decode(\n"
                 + wrap(comp) + "))\n\n")
        fh.write(f"SIZE_BITS_BY_LENGTH = {size_bits}\n\n")
        fh.write(f"OFFSETS_BY_LENGTH = {offsets}\n\n")
        fh.write("CONTEXT_LUT = _b64.b64decode(\n" + wrap(ctx_b64) + ")\n\n")
        fh.write(f"BLOCK_LENGTH_CODE = {block_len_code}\n\n")
        fh.write("# (prefix, kind, n, suffix) per transform id; kind in\n"
                 "# {ident, omit_first, omit_last, upper_first, upper_all}\n")
        fh.write("TRANSFORMS = [\n")
        for t in transforms:
            fh.write(f"    ({t[0]!r}, {t[1]!r}, {t[2]}, {t[3]!r}),\n")
        fh.write("]\n")
    print(f"wrote {OUT}: dict={len(dict_data)}B (deflated b64 "
          f"{len(comp)}B), 121 transforms verified, ctx=2048B")


if __name__ == "__main__":
    main()
