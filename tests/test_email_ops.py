"""mbox / RFC 822 email ingestion (ops/email_ops.py)."""
from __future__ import annotations

import base64

import pytest

from goose_parser_spark.ops.email_ops import iter_mbox, parse_email


def _msg(subject, body, extra_headers="", frm="a@example.org"):
    return (f"From: {frm}\nSubject: {subject}\n"
            f"Date: Mon, 01 Jan 2024 10:00:00 +0000\n{extra_headers}"
            f"\n{body}").encode()


def _mbox(msgs):
    return b"".join(b"From sender@x Mon Jan  1 10:00:00 2024\n" + m
                    + b"\n" for m in msgs)


def test_plain_message():
    rec = parse_email(_msg("Hello", "Body line one.\nLine two."))
    assert rec["subject"] == "Hello"
    assert rec["from_addr"] == "a@example.org"
    assert rec["body"] == "Body line one.\nLine two."


def test_rfc2047_encoded_subject():
    rec = parse_email(_msg("=?utf-8?B?" +
                           base64.b64encode("Héllo ünïcode".encode())
                           .decode() + "?=", "x"))
    assert rec["subject"] == "Héllo ünïcode"


def test_multipart_prefers_text_plain():
    raw = (b"From: a@b\nSubject: mp\nMIME-Version: 1.0\n"
           b"Content-Type: multipart/alternative; boundary=BB\n\n"
           b"--BB\nContent-Type: text/html\n\n<p>html body</p>\n"
           b"--BB\nContent-Type: text/plain; charset=utf-8\n"
           b"Content-Transfer-Encoding: base64\n\n"
           + base64.b64encode("plain wins ✓".encode()) +
           b"\n--BB--\n")
    rec = parse_email(raw)
    assert rec["body"] == "plain wins ✓"


def test_html_only_falls_back():
    raw = (b"From: a@b\nSubject: h\n"
           b"Content-Type: text/html\n\n<p>only html</p>\n")
    assert parse_email(raw)["body"] == "<p>only html</p>\n"


def test_mbox_split_and_unescaping():
    msgs = [_msg("one", "first"), _msg("two", ">From escaped line")]
    out = list(iter_mbox(_mbox(msgs)))
    assert len(out) == 2
    assert parse_email(out[0])["subject"] == "one"
    assert parse_email(out[1])["body"].startswith("From escaped")
    with pytest.raises(ValueError):
        list(iter_mbox(b"not an mbox"))


def test_mbox_messages_spark_op(spark):
    from goose_parser_spark.ops.email_ops import mbox_messages
    mb = _mbox([_msg("s1", "b1"), _msg("s2", "b2")])
    df = spark.createDataFrame(
        [(1, bytearray(mb)), (2, bytearray(b"junk"))],
        "doc_id long, payload binary")
    rows = {(r.doc_id, r.msg_no): r
            for r in mbox_messages(df).collect()}
    assert rows[(1, 0)].subject == "s1" and rows[(1, 1)].body == "b2\n"
    assert rows[(2, -1)].body is None


def test_fuzz_email_never_hangs():
    import random
    import time
    rnd = random.Random(4)
    t0 = time.monotonic()
    for n in (0, 50, 4096):
        blob = bytes(rnd.randrange(256) for _ in range(n))
        try:
            parse_email(blob)
        except Exception:
            pass
        try:
            list(iter_mbox(b"From x\n" + blob))
        except ValueError:
            pass
    assert time.monotonic() - t0 < 10
