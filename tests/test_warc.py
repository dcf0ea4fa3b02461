"""WARC ingestion: real framing grammar (Content-Length-driven records,
per-record gzip members, CRLF separators), inner HTTP parse, and the
end-to-end extraction query."""

from __future__ import annotations

import pytest

from finance_pipeline_spark.operators.warc import (
    _http_response_bytes,
    build_warc,
    parse_http_response,
    parse_warc,
)


def _recs():
    return [
        ("warcinfo", {"Content-Type": "application/warc-fields"}, b"a: b\r\n"),
        (
            "response",
            {"WARC-Target-URI": "http://s.example.com/doc/7"},
            _http_response_bytes("héllo wörld".encode()),
        ),
        (
            "request",
            {"WARC-Target-URI": "http://s.example.com/doc/7"},
            b"GET /doc/7 HTTP/1.1\r\nHost: s\r\n\r\n",
        ),
    ]


def test_warc_round_trip_plain_and_gzip_members():
    for gz in (False, True):
        out = parse_warc(build_warc(_recs(), gzip_members=gz))
        assert [r["type"] for r in out] == ["warcinfo", "response", "request"]
        status, headers, body = parse_http_response(out[1]["payload"])
        assert status == 200
        assert headers["content-type"].startswith("text/plain")
        assert body.decode() == "héllo wörld"
        # framing is Content-Length-driven: binary-safe payloads
        assert out[0]["headers"]["warc-type"] == "warcinfo"


def test_warc_rejects_misframed_input():
    good = build_warc(_recs(), gzip_members=False)
    with pytest.raises(ValueError, match="truncated WARC record payload"):
        parse_warc(good[:-10])
    with pytest.raises(ValueError, match="bad WARC version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    # strip the record separator after the first record's payload
    first_end = good.find(b"\r\n\r\n", good.find(b"Content-Length"))
    n = int(good[:first_end].split(b"Content-Length: ")[1].split(b"\r\n")[0])
    broken = good[: first_end + 4 + n] + good[first_end + 4 + n + 4 :]
    with pytest.raises(ValueError, match="separator"):
        parse_warc(broken)
    # truncated gzip member
    gz = build_warc(_recs(), gzip_members=True)
    with pytest.raises(ValueError, match="gzip member"):
        parse_warc(gz[:-5])
    # non-numeric Content-Length
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: xx\r\n\r\n"
    with pytest.raises(ValueError, match="non-numeric"):
        parse_warc(bad)
    # missing Content-Length entirely
    with pytest.raises(ValueError, match="missing Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")


def test_warc_extract_end_to_end(spark, sf_dir):
    """One row per document, responses only, fields bit-exact."""
    from finance_pipeline_spark.registry import QUERIES, load

    rows = {r.doc_id: r for r in QUERIES["text_warc_extract"].fn(spark, sf_dir).collect()}
    docs = {
        r.doc_id: (r.source, r.text)
        for r in load(spark, sf_dir, "documents").collect()
    }
    assert set(rows) == set(docs)
    did, (src, text) = next(iter(docs.items()))
    r = rows[did]
    assert r.url == f"http://{src}.example.com/doc/{did}"
    assert r.http_status == 200
    assert r.n_bytes == len(("" if text is None else text).encode("utf-8"))


def test_warc_framing_is_binary_safe_hypothesis():
    """Property (hypothesis): Content-Length framing must round-trip
    ANY payload bytes — including payloads that themselves contain
    record separators (b'\\r\\n\\r\\n'), WARC version lines, and gzip
    magic — in both plain and per-record-gzip layouts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.lists(
        st.binary(min_size=0, max_size=200), min_size=1, max_size=4
    )

    @settings(max_examples=40, deadline=None)
    @given(payloads, st.booleans())
    def prop(bodies, gz):
        recs = [
            ("response", {"WARC-Target-URI": f"http://h/doc/{i}"}, b)
            for i, b in enumerate(bodies)
        ]
        out = parse_warc(build_warc(recs, gzip_members=gz))
        assert [r["payload"] for r in out] == bodies

    # adversarial seeds the generator should also cover explicitly
    for tricky in (b"\r\n\r\n", b"WARC/1.0\r\n", b"\x1f\x8b\x08", b""):
        out = parse_warc(
            build_warc([("response", {}, tricky)], gzip_members=True)
        )
        assert out[0]["payload"] == tricky
    prop()


def test_warc_dir_to_docs_and_ingest_chain(spark, tmp_path):
    """The first mile end-to-end: real per-record-gzip WARC segment
    FILES on disk → binaryFile read → docs frame (stable URL-digest
    doc_ids, host source) → straight into the stored dedup index.
    Re-extraction converges on the same doc_ids, and a re-ingested
    extraction screens all-drop_exact."""
    from finance_pipeline_spark.operators.warc import (
        _http_response_bytes,
        build_warc,
        warc_dir_to_docs,
    )
    from finance_pipeline_spark.pipelines.dedup_index import CorpusDedupIndex

    wdir = tmp_path / "segments"
    wdir.mkdir()
    for seg in range(2):
        recs = [("warcinfo", {}, b"sw: test\r\n")]
        for i in range(3):
            url = f"http://host{seg}.example.com/p/{i}"
            body = f"document {seg}-{i} body text".encode()
            recs.append(
                ("response", {"WARC-Target-URI": url}, _http_response_bytes(body))
            )
        (wdir / f"seg{seg}.warc.gz").write_bytes(build_warc(recs))

    docs = warc_dir_to_docs(spark, str(wdir))
    rows = docs.collect()
    assert len(rows) == 6
    assert {r.source for r in rows} == {"host0.example.com", "host1.example.com"}
    assert all(r.n_chars == len(r.text) and r.doc_id > 0 for r in rows)
    # stable ids: re-extraction yields the identical frame
    again = {(r.doc_id, r.text) for r in warc_dir_to_docs(spark, str(wdir)).collect()}
    assert again == {(r.doc_id, r.text) for r in rows}

    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    first = idx.screen(docs.select("doc_id", "text")).collect()
    assert all(r.verdict == "keep" for r in first)
    idx.add(docs.select("doc_id", "text"))
    replay = idx.screen(docs.select("doc_id", "text")).collect()
    assert all(r.verdict == "drop_exact" for r in replay)
