"""Multimodal plumbing: Arrow-batched decode determinism, stub-codec
value contract, and the zero-byte frame-sampling guard."""

from __future__ import annotations

from finance_pipeline_spark import registry
from finance_pipeline_spark.operators.multimodal import _fake_decode_image

from tests.conftest import write_documents

registry.load_all()


def test_decode_features_deterministic(spark, sf_dir):
    run = lambda: sorted(  # noqa: E731
        tuple(r)
        for r in registry.QUERIES["mm_decode_features"].fn(spark, sf_dir).collect()
    )
    first = run()
    assert first and first == run()


def test_decode_matches_stub_codec(spark, tmp_path):
    rows = [(1, "tiny"), (2, "a slightly longer payload text")]
    sf = write_documents(tmp_path, rows)
    got = {
        r.doc_id: (r.width, r.height, r.n_bytes, r.mean_intensity)
        for r in registry.QUERIES["mm_decode_features"].fn(spark, sf).collect()
    }
    for doc_id, text in rows:
        payload = text.encode("utf-8")
        w, h, mi = _fake_decode_image(payload)
        assert got[doc_id] == (w, h, len(payload), mi)


def test_frame_sample_zero_byte_payload_emits_no_frames(spark, tmp_path):
    """Regression: sequence(0, -1) auto-steps descending, which used to
    emit bogus negative frame numbers for empty payloads."""
    sf = write_documents(tmp_path, [(1, ""), (2, "x" * 130)])
    rows = registry.QUERIES["mm_frame_sample"].fn(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_no, r.frame_bytes))
    assert 1 not in by_doc  # empty payload → zero frames
    assert sorted(by_doc[2]) == [(0, 64), (1, 64), (2, 2)]  # 130 = 64+64+2


def test_binary_meta_prunes_payload(spark, sf_dir):
    """Metadata query must not read the payload column — the plan's
    ReadSchema should prune to the columns it needs."""
    df = registry.QUERIES["mm_binary_meta"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "text" in plan  # payload is derived from text here
    n = df.count()
    assert n == 500
